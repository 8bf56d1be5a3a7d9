"""Headline benchmark: channel realizations/s per chip.

Config (BASELINE.json metric): 4×4 MIMO, ETU, 200 Hz Doppler, 10 dB SNR,
10% pilots — full pipeline per frame: Jakes fading synthesis + frequency
response + channel apply + AWGN + LS pilots + full-covariance Wiener MMSE
estimate (per-subcarrier, PDP+Doppler priors).

Baseline: the reference (src/channel_simulator.py simulate_transmission +
src/baseline_estimators.py MMSEEstimator.estimate, 4×4 ETU) measured on
this machine's CPU at 0.2377 frames/s (4.21 s/frame, mean of 3 after
warmup — see BASELINE.md).

Prints ONE JSON line on stdout; diagnostics go to stderr.
"""
import json
import sys
import time

REF_FRAMES_PER_S = 0.2377  # reference CPU, this machine (see BASELINE.md)


def main():
    import jax
    import jax.numpy as jnp

    from ce5g_tpu import ExperimentConfig, MIMOConfig
    from ce5g_tpu.estimators.api import estimate_batch
    from ce5g_tpu.physics import FrameParams, PROFILE_INDEX, simulate_batch, table_for

    cfg = ExperimentConfig(mimo=MIMOConfig(num_tx=4, num_rx=4))
    table = table_for(cfg)

    def pipeline(keys):
        b = keys.shape[0]
        params = FrameParams(
            jnp.full((b,), PROFILE_INDEX["ETU"], jnp.int32),
            jnp.full((b,), 200.0, jnp.float32),
            jnp.full((b,), 10.0, jnp.float32),
            jnp.full((b,), 0.1, jnp.float32),
        )
        frames = simulate_batch(keys, params, cfg=cfg, table=table)
        h_est = estimate_batch(frames, cfg=cfg, estimator="mmse_full", table=table)
        err = jnp.mean(jnp.abs(frames.channel - h_est) ** 2)
        pwr = jnp.mean(jnp.abs(frames.channel) ** 2)
        return err / pwr  # NMSE: forces full pipeline materialization

    fn = jax.jit(pipeline)
    batch = 256
    keys = jax.random.split(jax.random.key(0), batch)

    t0 = time.time()
    nmse = float(jax.block_until_ready(fn(keys)))
    compile_s = time.time() - t0
    print(f"compile+first run: {compile_s:.1f}s  nmse={10*jnp.log10(nmse):.2f} dB",
          file=sys.stderr)

    # steady state: several timed iterations with FRESH keys per iteration
    # (identical inputs can be relay-cached on the tunneled dev TPU) and a
    # scalar VALUE fetch per iteration (block_until_ready alone has been
    # observed not to block on that runtime).
    iters = 5
    t0 = time.time()
    sink = 0.0
    for i in range(iters):
        keys = jax.random.split(jax.random.key(i + 1), batch)
        sink += float(fn(keys))
    dt = time.time() - t0
    frames_per_s = batch * iters / dt
    print(f"steady: {frames_per_s:.1f} frames/s ({dt/iters*1e3:.1f} ms/batch of {batch})",
          file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "channel_realizations_per_s_per_chip_4x4_ETU_mmse_full",
                "value": round(frames_per_s, 2),
                "unit": "frames/s",
                "vs_baseline": round(frames_per_s / REF_FRAMES_PER_S, 1),
            }
        )
    )


if __name__ == "__main__":
    main()

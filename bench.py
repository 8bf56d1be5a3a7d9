"""Headline benchmark: channel realizations/s per chip.

Config (BASELINE.json metric): 4×4 MIMO, ETU, 200 Hz Doppler, 10 dB SNR,
10% pilots — full pipeline per frame: Jakes fading synthesis + frequency
response + channel apply + AWGN + LS pilots + full-covariance Wiener MMSE
estimate (per-subcarrier, PDP+Doppler priors).

Baseline: the reference (src/channel_simulator.py simulate_transmission +
src/baseline_estimators.py MMSEEstimator.estimate, 4×4 ETU) measured on
this machine's CPU at 0.2377 frames/s (4.21 s/frame, mean of 3 after
warmup — see BASELINE.md).

Measurement basis: the headline number is SUSTAINED ON-DEVICE throughput
— `iters` fresh-key batches scanned inside one jit, so per-call host
dispatch/fetch (28 ms of tunnel latency on this dev setup) is amortized.
The reference baseline is end-to-end CPU wall-clock; `--roundtrip` also
reports the per-round-trip number (one jit call per batch, dispatch +
device→host fetch included) so both comparison bases are explicit.

Prints ONE JSON line on stdout; diagnostics go to stderr.
"""
import json
import sys
import time

REF_FRAMES_PER_S = 0.2377  # reference CPU, this machine (see BASELINE.md)


def main():
    import jax

    # Persistent compilation cache: the pipeline compiles once per machine,
    # not once per process (first compile of the scanned pipeline is ~4 min
    # through the tunneled dev chip; cached reload is seconds).
    jax.config.update("jax_compilation_cache_dir", "/tmp/ce5g_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

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

    # The tunneled dev TPU adds ~28 ms of dispatch+fetch latency to EVERY
    # host round-trip (measured with a null jit), so per-call timing would
    # benchmark the tunnel, not the chip. The pipeline therefore scans over
    # `iters` fresh-key batches INSIDE one jit call (fresh keys defeat
    # relay caching; the scan carry forces sequential full materialization)
    # and the host fetches ONE scalar at the end.
    batch, iters = 256, 64

    @jax.jit
    def many(keys2d):
        def body(carry, ks):
            return carry + pipeline(ks), None

        tot, _ = jax.lax.scan(body, jnp.float32(0.0), keys2d)
        return tot / keys2d.shape[0]

    def keys_for(seed):
        return jax.random.split(jax.random.key(seed), iters * batch).reshape(
            iters, batch
        )

    # Round-5 diagnosis of the r3→r4 "compile-time regression": ~110 s of
    # the old compile_s was ONE-TIME device/tunnel initialization paid by
    # the first program the process executes (measured: a scanned
    # sim-only program pays 115 s on first run while its XLA compile is
    # 7 s; the next, larger program runs in 1.8 s). Warm the device with
    # a trivial program first so `compile_s` measures THIS pipeline's
    # compile + first run, and report the init separately.
    t0 = time.time()
    jax.block_until_ready(jax.jit(lambda a: a @ a)(jnp.ones((8, 8))))
    init_s = time.time() - t0
    print(f"device init/warmup: {init_s:.1f}s", file=sys.stderr)

    t0 = time.time()
    nmse = float(many(keys_for(0)))
    compile_s = time.time() - t0
    print(f"compile+first run: {compile_s:.1f}s  nmse={10*jnp.log10(nmse):.2f} dB",
          file=sys.stderr)

    reps = 3
    t0 = time.time()
    sink = 0.0
    for rep in range(reps):
        sink += float(many(keys_for(rep + 1)))
    dt = time.time() - t0
    frames_per_s = batch * iters * reps / dt
    print(
        f"steady: {frames_per_s:.1f} frames/s "
        f"({dt / (iters * reps) * 1e3:.1f} ms/batch of {batch})",
        file=sys.stderr,
    )

    if "--roundtrip" in sys.argv:
        one = jax.jit(pipeline)
        ks = keys_for(0)[0]
        float(one(ks))  # compile
        t0 = time.time()
        for rep in range(reps):
            float(one(keys_for(rep + 1)[0]))  # fetch blocks: full round trip
        rt = batch * reps / (time.time() - t0)
        print(
            f"round-trip: {rt:.1f} frames/s (one jit call + host fetch per "
            f"batch of {batch})",
            file=sys.stderr,
        )

    print(
        json.dumps(
            {
                "metric": "channel_realizations_per_s_per_chip_4x4_ETU_mmse_full",
                "value": round(frames_per_s, 2),
                "unit": "frames/s",
                "vs_baseline": round(frames_per_s / REF_FRAMES_PER_S, 1),
                # compile+first-run seconds (cached reload when the
                # persistent cache is warm) — tracked so compile-time
                # regressions are visible round over round. init_s is the
                # one-time device/tunnel bring-up a trivial warmup program
                # absorbs; r4's 111 s compile_s was init_s+compile_s
                # conflated (see comment above).
                "compile_s": round(compile_s, 1),
                "init_s": round(init_s, 1),
                "nmse_db": round(float(10 * jnp.log10(nmse)), 2),
            }
        )
    )


if __name__ == "__main__":
    main()

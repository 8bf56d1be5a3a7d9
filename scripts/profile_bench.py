"""Stage-level profiling of the headline bench pipeline on the real TPU.

Times each stage in isolation (scanned inside one jit to amortize the
tunnel round-trip, like bench.py) so optimization effort lands where the
time actually goes. Diagnostics only — not part of the driver flow.
"""
import time
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from ce5g_tpu import ExperimentConfig, MIMOConfig
from ce5g_tpu.estimators.api import estimate_batch
from ce5g_tpu.physics import FrameParams, PROFILE_INDEX, simulate_batch, table_for
from ce5g_tpu.physics.pilots import make_pattern
from ce5g_tpu.physics.jakes import path_gains_symbol_sampled
from ce5g_tpu.physics.mimo import frequency_response, apply_channel

BATCH, ITERS = 256, 4

cfg = ExperimentConfig(mimo=MIMOConfig(num_tx=4, num_rx=4))
table = table_for(cfg)
ofdm, mimo = cfg.ofdm, cfg.mimo


def params_for(b):
    return FrameParams(
        jnp.full((b,), PROFILE_INDEX["ETU"], jnp.int32),
        jnp.full((b,), 200.0, jnp.float32),
        jnp.full((b,), 10.0, jnp.float32),
        jnp.full((b,), 0.1, jnp.float32),
    )


def keys_for(seed):
    return jax.random.split(jax.random.key(seed), ITERS * BATCH).reshape(ITERS, BATCH)


def timeit(name, fn, keys2d):
    @jax.jit
    def many(keys2d):
        def body(c, ks):
            return c + fn(ks), None

        tot, _ = jax.lax.scan(body, jnp.float32(0.0), keys2d)
        return tot

    t0 = time.time()
    float(many(keys2d))
    compile_s = time.time() - t0
    reps = 3
    t0 = time.time()
    s = 0.0
    for r in range(reps):
        s += float(many(keys_for(r + 1)))
    dt = (time.time() - t0) / reps / ITERS
    print(f"{name:28s} {dt*1e3:8.2f} ms/batch  ({BATCH/dt:9.0f} fr/s)  compile {compile_s:6.1f}s",
          file=sys.stderr, flush=True)


def main():
    keys2d = keys_for(0)

    p = params_for(BATCH)

    def full(ks):
        frames = simulate_batch(ks, p, cfg=cfg, table=table)
        h = estimate_batch(frames, cfg=cfg, estimator="mmse_full", table=table)
        return jnp.mean(jnp.abs(frames.channel - h) ** 2)

    def sim_only(ks):
        frames = simulate_batch(ks, p, cfg=cfg, table=table)
        return jnp.mean(jnp.abs(frames.channel) ** 2) + jnp.mean(jnp.abs(frames.rx_symbols) ** 2)

    def pilots_only(ks):
        pat = jax.vmap(
            lambda k: make_pattern(k, ofdm.num_symbols, ofdm.num_used_subcarriers,
                                   0.1, cfg.pilots.pattern, cfg.pilots.max_density)
        )(ks)
        return jnp.sum(pat.mask) + jnp.sum(pat.valid)

    def jakes_only(ks):
        amp = jnp.asarray(table.amp_overwrite)[PROFILE_INDEX["ETU"]]
        g = jax.vmap(
            lambda k: path_gains_symbol_sampled(
                k, 200.0, amp, ofdm.num_symbols, ofdm.samples_per_symbol,
                ofdm.sampling_rate, mimo.num_rx, mimo.num_tx,
                cfg.channel.num_oscillators)
        )(ks)
        return jnp.mean(jnp.abs(g) ** 2)

    def freqresp_only(ks):
        amp = jnp.asarray(table.amp_overwrite)[PROFILE_INDEX["ETU"]]
        fm = jnp.asarray(table.freq_response)[PROFILE_INDEX["ETU"]]
        g = jax.vmap(
            lambda k: path_gains_symbol_sampled(
                k, 200.0, amp, ofdm.num_symbols, ofdm.samples_per_symbol,
                ofdm.sampling_rate, mimo.num_rx, mimo.num_tx,
                cfg.channel.num_oscillators)
        )(ks)
        H = jax.vmap(lambda gg: frequency_response(gg, fm))(g)
        return jnp.mean(jnp.abs(H) ** 2)

    def estimate_only(ks):
        frames = simulate_batch(ks, p, cfg=cfg, table=table)
        h = estimate_batch(frames, cfg=cfg, estimator="mmse_full", table=table)
        # subtract sim cost mentally via sim_only row
        return jnp.mean(jnp.abs(h) ** 2)

    timeit("full pipeline", full, keys2d)
    timeit("simulate only", sim_only, keys2d)
    timeit("pilots only", pilots_only, keys2d)
    timeit("jakes only", jakes_only, keys2d)
    timeit("jakes+freqresp", freqresp_only, keys2d)
    timeit("sim+mmse_full (=full)", estimate_only, keys2d)


if __name__ == "__main__":
    main()

"""Finer-grained stage profiling: pilot sub-stages, Jakes variants, MMSE
sub-stages, batch-size sweep. Diagnostics only."""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from ce5g_tpu import ExperimentConfig, MIMOConfig
from ce5g_tpu.physics import PROFILE_INDEX, table_for

BATCH, ITERS = 256, 4

cfg = ExperimentConfig(mimo=MIMOConfig(num_tx=4, num_rx=4))
table = table_for(cfg)
ofdm, mimo = cfg.ofdm, cfg.mimo
S, K = ofdm.num_symbols, ofdm.num_used_subcarriers
TOTAL = S * K
P_MAX = int(TOTAL * cfg.pilots.max_density)
N_PIL = int(TOTAL * 0.1)


def keys_for(seed, iters=ITERS, batch=BATCH):
    return jax.random.split(jax.random.key(seed), iters * batch).reshape(iters, batch)


def timeit(name, fn, iters=ITERS, batch=BATCH):
    @jax.jit
    def many(keys2d):
        def body(c, ks):
            return c + fn(ks), None

        tot, _ = jax.lax.scan(body, jnp.float32(0.0), keys2d)
        return tot

    t0 = time.time()
    float(many(keys_for(0, iters, batch)))
    compile_s = time.time() - t0
    reps = 3
    t0 = time.time()
    for r in range(reps):
        float(many(keys_for(r + 1, iters, batch)))
    dt = (time.time() - t0) / reps / iters
    print(f"{name:34s} {dt*1e3:8.2f} ms/batch({batch})  ({batch/dt:9.0f} fr/s)  compile {compile_s:5.1f}s",
          file=sys.stderr, flush=True)


def main():
    # warm the process/tunnel with a trivial jit first
    t0 = time.time()
    float(jax.jit(lambda x: x * 2.0)(jnp.float32(3.0)))
    print(f"trivial first jit: {time.time()-t0:.1f}s", file=sys.stderr, flush=True)

    # --- pilot sub-stages
    def uniform_only(ks):
        u = jax.vmap(lambda k: jax.random.uniform(k, (TOTAL,)))(ks)
        return jnp.sum(u)

    def bisect_only(ks):
        def one(k):
            u = jax.random.uniform(k, (TOTAL,))

            def bis(_, lh):
                lo, hi = lh
                mid = 0.5 * (lo + hi)
                above = jnp.sum(u < mid) >= N_PIL
                return jnp.where(above, lo, mid), jnp.where(above, mid, hi)

            lo, hi = jax.lax.fori_loop(0, 25, bis, (jnp.float32(0.0), jnp.float32(1.0)))
            return jnp.sum(u < hi)

        return jnp.sum(jax.vmap(one)(ks).astype(jnp.float32))

    def bisect_cumsum(ks):
        def one(k):
            u = jax.random.uniform(k, (TOTAL,))

            def bis(_, lh):
                lo, hi = lh
                mid = 0.5 * (lo + hi)
                above = jnp.sum(u < mid) >= N_PIL
                return jnp.where(above, lo, mid), jnp.where(above, mid, hi)

            lo, hi = jax.lax.fori_loop(0, 25, bis, (jnp.float32(0.0), jnp.float32(1.0)))
            pre = u < hi
            rank = jnp.cumsum(pre) - 1
            sel = pre & (rank < N_PIL)
            return jnp.sum(sel.astype(jnp.float32))

        return jnp.sum(jax.vmap(one)(ks))

    def bisect_vectorized(ks):
        # batched bisection: ALL frames share the fori_loop; reductions are
        # one (B, TOTAL) row-sum per round instead of per-frame loops.
        u = jax.vmap(lambda k: jax.random.uniform(k, (TOTAL,)))(ks)  # (B, total)

        def bis(_, lh):
            lo, hi = lh
            mid = 0.5 * (lo + hi)
            cnt = jnp.sum(u < mid[:, None], axis=1)
            above = cnt >= N_PIL
            return jnp.where(above, lo, mid), jnp.where(above, mid, hi)

        b = u.shape[0]
        lo, hi = jax.lax.fori_loop(
            0, 25, bis, (jnp.zeros(b, jnp.float32), jnp.ones(b, jnp.float32))
        )
        pre = u < hi[:, None]
        rank = jnp.cumsum(pre, axis=1) - 1
        sel = pre & (rank < N_PIL)
        return jnp.sum(sel.astype(jnp.float32))

    timeit("pilot: uniform only", uniform_only)
    timeit("pilot: +bisect25 (per-frame)", bisect_only)
    timeit("pilot: +bisect+cumsum", bisect_cumsum)
    timeit("pilot: batched bisect+cumsum", bisect_vectorized)

    # --- jakes variants
    import numpy as np
    amp = np.asarray(table.amp_overwrite)[PROFILE_INDEX["ETU"]]
    P = amp.shape[0]
    O = cfg.channel.num_oscillators
    dt_sym = ofdm.samples_per_symbol / ofdm.sampling_rate

    def jakes_direct(ks):
        def one(k):
            ka, kp = jax.random.split(k)
            shape = (P, mimo.num_rx, mimo.num_tx, O)
            ang = 2 * jnp.pi * jax.random.uniform(ka, shape)
            ph = 2 * jnp.pi * jax.random.uniform(kp, shape)
            omega = 2 * jnp.pi * 200.0 * jnp.cos(ang)
            t = jnp.arange(S, dtype=jnp.float32) * dt_sym
            arg = omega[..., None] * t + ph[..., None]
            h = jax.lax.complex(jnp.cos(arg), jnp.sin(arg)).sum(-2) / jnp.sqrt(2.0 * O)
            return jnp.sum(jnp.abs(h) ** 2)

        return jnp.sum(jax.vmap(one)(ks))

    def jakes_recurrence(ks):
        def one(k):
            ka, kp = jax.random.split(k)
            shape = (P, mimo.num_rx, mimo.num_tx, O)
            ang = 2 * jnp.pi * jax.random.uniform(ka, shape)
            ph = 2 * jnp.pi * jax.random.uniform(kp, shape)
            omega = 2 * jnp.pi * 200.0 * jnp.cos(ang)
            z0 = jax.lax.complex(jnp.cos(ph), jnp.sin(ph))
            step = omega * dt_sym
            w = jax.lax.complex(jnp.cos(step), jnp.sin(step))
            # powers w^s for s in [0, S) by binary decomposition (S<=16)
            w2 = w * w
            w4 = w2 * w2
            w8 = w4 * w4
            sbits = jnp.arange(S)
            def pw(base, bit):
                on = ((sbits >> bit) & 1).astype(jnp.float32)
                return jnp.where(on[..., :], 1.0, 0.0)  # placeholder
            # build (..., O, S) powers
            ws = jnp.stack([w, w2, w4, w8], axis=-1)  # (..., O, 4)
            bits = ((sbits[:, None] >> jnp.arange(4)[None, :]) & 1).astype(jnp.complex64)  # (S,4)
            # w^s = prod_b (w^{2^b})^{bit_b}: select via where
            terms = jnp.where(bits[None, None, None, None, :, :] == 1,
                              ws[..., None, :], jnp.ones((), jnp.complex64))  # (...,O,S,4)
            wpow = terms[..., 0] * terms[..., 1] * terms[..., 2] * terms[..., 3]
            h = (z0[..., None] * wpow).sum(-2) / jnp.sqrt(2.0 * O)
            return jnp.sum(jnp.abs(h) ** 2)

        return jnp.sum(jax.vmap(one)(ks))

    timeit("jakes: direct trig", jakes_direct)
    timeit("jakes: recurrence (binary pow)", jakes_recurrence)

    # --- mmse sub-stages
    from ce5g_tpu.estimators.mmse import bessel_j0

    fm = np.asarray(table.freq_response)[PROFILE_INDEX["ETU"]]  # (P, K)

    def mmse_ed(ks):
        def one(k):
            g = jax.random.normal(k, (mimo.num_rx, S, K))  # stand-in grid
            gc = g.astype(jnp.complex64)
            m = (jax.random.uniform(k, (S, K)) < 0.1).astype(jnp.float32)
            e = jnp.einsum("rsk,pk->rsp", gc * m, jnp.conj(fm),
                           precision=jax.lax.Precision.HIGHEST)
            a = jnp.conj(fm)[:, None, :] * fm[None, :, :]
            d = jnp.einsum("sk,pqk->spq", m, a, precision=jax.lax.Precision.HIGHEST)
            return jnp.sum(jnp.abs(e)) + jnp.sum(jnp.abs(d))

        return jnp.sum(jax.vmap(one)(ks))

    def mmse_chol(ks):
        r_dim = 72

        def one(k):
            x = jax.random.normal(k, (r_dim, r_dim))
            g = x @ x.T + r_dim * jnp.eye(r_dim)
            gc = g.astype(jnp.complex64)
            rhs = jax.random.normal(k, (r_dim, 4)).astype(jnp.complex64)
            ch = jnp.linalg.cholesky(gc)
            y = jax.lax.linalg.triangular_solve(ch, rhs, left_side=True, lower=True)
            z = jax.lax.linalg.triangular_solve(
                ch, y, left_side=True, lower=True, conjugate_a=True, transpose_a=True
            )
            return jnp.sum(jnp.abs(z))

        return jnp.sum(jax.vmap(one)(ks))

    timeit("mmse: e+d grid matmuls", mmse_ed)
    timeit("mmse: chol72+2xtrisolve", mmse_chol)

    # --- full pipeline batch sweep
    from ce5g_tpu.estimators.api import estimate_batch
    from ce5g_tpu.physics import FrameParams, simulate_batch

    def full_for(batch):
        p = FrameParams(
            jnp.full((batch,), PROFILE_INDEX["ETU"], jnp.int32),
            jnp.full((batch,), 200.0, jnp.float32),
            jnp.full((batch,), 10.0, jnp.float32),
            jnp.full((batch,), 0.1, jnp.float32),
        )

        def full(ks):
            frames = simulate_batch(ks, p, cfg=cfg, table=table)
            h = estimate_batch(frames, cfg=cfg, estimator="mmse_full", table=table)
            return jnp.mean(jnp.abs(frames.channel - h) ** 2)

        return full

    timeit("full @512", full_for(512), iters=2, batch=512)
    timeit("full @1024", full_for(1024), iters=2, batch=1024)


if __name__ == "__main__":
    main()

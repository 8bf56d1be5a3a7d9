"""Experiment: batched small-HPD-solve variants + freqresp variants on TPU."""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

BATCH, ITERS = 256, 16
_HI = jax.lax.Precision.HIGHEST


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
    c_s = time.time() - t0
    reps = 3
    t0 = time.time()
    for r in range(reps):
        float(many(keys_for(r + 1, iters, batch)))
    dt = (time.time() - t0) / reps / iters
    print(f"{name:38s} {dt*1e3:8.2f} ms/batch({batch})  compile {c_s:5.1f}s",
          file=sys.stderr, flush=True)


def make_problem(k, r_dim):
    kx, kb = jax.random.split(k)
    x = jax.random.normal(kx, (r_dim, r_dim), jnp.float32) \
        + 1j * jax.random.normal(kb, (r_dim, r_dim), jnp.float32)
    g = jnp.matmul(x.conj().T, x, precision=_HI) + r_dim * jnp.eye(r_dim, dtype=jnp.complex64)
    rhs = jax.random.normal(kx, (r_dim, 4)).astype(jnp.complex64)
    return g.astype(jnp.complex64), rhs


def chol_solve(r_dim):
    def one(k):
        g, rhs = make_problem(k, r_dim)
        ch = jnp.linalg.cholesky(g)
        y = jax.lax.linalg.triangular_solve(ch, rhs, left_side=True, lower=True)
        z = jax.lax.linalg.triangular_solve(
            ch, y, left_side=True, lower=True, conjugate_a=True, transpose_a=True)
        return jnp.sum(jnp.abs(z))

    return lambda ks: jnp.sum(jax.vmap(one)(ks))


def lu_solve(r_dim):
    def one(k):
        g, rhs = make_problem(k, r_dim)
        return jnp.sum(jnp.abs(jnp.linalg.solve(g, rhs)))

    return lambda ks: jnp.sum(jax.vmap(one)(ks))


def real_chol_solve(r_dim):
    # complex HPD solve as real SPD of size 2r: [[Ar,-Ai],[Ai,Ar]]
    def one(k):
        g, rhs = make_problem(k, r_dim)
        ar, ai = jnp.real(g), jnp.imag(g)
        big = jnp.block([[ar, -ai], [ai, ar]])
        rr = jnp.concatenate([jnp.real(rhs), jnp.imag(rhs)], axis=0)
        ch = jnp.linalg.cholesky(big)
        y = jax.lax.linalg.triangular_solve(ch, rr, left_side=True, lower=True)
        z = jax.lax.linalg.triangular_solve(
            ch, y, left_side=True, lower=True, transpose_a=True)
        return jnp.sum(jnp.abs(z))

    return lambda ks: jnp.sum(jax.vmap(one)(ks))


def rich_solve(r_dim, iters_inner=10):
    # diagonal-preconditioned Richardson/Jacobi-CG hybrid: CG with diag precond
    def one(k):
        g, rhs = make_problem(k, r_dim)
        dinv = 1.0 / jnp.real(jnp.diagonal(g))

        def mv(x):
            return jnp.matmul(g, x, precision=_HI)

        x = dinv[:, None] * rhs
        r = rhs - mv(x)
        p = dinv[:, None] * r
        rz = jnp.sum(jnp.conj(r) * p, axis=0)

        def body(_, st):
            x, r, p, rz = st
            ap = mv(p)
            alpha = rz / jnp.sum(jnp.conj(p) * ap, axis=0)
            x = x + alpha * p
            r = r - alpha * ap
            z = dinv[:, None] * r
            rz2 = jnp.sum(jnp.conj(r) * z, axis=0)
            beta = rz2 / rz
            p = z + beta * p
            return x, r, p, rz2

        x, r, p, rz = jax.lax.fori_loop(0, iters_inner, body, (x, r, p, rz))
        return jnp.sum(jnp.abs(x))

    return lambda ks: jnp.sum(jax.vmap(one)(ks))


def main():
    t0 = time.time()
    float(jax.jit(lambda x: x * 2.0)(jnp.float32(3.0)))
    print(f"warmup jit: {time.time()-t0:.1f}s", file=sys.stderr, flush=True)

    def null(ks):
        return jnp.sum(jax.vmap(lambda k: jax.random.uniform(k, (8,)))(ks))

    timeit("null (floor)", null)
    timeit("chol complex r=72", chol_solve(72))
    timeit("chol complex r=45", chol_solve(45))
    timeit("lu complex r=72", lu_solve(72))
    timeit("chol real 2r=144", real_chol_solve(72))
    timeit("pcg10 complex r=72", rich_solve(72))

    # freqresp variants
    S, K, R, T, P = 14, 599, 4, 4, 9
    fm = (np.random.randn(P, K) + 1j * np.random.randn(P, K)).astype(np.complex64)

    def fr_einsum(ks):
        def one(k):
            g = (jax.random.normal(k, (S, R, T, P)) +
                 1j * jax.random.normal(k, (S, R, T, P))).astype(jnp.complex64)
            H = jnp.einsum("srtp,pk->srtk", g, fm, precision=_HI)
            return jnp.sum(jnp.abs(H))

        return jnp.sum(jax.vmap(one)(ks))

    def fr_planar(ks):
        fr_, fi_ = np.real(fm).astype(np.float32), np.imag(fm).astype(np.float32)

        def one(k):
            kr, ki = jax.random.split(k)
            gr = jax.random.normal(kr, (S, R, T, P), jnp.float32)
            gi = jax.random.normal(ki, (S, R, T, P), jnp.float32)
            hr = jnp.einsum("srtp,pk->srtk", gr, fr_, precision=_HI) \
                - jnp.einsum("srtp,pk->srtk", gi, fi_, precision=_HI)
            hi = jnp.einsum("srtp,pk->srtk", gr, fi_, precision=_HI) \
                + jnp.einsum("srtp,pk->srtk", gi, fr_, precision=_HI)
            return jnp.sum(jnp.abs(hr) + jnp.abs(hi))

        return jnp.sum(jax.vmap(one)(ks))

    timeit("freqresp complex einsum", fr_einsum)
    timeit("freqresp planar 4-matmul", fr_planar)


if __name__ == "__main__":
    main()

"""Fused batched HPD solve kernel (ops/hpd_solve_pallas.py) tests.

Interpret mode exercises the exact kernel logic on CPU against the XLA
Cholesky reference; integration tests check the custom_vmap dispatch and
that mmse_full is unchanged by the solver swap.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ce5g_tpu.ops.hpd_solve_pallas import MAX_N, _xla_solve, hpd_solve


def _problem(key, b, n, r, cond=100.0):
    k1, k2 = jax.random.split(key)
    x = jax.random.normal(k1, (b, n, n)) + 1j * jax.random.normal(k1, (b, n, n))
    x = x.astype(jnp.complex64)
    gram = jnp.einsum("bij,bkj->bik", x, jnp.conj(x)) + (
        n / cond
    ) * jnp.eye(n, dtype=jnp.complex64)
    rhs = (jax.random.normal(k2, (b, n, r)) + 1j * jax.random.normal(k2, (b, n, r))).astype(jnp.complex64)
    return gram, rhs


@pytest.mark.parametrize("b,n,r", [(128, 45, 4), (128, 16, 2), (256, 33, 8)])
def test_kernel_matches_xla(b, n, r):
    gram, rhs = _problem(jax.random.key(0), b, n, r)
    x_ref = _xla_solve(gram, rhs)
    x_ker = hpd_solve(gram, rhs, force="interpret")
    resid = jnp.linalg.norm(x_ker - x_ref) / jnp.linalg.norm(x_ref)
    assert float(resid) < 1e-4


def test_kernel_pads_partial_batch():
    gram, rhs = _problem(jax.random.key(1), 37, 12, 3)
    x_ref = _xla_solve(gram, rhs)
    x_ker = hpd_solve(gram, rhs, force="interpret")
    assert x_ker.shape == x_ref.shape
    resid = jnp.linalg.norm(x_ker - x_ref) / jnp.linalg.norm(x_ref)
    assert float(resid) < 1e-4


def test_solution_residual():
    # batch 16 (was 128): interpret-mode pallas is python-slow and the
    # residual bound is per-system, not statistical
    gram, rhs = _problem(jax.random.key(2), 16, 24, 4, cond=1e4)
    x = hpd_solve(gram, rhs, force="interpret")
    resid = jnp.linalg.norm(jnp.einsum("bij,bjk->bik", gram, x) - rhs) / jnp.linalg.norm(rhs)
    assert float(resid) < 1e-3


def test_auto_backend_off_tpu_is_xla():
    # on CPU the auto path must not attempt the TPU kernel
    gram, rhs = _problem(jax.random.key(3), 8, 10, 2)
    x = hpd_solve(gram, rhs)  # force=None
    x_ref = _xla_solve(gram, rhs)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x_ref), rtol=1e-4, atol=1e-5)


def test_custom_vmap_dispatch():
    from ce5g_tpu.estimators.mmse import _solve_hpd

    gram, rhs = _problem(jax.random.key(4), 16, 20, 3)
    x_vmapped = jax.vmap(_solve_hpd)(gram, rhs)
    x_ref = _xla_solve(gram, rhs)
    resid = jnp.linalg.norm(x_vmapped - x_ref) / jnp.linalg.norm(x_ref)
    assert float(resid) < 1e-4

    # unbatched single-system call
    x1 = _solve_hpd(gram[0], rhs[0])
    np.testing.assert_allclose(np.asarray(x1), np.asarray(x_ref[0]), rtol=1e-3, atol=1e-4)


def test_max_n_guard():
    assert MAX_N >= 45  # must cover the default-config Woodbury rank

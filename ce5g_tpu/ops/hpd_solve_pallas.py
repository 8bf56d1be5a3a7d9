"""Pallas TPU kernel: fused batched Hermitian-positive-definite solve.

Solves A_b · X_b = B_b for a large batch of SMALL complex HPD systems
(the mmse_full Woodbury gram, n = n_paths·time_rank ≈ 45, rhs width
R = num_rx ≤ 8; see estimators/mmse.py).

Why a kernel: XLA lowers the batched solve to a Cholesky custom-call plus
two TriangularSolve custom-calls, each an n-step loop whose every step
round-trips the whole (B, n, n) workspace through HBM — measured 1.7 ms
at batch 256 / n 45 on TPU v5e, 18% of the entire simulate+MMSE pipeline.
This kernel keeps everything in VMEM and fuses factorization + both
substitutions into one pass:

  * layout: the BATCH is the lane axis — operands arrive as (n, n, 128)
    f32 planes per grid step, so every scalar op of the factorization is
    a 128-wide vector op;
  * left-looking Cholesky: column j needs only already-computed L columns
    and row j of the READ-ONLY input A (Hermitian ⇒ column = conj(row)),
    so A is never mutated — no scratch copy, VMEM fits n ≤ 64;
  * L is stored transposed (column j in row j of the scratch) so the
    sequential loops only ever index the leading (untiled) axis
    dynamically; the one sublane-axis extraction (backward substitution)
    uses a one-hot contraction instead of a misaligned dynamic slice;
  * forward + backward substitution run in the output refs.

Complex arithmetic is planar (re/im f32 pairs) throughout — matches the
f32 precision of the XLA path it replaces (the Woodbury cancellation
sensitivity lives outside the solve, estimators/mmse.py:46-48).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128
#: largest n the kernel accepts: VMEM ≈ 2·(A planes) + 2·(L planes) at
#: (n, n, 128) f32 each = 16·n²·128 bytes ⇒ n=64 → 8.4 MB, safe margin.
MAX_N = 64


def _kernel(ar_ref, ai_ref, br_ref, bi_ref, xr_ref, xi_ref, lr_ref, li_ref,
            *, n: int, r: int):
    i_col = jax.lax.broadcasted_iota(jnp.int32, (n, _LANE), 0)  # row index i

    # L scratch must start zeroed: the left-looking update reads all rows.
    lr_ref[:] = jnp.zeros((n, n, _LANE), jnp.float32)
    li_ref[:] = jnp.zeros((n, n, _LANE), jnp.float32)

    def factor_step(j, _):
        oh = (i_col == j).astype(jnp.float32)  # (n, L) one-hot at row j
        ge = (i_col >= j).astype(jnp.float32)

        # column j of A from its Hermitian row j: A[i,j] = conj(A[j,i])
        a_r = ar_ref[j]  # (n, L) over i
        a_i = -ai_ref[j]

        # w_k = conj(L[j,k]) — entry i=j of every stored column (sublane
        # axis) via one-hot contraction; rows k >= j of L are still zero.
        lr = lr_ref[:]  # (n, n, L): [k, i, lane]
        li = li_ref[:]
        wr = jnp.sum(lr * oh[None, :, :], axis=1)  # (n, L) over k: L[j,k].re
        wi = -jnp.sum(li * oh[None, :, :], axis=1)  # conj

        # s_i = Σ_k L[i,k]·conj(L[j,k])  (contract stored columns over k)
        s_r = jnp.sum(lr * wr[:, None, :] - li * wi[:, None, :], axis=0)
        s_i = jnp.sum(lr * wi[:, None, :] + li * wr[:, None, :], axis=0)

        c_r = a_r - s_r
        c_i = a_i - s_i
        d = jnp.sum(c_r * oh, axis=0)  # (L,) real pivot
        # Non-PD pivot → NaN, matching the XLA cholesky failure signaling
        # (a clamped rsqrt would silently produce finite garbage instead).
        inv = jnp.where(d > 0.0, jax.lax.rsqrt(jnp.maximum(d, 1e-30)), jnp.nan)
        l_r = c_r * inv[None, :] * ge
        l_i = c_i * inv[None, :] * ge * (1.0 - oh)  # exact-real diagonal
        lr_ref[j] = l_r
        li_ref[j] = l_i
        return 0

    jax.lax.fori_loop(0, n, factor_step, 0, unroll=False)

    # forward substitution: L y = b, in the output refs
    xr_ref[:] = br_ref[:]
    xi_ref[:] = bi_ref[:]

    def fwd_step(j, _):
        oh = (i_col == j).astype(jnp.float32)
        l_r = lr_ref[j]  # column j of L, (n, L)
        l_i = li_ref[j]
        ljj = jnp.sum(l_r * oh, axis=0)  # (L,)
        inv = 1.0 / ljj
        y_r = xr_ref[:]  # (n, R, L)
        y_i = xi_ref[:]
        yj_r = jnp.sum(y_r * oh[:, None, :], axis=0) * inv[None, :]  # (R, L)
        yj_i = jnp.sum(y_i * oh[:, None, :], axis=0) * inv[None, :]
        # y ← y − l⊗yj + onehot⊗yj  (row j lands exactly at yj)
        sub_r = l_r[:, None, :] * yj_r[None] - l_i[:, None, :] * yj_i[None]
        sub_i = l_r[:, None, :] * yj_i[None] + l_i[:, None, :] * yj_r[None]
        xr_ref[:] = y_r - sub_r + oh[:, None, :] * yj_r[None]
        xi_ref[:] = y_i - sub_i + oh[:, None, :] * yj_i[None]
        return 0

    jax.lax.fori_loop(0, n, fwd_step, 0, unroll=False)

    # backward substitution: Lᴴ x = y; Lᴴ column j over i (< j) is
    # conj(L[j, i]) = conj(L_store[i, j]) — a sublane one-hot contraction.
    def bwd_step(idx, _):
        j = n - 1 - idx
        oh = (i_col == j).astype(jnp.float32)
        lr = lr_ref[:]
        li = li_ref[:]
        v_r = jnp.sum(lr * oh[None, :, :], axis=1)  # (n, L): L[j, i] over i...
        v_i = -jnp.sum(li * oh[None, :, :], axis=1)
        # NOTE: v here is conj(L[j,·]) indexed by the STORED layout:
        # L_store[k, i] = L[i, k] ⇒ Σ_i L_store[k, i]·oh_j[i] = L[j, k],
        # so v_k = conj(L[j, k]) for k ≤ j and 0 above — exactly the Lᴴ
        # column j (v_j = L[j,j], real).
        ljj = jnp.sum(v_r * oh, axis=0)
        inv = 1.0 / ljj
        x_r = xr_ref[:]
        x_i = xi_ref[:]
        xj_r = jnp.sum(x_r * oh[:, None, :], axis=0) * inv[None, :]
        xj_i = jnp.sum(x_i * oh[:, None, :], axis=0) * inv[None, :]
        sub_r = v_r[:, None, :] * xj_r[None] - v_i[:, None, :] * xj_i[None]
        sub_i = v_r[:, None, :] * xj_i[None] + v_i[:, None, :] * xj_r[None]
        xr_ref[:] = x_r - sub_r + oh[:, None, :] * xj_r[None]
        xi_ref[:] = x_i - sub_i + oh[:, None, :] * xj_i[None]
        return 0

    jax.lax.fori_loop(0, n, bwd_step, 0, unroll=False)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _hpd_solve_pallas(ar, ai, br, bi, interpret=False):
    """planes (n, n, B), (n, R, B) f32, B a multiple of 128 → (n, R, B) ×2."""
    n, _, b = ar.shape
    r = br.shape[1]
    grid = (b // _LANE,)
    spec_a = pl.BlockSpec((n, n, _LANE), lambda i: (0, 0, i))
    spec_b = pl.BlockSpec((n, r, _LANE), lambda i: (0, 0, i))
    out_shape = [jax.ShapeDtypeStruct((n, r, b), jnp.float32)] * 2
    kernel = functools.partial(_kernel, n=n, r=r)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[spec_a, spec_a, spec_b, spec_b],
        out_specs=[spec_b, spec_b],
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((n, n, _LANE), jnp.float32),
            pltpu.VMEM((n, n, _LANE), jnp.float32),
        ],
        interpret=interpret,
    )(ar, ai, br, bi)


def _xla_solve(gram, rhs):
    """Reference path: Cholesky + two triangular solves (complex64)."""
    chol = jnp.linalg.cholesky(gram)
    y = jax.lax.linalg.triangular_solve(chol, rhs, left_side=True, lower=True)
    return jax.lax.linalg.triangular_solve(
        chol, y, left_side=True, lower=True, conjugate_a=True, transpose_a=True
    )


def hpd_solve(gram, rhs, *, force: "str | None" = None):
    """Batched complex HPD solve: X = A⁻¹B.

    Args:
        gram: (B, n, n) complex64 Hermitian positive-definite.
        rhs: (B, n, R) complex64.
        force: None (auto: Pallas on TPU for n ≤ MAX_N, XLA otherwise),
            'pallas' | 'interpret' | 'xla' for tests.

    Returns:
        (B, n, R) complex64.
    """
    b, n, _ = gram.shape
    backend = force
    if backend is None:
        on_tpu = jax.default_backend() == "tpu"
        backend = "pallas" if (on_tpu and n <= MAX_N) else "xla"
    if backend == "xla":
        return _xla_solve(gram, rhs)

    pad = (-b) % _LANE
    if pad:
        eye = jnp.broadcast_to(jnp.eye(n, dtype=gram.dtype), (pad, n, n))
        gram = jnp.concatenate([gram, eye], axis=0)
        rhs = jnp.concatenate(
            [rhs, jnp.zeros((pad,) + rhs.shape[1:], rhs.dtype)], axis=0
        )
    ar = jnp.real(gram).astype(jnp.float32).transpose(1, 2, 0)
    ai = jnp.imag(gram).astype(jnp.float32).transpose(1, 2, 0)
    br = jnp.real(rhs).astype(jnp.float32).transpose(1, 2, 0)
    bi = jnp.imag(rhs).astype(jnp.float32).transpose(1, 2, 0)
    xr, xi = _hpd_solve_pallas(ar, ai, br, bi, interpret=(backend == "interpret"))
    x = jax.lax.complex(xr, xi).transpose(2, 0, 1)
    return x[:b].astype(jnp.complex64)

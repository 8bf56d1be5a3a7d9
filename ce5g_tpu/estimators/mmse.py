"""MMSE channel estimation, batched — two modes.

1. ``mmse_diag`` — behavioral parity with the reference
   (src/baseline_estimators.py:155-196): with ``estimate_statistics=True``
   the reference builds R_h = I·mean|h_ls|² and computes
   R_h(R_h+σ²I)⁻¹ h_ls via a dense num_pilots×num_pilots inverse (an
   ≈839×839 ``np.linalg.inv`` — the 588 ms/frame cost in BASELINE.md).
   With a scaled-identity covariance that matrix product is *exactly* the
   scalar Wiener shrinkage p/(p+σ²)·h_ls, so we compute the scalar — same
   output, O(P) instead of O(P³) — then interpolate like LS.

2. ``mmse_full`` — the "done-right" per-subcarrier Wiener filter with true
   channel-correlation priors (north-star requirement; the reference's
   ``estimate_covariance`` path is dead code, baseline_estimators.py:137-153).
   The prior follows from the simulator's exact second-order statistics:

       E[H(s1,k1) H*(s2,k2)] = R_t[s1,s2] · R_f[k1,k2]
       R_t[Δs] = J0(2π·fd·Δs·T_sym)      (Jakes temporal correlation)
       R_f[k1,k2] = Σ_p w_p F[p,k1]F*[p,k2],  w_p = ½·amp_p²  (PDP)

   TPU-first key idea: R_f has rank ≤ 9 (paths) and R_t = UΛUᵀ has rank
   ≤ 14 (symbols), so the pilot covariance is a rank-r ≤ 126 Gram matrix
   Φ Φᴴ with Φ[i,(p,m)] = √(w_p λ_m)·F[p,k_i]·U[s_i,m]. The Wiener solve
   (T·R_pp + σ²I)⁻¹ h then collapses via the Woodbury identity to an
   r×r solve plus thin matmuls — O(P·r² + r³) ≈ 15 MFLOP instead of the
   reference's O(P³) ≈ 2 GFLOP — and the grid reconstruction is three
   small matmuls (S×S)(S×9)(9×K). Exact, no approximation.

   The T· factor: every call-site transmits the same grid on all T TX
   antennas (SURVEY §2.2), so the observed pilot "channel" is the
   superposition Σ_t H_t with covariance T·R; the cross-covariance of a
   single antenna's channel with the observation is R. ``mmse_full``
   estimates the per-antenna channel optimally under that superposition.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from .interpolate import interpolate
from .ls import ls_at_pilots

_EPS = 1e-12
# The Woodbury solve relies on exact cancellation (h - Phi sol)/sigma^2;
# TPU bf16 matmuls destroy it (observed +5 dB NMSE) - pin f32 precision.
_HI = jax.lax.Precision.HIGHEST


@jax.custom_batching.custom_vmap
def _solve_hpd(gram, rhs):
    """X = gram⁻¹·rhs for one (r, r) HPD system, (r, R) rhs.

    Unbatched: plain XLA Cholesky + triangular solves. Under vmap (the
    estimate_batch path) the custom batching rule dispatches the whole
    batch to the fused Pallas kernel (ops/hpd_solve_pallas.py) — XLA's
    batched Cholesky/TriangularSolve custom-calls round-trip HBM every
    panel step and measured 1.7 ms of the 9.7 ms pipeline at batch 256."""
    from ..ops.hpd_solve_pallas import _xla_solve

    return _xla_solve(gram[None], rhs[None])[0]


@_solve_hpd.def_vmap
def _solve_hpd_vmap(axis_size, in_batched, gram, rhs):
    from ..ops.hpd_solve_pallas import hpd_solve

    if not in_batched[0]:
        gram = jnp.broadcast_to(gram, (axis_size,) + gram.shape)
    if not in_batched[1]:
        rhs = jnp.broadcast_to(rhs, (axis_size,) + rhs.shape)
    return hpd_solve(gram, rhs), True


def bessel_j0(x):
    """J0 via the Abramowitz & Stegun 9.4.1 / 9.4.3 rational approximations
    (|err| < 1e-7); branch-free with jnp.where, valid for all real x."""
    x = jnp.abs(jnp.asarray(x, jnp.float32))
    # |x| <= 3
    t = (x / 3.0) ** 2
    small = (
        1.0
        + t * (-2.2499997 + t * (1.2656208 + t * (-0.3163866
        + t * (0.0444479 + t * (-0.0039444 + t * 0.0002100)))))
    )
    # |x| > 3
    xs = jnp.maximum(x, 3.0)
    u = 3.0 / xs
    f0 = (
        0.79788456
        + u * (-0.00000077 + u * (-0.00552740 + u * (-0.00009512
        + u * (0.00137237 + u * (-0.00072805 + u * 0.00014476)))))
    )
    th0 = (
        xs - 0.78539816
        + u * (-0.04166397 + u * (-0.00003954 + u * (0.00262573
        + u * (-0.00054125 + u * (-0.00029333 + u * 0.00013558)))))
    )
    large = f0 * jnp.cos(th0) / jnp.sqrt(xs)
    return jnp.where(x <= 3.0, small, large)


def mmse_diag_at_pilots(h_ls, valid, snr_db):
    """Scalar-Wiener shrinkage ≡ reference diagonal MMSE
    (baseline_estimators.py:177-194): p = mean|h_ls|², σ² = 1/SNR_lin,
    h = p/(p+σ²)·h_ls."""
    n = jnp.maximum(jnp.sum(valid), 1.0)
    p = jnp.sum(jnp.abs(h_ls) ** 2 * valid, axis=-1, keepdims=True) / n
    sigma2 = 10.0 ** (-jnp.asarray(snr_db, jnp.float32) / 10.0)
    return h_ls * (p / (p + sigma2))


def mmse_diag_estimate(
    rx_symbols,
    tx_grid,
    positions,
    valid,
    grid_shape: Tuple[int, int],
    num_tx: int,
    snr_db,
    method: str = "linear",
    pilot_mask=None,
):
    """Reference-parity MMSE: LS → scalar shrink → interpolate
    (baseline_estimators.py:232-270). Returns (S, R, T, K) complex64.

    With ``pilot_mask`` (and nearest/linear) the shrink runs in grid form
    and feeds the gather-free row-scan interpolation (see ls_estimate)."""
    rx_grids = jnp.moveaxis(rx_symbols, 1, 0)  # (R, S, K)
    if pilot_mask is not None and method in ("nearest", "linear"):
        from .interpolate import interpolate_grid

        m = jnp.asarray(pilot_mask, jnp.float32)
        g = m * (rx_grids / (tx_grid + _EPS))  # (R, S, K)
        n = jnp.maximum(jnp.sum(m), 1.0)
        p = jnp.sum(jnp.abs(g) ** 2, axis=(-2, -1), keepdims=True) / n
        sigma2 = 10.0 ** (-jnp.asarray(snr_db, jnp.float32) / 10.0)
        h_full = interpolate_grid(g * (p / (p + sigma2)), m, method)
    else:
        h_ls = ls_at_pilots(rx_grids, tx_grid, positions, valid)  # (R, P)
        h_mmse = mmse_diag_at_pilots(h_ls, valid, snr_db)
        h_full = interpolate(h_mmse, positions, valid, grid_shape, method)
    h_full = jnp.moveaxis(h_full, 1, 0)
    s, k = grid_shape
    return jnp.broadcast_to(
        h_full[:, :, None, :], (s, h_full.shape[1], num_tx, k)
    ).astype(jnp.complex64)


class WienerPrior(NamedTuple):
    """Per-frame second-order prior pieces."""

    phi: jax.Array  # (P, r) complex — low-rank pilot factor (weights folded in)
    u_scaled: jax.Array  # (S, r_t) real — U·√λ time eigenbasis
    f_mat: jax.Array  # (n_paths, K) complex — delay→bin matrix for profile
    w_path: jax.Array  # (n_paths,) path powers (½·amp²)


def build_wiener_prior(
    freq_matrix,
    amp,
    doppler_hz,
    symbol_duration: float,
    num_symbols: int,
    positions,
    valid,
) -> WienerPrior:
    """Assemble the rank-r pilot factor Φ and reconstruction pieces."""
    n_paths = amp.shape[-1]
    w_path = 0.5 * amp.astype(jnp.float32) ** 2  # Jakes E|h|²=½ (jakes.py)

    ds = jnp.arange(num_symbols, dtype=jnp.float32)
    rt = bessel_j0(2.0 * jnp.pi * doppler_hz * (ds[:, None] - ds[None, :]) * symbol_duration)
    lam, u = jnp.linalg.eigh(rt)  # ascending
    lam = jnp.maximum(lam, 0.0)
    u_scaled = u * jnp.sqrt(lam)[None, :]  # (S, S)

    sy, sc = positions[:, 0], positions[:, 1]
    f_pil = freq_matrix[:, sc]  # (n_paths, P)
    u_pil = u_scaled[sy]  # (P, S)
    # Φ[i, (p,m)] = √w_p·F[p,k_i] · (U√λ)[s_i,m]
    phi = (
        (jnp.sqrt(w_path)[:, None] * f_pil).T[:, :, None] * u_pil[:, None, :]
    )  # (P, n_paths, S)
    phi = phi.reshape(phi.shape[0], -1) * valid[:, None]
    return WienerPrior(phi, u_scaled, freq_matrix, w_path)


def wiener_solve(prior: WienerPrior, h_pilots, sigma2, obs_scale):
    """x = (obs_scale·ΦΦᴴ + σ²I)⁻¹ h via Woodbury; h: (..., P).

    The r×r system is Hermitian positive-definite (Gram + σ²I), so it is
    solved by Cholesky + two triangular solves — measured ~2× faster than
    the general LU `linalg.solve` on TPU for the batched 126×126 case."""
    phi = prior.phi * jnp.sqrt(obs_scale)
    r = phi.shape[1]
    gram = jnp.matmul(phi.conj().T, phi, precision=_HI) + sigma2 * jnp.eye(
        r, dtype=phi.dtype
    )
    ph = jnp.einsum("pr,...p->...r", phi.conj(), h_pilots, precision=_HI)
    lead = ph.shape[:-1]
    rhs = ph.reshape(-1, r).T  # (r, N) — all leading dims as one RHS block
    chol = jnp.linalg.cholesky(gram)
    y = jax.lax.linalg.triangular_solve(chol, rhs, left_side=True, lower=True)
    z = jax.lax.linalg.triangular_solve(
        chol, y, left_side=True, lower=True, conjugate_a=True, transpose_a=True
    )
    sol = z.T.reshape(*lead, r)
    return (h_pilots - jnp.einsum("pr,...r->...p", phi, sol, precision=_HI)) / sigma2


def wiener_reconstruct(prior: WienerPrior, x, positions, grid_shape):
    """Ĥ = R_grid,pilot · x as small matmuls (see module docstring).

    Scatter-free: instead of scattering x onto the (S, K) grid and
    contracting with F over K (a TPU-slow scatter + a K-wide read), the
    pilot-axis contraction Σ_i x_i·F*[p,k_i]·1[s_i=s] is one
    (..., n_paths, P) × (P, S) one-hot matmul — measured ~3× faster."""
    s, k = grid_shape
    sy, sc = positions[:, 0], positions[:, 1]
    f_pil = prior.f_mat[:, sc]  # (n_paths, P)
    xf = x[..., None, :] * jnp.conj(f_pil)  # (..., n_paths, P)
    onehot = (sy[:, None] == jnp.arange(s)[None, :]).astype(xf.dtype)  # (P, S)
    t1 = jnp.einsum("...zp,ps->...sz", xf, onehot, precision=_HI)  # (..., S, n_paths)
    rt_full = jnp.matmul(prior.u_scaled, prior.u_scaled.T, precision=_HI)  # R_t
    t2 = jnp.einsum("zs,...sp->...zp", rt_full.astype(t1.dtype), t1, precision=_HI)
    t2 = t2 * prior.w_path[None, :]
    return jnp.einsum("...zp,pk->...zk", t2, prior.f_mat, precision=_HI)


def _legendre_basis(s: int, m: int):
    """Static orthonormal degree-(m−1) Legendre basis over s symbols."""
    import numpy as np

    x = np.linspace(-1.0, 1.0, s)
    q, _ = np.linalg.qr(np.polynomial.legendre.legvander(x, m - 1))
    return jnp.asarray(q, jnp.float32)  # (s, m)


def mmse_full_estimate(
    rx_symbols,
    tx_grid,
    pilot_mask,
    grid_shape: Tuple[int, int],
    num_tx: int,
    snr_db,
    freq_matrix,
    amp,
    doppler_hz,
    symbol_duration: float,
    time_rank: "int | None" = None,
    f_table=None,
    profile_idx=None,
):
    """Full per-subcarrier Wiener MMSE with channel-correlation priors.

    GATHER-FREE formulation: every pilot-axis sum in the Woodbury path
    (Φᴴh, ΦᴴΦ, the reconstruction contraction) is a *masked grid sum*,
    because Φ's rows are separable: Φ[i,(p,m)] = √w_p·F[p,k_i]·V[s_i,m]
    with V = U√λ. Substituting and exchanging sums gives grid-level
    matmuls over dense (S, K) tensors:

        G[r,s,k]  = M[s,k]·Y[r,s,k]/X[s,k]            (masked LS grid)
        E[r,s,p]  = Σ_k G·F*[p,k]                     ((R,S,K)·(9,K) matmul)
        D[s,p,q]  = Σ_k M[s,k]·F*[p,k]F[q,k]          ((S,K)·(81,K) matmul)
        gram      = T·√(w_p w_q)·Σ_s V[s,m]V[s,n]·D[s,p,q]   (S=14 tiny)
        ph[r,pm]  = √T·√w_p·Σ_s V[s,m]·E[r,s,p]
        t1[r,s,p] = (E − √T·Σ_{q,n}√w_q·D[s,p,q]V[s,n]sol[r,q,n]) / σ²
        Ĥ[r,z,k]  = Σ_p w_p (Σ_s R_t[z,s] t1[r,s,p]) · F[p,k]

    This removes the (R, P) pilot gather and the (P, 126) Φ build — on
    TPU those dominated the estimate (gathers are VPU-serial; the dense
    form is three MXU matmuls) — measured ~3× faster end-to-end at batch
    256 with bit-identical math (the pilot sum IS the masked grid sum).

    Args mirror :func:`ls_estimate` (with ``pilot_mask`` (S, K) instead of
    positions/valid) plus the frame's prior inputs (``freq_matrix``/``amp``
    from the profile table row, Doppler, symbol duration). Returns
    (S, R, T, K) complex64, identical along T (the superposition
    observation cannot separate TX antennas — see module docstring).
    """
    s, k = grid_shape
    rx_grids = jnp.moveaxis(rx_symbols, 1, 0)  # (R, S, K)
    m = jnp.asarray(pilot_mask, jnp.float32)  # (S, K)
    g = m * (rx_grids / (tx_grid + _EPS))  # (R, S, K) masked LS grid

    n_paths = amp.shape[-1]
    w_path = 0.5 * amp.astype(jnp.float32) ** 2
    sw = jnp.sqrt(w_path)  # (n_paths,)
    t_scale = float(num_tx)

    # Time prior factor V with V·Vᵀ ≈ R_t = J0(2π fd Δs T_sym). The whole
    # estimate depends on V only through V·Vᵀ (pilot-space covariance and
    # reconstruction are both functions of R_t), so ANY factor works.
    # R_t is a smooth J0 kernel → essentially band-limited: projecting it
    # onto a STATIC orthonormal Legendre basis Q of rank m (`time_rank`)
    # is exact to float precision for fd·T_sym·S ≲ 0.5 (m=8 covers
    # fd ≤ 500 Hz at the default numerology with ≤1e-6 relative error)
    # while shrinking the Woodbury rank from n_paths·S to n_paths·m —
    # the batched Cholesky cost drops by (m/S)³. time_rank=None or ≥ S
    # falls back to the full-rank jittered Cholesky.
    ds = jnp.arange(s, dtype=jnp.float32)
    rt = bessel_j0(
        2.0 * jnp.pi * doppler_hz * (ds[:, None] - ds[None, :]) * symbol_duration
    )
    # Ridge scaled to the trace: R_t is nearly rank-2 at slow fading, so
    # its tail eigenvalues sit at f32 J0-approximation noise (~1e-6·tr)
    # and an absolute 1e-5 ridge is NOT safely PD on TPU f32.
    if time_rank is not None and time_rank < s:
        q = _legendre_basis(s, time_rank)  # (S, m) static
        # f32-exact projection: default (bf16) matmul precision leaves B
        # indefinite at the -1e-3 level on TPU and Cholesky NaNs.
        b = jnp.matmul(q.T, jnp.matmul(rt, q, precision=_HI), precision=_HI)
        ridge = 1e-4 * (jnp.trace(b) / time_rank) + 1e-6
        chol_b = jnp.linalg.cholesky(b + ridge * jnp.eye(time_rank))
        v = jnp.matmul(q, chol_b, precision=_HI)  # (S, m)
    else:
        ridge = 1e-4 * (jnp.trace(rt) / s) + 1e-6
        v = jnp.linalg.cholesky(rt + ridge * jnp.eye(s))  # (S, S)

    f = freq_matrix  # (n_paths, K) complex
    fc = jnp.conj(f)
    if f_table is not None and profile_idx is not None:
        # STATIC all-profiles tables: under vmap, per-frame F makes the
        # E/D contractions batched matmuls with tiny per-frame outputs
        # ((R·S)×P and S×P² — terrible MXU occupancy) plus per-frame
        # gathers/outer-product materializations. With the (numpy,
        # compile-time) tables both become ONE big real matmul against a
        # static RHS over all profiles, followed by a dense one-hot
        # profile select — measured ~0.7 ms faster at batch 256.
        import numpy as np

        ft = np.asarray(f_table)  # (C, P, K) complex — full profile table
        c_num, p_num, k_num = ft.shape
        frt = np.real(ft).transpose(2, 0, 1).reshape(k_num, c_num * p_num)
        fit = np.imag(ft).transpose(2, 0, 1).reshape(k_num, c_num * p_num)
        # e = Σ_k g·conj(F): Re = gr@fr + gi@fi ; Im = gi@fr − gr@fi
        w_e = np.concatenate(
            [
                np.concatenate([frt, -fit], axis=1),  # gr rows
                np.concatenate([fit, frt], axis=1),  # gi rows
            ],
            axis=0,
        ).astype(np.float32)  # (2K, 2·C·P)
        g2 = jnp.concatenate([jnp.real(g), jnp.imag(g)], axis=-1)  # (R,S,2K)
        e2 = jnp.matmul(g2, w_e, precision=_HI)  # (R, S, 2CP)
        e_re, e_im = jnp.split(e2, 2, axis=-1)
        onehot = (jnp.arange(c_num) == profile_idx).astype(jnp.float32)
        e_all = jax.lax.complex(e_re, e_im).reshape(
            g.shape[0], s, c_num, p_num
        )
        e = jnp.einsum("rscp,c->rsp", e_all, onehot.astype(e_all.dtype))

        # d = Σ_k m·A with A[c,p,q,k] = conj(F_c)[p,k]·F_c[q,k]
        a_re = np.einsum("cpk,cqk->kcpq", np.real(ft), np.real(ft)) + np.einsum(
            "cpk,cqk->kcpq", np.imag(ft), np.imag(ft)
        )
        a_im = np.einsum("cpk,cqk->kcpq", np.real(ft), np.imag(ft)) - np.einsum(
            "cpk,cqk->kcpq", np.imag(ft), np.real(ft)
        )
        w_d = np.concatenate(
            [a_re.reshape(k_num, -1), a_im.reshape(k_num, -1)], axis=1
        ).astype(np.float32)  # (K, 2·C·P·P)
        d2 = jnp.matmul(m, w_d, precision=_HI)  # (S, 2CPP)
        d_re, d_im = jnp.split(d2, 2, axis=-1)
        d_all = jax.lax.complex(d_re, d_im).reshape(s, c_num, p_num, p_num)
        d = jnp.einsum("scpq,c->spq", d_all, onehot.astype(d_all.dtype))
    else:
        e = jnp.einsum("rsk,pk->rsp", g, fc, precision=_HI)  # (R, S, n_paths)
        a = fc[:, None, :] * f[None, :, :]  # (n_paths, n_paths, K)
        # cast the real mask: the axon TPU compiler CHECK-crashes on
        # real×complex contractions (see estimators/blind.py note)
        d = jnp.einsum(
            "sk,pqk->spq", m.astype(jnp.complex64), a, precision=_HI
        )  # (S, n_paths, n_paths)

    # gram[(p,m),(q,n)] = T·√(w_p w_q)·Σ_s V[s,m]V[s,n]·D[s,p,q], computed
    # as ONE (S, M·N)ᵀ×(S, P·Q) matmul + reshape/transpose (compile-cheap).
    mt = v.shape[1]  # time rank (m ≤ S)
    vv = (v[:, :, None] * v[:, None, :]).reshape(s, mt * mt)  # (S, M·N)
    dpq = d.reshape(s, n_paths * n_paths)  # (S, P·Q)
    gmn_pq = jnp.matmul(vv.astype(d.dtype).T, dpq, precision=_HI)  # (MN, PQ)
    gram = gmn_pq.reshape(mt, mt, n_paths, n_paths).transpose(2, 0, 3, 1)
    gram = t_scale * gram * (sw[:, None, None, None] * sw[None, None, :, None])
    r_dim = n_paths * mt
    gram = gram.reshape(r_dim, r_dim)

    p_ch = jnp.sum(w_path)
    snr_lin = 10.0 ** (jnp.asarray(snr_db, jnp.float32) / 10.0)
    sigma2 = jnp.maximum(num_tx * p_ch / snr_lin, 1e-8).astype(jnp.float32)
    gram = gram + sigma2 * jnp.eye(r_dim, dtype=gram.dtype)

    sqrt_t = jnp.sqrt(t_scale)
    ph = sqrt_t * jnp.einsum(
        "sm,rsp->rpm", v.astype(e.dtype), e, precision=_HI
    ) * sw[None, :, None]  # (R, n_paths, S)

    rr = ph.shape[0]
    rhs = ph.reshape(rr, r_dim).T  # (r_dim, R)
    z = _solve_hpd(gram, rhs)
    sol = z.T.reshape(rr, n_paths, mt)  # (R, n_paths(q), m(n))

    solw = sol * sw[None, :, None]
    sol_sq = jnp.einsum(
        "sn,rqn->rsq", v.astype(d.dtype), solw, precision=_HI
    )  # (R, S, n_paths)
    corr = sqrt_t * jnp.einsum("spq,rsq->rsp", d, sol_sq, precision=_HI)
    t1 = (e - corr) / sigma2  # (R, S, n_paths)

    rt_full = jnp.matmul(v, v.T, precision=_HI)  # PSD-clamped R_t
    # emit (S, R, P) directly: transposing here costs ~500 elements/frame;
    # transposing h_full after the K-expansion would move the full
    # (S, R, K) grid (~69 MB/batch — measured as a real HBM transpose)
    t2 = jnp.einsum("zs,rsp->zrp", rt_full.astype(t1.dtype), t1, precision=_HI)
    t2 = t2 * w_path[None, None, :]
    from ..utils.complexify import packed_complex_matmul

    h_full = packed_complex_matmul(t2, f, precision=_HI)  # (S, R, K)

    return jnp.broadcast_to(
        h_full[:, :, None, :], (s, h_full.shape[1], num_tx, k)
    ).astype(jnp.complex64)


def estimate_covariance(h_ls):
    """Sample covariance of LS estimates (reference
    baseline_estimators.py:137-153 — dead code there, provided for API
    parity): flattens leading dims, returns (last_dim, last_dim)."""
    h = h_ls.reshape(-1, h_ls.shape[-1])
    hc = h - jnp.mean(h, axis=0, keepdims=True)
    n = jnp.maximum(h.shape[0] - 1, 1)
    return jnp.matmul(hc.T.conj(), hc, precision=_HI) / n

"""Blind prior estimation: SNR / Doppler / delay-profile from one frame.

Round-5 extension (no reference counterpart; the reference's estimators
receive the true SNR as an argument, src/baseline_estimators.py:155-196,
and its dataset generator records genie metadata). A deployed receiver has
none of that, so ``mmse_full`` run with oracle priors is a bound, not a
deployable estimator. This module closes the gap: it estimates all three
priors from the received frame itself, using only what a receiver knows —
the pilot positions/values and the 3GPP profile *candidate set* (EPA/EVA/
ETU are public standards, not side information).

Method — one joint ridge fit, all dense linear algebra (TPU-first):

  1. Masked LS grid g[r,s,k] = m·y/x (same first step as every estimator).
  2. Fit g's pilot values jointly in a delay ⊗ time dictionary:
         h(s,k) ≈ Σ_{d,m} c[d,m] · F_D[d,k] · Q[s,m]
     where F_D spans the UNION of the three profiles' quantized tap
     delays (D ≈ 15 atoms — resolvable with the 599-bin aperture) and Q
     is an orthonormal Legendre time basis of rank M (the J0 temporal
     kernel is band-limited; see estimators/api.py auto_time_rank). The
     normal equations are assembled gather-free from grid matmuls
     (the same masked-grid-sum identity as mmse_full) and solved as one
     batched (D·M)×(D·M) Hermitian system.
  3. Noise:   σ̂² = ‖residual‖² / (R·(n_pilots − tr(G⁻¹G₀)))   — the
     effective-dof-corrected fit residual. The dictionary contains every
     candidate tap and the time basis is accurate to ~1e-5, so channel
     leakage into the residual is negligible up to the config's SNR range.
  4. Profile & Doppler — JOINT smearing-aware template match. The ridge
     fit smears true coefficient power across correlated dictionary atoms:
     E[|c|²] = |G⁻¹G₀|²·p_true + σ²·diag(G⁻¹G₀G⁻¹). So the measured
     (noise-corrected) power vector p̂ is compared against SMEARED
     templates |G⁻¹G₀|²·(w_profile ⊗ λ(f_d)) over all (profile, f_d-grid)
     candidates, each with its optimal least-squares scale; argmin of the
     fit residual picks both priors at once. (A naive marginal match —
     tap powers vs profile PDP, Legendre-order powers vs diag(QᵀR_tQ) —
     was measured to overestimate 10 Hz Doppler as ~176 Hz at high SNR:
     the pilot pattern's uneven per-symbol sampling mixes time orders,
     and the smearing matrix is exactly that mixing.)
  6. SNR:     snr̂ = 10·log10(T·p_ch(profile)/σ̂²) — defined so that
     ``mmse_full``'s internal σ² mapping reproduces σ̂² exactly.

Everything is branch-free and vmaps over frames; the per-frame cost is
two (K × D²·M-ish) matmuls plus an ~(75×75) solve.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_EPS = 1e-12
_HI = jax.lax.Precision.HIGHEST


class BlindTables(NamedTuple):
    """Static (numpy, trace-time) tables for blind prior estimation."""

    f_dict: np.ndarray  # (D, K) complex64 — union-delay dictionary responses
    dict_delays: np.ndarray  # (D,) int32
    q_time: np.ndarray  # (S, M) float32 orthonormal Legendre basis
    w_profile: np.ndarray  # (C, D) float32 per-profile tap powers on slots
    p_ch: np.ndarray  # (C,) float32 nominal channel power per profile
    fd_grid: np.ndarray  # (NF,) float32 candidate Dopplers
    fd_lam: np.ndarray  # (NF, M) float32 diag(Qᵀ R_t(f_d) Q) per candidate


class PriorEstimate(NamedTuple):
    profile_idx: jax.Array  # () int32
    doppler_hz: jax.Array  # () float32
    snr_db: jax.Array  # () float32
    sigma2: jax.Array  # () float32 — estimated noise variance
    tap_power: jax.Array  # (D,) noise-corrected delay-tap powers (raw)
    order_power: jax.Array  # (M,) noise-corrected time-order powers
    profile_score: jax.Array  # (C,) fit score per profile (higher = better)
    w_tap: jax.Array  # (D,) per-frame Wiener prior tap powers (blended)


def _legendre(s: int, m: int) -> np.ndarray:
    x = np.linspace(-1.0, 1.0, s)
    q, _ = np.linalg.qr(np.polynomial.legendre.legvander(x, m - 1))
    return q.astype(np.float32)


def build_blind_tables(cfg, table, time_rank: int = 5, n_fd: int = 48) -> BlindTables:
    """Assemble the static dictionary/template tables for ``cfg``.

    ``table`` is the physics ProfileTable for the same numerology.
    """
    from ..estimators.api import _bessel_j0_np

    s = cfg.ofdm.num_symbols
    valid = table.path_valid > 0
    delays = np.unique(table.delay_samples[valid]).astype(np.int32)  # (D,)
    d = len(delays)

    # F_D[d, k] = exp(-2πj · bin_k · delay_d / N) over the used bins.
    phase = (
        -2.0 * np.pi * delays[:, None] * table.used_bins[None, :]
        / cfg.ofdm.fft_size
    )
    f_dict = np.exp(1j * phase).astype(np.complex64)

    amp = (
        table.amp_overwrite
        if cfg.channel.tap_collision == "overwrite"
        else table.amp_accumulate
    )
    w_path = 0.5 * amp.astype(np.float64) ** 2  # (C, P) — jakes E|h|² = ½amp²
    c_num = w_path.shape[0]
    w_profile = np.zeros((c_num, d), np.float32)
    for ci in range(c_num):
        for pi in range(w_path.shape[1]):
            if valid[ci, pi]:
                slot = int(np.searchsorted(delays, table.delay_samples[ci, pi]))
                w_profile[ci, slot] += w_path[ci, pi]
    p_ch = w_profile.sum(axis=1).astype(np.float32)

    q = _legendre(s, time_rank)

    fd_max = 1.5 * float(max(cfg.channel.doppler_hz))
    fd_grid = np.geomspace(2.0, max(fd_max, 10.0), n_fd).astype(np.float32)
    ds = np.arange(s, dtype=np.float64)
    lam = np.zeros((n_fd, time_rank), np.float32)
    for i, fd in enumerate(fd_grid):
        rt = _bessel_j0_np(
            2.0 * np.pi * fd * (ds[:, None] - ds[None, :]) * cfg.ofdm.symbol_duration
        )
        lam[i] = np.einsum("sm,st,tm->m", q, rt, q).astype(np.float32)
    return BlindTables(f_dict, delays, q, w_profile, p_ch, fd_grid, lam)


_TABLE_CACHE: dict = {}


def blind_tables_for(cfg, table) -> BlindTables:
    key = (id(table), cfg.channel.tap_collision, tuple(cfg.channel.doppler_hz))
    if key not in _TABLE_CACHE:
        _TABLE_CACHE[key] = build_blind_tables(cfg, table)
    return _TABLE_CACHE[key]


def _hpd_solve_xla(gram, rhs):
    """Batched complex HPD solve (r ≈ 75 exceeds the Pallas kernel's
    MAX_N=64; this runs once per frame, not in the per-sample hot path)."""
    chol = jnp.linalg.cholesky(gram)
    y = jax.lax.linalg.triangular_solve(chol, rhs, left_side=True, lower=True)
    return jax.lax.linalg.triangular_solve(
        chol, y, left_side=True, lower=True, conjugate_a=True, transpose_a=True
    )


def estimate_priors(
    rx_symbols: jax.Array,
    tx_grid: jax.Array,
    pilot_mask: jax.Array,
    tables: BlindTables,
    num_tx: int,
    ridge_rel: float = 1e-3,
) -> PriorEstimate:
    """Estimate (profile, Doppler, SNR) of ONE frame from its pilots.

    Args:
        rx_symbols: (S, R, K) complex received grid.
        tx_grid: (S, K) complex transmitted grid (common-grid convention).
        pilot_mask: (S, K) float.
        num_tx: TX count (the observed superposition has power T·p_ch).

    vmap over a leading batch axis for batched estimation.
    """
    f = jnp.asarray(tables.f_dict)  # (D, K)
    q = jnp.asarray(tables.q_time)  # (S, M)
    d_n, k_n = f.shape
    s_n, m_n = q.shape
    r_dim = d_n * m_n

    m = jnp.asarray(pilot_mask, jnp.float32)
    g = jnp.moveaxis(rx_symbols, 1, 0) / (tx_grid + _EPS) * m  # (R, S, K)

    fc = jnp.conj(f)
    # e[r,s,d] = Σ_k g·F*  ;  dmat[s,d,d'] = Σ_k m·F*[d]F[d']
    # NOTE: every mixed-dtype einsum operand is cast to complex64
    # explicitly — the axon TPU compiler hard-crashes (shape_util CHECK
    # "ElementIsComplex") on real×complex contractions.
    e = jnp.einsum("rsk,dk->rsd", g, fc, precision=_HI)
    a = fc[:, None, :] * f[None, :, :]  # (D, D, K)
    dmat = jnp.einsum(
        "sk,dek->sde", m.astype(jnp.complex64), a, precision=_HI
    )

    # G0[(d,m),(e,n)] = Σ_s q[s,m] q[s,n] dmat[s,d,e]  (Hermitian).
    # precision=HIGHEST is load-bearing: TPU bf16 matmul passes leave the
    # gram non-Hermitian at the 1e-3 level and the Cholesky NaNs.
    qc = q.astype(jnp.complex64)
    g0 = jnp.einsum("sm,sn,sde->dmen", qc, qc, dmat, precision=_HI)
    g0 = g0.reshape(r_dim, r_dim)
    b = jnp.einsum("sm,rsd->rdm", q.astype(e.dtype), e, precision=_HI)
    b = b.reshape(-1, r_dim)  # (R, r)

    tr_g0 = jnp.real(jnp.trace(g0))
    lam = ridge_rel * tr_g0 / r_dim + 1e-6
    gram = g0 + lam * jnp.eye(r_dim, dtype=g0.dtype)

    # one factorization, three solves: coefficients, G⁻¹G0 (dof), G⁻¹ (bias)
    eye = jnp.eye(r_dim, dtype=g0.dtype)
    rhs = jnp.concatenate([b.T, g0, eye], axis=1)
    sol = _hpd_solve_xla(gram, rhs)
    c = sol[:, : b.shape[0]].T  # (R, r)
    x_dof = sol[:, b.shape[0] : b.shape[0] + r_dim]  # G⁻¹G0
    g_inv = sol[:, b.shape[0] + r_dim :]

    # σ̂² from effective-dof-corrected residuals, pooled over rx antennas.
    total = jnp.sum(jnp.abs(g) ** 2)
    fit = 2.0 * jnp.sum(jnp.real(jnp.conj(c) * b)) - jnp.sum(
        jnp.real(jnp.conj(c) * jnp.einsum("ij,rj->ri", g0, c, precision=_HI))
    )
    resid = jnp.maximum(total - fit, 0.0)
    n_pilots = jnp.sum(m)
    tr_s = jnp.clip(jnp.real(jnp.trace(x_dof)), 0.0, n_pilots - 1.0)
    r_rx = g.shape[0]
    dof = jnp.maximum(r_rx * (n_pilots - tr_s), 1.0)
    sigma2 = jnp.maximum(resid / dof, 1e-9)

    # Noise bias of |c|²: diag of σ²·G⁻¹G0G⁻¹, per rx antenna.
    bias = sigma2 * jnp.real(jnp.sum(x_dof * g_inv.T, axis=1))  # (r,)
    power = jnp.sum(jnp.abs(c) ** 2, axis=0) - r_rx * bias
    power = jnp.maximum(power, 0.0)  # (r,) measured, noise-corrected

    # Joint smearing-aware (profile, Doppler) match: candidate true-power
    # vectors v = w_profile[c] ⊗ λ(f_d) pass through the measured smearing
    # |A|² (A = G⁻¹G0, the fit's resolution matrix), then each candidate
    # gets its optimal scale α = ⟨T,p̂⟩/⟨T,T⟩ and is scored by the
    # residual ‖p̂ − αT‖² — scale-invariant and pattern-aware.
    w_prof = jnp.asarray(tables.w_profile)  # (C, D)
    lam = jnp.asarray(tables.fd_lam)  # (NF, M)
    cand = (
        w_prof[:, None, :, None] * lam[None, :, None, :]
    ).reshape(-1, r_dim)  # (C·NF, r)
    a2 = jnp.abs(x_dof) ** 2  # (r, r) smearing of true power into measured
    templ = jnp.matmul(cand, a2.T, precision=_HI) * r_rx  # (C·NF, r)
    tp = jnp.matmul(templ, power, precision=_HI)
    tt = jnp.sum(templ * templ, axis=1)
    alpha = jnp.maximum(tp, 0.0) / jnp.maximum(tt, 1e-20)
    score_all = (
        jnp.sum(power * power) - 2.0 * alpha * tp + alpha**2 * tt
    )  # (C·NF,) ‖p̂ − αT‖²
    best = jnp.argmin(score_all)
    n_fd = lam.shape[0]
    profile_idx = (best // n_fd).astype(jnp.int32)
    doppler_hz = jnp.asarray(tables.fd_grid)[best % n_fd]
    score = -jnp.min(score_all.reshape(-1, n_fd), axis=1)  # (C,) per profile

    # Per-frame Wiener prior tap powers (the tail-risk fix): a HARD
    # profile pick zeroes every off-profile tap, so one misclassification
    # at high SNR caps that frame near −10 dB — the mean is then dominated
    # by the tail, not the average case. Instead the Wiener prior keeps
    # ALL union-dictionary taps alive with powers from
    #   (a) the classified template (ensemble PDP, α-scaled), blended with
    #   (b) the smearing-DECONVOLVED empirical powers (empirical Bayes:
    #       adapts to the realized fading, never zeroes a live tap),
    # plus a small floor. w_d is defined so E|h_d(per symbol)|² = w_d.
    delta = 1e-2 * jnp.trace(a2) / r_dim + 1e-8
    ata = jnp.matmul(a2.T, a2, precision=_HI) + delta * jnp.eye(
        r_dim, dtype=a2.dtype
    )
    v_emp = jnp.maximum(
        jnp.linalg.solve(
            ata,
            jnp.matmul(a2.T, power / jnp.maximum(r_rx, 1), precision=_HI),
        ),
        0.0,
    ).reshape(d_n, m_n)
    w_emp = jnp.sum(v_emp, axis=1) / s_n  # (D,)
    lam_best = lam[best % n_fd]  # (M,)
    w_cls = alpha[best] * w_prof[profile_idx] * (jnp.sum(lam_best) / s_n)
    # Per-tap reliability gate: trust the empirical power where it clears
    # the tap's own noise floor (high SNR / strong taps), fall back to the
    # classified ensemble template elsewhere. c=3 swept best on a 96-frame
    # validation mix (overall −14.4 dB vs −13.0 hard-classified and −13.7
    # pure-empirical; oracle-prior bound −17.5 on the same frames).
    bias_tap = jnp.sum(
        jnp.maximum(bias, 0.0).reshape(d_n, m_n), axis=1
    ) / s_n
    beta = w_emp**2 / (w_emp**2 + (3.0 * bias_tap) ** 2 + 1e-20)
    w_tap = beta * w_emp + (1.0 - beta) * w_cls
    w_tap = jnp.maximum(w_tap, 1e-3 * jnp.mean(w_tap))

    power = power.reshape(d_n, m_n)
    tap_power = jnp.sum(power, axis=1)  # (D,)
    order_power = jnp.sum(power, axis=0)  # (M,)

    p_ch = jnp.asarray(tables.p_ch)[profile_idx]
    snr_db = 10.0 * jnp.log10(jnp.maximum(num_tx * p_ch / sigma2, 1e-12))
    return PriorEstimate(
        profile_idx=profile_idx,
        doppler_hz=doppler_hz.astype(jnp.float32),
        snr_db=snr_db.astype(jnp.float32),
        sigma2=sigma2,
        tap_power=tap_power,
        order_power=order_power,
        profile_score=score,
        w_tap=w_tap,
    )

"""Frame-level estimation API: one call from a simulated Frame to Ĥ.

Ties physics.Frame outputs to the estimators with interpolation-weight
sharing (LS and diag-MMSE reuse one weight computation per frame). All
functions vmap cleanly over a leading batch axis.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from ..config import ExperimentConfig
from ..physics.profiles import ProfileTable
from ..physics.simulate import Frame, table_for
from .ls import ls_estimate
from .mmse import mmse_diag_estimate, mmse_full_estimate


def _bessel_j0_np(x):
    """NumPy port of :func:`..estimators.mmse.bessel_j0` (A&S 9.4.1/9.4.3
    rational approximations, |err| < 1e-7) for host-side rank sizing."""
    import numpy as np

    x = np.abs(np.asarray(x, np.float64))
    t = (x / 3.0) ** 2
    small = 1.0 + t * (-2.2499997 + t * (1.2656208 + t * (-0.3163866
        + t * (0.0444479 + t * (-0.0039444 + t * 0.0002100)))))
    xs = np.maximum(x, 3.0)
    u = 3.0 / xs
    f0 = (0.79788456 + u * (-0.00000077 + u * (-0.00552740 + u * (-0.00009512
        + u * (0.00137237 + u * (-0.00072805 + u * 0.00014476))))))
    th0 = (xs - 0.78539816 + u * (-0.04166397 + u * (-0.00003954
        + u * (0.00262573 + u * (-0.00054125 + u * (-0.00029333
        + u * 0.00013558))))))
    large = f0 * np.cos(th0) / np.sqrt(xs)
    return np.where(x <= 3.0, small, large)


def auto_time_rank(cfg: ExperimentConfig) -> Optional[int]:
    """Static Legendre-projection rank for the mmse_full time prior.

    The J0(2π·fd·τ) temporal kernel over a frame of duration S·T_sym is
    essentially band-limited to fd, so its Slepian dimension is
    ≈ 2·fd·S·T_sym plus a margin that has no clean closed form. The rank
    must be STATIC (Doppler is a traced per-frame value inside jit), but
    the worst-case fd — max of the configured Doppler list — is a Python
    float, so the required rank is found NUMERICALLY here: smallest m
    whose Legendre projection reconstructs the worst-case R_t within 1e-5
    relative Frobenius error (a one-off S×S host computation at trace
    time). At the default numerology this gives m=5 for fd ≤ 200 Hz and
    m=8 for fd ≤ 500 Hz — the Woodbury Cholesky cost scales (m/S)³, so
    sizing m exactly (instead of a safe formula margin) is a direct
    speedup of the mmse_full hot path.

    Returns None (full rank, always exact) when no m < S reaches the
    tolerance.
    """
    import numpy as np

    s = cfg.ofdm.num_symbols
    fd_max = max(cfg.channel.doppler_hz)
    # host-side J0 via the same A&S 9.4.1/9.4.3 rational approximations the
    # device path uses (estimators/mmse.py:bessel_j0); |err| < 1e-7 is
    # immaterial at the 1e-5 tolerance. No scipy runtime dependency.
    _j0 = _bessel_j0_np

    ds = np.arange(s, dtype=np.float64)
    tau = 2.0 * np.pi * fd_max * (ds[:, None] - ds[None, :]) * cfg.ofdm.symbol_duration
    rt = _j0(tau)
    x = np.linspace(-1.0, 1.0, s)
    norm = np.linalg.norm(rt)
    for m in range(2, s):
        q, _ = np.linalg.qr(np.polynomial.legendre.legvander(x, m - 1))
        rec = q @ (q.T @ rt @ q) @ q.T
        if np.linalg.norm(rec - rt) <= 1e-5 * norm:
            return m
    return None


def estimate_frame(
    frame: Frame,
    *,
    cfg: ExperimentConfig,
    estimator: str = "ls",
    method: str = "linear",
    table: Optional[ProfileTable] = None,
    time_rank: "int | None | str" = "auto",
) -> jax.Array:
    """Estimate the channel of one simulated frame.

    Args:
        estimator: 'ls' | 'mmse' (reference-parity diagonal) | 'mmse_full'
            (per-subcarrier Wiener with correlation priors) |
            'mmse_full_est' (same Wiener, but every prior — SNR, Doppler,
            delay profile — is estimated blindly from the frame's pilots;
            frame.params is never read — see estimators/blind.py).
        method: interpolation for 'ls'/'mmse' ('nearest'|'linear'|'cubic').
        time_rank: mmse_full time-prior rank — "auto" (sized from the max
            configured Doppler via :func:`auto_time_rank`), an int, or
            None for exact full rank.

    Returns:
        (S, R, T, K) complex64 channel estimate.
    """
    if table is None:
        table = table_for(cfg)
    s = cfg.ofdm.num_symbols
    k = cfg.ofdm.num_used_subcarriers
    grid_shape = (s, k)
    num_tx = cfg.mimo.num_tx
    tx_grid = frame.tx_symbols[:, 0, :]  # common grid (reference parity)

    if estimator == "ls":
        return ls_estimate(
            frame.rx_symbols,
            tx_grid,
            frame.pilot_positions,
            frame.pilot_valid,
            grid_shape,
            num_tx,
            method,
            pilot_mask=frame.pilot_mask,
        )
    if estimator == "mmse":
        return mmse_diag_estimate(
            frame.rx_symbols,
            tx_grid,
            frame.pilot_positions,
            frame.pilot_valid,
            grid_shape,
            num_tx,
            frame.params.snr_db,
            method,
            pilot_mask=frame.pilot_mask,
        )
    if estimator in ("mmse_full", "mmse_full_est"):
        import numpy as np

        amp_table = (
            table.amp_overwrite
            if cfg.channel.tap_collision == "overwrite"
            else table.amp_accumulate
        )
        if estimator == "mmse_full_est":
            # BLIND variant: the priors (profile / Doppler / SNR) are
            # estimated from the frame itself — frame.params is never read
            # (see estimators/blind.py). The delay prior is the UNION
            # dictionary with per-frame blended tap powers (never zeroing
            # a candidate tap — one hard misclassification at high SNR
            # would otherwise cap that frame near −10 dB), and σ² enters
            # through the snr_db↔p_ch mapping so mmse_full reproduces the
            # estimated noise variance exactly. This is the deployable
            # classical estimator; 'mmse_full' with genie params is the
            # bound.
            from .blind import blind_tables_for, estimate_priors

            tables = blind_tables_for(cfg, table)
            pri = estimate_priors(
                frame.rx_symbols,
                tx_grid,
                frame.pilot_mask,
                tables,
                num_tx,
            )
            amp = jnp.sqrt(2.0 * pri.w_tap)  # mmse_full folds w = ½·amp²
            p_ch = jnp.sum(pri.w_tap)
            snr_db = 10.0 * jnp.log10(
                jnp.maximum(num_tx * p_ch / pri.sigma2, 1e-12)
            )
            return mmse_full_estimate(
                frame.rx_symbols,
                tx_grid,
                frame.pilot_mask,
                grid_shape,
                num_tx,
                snr_db,
                jnp.asarray(tables.f_dict),  # static union-delay responses
                amp,
                pri.doppler_hz,
                cfg.ofdm.symbol_duration,
                time_rank=auto_time_rank(cfg) if time_rank == "auto" else time_rank,
            )
        profile_idx = frame.params.profile_idx
        doppler_hz = frame.params.doppler_hz
        snr_db = frame.params.snr_db
        freq_matrix = jnp.asarray(table.freq_response)[profile_idx]
        amp = jnp.asarray(amp_table)[profile_idx]
        # static all-profiles delay→bin table for the packed E/D matmuls
        f_table = np.asarray(table.freq_response)  # (C, P, K)
        return mmse_full_estimate(
            frame.rx_symbols,
            tx_grid,
            frame.pilot_mask,
            grid_shape,
            num_tx,
            snr_db,
            freq_matrix,
            amp,
            doppler_hz,
            cfg.ofdm.symbol_duration,
            time_rank=auto_time_rank(cfg) if time_rank == "auto" else time_rank,
            f_table=f_table,
            profile_idx=profile_idx,
        )
    raise ValueError(f"Unknown estimator: {estimator!r}")


def estimate_batch(
    frames: Frame,
    *,
    cfg: ExperimentConfig,
    estimator: str = "ls",
    method: str = "linear",
    table: Optional[ProfileTable] = None,
    chunk_size: Optional[int] = None,
    time_rank: "int | None | str" = "auto",
) -> jax.Array:
    """Batched :func:`estimate_frame` over a leading batch axis.

    Default is a plain vmap — sharding-friendly (the batch axis stays
    shardable under GSPMD) and memory-safe since the windowed k-NN search
    bounds the interpolation transient to (S·K × 128) ≈ 4 MB/frame.
    ``chunk_size`` switches to ``lax.map`` chunking for very large
    single-device batches (note: a scanned batch axis cannot stay sharded
    — don't combine chunking with a mesh-sharded batch).
    """
    if table is None:
        table = table_for(cfg)
    fn = functools.partial(
        estimate_frame,
        cfg=cfg,
        estimator=estimator,
        method=method,
        table=table,
        time_rank=time_rank,
    )
    batch = jax.tree.leaves(frames)[0].shape[0]
    if chunk_size and chunk_size < batch:
        return jax.lax.map(fn, frames, batch_size=chunk_size)
    return jax.vmap(fn)(frames)

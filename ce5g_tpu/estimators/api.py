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
from .interpolate import interp_weights
from .ls import ls_estimate
from .mmse import mmse_diag_estimate, mmse_full_estimate


def estimate_frame(
    frame: Frame,
    *,
    cfg: ExperimentConfig,
    estimator: str = "ls",
    method: str = "linear",
    table: Optional[ProfileTable] = None,
) -> jax.Array:
    """Estimate the channel of one simulated frame.

    Args:
        estimator: 'ls' | 'mmse' (reference-parity diagonal) | 'mmse_full'
            (per-subcarrier Wiener with correlation priors).
        method: interpolation for 'ls'/'mmse' ('nearest'|'linear'|'cubic').

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
        )
    if estimator == "mmse_full":
        freq_matrix = jnp.asarray(table.freq_response)[frame.params.profile_idx]
        amp_table = (
            table.amp_overwrite
            if cfg.channel.tap_collision == "overwrite"
            else table.amp_accumulate
        )
        amp = jnp.asarray(amp_table)[frame.params.profile_idx]
        return mmse_full_estimate(
            frame.rx_symbols,
            tx_grid,
            frame.pilot_positions,
            frame.pilot_valid,
            grid_shape,
            num_tx,
            frame.params.snr_db,
            freq_matrix,
            amp,
            frame.params.doppler_hz,
            cfg.ofdm.symbol_duration,
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
) -> jax.Array:
    """Batched :func:`estimate_frame` over a leading batch axis.

    The k-NN interpolation used by 'ls'/'mmse' builds a transient
    (grid × pilots) distance matrix (~40 MB/frame at 14×599 with 15%
    max density); a full vmap over a large batch would materialize
    batch × 40 MB at once, so those estimators default to chunked
    ``lax.map`` (32 frames per chunk ≈ 1.3 GB transient). 'mmse_full'
    (Woodbury, no distance matrix) defaults to a plain vmap.
    """
    if table is None:
        table = table_for(cfg)
    fn = functools.partial(
        estimate_frame, cfg=cfg, estimator=estimator, method=method, table=table
    )
    if chunk_size is None:
        chunk_size = 32 if estimator in ("ls", "mmse") else 0
    batch = jax.tree.leaves(frames)[0].shape[0]
    if chunk_size and chunk_size < batch:
        return jax.lax.map(fn, frames, batch_size=chunk_size)
    return jax.vmap(fn)(frames)

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
            frame.pilot_mask,
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
        estimate_frame, cfg=cfg, estimator=estimator, method=method, table=table
    )
    batch = jax.tree.leaves(frames)[0].shape[0]
    if chunk_size and chunk_size < batch:
        return jax.lax.map(fn, frames, batch_size=chunk_size)
    return jax.vmap(fn)(frames)

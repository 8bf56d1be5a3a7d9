"""Least-squares channel estimation, batched.

Parity source: reference src/baseline_estimators.py:10-117.

The reference estimates per (rx, tx) pair in Python loops, but every
call-site feeds it the SAME received grid replicated across the tx axis
(dataset_generator.py:63-64, quick_start.py:68-69 — there are no orthogonal
per-antenna pilots), so the per-pair results are identical along tx and the
estimate is of the *superposition* channel Σ_tx H·x (SURVEY §2.2). We
therefore compute one estimate per rx and broadcast over tx — bit-identical
result, T× less work.

The interpolation's candidate selection is fused and gather-free — see
interpolate.py.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from .interpolate import interpolate

_EPS = 1e-12


def ls_at_pilots(rx_grid, tx_grid, positions, valid):
    """LS estimates at pilot slots: H_p = Y_p / (X_p + 1e-12)
    (reference :40). Operates on fixed-size padded pilot slots.

    Args:
        rx_grid: (..., S, K) complex received grid (one rx antenna).
        tx_grid: (S, K) complex transmitted grid (pilots live in it).
        positions: (P, 2) int32; valid: (P,) float32.

    Returns:
        (..., P) complex; invalid slots are zeroed.
    """
    sy, sc = positions[:, 0], positions[:, 1]
    y_p = rx_grid[..., sy, sc]
    x_p = tx_grid[sy, sc]
    h = y_p / (x_p + _EPS)
    return h * valid


def ls_estimate(
    rx_symbols,
    tx_grid,
    positions,
    valid,
    grid_shape: Tuple[int, int],
    num_tx: int,
    method: str = "linear",
    pilot_mask=None,
):
    """Full LS estimation with interpolation (reference :83-117).

    Args:
        rx_symbols: (S, R, K) complex received symbols.
        tx_grid: (S, K) complex transmitted grid (common to all antennas —
            reference parity).
        num_tx: broadcast factor for the tx axis of the output.
        pilot_mask: optional (S, K) mask. When given (and the method is
            nearest/linear), the whole estimate runs in GRID FORM — the
            masked LS grid feeds the row-scan interpolation
            (interpolate.interpolate_grid) with zero pilot gathers; the
            padded-slot path below is the portable fallback and the
            'cubic' path. Same estimate either way.

    Returns:
        (S, R, T, K) complex64 — identical along T (reference behavior).
    """
    rx_grids = jnp.moveaxis(rx_symbols, 1, 0)  # (R, S, K)
    if pilot_mask is not None and method in ("nearest", "linear"):
        from .interpolate import interpolate_grid

        m = jnp.asarray(pilot_mask, jnp.float32)
        g = m * (rx_grids / (tx_grid + _EPS))  # masked LS grid (R, S, K)
        h_full = interpolate_grid(g, m, method)
    else:
        h_p = ls_at_pilots(rx_grids, tx_grid, positions, valid)  # (R, P)
        h_full = interpolate(h_p, positions, valid, grid_shape, method)
    h_full = jnp.moveaxis(h_full, 1, 0)  # (S, R, K)
    return jnp.broadcast_to(
        h_full[:, :, None, :], (grid_shape[0], h_full.shape[1], num_tx, grid_shape[1])
    ).astype(jnp.complex64)

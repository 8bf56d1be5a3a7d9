"""Pallas TPU kernel: fused windowed k-NN pilot-to-grid interpolation.

Why a kernel: the XLA formulation of scattered-pilot interpolation
(candidate gather → distance tensor → shell selection → weighted einsum)
measured ~5.3 ms/frame at batch 256 on TPU v5e — 10× the cost of the rest
of the LS pipeline — dominated by per-(frame, rx) gathers of the
(K, C) candidate-value table and multiple HBM passes over the
(S, K, C) distance/weight tensors. This kernel keeps everything in VMEM:

  * pilots are pre-sorted by subcarrier (XLA argsort, cheap), so each
    128-column grid tile reads ONE contiguous window of ``_WINDOW``
    sorted pilots via a dynamic slice — no gather at all;
  * squared distances, shell selection, and weight normalization are
    dense VPU ops on a (S·128, _WINDOW) tile that never touches HBM;
  * the weighted reduction over the window is a single MXU matmul
    (S·128, W) × (W, 2R) producing the output tile for every rx plane
    re/im at once.

Selection semantics ("shells"): each of the k passes selects *all*
pilots tied at the current minimum distance and shares the shell's
weight among them. This differs from scipy/np argmin only at grid
points with exactly tied distances (where any choice is arbitrary);
tests compare tie-free points. Reference behavior being replaced:
scipy.interpolate.griddata in baseline_estimators.py:65-79.

Window coverage: a tile of 128 consecutive grid columns spans at most
``128·S·max_density ≈ 269`` sorted pilots at the 15% default density
cap, so a ``_WINDOW=384``-pilot window centered on the tile always
contains the true k≤8 nearest pilots of every column (the symbol axis
spans only S=14). Above ~20% density the window becomes approximate;
``max_density`` is validated at the API boundary (physics/pilots.py).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_WINDOW = 384  # sorted-pilot window per 128-column tile (multiple of 128)
_LANE = 128
_BIG = 1e9  # coordinate sentinel for invalid pilot slots (d2 ~ 1e18 < f32 max)
_METHOD_K = {"nearest": 1, "linear": 3}


def _interp_kernel(starts_ref, coord_ref, svals_ref, out_ref, *, method: str,
                   num_symbols: int, window: int):
    t = pl.program_id(0)
    start = starts_ref[0, t]
    # Dynamic slices run along the SUBLANE axis (8-aligned starts); Mosaic
    # requires lane-axis offsets to be 128-aligned, which per-tile pilot
    # windows are not. The (W, 2) coord slice is transposed in-kernel.
    win_syc = jnp.transpose(coord_ref[pl.ds(start, window), :])  # (2, W)
    win_sy = win_syc[0:1]  # (1, W)
    win_sc = win_syc[1:2]
    win_v = svals_ref[pl.ds(start, window), :]  # (W, 2R)

    rows = num_symbols * _LANE
    row_i = jax.lax.broadcasted_iota(jnp.int32, (rows, window), 0)
    sy_g = (row_i // _LANE).astype(jnp.float32)
    colk = (t * _LANE + row_i % _LANE).astype(jnp.float32)
    d2 = (sy_g - win_sy) ** 2 + (colk - win_sc) ** 2  # (rows, W)

    valid = d2 < 1e17  # sentinel slots have d2 ~ 1e18
    if method in _METHOD_K:
        remaining = d2
        w = jnp.zeros_like(d2)
        for _ in range(_METHOD_K[method]):
            mn = jnp.min(remaining, axis=-1, keepdims=True)
            sel = remaining <= mn  # whole tied shell shares the weight
            if method == "nearest":
                w = w + sel.astype(jnp.float32)
            else:
                w = w + sel / (mn + 1e-6)
            remaining = jnp.where(sel, jnp.float32(3e18), remaining)
    else:  # cubic: Gaussian kernel, bandwidth tied to nearest distance
        mn = jnp.min(d2, axis=-1, keepdims=True)
        w = jnp.exp(-(d2 - mn) / (4.0 * (mn + 1.0)))
    w = jnp.where(valid, w, 0.0)
    w = w / jnp.maximum(jnp.sum(w, axis=-1, keepdims=True), 1e-12)

    out_ref[0] = jnp.dot(w, win_v, preferred_element_type=jnp.float32)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _prep_sorted(pilot_values, positions, valid, num_tiles: int, window: int):
    """Sort pilots by subcarrier; compute per-tile window starts (XLA side).

    Returns (starts (1, KT) i32, coord (2, P_pad) f32, svals (P_pad, 2R) f32).
    """
    p = positions.shape[0]
    p_pad = max(_round_up(p, _LANE), window)
    sy = positions[:, 0].astype(jnp.float32)
    sc = positions[:, 1].astype(jnp.float32)
    sort_key = jnp.where(valid > 0, sc, _BIG)
    order = jnp.argsort(sort_key)
    sc_s = sort_key[order]
    sy_s = jnp.where(valid[order] > 0, sy[order], _BIG)
    vals_s = (pilot_values * valid)[..., order]  # (R, P)

    pad = p_pad - p
    sc_s = jnp.pad(sc_s, (0, pad), constant_values=_BIG)
    sy_s = jnp.pad(sy_s, (0, pad), constant_values=_BIG)
    coord = jnp.stack([sy_s, sc_s], axis=-1)  # (P_pad, 2)

    planar = jnp.concatenate([vals_s.real, vals_s.imag], axis=0)  # (2R, P)
    svals = jnp.pad(planar, ((0, 0), (0, pad))).T  # (P_pad, 2R)

    edges = jnp.arange(num_tiles + 1, dtype=jnp.float32) * _LANE
    bounds = jnp.searchsorted(sc_s, edges).astype(jnp.int32)
    first, last = bounds[:-1], bounds[1:]
    margin = jnp.maximum((window - (last - first)) // 2, 0)
    starts = jnp.clip(first - margin, 0, p_pad - window)
    starts = (starts // 8) * 8  # sublane-aligned dynamic-slice starts
    return starts[None, :], coord, svals


def interpolate_pallas(
    pilot_values: jax.Array,
    positions: jax.Array,
    valid: jax.Array,
    grid_shape: Tuple[int, int],
    method: str = "linear",
    interpret: bool = False,
):
    """Pallas-fused equivalent of :func:`..estimators.interpolate.interpolate`.

    Args:
        pilot_values: (R, P) complex values per padded pilot slot (a single
            leading axis; callers with other leading shapes reshape).
        positions: (P, 2) int32 pilot (symbol, subcarrier) coords.
        valid: (P,) float32 slot validity.
        grid_shape: (S, K).
        interpret: run in the Pallas interpreter (CPU testing).

    Returns:
        (R, S, K) complex64 grid.
    """
    s, k = grid_shape
    r = pilot_values.shape[0]
    num_tiles = -(-k // _LANE)
    window = min(_WINDOW, max(_round_up(positions.shape[0], _LANE), _LANE))
    starts, coord, svals = _prep_sorted(
        pilot_values, positions, valid, num_tiles, window
    )
    rows = s * _LANE
    r2 = 2 * r

    kern = functools.partial(
        _interp_kernel, method=method, num_symbols=s, window=window
    )
    out = pl.pallas_call(
        kern,
        grid=(num_tiles,),
        out_shape=jax.ShapeDtypeStruct((num_tiles, rows, r2), jnp.float32),
        in_specs=[
            pl.BlockSpec((1, num_tiles), lambda t: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(coord.shape, lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(svals.shape, lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, rows, r2), lambda t: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(starts, coord, svals)

    # (KT, S·128, 2R) → (2R, S, KT·128) → complex (R, S, K)
    out = out.reshape(num_tiles, s, _LANE, r2)
    out = jnp.transpose(out, (3, 1, 0, 2)).reshape(r2, s, num_tiles * _LANE)
    out = out[..., :k]
    return jax.lax.complex(out[:r], out[r:])

"""Scattered pilot → full-grid interpolation, TPU-native.

Parity target: reference src/baseline_estimators.py:44-81 uses
``scipy.interpolate.griddata`` (Delaunay triangulation) over scattered
(symbol, subcarrier) pilot coordinates, real and imaginary parts separately,
``fill_value=0`` outside the convex hull. Delaunay is host-sequential and
unportable to TPU, so (per SURVEY §7 "hard parts"):

  * 'nearest'  — exact algorithmic parity: nearest pilot by Euclidean
    distance (matches griddata 'nearest' up to tie-breaking). This is also
    the reference's empirically best method (test_phase2_report.py:43).
  * 'linear'   — k=3 inverse-distance weighting (statistical parity with
    barycentric interpolation; NMSE-level equivalence is validated in
    tests, pointwise equality is not a goal).
  * 'cubic'    — k=8 Gaussian-kernel weighting (smooth, wider support).

Weights depend only on the pilot pattern — NOT on the antenna pair or the
pilot values — so they are computed once per frame and reused across every
(rx, tx) pair and every estimator (LS and MMSE), amortizing the distance
computation the reference repeats per pair per estimator (4× griddata calls
per frame per estimator in the 2×2 case).
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

_METHOD_K = {"nearest": 1, "linear": 3, "cubic": 8}


class InterpWeights(NamedTuple):
    idx: jax.Array  # (G, k) int32 — pilot-slot index of k nearest pilots
    w: jax.Array  # (G, k) float32 — normalized weights


# Candidate-window width for the windowed k-NN search. 128 consecutive
# sc-sorted pilots cover ≥ ±45 subcarrier columns at 10% density (and the
# whole frame below ~1.5%), far beyond any true k≤8 nearest neighbor's
# |Δsc| (the symbol axis spans only 14), so the windowed search is exact.
_CANDIDATES = 128


def _weights_from_d2(d2, idx, method: str, k: int) -> InterpWeights:
    if k == 1:
        j = jnp.argmin(d2, axis=1)
        take = jnp.take_along_axis(idx, j[:, None], axis=1)
        return InterpWeights(take.astype(jnp.int32), jnp.ones_like(take, jnp.float32))
    neg_d2, sel = jax.lax.top_k(-d2, k)  # (G,k)
    d2k = -neg_d2
    chosen = jnp.take_along_axis(idx, sel, axis=1)
    if method == "linear":
        w = 1.0 / (d2k + 1e-6)
    else:  # cubic: Gaussian kernel, scale set by the k-th neighbor distance
        sigma2 = jnp.maximum(d2k[:, -1:], 1e-6)
        w = jnp.exp(-d2k / sigma2)
    # Guard: padded-slot inf distances (fewer than k valid pilots) get 0.
    w = jnp.where(jnp.isfinite(d2k), w, 0.0)
    w = w / jnp.maximum(jnp.sum(w, axis=1, keepdims=True), 1e-12)
    return InterpWeights(chosen.astype(jnp.int32), w.astype(jnp.float32))


def interp_weights(
    positions: jax.Array,
    valid: jax.Array,
    grid_shape: Tuple[int, int],
    method: str = "linear",
) -> InterpWeights:
    """Compute k-nearest-pilot interpolation weights for a full grid.

    TPU-first: instead of an all-pairs (grid × pilots) distance matrix
    (O(G·P) ≈ 10M f32 per frame), pilots are sorted by subcarrier and each
    grid column searches only the ``_CANDIDATES`` rank-nearest pilots —
    exact for every realistic density (see _CANDIDATES note), ~10× less
    compute and memory at 10-15% density.

    Args:
        positions: (P, 2) int32 padded pilot (symbol, subcarrier) coords.
        valid: (P,) float32 slot validity.
        grid_shape: (S, K).
        method: 'nearest' | 'linear' | 'cubic'.
    """
    if method not in _METHOD_K:
        raise ValueError(f"Unknown interpolation method: {method!r}")
    k = _METHOD_K[method]
    s, kk = grid_shape
    g = s * kk
    p = positions.shape[0]

    ps = positions[:, 0].astype(jnp.float32)
    pk = positions[:, 1].astype(jnp.float32)

    if p <= _CANDIDATES:
        # small pilot sets: all-pairs is already cheap and exact
        gs = (jnp.arange(g, dtype=jnp.float32) // kk)[:, None]
        gk = (jnp.arange(g, dtype=jnp.float32) % kk)[:, None]
        d2 = (gs - ps[None, :]) ** 2 + (gk - pk[None, :]) ** 2
        d2 = jnp.where(valid[None, :] > 0, d2, jnp.inf)
        idx = jnp.broadcast_to(jnp.arange(p, dtype=jnp.int32), (g, p))
        return _weights_from_d2(d2, idx, method, k)

    c = _CANDIDATES
    n_valid = jnp.sum(valid).astype(jnp.int32)
    sort_key = jnp.where(valid > 0, pk, jnp.inf)
    order = jnp.argsort(sort_key).astype(jnp.int32)  # (P,) valid first, by sc
    sc_sorted = sort_key[order]

    cols = jnp.arange(kk, dtype=jnp.float32)
    pos_in_sorted = jnp.searchsorted(sc_sorted, cols)  # (K,)
    start = jnp.clip(pos_in_sorted - c // 2, 0, jnp.maximum(n_valid - c, 0))
    cand_sorted = start[:, None] + jnp.arange(c)[None, :]  # (K, C) sorted idx
    cand = order[cand_sorted]  # (K, C) original slot ids

    cand_sy = ps[cand]  # (K, C)
    cand_sc = pk[cand]
    cand_ok = valid[cand] > 0

    grid_sy = jnp.arange(s, dtype=jnp.float32)[:, None, None]  # (S,1,1)
    d2 = (grid_sy - cand_sy[None]) ** 2 + (cols[None, :, None] - cand_sc[None]) ** 2
    d2 = jnp.where(cand_ok[None], d2, jnp.inf)  # (S, K, C)
    d2 = d2.reshape(g, c)
    idx = jnp.broadcast_to(cand[None], (s, kk, c)).reshape(g, c)
    return _weights_from_d2(d2, idx, method, k)


def apply_interp(weights: InterpWeights, pilot_values: jax.Array, grid_shape):
    """Expand pilot values to the full grid.

    Args:
        pilot_values: (..., P) complex values per pilot slot.
    Returns:
        (..., S, K) complex grid.
    """
    s, kk = grid_shape
    gathered = pilot_values[..., weights.idx]  # (..., G, k)
    out = jnp.sum(gathered * weights.w, axis=-1)
    return out.reshape(*pilot_values.shape[:-1], s, kk)


def interpolate(
    pilot_values: jax.Array,
    positions: jax.Array,
    valid: jax.Array,
    grid_shape: Tuple[int, int],
    method: str = "linear",
):
    """One-shot convenience: weights + apply."""
    w = interp_weights(positions, valid, grid_shape, method)
    return apply_interp(w, pilot_values, grid_shape)


def normalized_conv_interpolate(
    pilot_grid: jax.Array,
    mask: jax.Array,
    sigmas: Tuple[float, ...] = (1.5, 4.0, 12.0),
):
    """Normalized-convolution (Shepard) interpolation — the fast TPU-native
    alternative: O(G · kernel) separable Gaussian blurs of (value·mask) and
    mask, combined coarse-to-fine so sparse regions fall back to wider
    kernels. No reference analog; offered as method='conv' for speed.

    Args:
        pilot_grid: (..., S, K) complex grid with values only at pilot REs.
        mask: (S, K) or (..., S, K) float pilot mask.
    """

    def gauss_kernel(sigma):
        r = int(max(2, 3 * sigma))
        x = jnp.arange(-r, r + 1, dtype=jnp.float32)
        k = jnp.exp(-0.5 * (x / sigma) ** 2)
        return k / k.sum()

    def blur_axis(x, kern, axis):
        # separable conv along one axis via conv_general_dilated on 1D
        pad = (kern.shape[0] - 1) // 2
        moved = jnp.moveaxis(x, axis, -1)
        flat = moved.reshape(-1, 1, moved.shape[-1])
        out = jax.lax.conv_general_dilated(
            flat, kern.reshape(1, 1, -1), (1,), [(pad, pad)]
        )
        return jnp.moveaxis(out.reshape(moved.shape), -1, axis)

    def blur(x, kern):
        return blur_axis(blur_axis(x, kern, -1), kern, -2)

    num = pilot_grid
    den = jnp.broadcast_to(mask, pilot_grid.shape).astype(jnp.float32)
    out = jnp.zeros_like(pilot_grid)
    have = jnp.zeros(pilot_grid.shape, bool)
    for sigma in sigmas:
        kern = gauss_kernel(sigma)
        n_re = blur(num.real, kern)
        n_im = blur(num.imag, kern)
        d = blur(den, kern)
        est = jax.lax.complex(n_re, n_im) / jnp.maximum(d, 1e-8)
        ok = d > 1e-3
        out = jnp.where(~have & ok, est, out)
        have = have | ok
    return out

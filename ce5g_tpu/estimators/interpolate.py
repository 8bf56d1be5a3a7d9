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
  * 'cubic'    — windowed Gaussian-kernel weighting (smooth, wide support,
    bandwidth tied to the nearest-pilot distance).

TPU-first design (two iterations of hardware feedback baked in):
  1. windowed candidate search — pilots are sorted by subcarrier and each
     grid column considers only the ``_CANDIDATES`` rank-nearest pilots
     (exact: the symbol axis spans 14, so true neighbors are always inside
     the window at any realistic density); this caps the distance tensor
     at (S·K × 128) ≈ 4 MB/frame instead of O(S·K × P) ≈ 40 MB.
  2. gather-free selection — ``jax.lax.top_k`` (per-row sort) and
     per-gridpoint index gathers measured ~10× slower than the whole rest
     of the pipeline on TPU. Selection is instead k passes of
     (masked min → first-match mask → accumulate weight), all dense VPU
     ops over the candidate axis, and values are applied by a single
     weighted reduction over the candidate table (pilot values are
     gathered once per frame into (K, C), never per grid point).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

_METHOD_K = {"nearest": 1, "linear": 3, "cubic": 8}

# 128 consecutive sc-sorted pilots cover ≥ ±45 subcarrier columns at 10%
# density (and the whole frame below ~1.5%), far beyond any true k≤8
# nearest neighbor's |Δsc|, so the windowed search is exact.
_CANDIDATES = 128


def _selection_weights(d2, method: str):
    """Dense per-candidate weights over the last axis (no sorts/gathers).

    nearest: first-match of the row minimum (exact argmin semantics).
    linear:  k=3 masked-min passes, IDW 1/(d²+1e-6) weights.
    cubic:   Gaussian kernel over all candidates, σ² = 4·(min d² + 1).
    Rows with no finite candidate get all-zero weights.
    """
    if method == "nearest" or method == "linear":
        k = _METHOD_K[method]
        remaining = d2
        w = jnp.zeros_like(d2)
        for _ in range(k):
            mn = jnp.min(remaining, axis=-1, keepdims=True)
            # the whole tied shell shares the weight (same semantics as the
            # pallas kernel; cheaper than first-match, which needs a cumsum)
            sel = (remaining <= mn) & jnp.isfinite(remaining)
            if method == "nearest":
                w = w + sel.astype(d2.dtype)
            else:
                w = w + sel / (mn + 1e-6)
            remaining = jnp.where(sel, jnp.inf, remaining)
    elif method == "cubic":
        mn = jnp.min(d2, axis=-1, keepdims=True)
        sigma2 = 4.0 * (jnp.where(jnp.isfinite(mn), mn, 0.0) + 1.0)
        w = jnp.exp(-(d2 - jnp.where(jnp.isfinite(mn), mn, 0.0)) / sigma2)
        w = jnp.where(jnp.isfinite(d2), w, 0.0)
    else:
        raise ValueError(f"Unknown interpolation method: {method!r}")
    return w / jnp.maximum(jnp.sum(w, axis=-1, keepdims=True), 1e-12)


def _candidate_table(positions, valid, num_subcarriers: int):
    """Sorted-window candidate slots per grid column: (K, C) int32."""
    p = positions.shape[0]
    c = min(_CANDIDATES, p)
    pk = positions[:, 1].astype(jnp.float32)
    n_valid = jnp.sum(valid).astype(jnp.int32)
    sort_key = jnp.where(valid > 0, pk, jnp.inf)
    order = jnp.argsort(sort_key).astype(jnp.int32)  # valid first, by sc
    sc_sorted = sort_key[order]
    cols = jnp.arange(num_subcarriers, dtype=jnp.float32)
    pos_in_sorted = jnp.searchsorted(sc_sorted, cols)
    start = jnp.clip(pos_in_sorted - c // 2, 0, jnp.maximum(n_valid - c, 0))
    cand_sorted = start[:, None] + jnp.arange(c)[None, :]  # (K, C)
    return order[cand_sorted]


def interpolate(
    pilot_values: jax.Array,
    positions: jax.Array,
    valid: jax.Array,
    grid_shape: Tuple[int, int],
    method: str = "linear",
    impl: str | None = None,
):
    """Expand pilot-slot values to the full grid.

    Args:
        pilot_values: (..., P) complex values per (padded) pilot slot.
        positions: (P, 2) int32 pilot (symbol, subcarrier) coords.
        valid: (P,) float32 slot validity.
        grid_shape: (S, K).
        method: 'nearest' | 'linear' | 'cubic'.
        impl: 'pallas' (fused TPU kernel, the default on TPU — ~50× less
            HBM traffic than the XLA formulation at batch scale),
            'xla' (portable fallback, default elsewhere), or None = auto.

    Returns:
        (..., S, K) complex grid.
    """
    if method not in ("nearest", "linear", "cubic"):
        raise ValueError(f"Unknown interpolation method: {method!r}")
    if impl is None:
        impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    if impl == "pallas":
        from ..ops.interp_pallas import interpolate_pallas

        lead = pilot_values.shape[:-1]
        vals2 = pilot_values.reshape(-1, pilot_values.shape[-1])
        out = interpolate_pallas(vals2, positions, valid, grid_shape, method)
        return out.reshape(*lead, *grid_shape)
    s, kk = grid_shape
    cand = _candidate_table(positions, valid, kk)  # (K, C)
    cand_sy = positions[:, 0].astype(jnp.float32)[cand]  # (K, C)
    cand_sc = positions[:, 1].astype(jnp.float32)[cand]
    cand_ok = valid[cand] > 0
    v_cand = pilot_values[..., cand]  # (..., K, C) — one gather per frame

    grid_sy = jnp.arange(s, dtype=jnp.float32)[:, None, None]
    cols = jnp.arange(kk, dtype=jnp.float32)[None, :, None]
    d2 = (grid_sy - cand_sy[None]) ** 2 + (cols - cand_sc[None]) ** 2
    d2 = jnp.where(cand_ok[None], d2, jnp.inf)  # (S, K, C)

    w = _selection_weights(d2, method)  # (S, K, C) real
    return jnp.einsum(
        "skc,...kc->...sk", w.astype(jnp.float32), v_cand,
        precision=jax.lax.Precision.HIGHEST,
    )


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

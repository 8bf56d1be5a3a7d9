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


def _fill_1d(values, ok, reverse: bool = False):
    """Per-row forward (or backward) fill of masked values along the last
    axis, as a log-depth associative scan (dense shift-network ops — no
    gathers, no sequential loop). Positions with no pilot on their side
    keep 0 (they are excluded by an infinite distance anyway).

    values: (..., K) complex; ok: broadcastable bool (..., K).
    """
    ok_b = jnp.broadcast_to(ok, values.shape)

    def combine(a, b):
        a_ok, a_re, a_im = a
        b_ok, b_re, b_im = b
        return (
            a_ok | b_ok,
            jnp.where(b_ok, b_re, a_re),
            jnp.where(b_ok, b_im, a_im),
        )

    _, re, im = jax.lax.associative_scan(
        combine,
        (ok_b, values.real, values.imag),
        axis=values.ndim - 1,  # reverse-mode requires a nonnegative axis
        reverse=reverse,
    )
    return jax.lax.complex(re, im)


def _fill2_1d(values, ok, iota, reverse: bool = False):
    """Like :func:`_fill_1d` but carrying the TWO most recent pilots
    (position + value each) — the per-row candidates the k=3 IDW needs.

    Returns (p1, v1, p2, v2): p* are f32 positions (−2e9 when absent; the
    caller turns absent into an infinite distance), v* the corresponding
    complex values. Position/count leaves keep the mask's (leading-1)
    shape so the scan does not replicate them per rx antenna.
    """
    ok_s = ok.reshape((1,) * (values.ndim - ok.ndim) + ok.shape)
    ok_b = jnp.broadcast_to(ok, values.shape)
    absent = jnp.float32(-2e9)
    cnt0 = ok_s.astype(jnp.int32)
    pos0 = jnp.where(ok_s, jnp.broadcast_to(iota, ok_s.shape), absent)
    zero = jnp.zeros_like(values.real)

    def combine(a, b):
        # b is the NEWER segment in scan order; newest-two of a∥b
        (ca, p1a, r1a, i1a, p2a, r2a, i2a) = a
        (cb, p1b, r1b, i1b, p2b, r2b, i2b) = b
        b2 = cb >= 2
        b1 = cb == 1
        pick_b1 = b2  # second-newest comes from b
        p1 = jnp.where(cb >= 1, p1b, p1a)
        r1 = jnp.where(cb >= 1, r1b, r1a)
        i1 = jnp.where(cb >= 1, i1b, i1a)
        p2 = jnp.where(pick_b1, p2b, jnp.where(b1, p1a, p2a))
        r2 = jnp.where(pick_b1, r2b, jnp.where(b1, r1a, r2a))
        i2 = jnp.where(pick_b1, i2b, jnp.where(b1, i1a, i2a))
        return (jnp.minimum(ca + cb, 2), p1, r1, i1, p2, r2, i2)

    _, p1, r1, i1, p2, r2, i2 = jax.lax.associative_scan(
        combine,
        (
            cnt0,
            pos0,
            jnp.where(ok_b, values.real, zero),
            jnp.where(ok_b, values.imag, zero),
            jnp.full_like(pos0, absent),
            zero,
            zero,
        ),
        axis=values.ndim - 1,
        reverse=reverse,
    )
    return p1, jax.lax.complex(r1, i1), p2, jax.lax.complex(r2, i2)


def interpolate_grid(
    value_grid: jax.Array,
    mask: jax.Array,
    method: str = "linear",
    impl: "str | None" = None,
):
    """Grid-form scattered interpolation — the round-5 fast path.

    Same estimate as :func:`interpolate` but taking the masked VALUE GRID
    ((..., S, K), zeros off-pilot) + pilot mask (S, K) instead of padded
    pilot slots — i.e. exactly what ``mask · rx/tx`` produces, with no
    pilot gather at all.

    Row-decomposition: for a fixed source symbol row r, row-r pilots
    ordered by distance to grid point (s, k) are ordered by |Δsc| (the
    |Δsy| term is constant within the row), so the global nearest set is
    contained in the per-row nearest-left/right pilots ('nearest': 2·S
    candidates) and the global top-3 in the per-row TWO nearest per side
    ('linear': 4·S candidates) — all computed by log-depth associative
    scans (dense shift-network ops; no gathers, no top-k over wide
    windows). Selection is a 3-level running min (m₁ < m₂ < m₃ distinct
    shell values) — ~5 traversals of a (S, 4S, K) ≈ 1.9 MB/frame tensor
    instead of the previous 128-wide window's (S·K, 128) ≈ 4.3 MB with
    read-modify-write top-k passes. 'nearest' is bit-exact vs the slot
    path (same tied-shell semantics); 'linear' can miss a same-row
    same-side THIRD neighbor only when three same-row pilots are all
    globally closer than every other row's best — a sub-0.05-dB NMSE
    effect (pinned by tests/test_interp_rowscan.py).
    """
    if method not in ("nearest", "linear"):
        raise ValueError(f"interpolate_grid supports nearest/linear, got {method!r}")
    if impl is None:
        impl = "fused" if jax.default_backend() == "tpu" else "xla"
    if impl == "fused" and value_grid.ndim == 3:
        # fully-fused Pallas kernel: fills + selection + apply in VMEM —
        # the XLA path below materializes the (R, S, C, K) selection
        # product through HBM (measured 16-45 ms/batch of 256 on v5e)
        from ..ops.interp_fused_pallas import interpolate_grid_fused

        return interpolate_grid_fused(value_grid, mask, method)
    s, k = mask.shape[-2], mask.shape[-1]
    ok = mask > 0
    iota = jnp.arange(k, dtype=jnp.float32)
    absent = jnp.float32(-2e9)

    if method == "nearest":
        neg = jnp.float32(-1e9)
        ax = ok.ndim - 1  # cummax requires a non-negative axis index
        pos_l = jax.lax.cummax(jnp.where(ok, iota, neg), axis=ax)
        pos_r = -jax.lax.cummax(jnp.where(ok, -iota, neg), axis=ax, reverse=True)
        d_l = jnp.where(pos_l > neg / 2, iota - pos_l, jnp.inf)  # (S, K)
        d_r = jnp.where(pos_r < -neg / 2, pos_r - iota, jnp.inf)
        # a pilot exactly at column k is BOTH sides' nearest — count it
        # once (it would otherwise get double weight inside tied shells)
        d_r = jnp.where(pos_r == pos_l, jnp.inf, d_r)
        d_sides = [d_l, d_r]
        v_sides = [
            _fill_1d(value_grid, ok, reverse=False),
            _fill_1d(value_grid, ok, reverse=True),
        ]
    else:
        p1l, v1l, p2l, v2l = _fill2_1d(value_grid, ok, iota, reverse=False)
        p1r, v1r, p2r, v2r = _fill2_1d(value_grid, ok, iota, reverse=True)
        sq = lambda p: p.reshape(p.shape[-2:])  # drop the leading 1s
        p1l, p2l, p1r, p2r = sq(p1l), sq(p2l), sq(p1r), sq(p2r)
        d_1l = jnp.where(p1l > absent / 2, iota - p1l, jnp.inf)
        d_2l = jnp.where(p2l > absent / 2, iota - p2l, jnp.inf)
        d_1r = jnp.where(p1r > absent / 2, p1r - iota, jnp.inf)
        d_2r = jnp.where(p2r > absent / 2, p2r - iota, jnp.inf)
        d_1r = jnp.where(p1r == p1l, jnp.inf, d_1r)  # dedup pilot at k
        d_sides = [d_1l, d_2l, d_1r, d_2r]
        v_sides = [v1l, v2l, v1r, v2r]

    n_sides = len(d_sides)
    # candidate axis c = (row r, side), ordered (r0,s0),(r0,s1),…:
    # distances (S_out, n_sides·S, K) shared across the leading value dims
    d1 = jnp.stack(d_sides, axis=-2).reshape(n_sides * s, k)
    rows = jnp.arange(s, dtype=jnp.float32)
    drow = rows[:, None] - jnp.repeat(rows, n_sides)[None, :]
    d2 = drow[:, :, None] ** 2 + d1[None, :, :] ** 2  # (S_out, C, K)

    # k-NN tied-shell weights via distinct shell values m1 < m2 < m3:
    # pure reduce-reads of d2 — no read-modify-write "remaining" tensors.
    big = jnp.float32(jnp.inf)
    m1 = jnp.min(d2, axis=1, keepdims=True)
    if method == "nearest":
        w = ((d2 <= m1) & jnp.isfinite(d2)).astype(jnp.float32)
    else:
        m2 = jnp.min(jnp.where(d2 > m1, d2, big), axis=1, keepdims=True)
        m3 = jnp.min(jnp.where(d2 > m2, d2, big), axis=1, keepdims=True)
        fin = jnp.isfinite(d2)
        w = jnp.where(fin & (d2 <= m1), 1.0 / (m1 + 1e-6), 0.0)
        w = w + jnp.where(fin & (d2 > m1) & (d2 <= m2), 1.0 / (m2 + 1e-6), 0.0)
        w = w + jnp.where(fin & (d2 > m2) & (d2 <= m3), 1.0 / (m3 + 1e-6), 0.0)
    w = w / jnp.maximum(jnp.sum(w, axis=1, keepdims=True), 1e-12)

    v_cand = jnp.stack(v_sides, axis=-2).reshape(
        *value_grid.shape[:-2], n_sides * s, k
    )  # (..., C, K) matching d1's (row, side) order
    return jnp.einsum(
        "sck,...ck->...sk", w.astype(jnp.float32), v_cand,
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

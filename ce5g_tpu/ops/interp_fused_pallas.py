"""Pallas TPU kernel: FUSED grid-form scattered interpolation.

Replaces the XLA formulation of estimators/interpolate.interpolate_grid
on TPU. Measured breakdown of the XLA path at batch 256 (4 rx):
associative-scan fills ~12 ms + candidate selection/apply ~16 ms
(nearest) / ~45 ms (linear) — the selection materializes a
(B, R, S, C, K) product through HBM. This kernel runs the ENTIRE
estimate per frame inside VMEM:

  1. per-row nearest-pilot fills as log-shift (Hillis-Steele) passes —
     `pltpu.roll` + masked combine, 10 unrolled steps, no HBM
     intermediates; 'linear' carries the TWO nearest pilots per side
     (the same pair-merge combine as interpolate._fill2_1d);
  2. per-output-row tied-shell k-NN selection (distinct shell minima
     m₁ < m₂ < m₃, exactly the XLA path's semantics incl. the
     both-sides-same-pilot dedup);
  3. weighted reduction into the output rows, per rx antenna.

Everything is (S, K)-shaped vector math (S=14 sublanes × K=599 lanes);
the only HBM traffic is one read of (mask, values) and one write of the
output. Parity with the XLA path is pinned by
tests/test_interp_rowscan.py::test_fused_matches_xla (bit-near for
'nearest', tied-shell-identical for 'linear').
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INF = 3e30  # python floats: jnp scalars would be captured tracer consts
_FIN = 1e29  # "is a real candidate" threshold


def _shift(x, d: int, col, k: int, reverse: bool, fill):
    """Shift x by d along lanes (+d = from the left / lower k), replacing
    the wrapped-in region with ``fill``. ``col`` broadcasts against x
    (trailing-dim aligned), so x may carry leading plane dims."""
    ax = x.ndim - 1
    if reverse:
        rolled = pltpu.roll(x, k - d, axis=ax)
        ok = col < (k - d)
    else:
        rolled = pltpu.roll(x, d, axis=ax)
        ok = col >= d
    return jnp.where(ok, rolled, fill)


def _fill_pass(ok0, pos0, vals0, col, k: int, depth: int, reverse: bool):
    """Log-shift nearest-pilot fill along lanes.

    ok0: (S, K) f32 1.0 at pilots; pos0: (S, K) pilot column (else -1);
    vals0: list of (S, K) value planes (re/im per rx) valid at pilots.
    Returns (p1, p2, v1s, v2s): nearest / second-nearest positions
    (−1 when absent) and their value planes. depth=1 skips the pair carry.
    """
    cnt = ok0
    p1 = jnp.where(ok0 > 0, pos0, -1.0)
    v1 = [jnp.where(ok0 > 0, v, 0.0) for v in vals0]
    p2 = jnp.full_like(p1, -1.0)
    v2 = [jnp.zeros_like(v) for v in vals0]

    d = 1
    while d < k:
        s_cnt = _shift(cnt, d, col, k, reverse, 0.0)
        s_p1 = _shift(p1, d, col, k, reverse, -1.0)
        s_v1 = [_shift(v, d, col, k, reverse, 0.0) for v in v1]
        # self is the NEWER segment (closer to the query in scan order):
        # newest-two of (shifted ∥ self)
        have1 = cnt >= 1.0
        if depth >= 2:
            s_p2 = _shift(p2, d, col, k, reverse, -1.0)
            s_v2 = [_shift(v, d, col, k, reverse, 0.0) for v in v2]
            have2 = cnt >= 2.0
            # second-newest: self's own 2nd if it has two; else self's 1st
            # newest falls back to shifted's 1st; else shifted's 2nd
            p2 = jnp.where(have2, p2, jnp.where(have1, s_p1, s_p2))
            v2 = [
                jnp.where(have2, b, jnp.where(have1, sb1, sb2))
                for b, sb1, sb2 in zip(v2, s_v1, s_v2)
            ]
        p1 = jnp.where(have1, p1, s_p1)
        v1 = [jnp.where(have1, b, sb) for b, sb in zip(v1, s_v1)]
        cnt = jnp.minimum(cnt + s_cnt, 2.0)
        d *= 2
    return p1, p2, v1, v2


def _kernel(m_ref, vr_ref, vi_ref, or_ref, oi_ref, *, s: int, r_cnt: int,
            k: int, method: str):
    col = jax.lax.broadcasted_iota(jnp.int32, (s, k), 1)
    colf = col.astype(jnp.float32)
    mask = m_ref[...]
    ok = (mask > 0).astype(jnp.float32)
    depth = 1 if method == "nearest" else 2

    # one stacked (2R, S, K) value tensor: shifts/selects hit all planes
    # in single wide ops instead of per-plane dispatches
    vals = [jnp.concatenate([vr_ref[...], vi_ref[...]], axis=0)]

    p1l, p2l, v1l, v2l = _fill_pass(ok, colf, vals, col, k, depth, False)
    p1r, p2r, v1r, v2r = _fill_pass(ok, colf, vals, col, k, depth, True)

    def dist(p, left: bool):
        d = colf - p if left else p - colf
        return jnp.where(p >= 0.0, d, _INF)

    d1l = dist(p1l, True)
    d1r = dist(p1r, False)
    # a pilot exactly at column k is BOTH sides' nearest — count it once
    d1r = jnp.where(p1r == p1l, _INF, d1r)
    if method == "nearest":
        d_classes = [d1l, d1r]
        v_classes = [v1l[0], v1r[0]]
    else:
        d_classes = [d1l, dist(p2l, True), d1r, dist(p2r, False)]
        v_classes = [v1l[0], v2l[0], v1r[0], v2r[0]]
    n_cls = len(d_classes)

    # candidate axis c = (class, src_row), class-major: d1sq (C, K),
    # rowpen (S_out, C) built by tiling the (S_out, S_src) penalty block
    d1sq = jnp.concatenate(
        [jnp.minimum(d * d, _INF) for d in d_classes], axis=0
    )  # (C, K)
    i_out = jax.lax.broadcasted_iota(jnp.int32, (s, s), 0).astype(jnp.float32)
    i_src = jax.lax.broadcasted_iota(jnp.int32, (s, s), 1).astype(jnp.float32)
    pen = (i_out - i_src) ** 2  # (S_out, S_src)
    rowpen = jnp.concatenate([pen] * n_cls, axis=1)  # (S_out, C)

    d2 = jnp.minimum(rowpen[:, :, None] + d1sq[None, :, :], _INF)  # (S,C,K)
    m1 = jnp.min(d2, axis=1, keepdims=True)  # (S, 1, K)
    if method == "nearest":
        w = (d2 <= m1).astype(jnp.float32) * (d2 < _FIN)
    else:
        m2 = jnp.min(jnp.where(d2 > m1, d2, _INF), axis=1, keepdims=True)
        m3 = jnp.min(jnp.where(d2 > m2, d2, _INF), axis=1, keepdims=True)
        fin = (d2 < _FIN).astype(jnp.float32)
        w = jnp.where(d2 <= m1, 1.0 / (m1 + 1e-6), 0.0)
        w = w + jnp.where((d2 > m1) & (d2 <= m2), 1.0 / (m2 + 1e-6), 0.0)
        w = w + jnp.where((d2 > m2) & (d2 <= m3), 1.0 / (m3 + 1e-6), 0.0)
        w = w * fin
    inv = 1.0 / jnp.maximum(jnp.sum(w, axis=1, keepdims=True), 1e-12)
    w = w * inv  # (S_out, C, K), normalized

    # apply: out_plane[s_out] = Σ_c w[s_out, c] · v_cand[plane, c]
    v_cand = jnp.concatenate(v_classes, axis=1)  # (2R, C, K)
    for p in range(2 * r_cnt):
        out_p = jnp.sum(w * v_cand[p][None, :, :], axis=1)  # (S_out, K)
        if p < r_cnt:
            or_ref[p] = out_p
        else:
            oi_ref[p - r_cnt] = out_p


@functools.partial(jax.jit, static_argnames=("method", "interpret"))
def interpolate_grid_fused(
    value_grid, mask, method: str = "linear", interpret: bool = False
):
    """One frame: (R, S, K) complex masked values + (S, K) mask →
    (R, S, K) complex interpolated grid. vmap over frames — pallas_call
    turns the mapped axis into an extra grid dimension. ``interpret``
    runs the kernel in interpreter mode (CPU-testable)."""
    r_cnt, s, k = value_grid.shape
    vr = jnp.real(value_grid).astype(jnp.float32)
    vi = jnp.imag(value_grid).astype(jnp.float32)
    m = jnp.asarray(mask, jnp.float32)
    out_re, out_im = pl.pallas_call(
        functools.partial(_kernel, s=s, r_cnt=r_cnt, k=k, method=method),
        out_shape=(
            jax.ShapeDtypeStruct((r_cnt, s, k), jnp.float32),
            jax.ShapeDtypeStruct((r_cnt, s, k), jnp.float32),
        ),
        interpret=interpret,
    )(m, vr, vi)
    return jax.lax.complex(out_re, out_im)

"""Complex ↔ planar-real conversions (reference: src/utils.py:173-180),
plus the packed complex matmul used by the thin-contraction hot paths."""
from __future__ import annotations

import jax
import jax.numpy as jnp


def complex_to_real(x, axis: int = -1):
    """Stack (re, im) along ``axis`` (appended last by default)."""
    return jnp.stack([jnp.real(x), jnp.imag(x)], axis=axis)


def real_to_complex(x, axis: int = -1):
    """Inverse of :func:`complex_to_real`."""
    re = jnp.take(x, 0, axis=axis)
    im = jnp.take(x, 1, axis=axis)
    return re + 1j * im


def packed_complex_matmul(a, b, precision=None):
    """(..., P) complex × (P, K) complex → (..., K) complex as ONE real
    matmul with a stacked contraction axis.

    XLA lowers a complex dot to FOUR real matmuls. For the framework's
    thin delay→subcarrier expansions (P = 9 paths, K = 599 bins) each of
    those runs the MXU at 9/128 contraction occupancy, so the four passes
    are pure overhead. Packing re/im into the contraction —

        [Re(a) Im(a)] @ [[Re(b)  Im(b)]
                         [-Im(b) Re(b)]]  =  [Re(ab) Im(ab)]

    — computes the same MACs in one pass at 18/128 occupancy: measured
    ~2× fewer MXU tile passes on the H = gains·F hot path. Accumulation
    order differs from the 4-matmul form at f32 rounding level only.
    """
    k = b.shape[-1]
    a2 = jnp.concatenate([jnp.real(a), jnp.imag(a)], axis=-1)  # (..., 2P)
    top = jnp.concatenate([jnp.real(b), jnp.imag(b)], axis=-1)  # (P, 2K)
    bot = jnp.concatenate([-jnp.imag(b), jnp.real(b)], axis=-1)
    w = jnp.concatenate([top, bot], axis=0)  # (2P, 2K)
    h2 = jnp.matmul(a2, w, precision=precision)
    return jax.lax.complex(h2[..., :k], h2[..., k:]).astype(jnp.complex64)

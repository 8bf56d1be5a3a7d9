"""Complex ↔ planar-real conversions (reference: src/utils.py:173-180)."""
from __future__ import annotations

import jax.numpy as jnp


def complex_to_real(x, axis: int = -1):
    """Stack (re, im) along ``axis`` (appended last by default)."""
    return jnp.stack([jnp.real(x), jnp.imag(x)], axis=axis)


def real_to_complex(x, axis: int = -1):
    """Inverse of :func:`complex_to_real`."""
    re = jnp.take(x, 0, axis=axis)
    im = jnp.take(x, 1, axis=axis)
    return re + 1j * im

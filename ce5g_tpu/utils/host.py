"""Device→host transfer helpers.

The axon TPU runtime (tunneled single-chip dev environment) does not
implement complex64 device→host transfers — ``np.asarray(complex_array)``
raises UNIMPLEMENTED. ``get_numpy`` works around it: complex leaves are
split into (real, imag) float32 pairs *on device* (one tiny jitted op) and
recombined on the host. Real leaves pass straight through. On CPU or
regular TPU runtimes this is just a minor extra copy.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_split = jax.jit(lambda x: (jnp.real(x), jnp.imag(x)))


def get_numpy(tree):
    """jax.device_get with complex leaves transferred as planar re/im."""

    def fetch(x):
        if hasattr(x, "dtype") and jnp.iscomplexobj(x):
            re, im = _split(x)
            out = np.asarray(jax.device_get(re)) + 1j * np.asarray(jax.device_get(im))
            return out.astype(np.complex64)
        return jax.device_get(x)

    return jax.tree.map(fetch, tree)

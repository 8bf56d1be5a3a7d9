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
_combine = jax.jit(jax.lax.complex)


def get_numpy(tree):
    """jax.device_get with complex leaves transferred as planar re/im."""

    def fetch(x):
        if hasattr(x, "dtype") and jnp.iscomplexobj(x):
            re, im = _split(x)
            out = np.asarray(jax.device_get(re)) + 1j * np.asarray(jax.device_get(im))
            return out.astype(np.complex64)
        return jax.device_get(x)

    return jax.tree.map(fetch, tree)


def put_complex(x):
    """Relay-safe device_put: complex HOST arrays are shipped as planar
    (re, im) float32 and recombined on device by a tiny jitted program —
    the axon relay implements neither direction of complex64 transfer
    (host→device fails the same way as device→host, deferred to first
    use). Real arrays pass straight through."""
    x = np.asarray(x)
    if np.iscomplexobj(x):
        re = jnp.asarray(np.ascontiguousarray(x.real, dtype=np.float32))
        im = jnp.asarray(np.ascontiguousarray(x.imag, dtype=np.float32))
        return _combine(re, im)
    return jnp.asarray(x)

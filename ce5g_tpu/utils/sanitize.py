"""Numeric sanitizers (SURVEY §5.2).

The reference's only sanitizers are NaN/Inf scans in its validation
scripts (test_phase1_transmission.py:105-107,
verify_phase3_datasets.py:96-113). TPU-native equivalents:

  * :func:`debug_nans` — context manager flipping ``jax_debug_nans`` so
    the first NaN-producing primitive raises with a traceback (re-runs
    the offending computation un-jitted);
  * :func:`assert_finite` — jittable finite-check over a pytree using
    ``checkify``-free ``jnp.isfinite`` reductions; returns a bool scalar
    (and optionally hard-fails on host);
  * :func:`finite_report` — host-side per-leaf NaN/Inf census used by the
    dataset verifier and available to the training loop.
"""
from __future__ import annotations

import contextlib
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np


@contextlib.contextmanager
def debug_nans(enable: bool = True):
    """Enable ``jax_debug_nans`` within the scope."""
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", enable)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)


def _leaf_finite(x) -> jax.Array:
    if jnp.iscomplexobj(x):
        return jnp.isfinite(x.real).all() & jnp.isfinite(x.imag).all()
    if jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating):
        return jnp.isfinite(x).all()
    return jnp.asarray(True)


def assert_finite(tree, name: str = "tree", hard: bool = False) -> jax.Array:
    """All-finite check over a pytree; jit/vmap-safe (returns bool scalar).

    With ``hard=True`` (host-side use only) raises ``FloatingPointError``
    when any leaf contains NaN/Inf.
    """
    flags = [_leaf_finite(x) for x in jax.tree.leaves(tree)]
    ok = jnp.stack(flags).all() if flags else jnp.asarray(True)
    if hard and not bool(ok):
        bad = finite_report(tree)
        raise FloatingPointError(f"non-finite values in {name}: {bad}")
    return ok


def finite_report(tree) -> Dict[str, Dict[str, int]]:
    """Host-side per-leaf census of NaN/Inf counts (non-finite leaves only)."""
    out: Dict[str, Dict[str, int]] = {}
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    for keypath, leaf in flat:
        a = np.asarray(jax.device_get(jnp.real(leaf) if jnp.iscomplexobj(leaf) else leaf))
        if a.dtype.kind not in "fc":
            continue
        nan, inf = int(np.isnan(a).sum()), int(np.isinf(a).sum())
        if jnp.iscomplexobj(leaf):
            b = np.asarray(jax.device_get(jnp.imag(leaf)))
            nan += int(np.isnan(b).sum())
            inf += int(np.isinf(b).sum())
        if nan or inf:
            out[jax.tree_util.keystr(keypath)] = {"nan": nan, "inf": inf}
    return out

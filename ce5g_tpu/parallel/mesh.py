"""Device mesh and sharding helpers.

The reference has no distributed layer at all (SURVEY §2.9: single-process
NumPy/torch). This module is the TPU-native equivalent required by the
north star: a ('data', 'model') mesh, NamedSharding helpers for batch (DP)
and weight (TP) sharding, and psum-reduced metrics over shard_map.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    data: Optional[int] = None,
    model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a ('data', 'model') mesh over the available devices.

    Defaults to all devices on the data axis. The data axis carries frame/
    batch sharding (embarrassingly parallel simulation + DP training); the
    model axis carries weight sharding for TP.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        data = n // model
    if data * model != n:
        raise ValueError(f"mesh {data}x{model} != {n} devices")
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, ("data", "model"))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-axis sharding (leading dim over 'data')."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(tree, mesh: Mesh):
    """device_put every array's leading axis over the 'data' axis."""
    s = data_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), tree)


def shard_model_state(state_tree, mesh: Mesh, min_size: int = 2):
    """Tensor-parallel weight sharding: shard the largest divisible axis of
    each ≥2-D parameter over the 'model' axis, replicate everything else.

    Works on any pytree of arrays (e.g. ``nnx.to_pure_dict(nnx.state(m))``).
    This is GSPMD-style TP: XLA inserts the all-gathers/reduce-scatters
    implied by the layout.
    """
    m = mesh.shape["model"]

    def spec_for(x):
        if m == 1 or x.ndim < min_size:
            return P()
        # prefer the last (feature/out-channel) axis, then any divisible one
        axes = [x.ndim - 1] + list(range(x.ndim - 1))
        for ax in axes:
            if x.shape[ax] % m == 0 and x.shape[ax] >= m:
                spec = [None] * x.ndim
                spec[ax] = "model"
                return P(*spec)
        return P()

    return jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, spec_for(x))), state_tree
    )


def psum_mean(value, axis_name: str = "data"):
    """Mean-reduce a per-shard mean across the mesh (for shard_map bodies)."""
    return jax.lax.pmean(value, axis_name)

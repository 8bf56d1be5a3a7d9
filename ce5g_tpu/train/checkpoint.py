"""Checkpoint I/O: model + optimizer state as flat npz archives.

Parity surface: reference src/utils.py:190-208 (save/load of
model_state_dict + optimizer_state_dict + epoch + loss) and
run_phase4_training.py:241-259 (resume restores optimizer state and the
epoch counter so training continues where it stopped). Here a checkpoint
is a directory: ``state.npz`` (model), optional ``opt_state.npz``
(optimizer), and ``meta.json`` (epoch, losses, trainer counters).
"""
from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import numpy as np
from flax import nnx


def _flatten(pure: Dict) -> Dict[str, np.ndarray]:
    """Flatten a pure nnx state dict to {'a/b/c': array} for npz."""
    flat, _ = jax.tree_util.tree_flatten_with_path(jax.tree.map(np.asarray, pure))
    arrays = {}
    for keypath, leaf in flat:
        name = "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in keypath)
        arrays[name] = np.asarray(leaf)
    return arrays


def _rebuild(template, loaded: Dict[str, np.ndarray], prefix=()):
    """Rebuild the pure-dict tree from the flat npz mapping, shaped like
    ``template``."""
    if isinstance(template, dict):
        return {
            k: _rebuild(v, loaded, prefix + (str(k),)) for k, v in template.items()
        }
    name = "/".join(prefix)
    return jax.numpy.asarray(loaded[name])


def _save_module_state(module, path: Path, filename: str) -> None:
    # PRNG-key variables (dropout streams) are session state, not weights —
    # excluded (they also can't serialize to npz).
    state = nnx.state(module, nnx.Not(nnx.RngState))
    np.savez(path / filename, **_flatten(nnx.to_pure_dict(state)))


def _load_module_state(module, path: Path, filename: str) -> None:
    state = nnx.state(module, nnx.Not(nnx.RngState))
    with np.load(path / filename) as z:
        loaded = {k: z[k] for k in z.files}
    nnx.replace_by_pure_dict(state, _rebuild(nnx.to_pure_dict(state), loaded))
    nnx.update(module, state)


def _save_rng_state(model, path: Path) -> None:
    """Serialize the model's PRNG streams (dropout keys + counts) so a
    resumed run draws the exact same dropout masks as an unbroken one.
    Typed key arrays are stored as their uint32 key data (name##key)."""
    pure = nnx.to_pure_dict(nnx.state(model, nnx.RngState))
    arrays = {}
    flat, _ = jax.tree_util.tree_flatten_with_path(pure)
    for keypath, leaf in flat:
        name = "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in keypath)
        leaf = jax.numpy.asarray(leaf)
        if jax.dtypes.issubdtype(leaf.dtype, jax.dtypes.prng_key):
            arrays[name + "##key"] = np.asarray(jax.random.key_data(leaf))
        else:
            arrays[name] = np.asarray(leaf)
    np.savez(path / "rng_state.npz", **arrays)


def _load_rng_state(model, path: Path) -> None:
    rng_path = path / "rng_state.npz"
    if not rng_path.exists():
        return  # older checkpoint: keep current streams
    with np.load(rng_path) as z:
        loaded = {k: z[k] for k in z.files}

    def rebuild(tree, prefix=()):
        if isinstance(tree, dict):
            return {k: rebuild(v, prefix + (str(k),)) for k, v in tree.items()}
        name = "/".join(prefix)
        if name + "##key" in loaded:
            return jax.random.wrap_key_data(jax.numpy.asarray(loaded[name + "##key"]))
        return jax.numpy.asarray(loaded[name])

    state = nnx.state(model, nnx.RngState)
    nnx.replace_by_pure_dict(state, rebuild(nnx.to_pure_dict(state)))
    nnx.update(model, state)


def save_checkpoint(
    path, model: nnx.Module, optimizer: Optional[nnx.Optimizer] = None, **metadata
) -> None:
    """Save model state (+ optimizer state, + JSON metadata) under ``path``
    (a directory). Passing ``optimizer`` makes the checkpoint resumable
    (reference utils.py:196 saves optimizer_state_dict unconditionally)."""
    path = Path(path)
    path.mkdir(parents=True, exist_ok=True)
    _save_module_state(model, path, "state.npz")
    if optimizer is not None:
        _save_module_state(optimizer, path, "opt_state.npz")
        _save_rng_state(model, path)
    (path / "meta.json").write_text(json.dumps(metadata, default=float, indent=2))


def load_checkpoint(
    path, model: nnx.Module, optimizer: Optional[nnx.Optimizer] = None
) -> Dict[str, Any]:
    """Restore state into ``model`` (and ``optimizer`` when given) in place;
    returns the metadata dict (reference utils.py:201-208)."""
    path = Path(path)
    _load_module_state(model, path, "state.npz")
    if optimizer is not None:
        opt_path = path / "opt_state.npz"
        if not opt_path.exists():
            raise FileNotFoundError(
                f"{opt_path} missing: checkpoint was saved without optimizer "
                "state and cannot resume training"
            )
        _load_module_state(optimizer, path, "opt_state.npz")
        _load_rng_state(model, path)
    meta_path = path / "meta.json"
    return json.loads(meta_path.read_text()) if meta_path.exists() else {}

"""Model checkpointing via orbax (reference utils.py:190-208 +
run_phase4_training.py:241-259 torch.save-dict parity: state + metadata)."""
from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
from flax import nnx


def save_checkpoint(path, model: nnx.Module, **metadata) -> None:
    """Save model state (+ JSON metadata) under ``path`` (a directory)."""
    path = Path(path)
    path.mkdir(parents=True, exist_ok=True)
    # PRNG-key variables (dropout streams) are session state, not model
    # weights — excluded (they also can't serialize to npz).
    state = nnx.state(model, nnx.Not(nnx.RngState))
    flat = jax.tree_util.tree_flatten_with_path(jax.tree.map(np.asarray, nnx.to_pure_dict(state)))
    arrays = {}
    for keypath, leaf in flat[0]:
        name = "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in keypath)
        arrays[name] = np.asarray(leaf)
    np.savez(path / "state.npz", **arrays)
    (path / "meta.json").write_text(json.dumps(metadata, default=float, indent=2))


def load_checkpoint(path, model: nnx.Module) -> Dict[str, Any]:
    """Restore state into ``model`` in place; returns the metadata dict."""
    path = Path(path)
    state = nnx.state(model, nnx.Not(nnx.RngState))
    pure = nnx.to_pure_dict(state)
    with np.load(path / "state.npz") as z:
        loaded = {k: z[k] for k in z.files}

    def rebuild(tree, prefix=()):
        if isinstance(tree, dict):
            return {k: rebuild(v, prefix + (str(k),)) for k, v in tree.items()}
        name = "/".join(prefix)
        return jax.numpy.asarray(loaded[name])

    nnx.replace_by_pure_dict(state, rebuild(pure))
    nnx.update(model, state)
    meta_path = path / "meta.json"
    return json.loads(meta_path.read_text()) if meta_path.exists() else {}

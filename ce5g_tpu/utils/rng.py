"""Deterministic key derivation.

Replaces the reference's ``set_seed(seed + start_idx)`` resume scheme
(reference: src/utils.py:13-22, run_phase3_robust.py:140-156) with
collision-free ``jax.random.fold_in`` chains: any sample of any split can be
regenerated independently on any shard.
"""
from __future__ import annotations

import jax

# Split names get stable integer tags (parity with the reference's
# split-keyed seeds {train:42, val:123, test:456},
# run_phase3_dataset_generation.py:98-101 — ours are tags, not seeds).
SPLIT_TAGS = {"train": 0, "val": 1, "test": 2}


def base_key(seed: int) -> jax.Array:
    return jax.random.key(seed)


def split_key(seed: int, split: str) -> jax.Array:
    return jax.random.fold_in(base_key(seed), SPLIT_TAGS.get(split, hash(split) % (2**31)))


def sample_key(seed: int, split: str, sample_idx) -> jax.Array:
    """Key for one dataset sample; pure function of (seed, split, idx)."""
    return jax.random.fold_in(split_key(seed, split), sample_idx)

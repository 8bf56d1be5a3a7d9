"""Sharded dataset factory (TPU-native rebuild of reference
src/dataset_generator.py, run_phase3_dataset_generation.py,
run_phase3_robust.py and verify_phase3_datasets.py): whole chunks of
frames are simulated + LS-estimated in one jit call, written as sharded
chunk files with a JSON manifest, resumable from deterministic per-sample
PRNG keys."""
from .atscale import generate_digest_split, online_train, verify_digest_chunk
from .generator import (
    DatasetGenerator,
    draw_params,
    generate_chunk_fn,
    read_split,
)
from .verify import verify_dataset
from .wiener import compute_wiener_sidecar

__all__ = [
    "DatasetGenerator",
    "draw_params",
    "generate_chunk_fn",
    "generate_digest_split",
    "online_train",
    "read_split",
    "verify_dataset",
    "verify_digest_chunk",
    "compute_wiener_sidecar",
]

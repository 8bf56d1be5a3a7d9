"""Sharded end-to-end steps: dataset generation and training over a mesh.

These are the pod-scale analogs of the reference's single-process loops
(SURVEY §2.9 "TPU-native equivalents"): frames shard over the 'data' axis
(each chip simulates its own frames — zero communication), statistics
reduce via psum/pmean, and the training step runs DP over 'data' with
optional TP weight sharding over 'model'.
"""
from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import ExperimentConfig
from ..data.generator import draw_params
from ..estimators.api import estimate_batch
from ..physics.simulate import simulate_batch, table_for
from ..utils.metrics import ber_approximation
from .mesh import data_sharding


def sharded_eval_stats_fn(cfg: ExperimentConfig, mesh: Mesh, estimator: str = "mmse_full"):
    """Build a jitted sharded pipeline: keys → per-config MSE/NMSE/BER stats.

    Frames shard over 'data'; the mean reductions become cross-device
    psums inserted by GSPMD. This is the allreduce-equivalent of the
    reference's evaluate_estimator aggregation (SURVEY §5.8).
    """
    table = table_for(cfg)

    def pipeline(keys):
        kp = jax.vmap(lambda k: jax.random.fold_in(k, 0))(keys)
        ks = jax.vmap(lambda k: jax.random.fold_in(k, 1))(keys)
        params = draw_params(kp, cfg)
        frames = simulate_batch(ks, params, cfg=cfg, table=table)
        h_est = estimate_batch(frames, cfg=cfg, estimator=estimator, table=table)
        err = jnp.mean(jnp.abs(frames.channel - h_est) ** 2, axis=(1, 2, 3, 4))
        power = jnp.mean(jnp.abs(frames.channel) ** 2, axis=(1, 2, 3, 4))
        nmse = err / (power + 1e-12)
        ber = ber_approximation(params.snr_db, nmse)
        return {
            "mse": jnp.mean(err),
            "nmse": jnp.mean(nmse),
            "nmse_db": 10.0 * jnp.log10(jnp.mean(nmse) + 1e-12),
            "ber": jnp.mean(ber),
        }

    shard = data_sharding(mesh)
    return jax.jit(pipeline, in_shardings=shard, out_shardings=NamedSharding(mesh, P()))


def sharded_generate_fn(cfg: ExperimentConfig, mesh: Mesh):
    """Jitted sharded dataset-chunk generator (keys sharded over 'data').

    Identical math to data.generator.generate_chunk_fn; the only
    difference is the explicit input sharding so each chip simulates its
    own shard of frames.
    """
    from ..data.generator import generate_chunk_fn

    fn = generate_chunk_fn(cfg, table_for(cfg))
    shard = data_sharding(mesh)
    return jax.jit(lambda keys: fn.__wrapped__(keys), in_shardings=shard)

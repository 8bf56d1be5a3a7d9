"""Multi-chip training step: DP over 'data' + TP weight sharding over
'model', expressed with jax.sharding + jit (GSPMD inserts the collectives:
psum of gradients over 'data', all-gathers for the TP layout).
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import nnx
from jax.sharding import Mesh

from ..config import ExperimentConfig
from ..models.factory import get_model
from ..models.inputs import apply_output_residual
from ..models.loss import channel_estimation_loss
from .mesh import data_sharding, shard_model_state


def make_sharded_train_state(
    cfg: ExperimentConfig, mesh: Mesh, model_type: Optional[str] = None
):
    """Build (model, optimizer) with TP-sharded weights on the mesh."""
    dtype = jnp.bfloat16 if cfg.training.mixed_precision else jnp.float32
    model = get_model(model_type or cfg.model.type, cfg.model, dtype=dtype, seed=cfg.seed)
    # Shard parameters + batch stats over the 'model' axis.
    state = nnx.state(model, nnx.Not(nnx.RngState))
    pure = nnx.to_pure_dict(state)
    sharded = shard_model_state(pure, mesh)
    nnx.replace_by_pure_dict(state, sharded)
    nnx.update(model, state)
    tx = optax.chain(
        optax.clip_by_global_norm(cfg.training.gradient_clip or 1.0),
        optax.adamw(cfg.training.learning_rate, weight_decay=cfg.training.weight_decay),
    )
    optimizer = nnx.Optimizer(model, tx, wrt=nnx.Param)
    return model, optimizer


def make_sharded_train_step(cfg: ExperimentConfig):
    """jit train step; batch arrives sharded over 'data', params carry
    their own (TP or replicated) shardings — XLA does the rest."""
    tr = cfg.training

    @nnx.jit(donate_argnames=("model", "optimizer"))
    def step(model, optimizer, inputs, targets, mask):
        def loss_fn(m):
            # same step semantics as every Trainer step builder: the
            # 7-channel wiener layout adds the wiener feature back onto
            # the prediction (residual head); 5-channel inputs pass through
            pred = apply_output_residual(m(inputs, train=True), inputs)
            return channel_estimation_loss(
                pred, targets, mask, tr.loss, tr.channel_weight, tr.pilot_weight
            )

        loss, grads = nnx.value_and_grad(loss_fn)(model)
        optimizer.update(model, grads)
        return loss

    return step


def run_one_sharded_step(
    cfg: ExperimentConfig,
    mesh: Mesh,
    batch_size: int = 8,
    grid: Tuple[int, int] = (14, 599),
    model_type: str = "cnn",
):
    """Build state, shard a synthetic batch, run ONE train step. Used by
    the driver's multichip dry-run and the sharding tests."""
    s, k = grid
    model, optimizer = make_sharded_train_state(cfg, mesh, model_type)
    step = make_sharded_train_step(cfg)
    key = jax.random.key(0)
    if model_type == "lstm":
        # sequence layout (models/inputs.py lstm_inputs): (B, S·K, 4),
        # masked loss not used on the flattened sequence (trainer parity)
        x = jax.random.normal(key, (batch_size, s * k, 4), jnp.float32)
        y = jax.random.normal(key, (batch_size, s * k, 2), jnp.float32)
        m = None
    else:
        x = jax.random.normal(
            key, (batch_size, s, k, cfg.model.input_channels), jnp.float32
        )
        y = jax.random.normal(key, (batch_size, s, k, 2), jnp.float32)
        m = jnp.zeros((batch_size, s, k), jnp.float32)
    shard = data_sharding(mesh)
    x, y = jax.device_put(x, shard), jax.device_put(y, shard)
    if m is not None:
        m = jax.device_put(m, shard)
    loss = step(model, optimizer, x, y, m)
    jax.block_until_ready(loss)
    return float(loss)

"""Channel-estimation loss (reference ChannelEstimationLoss,
src/ai_models.py:378-428): base MSE/MAE/Huber × channel_weight plus an
optional pilot-masked squared-error term × pilot_weight."""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp


def channel_estimation_loss(
    pred,
    target,
    pilot_mask=None,
    loss_type: str = "mse",
    channel_weight: float = 1.0,
    pilot_weight: float = 0.0,
):
    """Compute the weighted estimation loss.

    Args:
        pred/target: (..., 2) real/imag grids (any matching shapes).
        pilot_mask: optional mask broadcastable to pred[..., 0]; when given
            with pilot_weight > 0, adds mean((mask·err)²).
        loss_type: 'mse' | 'mae' | 'huber' (δ=1, torch SmoothL1 parity).
    """
    err = (pred - target).astype(jnp.float32)
    if loss_type == "mse":
        base = jnp.mean(err**2)
    elif loss_type == "mae":
        base = jnp.mean(jnp.abs(err))
    elif loss_type == "huber":
        a = jnp.abs(err)
        base = jnp.mean(jnp.where(a <= 1.0, 0.5 * err**2, a - 0.5))
    else:
        raise ValueError(f"Unknown loss type: {loss_type!r}")
    loss = channel_weight * base
    if pilot_mask is not None and pilot_weight > 0.0:
        masked = jnp.asarray(pilot_mask, jnp.float32)[..., None] * err
        loss = loss + pilot_weight * jnp.mean(masked**2)
    return loss

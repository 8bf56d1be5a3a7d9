"""Channel-estimation loss (reference ChannelEstimationLoss,
src/ai_models.py:378-428): base MSE/MAE/Huber × channel_weight plus an
optional pilot-masked term × pilot_weight. The pilot term applies the
SAME configured base loss to the masked tensors (the reference feeds
pred·mask / target·mask through its `self.criterion`), not a hard-coded
squared error."""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp


def _base_loss(err, loss_type: str):
    """Mean elementwise loss of an error tensor: torch MSELoss / L1Loss /
    SmoothL1Loss (δ=1) parity."""
    if loss_type == "mse":
        return jnp.mean(err**2)
    if loss_type == "mae":
        return jnp.mean(jnp.abs(err))
    if loss_type == "huber":
        a = jnp.abs(err)
        return jnp.mean(jnp.where(a <= 1.0, 0.5 * err**2, a - 0.5))
    raise ValueError(f"Unknown loss type: {loss_type!r}")


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
            with pilot_weight > 0, adds base_loss(mask·pred, mask·target)
            under the same ``loss_type`` (reference ai_models.py:424-426).
        loss_type: 'mse' | 'mae' | 'huber' (δ=1, torch SmoothL1 parity).
    """
    err = (pred - target).astype(jnp.float32)
    loss = channel_weight * _base_loss(err, loss_type)
    if pilot_mask is not None and pilot_weight > 0.0:
        masked = jnp.asarray(pilot_mask, jnp.float32)[..., None] * err
        loss = loss + pilot_weight * _base_loss(masked, loss_type)
    return loss

"""Channel-estimation loss (reference ChannelEstimationLoss,
src/ai_models.py:378-428): base MSE/MAE/Huber × channel_weight plus an
optional pilot-masked term × pilot_weight. The pilot term applies the
SAME configured base loss to the masked tensors (the reference feeds
pred·mask / target·mask through its `self.criterion`), not a hard-coded
squared error."""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp


def _base_loss(err, loss_type: str, target=None):
    """Mean elementwise loss of an error tensor: torch MSELoss / L1Loss /
    SmoothL1Loss (δ=1) parity, plus the TPU-native 'nmse' extension."""
    if loss_type == "mse":
        return jnp.mean(err**2)
    if loss_type == "mae":
        return jnp.mean(jnp.abs(err))
    if loss_type == "huber":
        a = jnp.abs(err)
        return jnp.mean(jnp.where(a <= 1.0, 0.5 * err**2, a - 0.5))
    if loss_type == "nmse":
        # Per-SAMPLE normalized MSE (round-4 extension, no reference
        # counterpart): mean over the batch of ‖err_i‖²/‖target_i‖².
        # This is exactly the evaluation metric (mean-of-ratios NMSE,
        # eval/evaluate.py _nmse_per_sample), so optimization and scoring
        # agree — plain MSE instead up-weights high-power samples.
        axes = tuple(range(1, err.ndim))
        e = jnp.mean(err**2, axis=axes)
        p = jnp.mean(jnp.asarray(target, jnp.float32) ** 2, axis=axes)
        return jnp.mean(e / (p + 1e-8))
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
    loss = channel_weight * _base_loss(err, loss_type, target)
    if pilot_mask is not None and pilot_weight > 0.0:
        m = jnp.asarray(pilot_mask, jnp.float32)[..., None]
        loss = loss + pilot_weight * _base_loss(m * err, loss_type, m * target)
    return loss

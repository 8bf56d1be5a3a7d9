"""CNN channel estimator (reference CNNChannelEstimator,
src/ai_models.py:17-73): Conv stack + BatchNorm + ReLU + Dropout, 1×1
output conv to 2 channels. NHWC, bf16-friendly."""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from flax import nnx


class ConvBlock(nnx.Module):
    """conv → batchnorm → relu → dropout."""

    def __init__(self, c_in, c_out, kernel, dropout, *, dtype, rngs):
        self.conv = nnx.Conv(
            c_in,
            c_out,
            kernel_size=(kernel, kernel),
            padding="SAME",
            dtype=dtype,
            param_dtype=jnp.float32,
            rngs=rngs,
        )
        self.bn = nnx.BatchNorm(
            c_out, dtype=dtype, param_dtype=jnp.float32, rngs=rngs
        )
        # reference nn.Dropout2d (ai_models.py:54) drops whole CHANNELS —
        # broadcast over the (S, K) spatial axes. Also ~40% faster train
        # steps: the elementwise variant drew 137M random bits per step.
        self.drop = nnx.Dropout(dropout, broadcast_dims=(1, 2), rngs=rngs)

    def __call__(self, x, train: bool = False):
        x = self.conv(x)
        x = self.bn(x, use_running_average=not train)
        x = nnx.relu(x)
        return self.drop(x, deterministic=not train)


class CNNChannelEstimator(nnx.Module):
    """(B, S, K, in_ch) → (B, S, K, 2) float32."""

    def __init__(
        self,
        in_channels: int = 5,
        hidden_channels: Tuple[int, ...] = (64, 128, 256, 128, 64),
        kernel_size: int = 3,
        dropout: float = 0.1,
        *,
        dtype=jnp.float32,
        rngs: nnx.Rngs,
    ):
        self.dtype = dtype
        blocks = []
        c_prev = in_channels
        for c in hidden_channels:
            blocks.append(
                ConvBlock(c_prev, c, kernel_size, dropout, dtype=dtype, rngs=rngs)
            )
            c_prev = c
        self.blocks = nnx.List(blocks)
        self.out = nnx.Conv(
            c_prev,
            2,
            kernel_size=(1, 1),
            dtype=dtype,
            param_dtype=jnp.float32,
            rngs=rngs,
        )

    def __call__(self, x, train: bool = False):
        x = jnp.asarray(x, self.dtype)
        for block in self.blocks:
            x = block(x, train=train)
        return self.out(x).astype(jnp.float32)

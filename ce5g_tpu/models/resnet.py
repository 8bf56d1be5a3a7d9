"""ResNet channel estimator (reference ResidualBlock /
ResNetChannelEstimator, src/ai_models.py:228-301): 7×7 input conv →
N residual blocks (conv-bn-relu-dropout-conv-bn + skip) → 1×1 out."""
from __future__ import annotations

import jax.numpy as jnp
from flax import nnx


class ResidualBlock(nnx.Module):
    def __init__(self, channels, dropout, *, dtype, rngs):
        kw = dict(dtype=dtype, param_dtype=jnp.float32, rngs=rngs)
        self.conv1 = nnx.Conv(channels, channels, kernel_size=(3, 3), padding="SAME", **kw)
        self.bn1 = nnx.BatchNorm(channels, **kw)
        self.conv2 = nnx.Conv(channels, channels, kernel_size=(3, 3), padding="SAME", **kw)
        self.bn2 = nnx.BatchNorm(channels, **kw)
        # reference nn.Dropout2d (ai_models.py:238): channel dropout,
        # mask broadcast over the (S, K) spatial axes
        self.drop = nnx.Dropout(dropout, broadcast_dims=(1, 2), rngs=rngs)

    def __call__(self, x, train: bool = False):
        y = self.conv1(x)
        y = self.bn1(y, use_running_average=not train)
        y = nnx.relu(y)
        y = self.drop(y, deterministic=not train)
        y = self.conv2(y)
        y = self.bn2(y, use_running_average=not train)
        return nnx.relu(x + y)


class ResNetChannelEstimator(nnx.Module):
    """(B, S, K, in_ch) → (B, S, K, 2) float32."""

    def __init__(
        self,
        in_channels: int = 5,
        base_channels: int = 64,
        num_blocks: int = 4,
        dropout: float = 0.1,
        *,
        dtype=jnp.float32,
        rngs: nnx.Rngs,
    ):
        self.dtype = dtype
        kw = dict(dtype=dtype, param_dtype=jnp.float32, rngs=rngs)
        self.stem = nnx.Conv(
            in_channels, base_channels, kernel_size=(7, 7), padding="SAME", **kw
        )
        self.stem_bn = nnx.BatchNorm(base_channels, **kw)
        self.blocks = nnx.List(
            ResidualBlock(base_channels, dropout, dtype=dtype, rngs=rngs)
            for _ in range(num_blocks)
        )
        self.out = nnx.Conv(base_channels, 2, kernel_size=(1, 1), **kw)

    def __call__(self, x, train: bool = False):
        x = jnp.asarray(x, self.dtype)
        x = nnx.relu(self.stem_bn(self.stem(x), use_running_average=not train))
        for block in self.blocks:
            x = block(x, train=train)
        return self.out(x).astype(jnp.float32)

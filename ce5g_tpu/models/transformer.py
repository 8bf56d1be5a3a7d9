"""Axial Transformer channel estimator.

The reference defines an AttentionBlock that is never wired into any model
(src/ai_models.py:304-324, SURVEY §2.3). This makes attention a real
estimator, shaped for the OFDM grid: alternating attention along the
subcarrier axis (frequency correlation) and the symbol axis (Doppler/time
correlation). Axial attention keeps sequence lengths at K and S instead of
S·K, so the QK/AV matmuls stay MXU-sized and memory stays O(S·K·(S+K))."""
from __future__ import annotations

import jax.numpy as jnp
from flax import nnx


class AxialBlock(nnx.Module):
    """Pre-LN attention over one grid axis + MLP, both residual."""

    def __init__(self, d_model, num_heads, dropout, *, dtype, rngs):
        kw = dict(dtype=dtype, param_dtype=jnp.float32, rngs=rngs)
        self.ln1 = nnx.LayerNorm(d_model, **kw)
        self.attn = nnx.MultiHeadAttention(
            num_heads=num_heads,
            in_features=d_model,
            decode=False,
            dtype=dtype,
            param_dtype=jnp.float32,
            rngs=rngs,
        )
        self.ln2 = nnx.LayerNorm(d_model, **kw)
        self.fc1 = nnx.Linear(d_model, 4 * d_model, **kw)
        self.fc2 = nnx.Linear(4 * d_model, d_model, **kw)
        self.drop = nnx.Dropout(dropout, rngs=rngs)

    def __call__(self, x, train: bool = False):
        # x: (batch', L, d) — caller folds the other grid axis into batch'.
        h = self.ln1(x)
        x = x + self.attn(h, deterministic=not train)
        h = self.fc2(nnx.gelu(self.fc1(self.ln2(x))))
        return x + self.drop(h, deterministic=not train)


class TransformerChannelEstimator(nnx.Module):
    """(B, S, K, in_ch) → (B, S, K, 2) float32."""

    def __init__(
        self,
        in_channels: int = 5,
        d_model: int = 64,
        num_heads: int = 4,
        num_layers: int = 2,
        dropout: float = 0.1,
        *,
        dtype=jnp.float32,
        rngs: nnx.Rngs,
    ):
        self.dtype = dtype
        self.d_model = d_model
        kw = dict(dtype=dtype, param_dtype=jnp.float32, rngs=rngs)
        self.embed = nnx.Linear(in_channels, d_model, **kw)
        # learned axial positional embeddings, added per axis
        init = nnx.initializers.normal(0.02)
        self.pos_s = nnx.Param(init(rngs.params(), (1, 256, 1, d_model), jnp.float32))
        self.pos_k = nnx.Param(init(rngs.params(), (1, 1, 4096, d_model), jnp.float32))
        self.freq_blocks = nnx.List(
            AxialBlock(d_model, num_heads, dropout, dtype=dtype, rngs=rngs)
            for _ in range(num_layers)
        )
        self.time_blocks = nnx.List(
            AxialBlock(d_model, num_heads, dropout, dtype=dtype, rngs=rngs)
            for _ in range(num_layers)
        )
        self.head = nnx.Linear(d_model, 2, **kw)

    def __call__(self, x, train: bool = False):
        x = jnp.asarray(x, self.dtype)
        b, s, k, _ = x.shape
        x = self.embed(x)
        x = x + self.pos_s[:, :s].astype(self.dtype) + self.pos_k[:, :, :k].astype(self.dtype)
        for fb, tb in zip(self.freq_blocks, self.time_blocks):
            # attention along subcarriers: fold S into batch
            x = fb(x.reshape(b * s, k, self.d_model), train=train).reshape(b, s, k, -1)
            # attention along symbols: fold K into batch
            x = jnp.swapaxes(x, 1, 2).reshape(b * k, s, self.d_model)
            x = tb(x, train=train).reshape(b, k, s, -1)
            x = jnp.swapaxes(x, 1, 2)
        return self.head(x).astype(jnp.float32)

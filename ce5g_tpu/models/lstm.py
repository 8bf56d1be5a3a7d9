"""Bidirectional multi-layer LSTM estimator (reference
LSTMChannelEstimator, src/ai_models.py:76-130): stacked biLSTM over a
flattened (S·K, 4) sequence, Linear head to 2.

TPU note: recurrence is a lax.scan (nnx.RNN) over the sequence axis —
inherently serial, kept for API parity; the hybrid/axial models are the
performant alternatives."""
from __future__ import annotations

import jax.numpy as jnp
from flax import nnx


class BiLSTMLayer(nnx.Module):
    """Forward + backward LSTM over axis 1, features concatenated."""

    def __init__(self, in_features, hidden, *, dtype, rngs):
        self.fwd = nnx.RNN(
            nnx.OptimizedLSTMCell(
                in_features, hidden, dtype=dtype, param_dtype=jnp.float32, rngs=rngs
            )
        )
        self.bwd = nnx.RNN(
            nnx.OptimizedLSTMCell(
                in_features, hidden, dtype=dtype, param_dtype=jnp.float32, rngs=rngs
            ),
            reverse=True,
            keep_order=True,
        )

    def __call__(self, x):
        return jnp.concatenate([self.fwd(x), self.bwd(x)], axis=-1)


class LSTMChannelEstimator(nnx.Module):
    """(B, L, in_features) → (B, L, 2) float32."""

    def __init__(
        self,
        in_features: int = 4,
        hidden_size: int = 256,
        num_layers: int = 3,
        bidirectional: bool = True,
        dropout: float = 0.2,
        *,
        dtype=jnp.float32,
        rngs: nnx.Rngs,
    ):
        self.dtype = dtype
        self.bidirectional = bidirectional
        layers = []
        f_in = in_features
        for _ in range(num_layers):
            if bidirectional:
                layers.append(BiLSTMLayer(f_in, hidden_size, dtype=dtype, rngs=rngs))
                f_in = 2 * hidden_size
            else:
                layers.append(
                    nnx.RNN(
                        nnx.OptimizedLSTMCell(
                            f_in,
                            hidden_size,
                            dtype=dtype,
                            param_dtype=jnp.float32,
                            rngs=rngs,
                        )
                    )
                )
                f_in = hidden_size
        self.layers = nnx.List(layers)
        # torch nn.LSTM applies dropout between layers only
        self.drop = nnx.Dropout(dropout, rngs=rngs)
        self.head = nnx.Linear(f_in, 2, dtype=dtype, param_dtype=jnp.float32, rngs=rngs)

    def __call__(self, x, train: bool = False):
        x = jnp.asarray(x, self.dtype)
        for i, layer in enumerate(self.layers):
            x = layer(x)
            if i + 1 < len(self.layers):
                x = self.drop(x, deterministic=not train)
        return self.head(x).astype(jnp.float32)

"""Hybrid CNN+LSTM estimator (reference HybridCNNLSTMEstimator,
src/ai_models.py:133-225). The reference runs a *Python loop of 599
sequential biLSTM calls* — one per subcarrier (:214-219). Here the
subcarrier axis folds into the batch axis, so all K time-sequences run as
ONE scanned biLSTM over the 14-symbol axis: identical math, batched for
the MXU."""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from flax import nnx

from .cnn import ConvBlock
from .lstm import BiLSTMLayer


class HybridCNNLSTMEstimator(nnx.Module):
    """(B, S, K, in_ch) → (B, S, K, 2) float32."""

    def __init__(
        self,
        in_channels: int = 5,
        cnn_channels: Tuple[int, ...] = (32, 64, 128),
        lstm_hidden: int = 256,
        lstm_layers: int = 2,
        dropout: float = 0.1,
        *,
        dtype=jnp.float32,
        rngs: nnx.Rngs,
    ):
        self.dtype = dtype
        blocks = []
        c_prev = in_channels
        for c in cnn_channels:
            blocks.append(ConvBlock(c_prev, c, 3, dropout, dtype=dtype, rngs=rngs))
            c_prev = c
        self.cnn = nnx.List(blocks)
        lstms = []
        f_in = c_prev
        for _ in range(lstm_layers):
            lstms.append(BiLSTMLayer(f_in, lstm_hidden, dtype=dtype, rngs=rngs))
            f_in = 2 * lstm_hidden
        self.lstm = nnx.List(lstms)
        self.head = nnx.Linear(f_in, 2, dtype=dtype, param_dtype=jnp.float32, rngs=rngs)

    def __call__(self, x, train: bool = False):
        x = jnp.asarray(x, self.dtype)
        b, s, k, _ = x.shape
        for block in self.cnn:
            x = block(x, train=train)
        # (B, S, K, C) → (B·K, S, C): every subcarrier is its own sequence.
        x = jnp.transpose(x, (0, 2, 1, 3)).reshape(b * k, s, x.shape[-1])
        for layer in self.lstm:
            x = layer(x)
        x = self.head(x)  # (B·K, S, 2)
        x = x.reshape(b, k, s, 2).transpose(0, 2, 1, 3)
        return x.astype(jnp.float32)

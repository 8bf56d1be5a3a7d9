"""Model factory (reference get_model, src/ai_models.py:327-375) and
parameter counting (reference utils.py:210-213)."""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import nnx

from ..config import ModelConfig
from .cnn import CNNChannelEstimator
from .hybrid import HybridCNNLSTMEstimator
from .lstm import LSTMChannelEstimator
from .resnet import ResNetChannelEstimator
from .transformer import TransformerChannelEstimator

MODEL_TYPES = ("cnn", "lstm", "hybrid", "cnn_lstm", "resnet", "transformer")


def get_model(
    model_type: str,
    cfg: ModelConfig,
    *,
    dtype=jnp.float32,
    seed: int = 0,
) -> nnx.Module:
    """Build a model by name. 'cnn_lstm' aliases 'hybrid' (reference
    ai_models.py:349)."""
    rngs = nnx.Rngs(seed)
    mt = model_type.lower()
    if mt == "cnn":
        return CNNChannelEstimator(
            in_channels=cfg.input_channels,
            hidden_channels=cfg.cnn_hidden_channels,
            kernel_size=cfg.cnn_kernel_size,
            dropout=cfg.cnn_dropout,
            dtype=dtype,
            rngs=rngs,
        )
    if mt == "lstm":
        return LSTMChannelEstimator(
            in_features=4,
            hidden_size=cfg.lstm_hidden_size,
            num_layers=cfg.lstm_num_layers,
            bidirectional=cfg.lstm_bidirectional,
            dropout=cfg.lstm_dropout,
            dtype=dtype,
            rngs=rngs,
        )
    if mt in ("hybrid", "cnn_lstm"):
        return HybridCNNLSTMEstimator(
            in_channels=cfg.input_channels,
            cnn_channels=cfg.hybrid_cnn_channels,
            lstm_hidden=cfg.hybrid_lstm_hidden,
            lstm_layers=cfg.hybrid_lstm_layers,
            dropout=cfg.cnn_dropout,
            dtype=dtype,
            rngs=rngs,
        )
    if mt == "resnet":
        return ResNetChannelEstimator(
            in_channels=cfg.input_channels,
            base_channels=cfg.resnet_base_channels,
            num_blocks=cfg.resnet_num_blocks,
            dropout=cfg.cnn_dropout,
            dtype=dtype,
            rngs=rngs,
        )
    if mt == "transformer":
        return TransformerChannelEstimator(
            in_channels=cfg.input_channels,
            dtype=dtype,
            rngs=rngs,
        )
    raise ValueError(f"Unknown model type: {model_type!r} (choose from {MODEL_TYPES})")


def count_parameters(model: nnx.Module) -> int:
    """Total trainable parameter count (reference utils.py:210-213)."""
    params = nnx.state(model, nnx.Param)
    return sum(int(x.size) for x in jax.tree.leaves(params))

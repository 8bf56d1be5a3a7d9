"""Neural channel estimators (TPU-native rebuild of reference
src/ai_models.py): CNN / LSTM / Hybrid / ResNet ports plus a working
axial Transformer (the reference's AttentionBlock at ai_models.py:304-324
is dead code — here it is a first-class model).

All grid models are NHWC ``(B, S, K, 5) -> (B, S, K, 2)`` so convolutions
map directly onto the MXU without layout transposes; compute dtype is
bfloat16 when requested, parameters stay float32.
"""
from .cnn import CNNChannelEstimator
from .factory import MODEL_TYPES, count_parameters, get_model
from .hybrid import HybridCNNLSTMEstimator
from .inputs import MLBatch, grid_inputs, lstm_inputs
from .loss import channel_estimation_loss
from .lstm import LSTMChannelEstimator
from .resnet import ResNetChannelEstimator
from .transformer import TransformerChannelEstimator

__all__ = [
    "CNNChannelEstimator",
    "LSTMChannelEstimator",
    "HybridCNNLSTMEstimator",
    "ResNetChannelEstimator",
    "TransformerChannelEstimator",
    "MODEL_TYPES",
    "count_parameters",
    "get_model",
    "MLBatch",
    "grid_inputs",
    "lstm_inputs",
    "channel_estimation_loss",
]

"""ce5g_tpu — TPU-native 5G MIMO-OFDM channel-estimation framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
``anish-dev09/CHANNEL-ESTIMATION-IN-5G-NETWORK`` (the importable package
name for ``channel-estimation-in-5g-network_tpu``): batched physics
simulation, classical LS/MMSE estimation, sharded dataset generation,
neural estimators and training, and evaluation/reporting — all designed
for TPU meshes (jit/vmap/shard_map) rather than per-frame Python loops.
"""

from .config import (
    ChannelConfig,
    DatasetConfig,
    ExperimentConfig,
    MIMOConfig,
    ModelConfig,
    OFDMConfig,
    PilotConfig,
    SimulationConfig,
    TrainingConfig,
    config_from_dict,
    load_config,
)

__version__ = "0.1.0"

__all__ = [
    "ChannelConfig",
    "DatasetConfig",
    "ExperimentConfig",
    "MIMOConfig",
    "ModelConfig",
    "OFDMConfig",
    "PilotConfig",
    "SimulationConfig",
    "TrainingConfig",
    "config_from_dict",
    "load_config",
]

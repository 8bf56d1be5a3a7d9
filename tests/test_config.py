"""Config loading tests: the YAML schema (reference
configs/experiment_config.yaml semantics, utils.py:25-29) must round-trip
into the typed frozen dataclasses, with defaults for missing sections."""
import dataclasses

import pytest

from ce5g_tpu import ExperimentConfig, load_config
from ce5g_tpu.config import config_from_dict


def test_repo_yaml_matches_defaults():
    """configs/experiment_config.yaml documents the defaults — loading it
    must produce exactly ExperimentConfig()."""
    cfg = load_config("configs/experiment_config.yaml")
    assert cfg == ExperimentConfig()


def test_load_none_is_defaults():
    assert load_config(None) == ExperimentConfig()


def test_reference_schema_fields():
    raw = {
        "ofdm": {"fft_size": 512, "cp_length": 36, "num_symbols": 7,
                 "useful_subcarriers": 300, "subcarrier_spacing": 30000},
        "mimo": {"num_tx_antennas": 4, "num_rx_antennas": 4},
        "channel": {"models": ["ETU"], "doppler_hz": [300],
                    "carrier_freq": 3.5e9},
        "pilots": {"density": [0.08], "pattern": "comb",
                   "interpolation": "nearest"},
        "simulation": {"snr_range": [0, 10], "num_frames": 7},
        "dataset": {"train_samples": 11, "save_format": "h5",
                    "chunk_size": 3},
        "model": {"type": "ResNet", "cnn": {"kernel_size": 5}},
        "training": {"epochs": 3, "batch_size": 2, "optimizer": "sgd",
                     "lr_scheduler": "step"},
        "seed": 7,
    }
    cfg = config_from_dict(raw)
    assert cfg.ofdm.fft_size == 512
    assert cfg.ofdm.num_used_subcarriers == 299  # DC-removal rule
    assert cfg.ofdm.sampling_rate == 512 * 30000
    assert cfg.mimo.num_tx == 4 and cfg.mimo.num_rx == 4
    assert cfg.channel.models == ("ETU",)
    assert cfg.pilots.pattern == "comb"
    assert cfg.simulation.snr_range_db == (0.0, 10.0)
    assert cfg.dataset.save_format == "h5"
    assert cfg.model.type == "resnet"
    assert cfg.model.cnn_kernel_size == 5
    assert cfg.training.optimizer == "sgd"
    assert cfg.seed == 7


def test_missing_sections_fall_back():
    cfg = config_from_dict({"mimo": {"num_tx_antennas": 1, "num_rx_antennas": 1}})
    d = ExperimentConfig()
    assert cfg.ofdm == d.ofdm
    assert cfg.training == d.training
    assert cfg.mimo.num_tx == 1


def test_config_is_hashable_static_arg():
    """Frozen dataclasses must be usable as static jit args."""
    cfg = ExperimentConfig()
    assert hash(cfg) == hash(dataclasses.replace(cfg))
    assert cfg == dataclasses.replace(cfg)
    assert cfg != dataclasses.replace(cfg, seed=cfg.seed + 1)

"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set env before the first jax import (the container's sitecustomize
pins JAX_PLATFORMS=axon, i.e. the tunneled TPU — tests should not compile
through the tunnel).
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = _flags + " --xla_force_host_platform_device_count=8"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def cfg():
    from ce5g_tpu import ExperimentConfig

    return ExperimentConfig()


@pytest.fixture(scope="session")
def small_cfg():
    """Tiny numerology for fast tests (keeps the 599-rule analog: 40-1=39)."""
    from ce5g_tpu import ExperimentConfig, OFDMConfig, MIMOConfig

    return ExperimentConfig(
        ofdm=OFDMConfig(fft_size=64, cp_length=8, num_symbols=6, useful_subcarriers=40),
        mimo=MIMOConfig(num_tx=2, num_rx=2),
    )

"""OFDM modulation / demodulation as batched JAX FFT ops.

Parity source: reference src/channel_simulator.py:130-203. The reference
loops symbol-by-symbol in Python; here the whole frame (and any leading batch
dims) goes through one batched IFFT/FFT. Conventions preserved exactly:

  modulate:   scatter used bins → ifftshift → IFFT · √N → prepend last
              ``cp_length`` samples as the cyclic prefix
  demodulate: strip CP → FFT / √N → fftshift → gather used bins

The used-bin rule (600 centered bins minus the DC bin → 599) comes from
``used_subcarrier_bins`` (reference channel_simulator.py:139-148).
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax.numpy as jnp

from ..config import OFDMConfig
from .profiles import used_subcarrier_bins


def _used_shifted(cfg: OFDMConfig) -> np.ndarray:
    shifted, _ = used_subcarrier_bins(cfg.fft_size, cfg.useful_subcarriers)
    return shifted


def modulate(symbols, cfg: OFDMConfig):
    """Frequency-domain symbols → CP-OFDM time signal.

    Args:
        symbols: (..., num_symbols, K) complex used-subcarrier values.
    Returns:
        (..., num_symbols, fft_size + cp_length) complex64 time signal.
    """
    shifted = _used_shifted(cfg)
    shape = symbols.shape[:-1] + (cfg.fft_size,)
    grid = jnp.zeros(shape, dtype=jnp.complex64)
    grid = grid.at[..., shifted].set(symbols.astype(jnp.complex64))
    time = jnp.fft.ifft(jnp.fft.ifftshift(grid, axes=-1), axis=-1) * np.sqrt(cfg.fft_size)
    cp = time[..., -cfg.cp_length :]
    return jnp.concatenate([cp, time], axis=-1).astype(jnp.complex64)


def demodulate(signal, cfg: OFDMConfig):
    """CP-OFDM time signal → used-subcarrier frequency symbols.

    Args:
        signal: (..., num_symbols, fft_size + cp_length) complex.
    Returns:
        (..., num_symbols, K) complex64.
    """
    shifted = _used_shifted(cfg)
    body = signal[..., cfg.cp_length :]
    freq = jnp.fft.fftshift(jnp.fft.fft(body, axis=-1), axes=-1) / np.sqrt(cfg.fft_size)
    return freq[..., shifted].astype(jnp.complex64)

"""Channel-estimation metrics as pure JAX functions.

Behavioral parity targets: reference src/utils.py:156-170,
src/baseline_estimators.py:315-337, run_phase5_evaluation.py:33-68.
All functions accept arbitrary leading batch dims; reductions are over the
trailing grid dims unless ``axes`` is given, so they compose with vmap/psum.
"""
from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax.numpy as jnp

_EPS = 1e-12


def db2linear(db):
    """10^(x/10) (reference: src/utils.py:39-41)."""
    return 10.0 ** (jnp.asarray(db) / 10.0)


def linear2db(x):
    """10·log10(x+1e-12) (reference: src/utils.py:44-46)."""
    return 10.0 * jnp.log10(jnp.asarray(x) + _EPS)


def mse(h_true, h_est, axes: Optional[Sequence[int]] = None):
    """Mean |H_true − H_est|² (reference: src/utils.py:161-163)."""
    err = jnp.abs(h_true - h_est) ** 2
    return jnp.mean(err, axis=tuple(axes) if axes is not None else None)


def nmse(h_true, h_est, axes: Optional[Sequence[int]] = None):
    """MSE / mean|H_true|² (reference: src/utils.py:166-170)."""
    ax = tuple(axes) if axes is not None else None
    m = jnp.mean(jnp.abs(h_true - h_est) ** 2, axis=ax)
    p = jnp.mean(jnp.abs(h_true) ** 2, axis=ax)
    return m / (p + _EPS)


def nmse_db(h_true, h_est, axes: Optional[Sequence[int]] = None):
    return linear2db(nmse(h_true, h_est, axes))


def evaluate_estimator(h_true, h_est) -> Dict[str, jnp.ndarray]:
    """MSE/NMSE/NMSE_dB dict (reference: src/baseline_estimators.py:315-337)."""
    m = mse(h_true, h_est)
    n = nmse(h_true, h_est)
    return {"mse": m, "nmse": n, "nmse_db": linear2db(n)}


def ber_approximation(snr_db, nmse_linear):
    """Analytic BER proxy used by the reference evaluation
    (reference: run_phase5_evaluation.py:57-68): effective SNR degraded by
    channel-estimation error, then ½·exp(−SNR_eff/2), clipped to [1e-6, 0.5].
    """
    snr_lin = db2linear(snr_db)
    eff = snr_lin / (1.0 + snr_lin * nmse_linear)
    ber = 0.5 * jnp.exp(-eff / 2.0)
    return jnp.clip(ber, 1e-6, 0.5)


def calculate_ber(tx_bits, rx_bits):
    """Exact bit-error rate (reference: src/utils.py:156-158)."""
    tx_bits = jnp.asarray(tx_bits)
    return jnp.sum(tx_bits != jnp.asarray(rx_bits)) / tx_bits.size


def awgn_noise(key, shape, snr_db, signal_power=1.0):
    """Complex AWGN for a given SNR and signal power
    (reference src/utils.py:49-68)."""
    import jax

    noise_power = signal_power / db2linear(snr_db)
    std = jnp.sqrt(noise_power / 2.0)
    kr, ki = jax.random.split(key)
    return (
        jax.random.normal(kr, shape) * std + 1j * jax.random.normal(ki, shape) * std
    ).astype(jnp.complex64)

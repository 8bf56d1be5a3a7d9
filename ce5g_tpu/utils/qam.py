"""Vectorized Gray-coded QAM modulation/demodulation.

Behavioral parity: reference src/utils.py:71-153 (QPSK + 16-QAM Gray maps,
minimum-distance demod). The reference's modulator has a latent bug — it
indexes a Python list with an ndarray (utils.py:107) and raises for array
input; we implement the clearly-intended mapping (constellation[gray_map[d]])
with device arrays. 64-QAM is added (declared in the reference config,
experiment_config.yaml:33, but never implemented there).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

_SQRT2 = np.sqrt(2.0)
_SQRT10 = np.sqrt(10.0)
_SQRT42 = np.sqrt(42.0)

# QPSK (reference: utils.py:93-94)
_QPSK_CONST = np.array([1 + 1j, -1 + 1j, 1 - 1j, -1 - 1j]) / _SQRT2
_QPSK_GRAY = np.array([0, 1, 3, 2])

# 16-QAM (reference: utils.py:96-102)
_QAM16_CONST = (
    np.array(
        [
            -3 - 3j, -3 - 1j, -3 + 3j, -3 + 1j,
            -1 - 3j, -1 - 1j, -1 + 3j, -1 + 1j,
            3 - 3j, 3 - 1j, 3 + 3j, 3 + 1j,
            1 - 3j, 1 - 1j, 1 + 3j, 1 + 1j,
        ]
    )
    / _SQRT10
)
_QAM16_GRAY = np.array([0, 1, 3, 2, 4, 5, 7, 6, 12, 13, 15, 14, 8, 9, 11, 10])


def _gray64() -> tuple[np.ndarray, np.ndarray]:
    # Separable Gray mapping per I/Q axis, standard 64-QAM.
    levels = np.array([-7, -5, -3, -1, 1, 3, 5, 7])
    gray3 = np.array([0, 1, 3, 2, 6, 7, 5, 4])  # 3-bit Gray sequence
    const = np.empty(64, dtype=complex)
    gray = np.empty(64, dtype=int)
    for i in range(8):
        for q in range(8):
            idx = i * 8 + q
            const[idx] = (levels[i] + 1j * levels[q]) / _SQRT42
            gray[idx] = gray3[i] * 8 + gray3[q]
    return const, gray


_QAM64_CONST, _QAM64_GRAY = _gray64()

_TABLES = {
    4: (_QPSK_CONST, _QPSK_GRAY),
    16: (_QAM16_CONST, _QAM16_GRAY),
    64: (_QAM64_CONST, _QAM64_GRAY),
}


def bits_per_symbol(M: int) -> int:
    return int(np.log2(M))


def qam_modulate(bits, M: int = 4):
    """Map a flat bit array to Gray-coded M-QAM symbols (complex64)."""
    if M not in _TABLES:
        raise NotImplementedError(f"Modulation order {M} not implemented")
    const, gray = _TABLES[M]
    k = bits_per_symbol(M)
    bits = jnp.asarray(bits)
    n_sym = bits.shape[-1] // k
    bit_matrix = bits[..., : n_sym * k].reshape(*bits.shape[:-1], n_sym, k)
    weights = 2 ** jnp.arange(k - 1, -1, -1)
    decimal = jnp.sum(bit_matrix * weights, axis=-1)
    mapped = jnp.asarray(gray)[decimal]
    return jnp.asarray(const, dtype=jnp.complex64)[mapped]


def qam_demodulate(symbols, M: int = 4):
    """Minimum-distance demod back to bits (reference: utils.py:112-153)."""
    if M not in _TABLES:
        raise NotImplementedError(f"Demodulation order {M} not implemented")
    const, gray = _TABLES[M]
    k = bits_per_symbol(M)
    symbols = jnp.asarray(symbols)
    d = jnp.abs(symbols[..., None] - jnp.asarray(const, dtype=symbols.dtype))
    detected = jnp.argmin(d, axis=-1)
    inverse_gray = jnp.asarray(np.argsort(gray))
    decimal = inverse_gray[detected]
    shifts = jnp.arange(k - 1, -1, -1)
    bits = (decimal[..., None] >> shifts) & 1
    return bits.reshape(*symbols.shape[:-1], -1)

"""MIMO equalization as batched small-matrix solves.

Parity source: reference src/baseline_estimators.py:273-312 — per
(symbol, subcarrier) Python loops forming (HᴴH + λI)⁻¹Hᴴy with λ = 1e-8
(ZF) or the hard-coded σ² = 0.01 (MMSE). Here every RE's T×T system is
solved in one batched ``jnp.linalg.solve`` (T ≤ 4 ⇒ tiny, fully fused).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_HI = jax.lax.Precision.HIGHEST


def equalize_channel(rx_symbols, h_est, method: str = "zf", noise_var: float = 0.01):
    """Equalize received symbols with an estimated channel.

    Args:
        rx_symbols: (..., S, R, K) complex.
        h_est: (..., S, R, T, K) complex.
        method: 'zf' (λ=1e-8 ridge, reference :297) or 'mmse' (σ²,
            reference :306 hard-codes 0.01).

    Returns:
        (..., S, T, K) complex64 equalized symbols.
    """
    if method == "zf":
        lam = 1e-8
    elif method == "mmse":
        lam = noise_var
    else:
        raise ValueError(f"Unknown equalization method: {method!r}")

    h = jnp.moveaxis(h_est, -1, -3)  # (..., S, K, R, T)
    y = jnp.moveaxis(rx_symbols, -1, -2)[..., None]  # (..., S, K, R, 1)
    hh = jnp.conj(jnp.swapaxes(h, -1, -2))  # (..., S, K, T, R)
    a = jnp.matmul(hh, h, precision=_HI) + lam * jnp.eye(h.shape[-1], dtype=h.dtype)
    x = jnp.linalg.solve(a, jnp.matmul(hh, y, precision=_HI))[..., 0]
    return jnp.moveaxis(x, -1, -2).astype(jnp.complex64)  # (..., S, T, K)

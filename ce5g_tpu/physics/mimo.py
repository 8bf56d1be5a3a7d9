"""MIMO channel: frequency response, channel application, AWGN.

Parity source: reference src/channel_simulator.py:263-345.

TPU-first redesigns (all mathematically equivalent to the reference):
  * Frequency response — the reference FFTs a zero-padded CIR snapshot per
    (symbol, rx, tx) in Python loops (:300-309). Since the CIR is a sparse
    sum of ≤9 taps, H equals a path-contraction against the precomputed
    delay→bin matrix ``F``:  H[s,r,t,k] = Σ_p g[s,r,t,p] · F[p,k] — one
    batched matmul on the MXU, no FFT.
  * Channel application — the reference does 14×599 tiny (R×T)@(T,) matvecs
    in Python loops (:330-334); here it is one einsum.
  * AWGN — noise power is tied to the *measured* mean received power of the
    whole frame, exactly like the reference (:337-343).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

# Simulation/estimation matmuls are tiny contractions (paths, antennas);
# full-f32 precision costs nothing and avoids TPU bf16-matmul noise
# corrupting the simulated channel or the Wiener cancellation.
_HI = jax.lax.Precision.HIGHEST


def frequency_response(path_gains, freq_matrix):
    """Per-subcarrier channel from per-path gains.

    Args:
        path_gains: (..., S, R, T, P) complex — symbol-sampled path gains
            (already scaled by sqrt path power and collision weights).
        freq_matrix: (P, K) or (..., P, K) complex delay→used-bin matrix.

    Returns:
        (..., S, R, T, K) complex64 channel frequency response.
    """
    if freq_matrix.ndim == 2:
        return jnp.einsum("...srtp,pk->...srtk", path_gains, freq_matrix, precision=_HI)
    return jnp.einsum("...srtp,...pk->...srtk", path_gains, freq_matrix, precision=_HI)


def apply_channel(key, tx_symbols, channel_response, snr_db):
    """y = H·x per RE + AWGN at measured signal power.

    Args:
        key: PRNG key for the noise draw.
        tx_symbols: (..., S, T, K) complex.
        channel_response: (..., S, R, T, K) complex.
        snr_db: scalar or (...,) per-frame SNR in dB.

    Returns:
        (..., S, R, K) complex64 received symbols.
    """
    received = jnp.einsum(
        "...srtk,...stk->...srk", channel_response, tx_symbols, precision=_HI
    )

    # Per-frame measured signal power (reference :337): mean over the frame's
    # own (S, R, K) axes so batched frames each get their own noise scale.
    frame_axes = tuple(range(received.ndim - 3, received.ndim))
    signal_power = jnp.mean(jnp.abs(received) ** 2, axis=frame_axes)
    snr_linear = 10.0 ** (jnp.asarray(snr_db, jnp.float32) / 10.0)
    noise_power = signal_power / snr_linear
    noise_std = jnp.sqrt(noise_power / 2.0)

    kr, ki = jax.random.split(key)
    shape = received.shape
    noise = jax.lax.complex(
        jax.random.normal(kr, shape, jnp.float32),
        jax.random.normal(ki, shape, jnp.float32),
    )
    bcast = noise_std.reshape(noise_std.shape + (1,) * 3)
    return (received + noise * bcast).astype(jnp.complex64)


def time_domain_apply(tx_signal, dense_gains, delay_samples, path_valid):
    """Apply the time-varying FIR channel sample-by-sample (exact TD chain).

    y_r(t) = Σ_p Σ_t' g[t, r, t', p] · x_{t'}(t − d_p)

    Args:
        tx_signal: (..., T, N) complex time-domain signal per TX antenna
            (symbols already serialized: N = S·(fft+cp)).
        dense_gains: (..., N, R, T, P) complex per-sample path gains
            (collision-resolved amplitudes included).
        delay_samples: (P,) int32 static tap delays for this profile.
        path_valid: (P,) float path validity weights.

    Returns:
        (..., R, N) complex received signal (pre-noise).
    """
    num_paths = delay_samples.shape[0]
    n = tx_signal.shape[-1]

    def shifted(p):
        d = delay_samples[p]
        rolled = jnp.roll(tx_signal, d, axis=-1)
        # zero the wrapped head: samples before t = d had no input
        idx = jnp.arange(n)
        keep = (idx >= d).astype(tx_signal.real.dtype)
        return rolled * keep

    y = jnp.zeros(tx_signal.shape[:-2] + dense_gains.shape[-3:-2] + (n,), jnp.complex64)
    for p in range(num_paths):  # static tiny loop over ≤9 paths
        x_p = shifted(p)  # (..., T, N)
        g_p = dense_gains[..., :, :, p] * path_valid[p]  # (..., N, R, T)
        y = y + jnp.einsum("...nrt,...tn->...rn", g_p, x_p, precision=_HI)
    return y

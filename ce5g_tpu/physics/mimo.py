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
    from ..utils.complexify import packed_complex_matmul

    if freq_matrix.ndim == 2:
        # thin contraction (P=9): packed form halves the MXU tile passes
        return packed_complex_matmul(path_gains, freq_matrix, precision=_HI)
    return jnp.einsum("...srtp,...pk->...srtk", path_gains, freq_matrix, precision=_HI)


def _add_awgn(key, received, snr_db):
    """AWGN at the frame's measured mean received power (reference :337-343).

    Per-frame power: mean over the trailing (S, R, K) axes so batched
    frames each get their own noise scale."""
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
    return _add_awgn(key, received, snr_db)


def apply_channel_common_grid(key, tx_grid, path_gains, freq_matrix, snr_db):
    """y = H·x + AWGN for the common-grid case, without re-reading H.

    Every reference call-site transmits the SAME grid on all TX antennas
    (channel_simulator.py:402-404, SURVEY §2.2), so by linearity
    y[s,r,k] = Σ_t H[s,r,t,k]·x[s,k] = ((Σ_t g)[s,r,:] @ F)[k] · x[s,k] —
    the TX sum moves onto the tiny path-gain tensor BEFORE the delay→bin
    expansion. This skips the (..., S, R, T, K) read of H (≈275 MB/256
    frames — the single largest HBM consumer in the profile) and the
    T-thin dot_general. Identical math to apply_channel up to f32
    summation order; parity tests are statistical (realized SNR, NMSE).

    Args:
        tx_grid: (..., S, K) complex — the grid shared by all TX antennas.
        path_gains: (..., S, R, T, P) complex symbol-sampled gains.
        freq_matrix: (P, K) or (..., P, K) delay→bin matrix.
    """
    from ..utils.complexify import packed_complex_matmul

    gsum = jnp.sum(path_gains, axis=-2)  # (..., S, R, P)
    if freq_matrix.ndim == 2:
        hsum = packed_complex_matmul(gsum, freq_matrix, precision=_HI)
    else:
        hsum = jnp.einsum("...srp,...pk->...srk", gsum, freq_matrix, precision=_HI)
    received = hsum * tx_grid[..., :, None, :]
    return _add_awgn(key, received, snr_db)


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

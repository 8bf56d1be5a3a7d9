"""Jakes sum-of-sinusoids Rayleigh fading, batched for TPU.

Parity source: reference src/channel_simulator.py:84-127 — per path and per
(tx, rx) pair, 20 oscillators with random arrival angles and phases:

    h(t) = (Σ_n cos(2π·fd·cos(a_n)·t + φ_n) + j Σ_n sin(...)) / sqrt(2N)

The reference evaluates this with a 4-deep Python loop over
path × tx × rx × oscillator at every one of the 15,344 time samples per
frame (~11M scalar trig evals per 2×2 frame — its #1 hot loop, SURVEY §3.1).

TPU-first redesign: the frequency-domain pipeline only ever reads the CIR at
the 14 symbol-start samples (channel_simulator.py:300-302), so we evaluate
the oscillator sum *only at the requested times* as one fused elementwise
contraction over an (..., P, R, T, O, S) tensor — a few million VPU flops
per batch, no loops, no dense CIR. The dense time series (needed by the
time-domain TX/RX chain) uses the same kernel evaluated on chunked time
blocks via ``lax.map`` to bound memory.

Distributional parity note: the reference uses NumPy MT19937 draws; exact
bit parity is impossible with JAX's counter-based PRNG, so parity is
statistical (same law: angles, phases ~ U(0, 2π) i.i.d. per
(path, rx, tx, oscillator)), which BASELINE.md's SNR/MSE-bound criterion
permits.

Normalization parity quirk: the reference divides the N-oscillator sum by
sqrt(2N) (channel_simulator.py:124). Since Σ_n cos(ω_n t + φ_n) with i.i.d.
uniform phases has variance N/2, the resulting complex fading has
E|h|² = 1/2 per path — NOT unit power. The total channel power is therefore
0.5 · Σ_p(kept) power_p. We reproduce this exactly; tests pin it down.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def jakes_oscillator_params(key, num_paths: int, num_rx: int, num_tx: int, num_osc: int):
    """Draw per-(path, rx, tx, oscillator) angles and phases ~ U(0, 2π)."""
    ka, kp = jax.random.split(key)
    shape = (num_paths, num_rx, num_tx, num_osc)
    two_pi = 2.0 * jnp.pi
    angles = two_pi * jax.random.uniform(ka, shape, dtype=jnp.float32)
    phases = two_pi * jax.random.uniform(kp, shape, dtype=jnp.float32)
    return angles, phases


def jakes_gains_at_times(angles, phases, doppler_hz, times):
    """Evaluate the Jakes fading process at arbitrary times.

    Args:
        angles, phases: (P, R, T, O) oscillator parameters.
        doppler_hz: scalar max Doppler frequency.
        times: (S,) sample times in seconds.

    Returns:
        complex64 gains of shape (S, R, T, P), unit average power per path.

    Layout note (TPU): the VPU vectorizes over the LAST axis (128 lanes).
    The trig argument tensor is built as (S, P·R·T·O) — time on sublanes,
    the flattened oscillator population (≈2880 for 4×4×9×20) on lanes — so
    cos/sin run at full lane occupancy; with S last (only 14 wide) the
    same computation measured ~3× slower. The (S,P,R,T) → (S,R,T,P)
    transpose afterwards touches only S·P·R·T ≈ 2k elements per frame.
    """
    p, r, t, o = angles.shape
    two_pi = 2.0 * jnp.pi
    omega = two_pi * doppler_hz * jnp.cos(angles)  # (P,R,T,O) Doppler radians/s
    # arg[s, (p,r,t,o)] = ω·t_s + φ
    arg = (
        times[:, None] * omega.reshape(1, -1) + phases.reshape(1, -1)
    )  # (S, P·R·T·O)
    scale = 1.0 / jnp.sqrt(2.0 * o)
    h = jax.lax.complex(jnp.cos(arg), jnp.sin(arg)).reshape(-1, p, r, t, o)
    h = jnp.sum(h, axis=-1) * scale  # (S, P, R, T)
    return jnp.transpose(h, (0, 2, 3, 1))  # (S,R,T,P)


def path_gains_symbol_sampled(
    key,
    doppler_hz,
    amp,
    num_symbols: int,
    samples_per_symbol: int,
    sampling_rate: float,
    num_rx: int,
    num_tx: int,
    num_osc: int = 20,
):
    """Per-path complex gains at each OFDM symbol start.

    Matches the reference's CIR snapshots at ``sym_idx * samples_per_symbol``
    (channel_simulator.py:300-302), scaled by sqrt(path power) ``amp``
    (channel_simulator.py:104, :125).

    Args:
        key: PRNG key for this frame.
        doppler_hz: scalar Doppler.
        amp: (P,) per-path amplitude weights (already collision-resolved).
    Returns:
        complex64 (num_symbols, num_rx, num_tx, P).
    """
    num_paths = amp.shape[-1]
    angles, phases = jakes_oscillator_params(key, num_paths, num_rx, num_tx, num_osc)
    t = (
        jnp.arange(num_symbols, dtype=jnp.float32)
        * (samples_per_symbol / sampling_rate)
    )
    g = jakes_gains_at_times(angles, phases, doppler_hz, t)  # (S,R,T,P)
    return g * amp.astype(g.dtype)


def dense_fading(
    key,
    doppler_hz,
    amp,
    num_samples: int,
    sampling_rate: float,
    num_rx: int,
    num_tx: int,
    num_osc: int = 20,
    block: int = 2048,
):
    """Dense per-sample fading gains for the time-domain chain.

    Returns complex64 (num_samples, R, T, P); evaluated in ``block``-sized
    time chunks (lax.map) so the (P,R,T,O,block) intermediate stays small.
    The trailing partial block is computed via padding and trimmed.
    """
    num_paths = amp.shape[-1]
    angles, phases = jakes_oscillator_params(key, num_paths, num_rx, num_tx, num_osc)
    padded = -(-num_samples // block) * block
    starts = jnp.arange(0, padded, block)

    def one_block(start):
        t = (start + jnp.arange(block, dtype=jnp.float32)) / sampling_rate
        return jakes_gains_at_times(angles, phases, doppler_hz, t)

    g = jax.lax.map(one_block, starts)  # (nblk, block, R, T, P)
    g = g.reshape(padded, num_rx, num_tx, num_paths)[:num_samples]
    return g * amp.astype(g.dtype)

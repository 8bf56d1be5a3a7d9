"""Sequence-parallel time-domain channel simulation (overlap-save).

The reference generates the fading process monolithically per frame
(15,344 samples; 50-symbol extended demos) — SURVEY §5.7 flags the TPU
equivalent we must provide: split the fading-process time axis into blocks
across devices and exchange FIR boundary taps between neighbors.

Physics: the received signal is y(t) = Σ_p g_p(t)·x(t−d_p) with tap delays
up to 77 samples (ETU @ 15.36 MHz). If each device owns a contiguous time
block, the first ``max_delay`` outputs of block i need the last
``max_delay`` *input* samples of block i−1 — a halo. Overlap-save: each
device receives its left neighbor's input tail via ``jax.lax.ppermute``
over the 'data' axis (one ICI hop), prepends it, computes its block, and
keeps only its own outputs. Device 0 receives zeros (signal start).

The Jakes gains are evaluated per block at absolute times (the oscillator
parameters are broadcast; evaluation is embarrassingly parallel), so the
sharded result is bit-identical to the monolithic one — asserted in
tests/test_time_sharded.py.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..physics.jakes import jakes_gains_at_times, jakes_oscillator_params


def _block_apply(x_with_halo, gains, delay_samples, path_valid, halo: int):
    """Apply the time-varying FIR to one block given a left input halo.

    Args:
        x_with_halo: (T, halo + L) input samples (halo first).
        gains: (L, R, T, P) per-sample gains for the block's own samples.
        delay_samples: (P,) tap delays (all ≤ halo).
    Returns:
        (R, L) block outputs.
    """
    num_paths = delay_samples.shape[0]
    l = gains.shape[0]
    y = jnp.zeros(gains.shape[1:2] + (l,), jnp.complex64)  # (R, L)
    for p in range(num_paths):
        d = delay_samples[p]
        # x(t - d) for t in the block = slice starting at halo - d
        x_p = jax.lax.dynamic_slice_in_dim(x_with_halo, halo - d, l, axis=-1)
        g_p = gains[..., p] * path_valid[p]  # (L, R, T)
        y = y + jnp.einsum(
            "lrt,tl->rl", g_p, x_p, precision=jax.lax.Precision.HIGHEST
        )
    return y


def sharded_time_domain_apply(
    mesh: Mesh,
    tx_serial: jax.Array,
    key: jax.Array,
    doppler_hz,
    amp: jax.Array,
    delay_samples: jax.Array,
    path_valid: jax.Array,
    sampling_rate: float,
    num_rx: int,
    num_tx: int,
    num_osc: int = 20,
    halo: int = 128,
    axis: str = "data",
):
    """Time-sharded fading + FIR application over the mesh's ``axis``.

    Args:
        tx_serial: (T, N) serialized transmit signal; N must divide by the
            axis size. Replicated input; each device computes its block.
        key: frame key (oscillator params are derived identically on every
            device — no broadcast needed).
        halo: boundary-tap overlap, ≥ max delay (77 for ETU). Padded to a
            lane-friendly 128 by default.

    Returns:
        (R, N) received signal (pre-noise), sharded over the time axis.
    """
    n_dev = mesh.shape[axis]
    t_ants, n = tx_serial.shape
    assert n % n_dev == 0, (n, n_dev)
    block = n // n_dev

    num_paths = amp.shape[-1]
    angles, phases = jakes_oscillator_params(key, num_paths, num_rx, num_tx, num_osc)

    def body(x_block):
        # x_block: (T, block) — this device's input slice
        idx = jax.lax.axis_index(axis)
        # halo exchange: receive left neighbor's tail (device i-1 → i)
        tail = x_block[:, -halo:]
        left_tail = jax.lax.ppermute(
            tail, axis, [(i, (i + 1) % n_dev) for i in range(n_dev)]
        )
        left_tail = jnp.where(idx == 0, jnp.zeros_like(left_tail), left_tail)
        x_halo = jnp.concatenate([left_tail, x_block], axis=-1)

        # absolute-time Jakes gains for this block
        t0 = idx * block
        times = (t0 + jnp.arange(block, dtype=jnp.float32)) / sampling_rate
        gains = jakes_gains_at_times(angles, phases, doppler_hz, times)  # (L,R,T,P)
        gains = gains * amp.astype(gains.dtype)

        return _block_apply(x_halo, gains, delay_samples, path_valid, halo)

    shard = NamedSharding(mesh, P(None, axis))
    x_sharded = jax.device_put(tx_serial, shard)
    fn = jax.shard_map(
        body, mesh=mesh, in_specs=P(None, axis), out_specs=P(None, axis)
    )
    return fn(x_sharded)


def reference_time_domain_apply(
    tx_serial, key, doppler_hz, amp, delay_samples, path_valid,
    sampling_rate, num_rx, num_tx, num_osc=20,
):
    """Monolithic single-device equivalent (for equality testing)."""
    from ..physics.mimo import time_domain_apply

    num_paths = amp.shape[-1]
    angles, phases = jakes_oscillator_params(key, num_paths, num_rx, num_tx, num_osc)
    n = tx_serial.shape[-1]
    times = jnp.arange(n, dtype=jnp.float32) / sampling_rate
    gains = jakes_gains_at_times(angles, phases, doppler_hz, times)
    gains = gains * amp.astype(gains.dtype)
    return time_domain_apply(tx_serial, gains, delay_samples, path_valid)

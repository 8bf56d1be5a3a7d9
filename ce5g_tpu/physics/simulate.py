"""Top-level frame simulation: the batched analog of
``simulate_transmission`` (reference src/channel_simulator.py:348-421).

Design: one pure function per frame, driven by a single PRNG key and a
``FrameParams`` pytree of per-frame draw values (profile index, Doppler,
SNR, pilot density). ``simulate_batch`` vmaps it over frames — each batch
may freely mix channel models / Dopplers / SNRs / densities because the
profile table is padded (see physics/profiles.py) and pilot shapes are fixed
(see physics/pilots.py).

Reference behavior reproduced exactly (same math, batched):
  * unit-modulus random-phase pilot & data symbols exp(j·U(0,2π)) (:395-399);
  * the SAME grid is transmitted on every TX antenna (:402-404) — there are
    no orthogonal per-antenna pilots (SURVEY §2.2 quirk; estimators see the
    superposition Σ_tx H·x). Set ``orthogonal_pilots=True`` for the
    physically sensible per-antenna-phase variant (an extension, off by
    default for parity);
  * channel sampled at symbol starts, frequency response over the
    599 DC-removed bins, AWGN at measured frame power.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..config import ExperimentConfig
from .jakes import path_gains_symbol_sampled, dense_fading
from .mimo import (
    apply_channel,
    apply_channel_common_grid,
    frequency_response,
    time_domain_apply,
)
from .ofdm import demodulate, modulate
from .pilots import PilotPattern, make_pattern
from .profiles import ProfileTable, build_profile_table


class FrameParams(NamedTuple):
    """Per-frame simulation parameters (each may be a scalar or a batch)."""

    profile_idx: jax.Array  # int32 index into PROFILE_NAMES
    doppler_hz: jax.Array
    snr_db: jax.Array
    pilot_density: jax.Array


class Frame(NamedTuple):
    """Simulated frame (reference return dict, channel_simulator.py:412-421)."""

    tx_symbols: jax.Array  # (S, T, K) complex64
    rx_symbols: jax.Array  # (S, R, K) complex64
    channel: jax.Array  # (S, R, T, K) complex64  (H_true)
    pilot_mask: jax.Array  # (S, K) float32
    pilot_positions: jax.Array  # (P_max, 2) int32
    pilot_valid: jax.Array  # (P_max,) float32
    num_pilots: jax.Array  # () int32
    params: FrameParams


def table_for(cfg: ExperimentConfig) -> ProfileTable:
    return build_profile_table(
        cfg.ofdm.sampling_rate, cfg.ofdm.fft_size, cfg.ofdm.useful_subcarriers
    )


def _amp_for(table: ProfileTable, cfg: ExperimentConfig, profile_idx):
    amp_table = (
        table.amp_overwrite
        if cfg.channel.tap_collision == "overwrite"
        else table.amp_accumulate
    )
    return jnp.asarray(amp_table)[profile_idx]  # (P,)


def _tx_grid(key, num_symbols: int, num_sc: int, num_tx: int, orthogonal: bool):
    """Unit-modulus random-phase grid; same on all TX antennas unless
    ``orthogonal`` (then independent per antenna)."""
    if orthogonal:
        phases = jax.random.uniform(
            key, (num_symbols, num_tx, num_sc), minval=0.0, maxval=2.0 * jnp.pi
        )
    else:
        phases = jax.random.uniform(
            key, (num_symbols, 1, num_sc), minval=0.0, maxval=2.0 * jnp.pi
        )
        phases = jnp.broadcast_to(phases, (num_symbols, num_tx, num_sc))
    return jnp.exp(1j * phases).astype(jnp.complex64)


def simulate_frame(
    key,
    params: FrameParams,
    *,
    cfg: ExperimentConfig,
    table: Optional[ProfileTable] = None,
    orthogonal_pilots: bool = False,
) -> Frame:
    """Simulate one MIMO-OFDM frame in the frequency domain (main path)."""
    if table is None:
        table = table_for(cfg)
    ofdm, mimo = cfg.ofdm, cfg.mimo
    num_sc = ofdm.num_used_subcarriers
    k_pilot, k_tx, k_fade, k_noise = jax.random.split(key, 4)

    pattern = make_pattern(
        k_pilot,
        ofdm.num_symbols,
        num_sc,
        params.pilot_density,
        cfg.pilots.pattern,
        cfg.pilots.max_density,
    )

    tx = _tx_grid(k_tx, ofdm.num_symbols, num_sc, mimo.num_tx, orthogonal_pilots)

    amp = _amp_for(table, cfg, params.profile_idx)
    gains = path_gains_symbol_sampled(
        k_fade,
        params.doppler_hz,
        amp,
        ofdm.num_symbols,
        ofdm.samples_per_symbol,
        ofdm.sampling_rate,
        mimo.num_rx,
        mimo.num_tx,
        cfg.channel.num_oscillators,
    )  # (S, R, T, P)

    freq_matrix = jnp.asarray(table.freq_response)[params.profile_idx]  # (P, K)
    H = frequency_response(gains, freq_matrix)  # (S, R, T, K)

    if orthogonal_pilots:
        rx = apply_channel(k_noise, tx, H, params.snr_db)  # (S, R, K)
    else:
        # common grid on all TX ⇒ the TX sum moves onto the path gains,
        # skipping a second full read of H (see apply_channel_common_grid)
        rx = apply_channel_common_grid(
            k_noise, tx[:, 0, :], gains, freq_matrix, params.snr_db
        )

    return Frame(
        tx_symbols=tx,
        rx_symbols=rx,
        channel=H.astype(jnp.complex64),
        pilot_mask=pattern.mask,
        pilot_positions=pattern.positions,
        pilot_valid=pattern.valid,
        num_pilots=pattern.num_pilots,
        params=params,
    )


def simulate_batch(
    keys,
    params: FrameParams,
    *,
    cfg: ExperimentConfig,
    table: Optional[ProfileTable] = None,
    orthogonal_pilots: bool = False,
) -> Frame:
    """vmap of :func:`simulate_frame` over a leading batch axis."""
    if table is None:
        table = table_for(cfg)
    fn = functools.partial(
        simulate_frame, cfg=cfg, table=table, orthogonal_pilots=orthogonal_pilots
    )
    return jax.vmap(fn)(keys, params)


def simulate_frame_time_domain(
    key,
    params: FrameParams,
    *,
    cfg: ExperimentConfig,
    table: Optional[ProfileTable] = None,
    orthogonal_pilots: bool = False,
) -> Frame:
    """Full time-domain TX/RX chain (north-star requirement; the reference
    defines OFDMSystem.modulate/demodulate but never exercises them in its
    main path, SURVEY §2.1 note at channel_simulator.py:348-421).

    Pipeline: grid → IFFT+CP → serialize → time-varying FIR (dense Jakes
    fading, per-tap delays) → AWGN at measured power → CP-strip+FFT → grid.
    ``channel`` holds the symbol-start frequency response of the same fading
    realization, so estimator NMSE is comparable with the FD path (the TD
    path additionally contains intra-symbol channel variation + CP edge
    effects — i.e. it is *more* physical).
    """
    if table is None:
        table = table_for(cfg)
    ofdm, mimo = cfg.ofdm, cfg.mimo
    num_sc = ofdm.num_used_subcarriers
    sps = ofdm.samples_per_symbol
    n_samples = ofdm.num_symbols * sps
    k_pilot, k_tx, k_fade, k_noise = jax.random.split(key, 4)

    pattern = make_pattern(
        k_pilot,
        ofdm.num_symbols,
        num_sc,
        params.pilot_density,
        cfg.pilots.pattern,
        cfg.pilots.max_density,
    )
    tx = _tx_grid(k_tx, ofdm.num_symbols, num_sc, mimo.num_tx, orthogonal_pilots)

    # (T, S, K) → per-antenna OFDM modulate → (T, N) serialized time signal.
    tx_t = jnp.swapaxes(tx, 0, 1)
    tx_time = modulate(tx_t, ofdm)  # (T, S, sps)
    tx_serial = tx_time.reshape(mimo.num_tx, n_samples)

    amp = _amp_for(table, cfg, params.profile_idx)
    dense = dense_fading(
        k_fade,
        params.doppler_hz,
        amp,
        n_samples,
        ofdm.sampling_rate,
        mimo.num_rx,
        mimo.num_tx,
        cfg.channel.num_oscillators,
    )  # (N, R, T, P)

    delay_samples = jnp.asarray(table.delay_samples)[params.profile_idx]
    path_valid = jnp.asarray(table.path_valid)[params.profile_idx]
    y = time_domain_apply(tx_serial, dense, delay_samples, path_valid)  # (R, N)

    # AWGN at measured received power (time-domain analog of reference :337).
    signal_power = jnp.mean(jnp.abs(y) ** 2)
    snr_linear = 10.0 ** (jnp.asarray(params.snr_db, jnp.float32) / 10.0)
    noise_std = jnp.sqrt(signal_power / snr_linear / 2.0)
    kr, ki = jax.random.split(k_noise)
    noise = jax.lax.complex(
        jax.random.normal(kr, y.shape, jnp.float32),
        jax.random.normal(ki, y.shape, jnp.float32),
    )
    y = y + noise * noise_std

    rx = demodulate(y.reshape(mimo.num_rx, ofdm.num_symbols, sps), ofdm)  # (R, S, K)
    rx = jnp.swapaxes(rx, 0, 1)  # (S, R, K)

    # Reference-comparable H_true: symbol-start snapshots of the same fading.
    gains_sym = dense[:: sps][: ofdm.num_symbols]  # (S, R, T, P)
    freq_matrix = jnp.asarray(table.freq_response)[params.profile_idx]
    H = frequency_response(gains_sym, freq_matrix)

    return Frame(
        tx_symbols=tx,
        rx_symbols=rx.astype(jnp.complex64),
        channel=H.astype(jnp.complex64),
        pilot_mask=pattern.mask,
        pilot_positions=pattern.positions,
        pilot_valid=pattern.valid,
        num_pilots=pattern.num_pilots,
        params=params,
    )

"""Measured end-to-end BER (not just the analytic proxy).

The reference never demodulates in its evaluation path — BER is an
analytic function of NMSE (run_phase5_evaluation.py:57-68) and its QAM
helpers are dormant (SURVEY §2.7). This module adds the real thing:
QAM data over the simulated channel → channel estimation → per-RE
equalization → minimum-distance demod → bit compare. This backs
BASELINE.json config #4 ("batched LS+MMSE + BER eval").

The reference transmits the same grid on every TX antenna, so the
estimable channel per rx is the antenna superposition; equalization is
therefore per-(rx, RE) scalar Wiener x̂ = ĥ*·y/(|ĥ|²+σ²), and the BER is
averaged over rx chains. (With ``orthogonal_pilots`` the full MIMO ZF
path in estimators/equalize.py applies instead.)
"""
from __future__ import annotations

import functools
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from ..config import ExperimentConfig
from ..estimators.api import estimate_frame
from ..physics.jakes import path_gains_symbol_sampled
from ..physics.mimo import apply_channel, frequency_response
from ..physics.pilots import make_pattern
from ..physics.simulate import Frame, FrameParams, table_for
from ..utils.qam import bits_per_symbol, qam_demodulate, qam_modulate


def simulate_qam_frame(
    key,
    params: FrameParams,
    *,
    cfg: ExperimentConfig,
    table=None,
    modulation: int = 4,
):
    """Like physics.simulate_frame but with Gray-QAM data symbols on
    non-pilot REs (pilots stay unit-modulus random-phase). Returns
    (Frame, bits) where bits is the (S·K·bps,) transmitted payload with
    pilot-position bits zeroed (masked out of the BER count).
    """
    if table is None:
        table = table_for(cfg)
    ofdm, mimo = cfg.ofdm, cfg.mimo
    num_sc = ofdm.num_used_subcarriers
    k_pilot, k_tx, k_fade, k_noise, k_bits = jax.random.split(key, 5)

    pattern = make_pattern(
        k_pilot, ofdm.num_symbols, num_sc, params.pilot_density,
        cfg.pilots.pattern, cfg.pilots.max_density,
    )
    bps = bits_per_symbol(modulation)
    n_re = ofdm.num_symbols * num_sc
    bits = jax.random.bernoulli(k_bits, 0.5, (n_re * bps,)).astype(jnp.int32)
    data_syms = qam_modulate(bits, modulation).reshape(ofdm.num_symbols, num_sc)

    pilot_phase = jax.random.uniform(
        k_tx, (ofdm.num_symbols, num_sc), minval=0.0, maxval=2.0 * jnp.pi
    )
    pilots = jnp.exp(1j * pilot_phase)
    grid = jnp.where(pattern.mask > 0, pilots, data_syms)
    tx = jnp.broadcast_to(grid[:, None, :], (ofdm.num_symbols, mimo.num_tx, num_sc))

    amp_table = (
        table.amp_overwrite if cfg.channel.tap_collision == "overwrite"
        else table.amp_accumulate
    )
    amp = jnp.asarray(amp_table)[params.profile_idx]
    gains = path_gains_symbol_sampled(
        k_fade, params.doppler_hz, amp, ofdm.num_symbols, ofdm.samples_per_symbol,
        ofdm.sampling_rate, mimo.num_rx, mimo.num_tx, cfg.channel.num_oscillators,
    )
    fm = jnp.asarray(table.freq_response)[params.profile_idx]
    h = frequency_response(gains, fm)
    rx = apply_channel(k_noise, tx, h, params.snr_db)

    frame = Frame(
        tx_symbols=tx.astype(jnp.complex64),
        rx_symbols=rx,
        channel=h.astype(jnp.complex64),
        pilot_mask=pattern.mask,
        pilot_positions=pattern.positions,
        pilot_valid=pattern.valid,
        num_pilots=pattern.num_pilots,
        params=params,
    )
    return frame, bits


def ber_frame(
    key,
    params: FrameParams,
    *,
    cfg: ExperimentConfig,
    table=None,
    estimator: str = "mmse_full",
    modulation: int = 4,
):
    """Measured BER of one frame with the given channel estimator."""
    if table is None:
        table = table_for(cfg)
    frame, bits = simulate_qam_frame(
        key, params, cfg=cfg, table=table, modulation=modulation
    )
    h_est = estimate_frame(frame, cfg=cfg, estimator=estimator, table=table)
    # superposition channel per rx: Σ_t Ĥ (estimators return per-pair copies)
    h_sum = jnp.sum(h_est, axis=2)  # (S, R, K)
    y = frame.rx_symbols  # (S, R, K)
    snr_lin = 10.0 ** (jnp.asarray(params.snr_db, jnp.float32) / 10.0)
    sigma2 = jnp.mean(jnp.abs(y) ** 2) / snr_lin
    x_hat = jnp.conj(h_sum) * y / (jnp.abs(h_sum) ** 2 + sigma2)  # (S, R, K)

    bps = bits_per_symbol(modulation)
    data_mask = 1.0 - frame.pilot_mask  # (S, K)
    rx_bits = qam_demodulate(
        jnp.moveaxis(x_hat, 1, 0).reshape(x_hat.shape[1], -1), modulation
    )  # (R, S·K·bps)
    tx_bits = bits  # (S·K·bps,)
    bit_mask = jnp.repeat(data_mask.reshape(-1), bps)  # (S·K·bps,)
    errors = jnp.sum((rx_bits != tx_bits[None, :]) * bit_mask[None, :])
    total = jnp.maximum(jnp.sum(bit_mask) * x_hat.shape[1], 1.0)
    return errors / total


def ber_sweep(
    cfg: ExperimentConfig,
    snrs_db,
    *,
    profile_idx: int = 1,
    doppler_hz: float = 50.0,
    density: float = 0.1,
    estimator: str = "mmse_full",
    modulation: int = 4,
    frames_per_point: int = 32,
    seed: int = 0,
) -> Dict[str, float]:
    """Measured BER vs SNR (batched per point)."""
    table = table_for(cfg)

    @jax.jit
    def point(keys, snr):
        b = keys.shape[0]
        params = FrameParams(
            jnp.full((b,), profile_idx, jnp.int32),
            jnp.full((b,), doppler_hz, jnp.float32),
            jnp.full((b,), snr, jnp.float32),
            jnp.full((b,), density, jnp.float32),
        )
        fn = functools.partial(
            ber_frame, cfg=cfg, table=table, estimator=estimator,
            modulation=modulation,
        )
        return jnp.mean(jax.vmap(fn)(keys, params))

    out = {}
    for i, snr in enumerate(snrs_db):
        keys = jax.random.split(jax.random.key(seed + i), frames_per_point)
        out[str(float(snr))] = float(point(keys, float(snr)))
    return out

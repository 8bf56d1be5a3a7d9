"""Estimator tests — port of the reference phase-2 behavioral contracts:
LS NMSE sanity (test_phase2_ls.py), MMSE ≥ LS (test_phase2_comparison.py),
NMSE improves with SNR (test_phase2_snr_sweep.py), interpolation-method
equivalence on identical data (test_phase2_interpolation.py), plus exactness
checks that have no reference analog (noise-free LS at pilots, Woodbury
Wiener vs dense solve).
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ce5g_tpu.estimators import (
    bessel_j0,
    equalize_channel,
    estimate_batch,
    estimate_frame,
    interpolate,
    ls_at_pilots,
    normalized_conv_interpolate,
)
from ce5g_tpu.estimators.mmse import build_wiener_prior, wiener_solve
from ce5g_tpu.physics import FrameParams, PROFILE_INDEX, simulate_batch, simulate_frame, table_for
from ce5g_tpu.utils import nmse_db


def params(profile="EVA", doppler=50.0, snr=15.0, density=0.1, B=None):
    def f(x, dt):
        v = jnp.asarray(x, dt)
        return jnp.full((B,), v) if B else v

    return FrameParams(
        f(PROFILE_INDEX[profile], jnp.int32),
        f(doppler, jnp.float32),
        f(snr, jnp.float32),
        f(density, jnp.float32),
    )


@pytest.fixture(scope="module")
def batch(cfg):
    B = 8
    keys = jax.random.split(jax.random.key(0), B)
    frames = simulate_batch(keys, params(B=B), cfg=cfg)
    return frames


class TestInterpolation:
    def test_nearest_exact_at_pilots(self):
        """Interpolated grid equals pilot values at pilot positions."""
        from ce5g_tpu.physics import make_pattern

        p = make_pattern(jax.random.key(0), 14, 599, 0.1, "scattered")
        vals = (
            jax.random.normal(jax.random.key(1), (int(p.positions.shape[0]),))
            + 1j * jax.random.normal(jax.random.key(2), (int(p.positions.shape[0]),))
        ) * p.valid
        for method in ("nearest", "linear"):
            grid = interpolate(vals, p.positions, p.valid, (14, 599), method)
            pos = np.asarray(p.positions)[np.asarray(p.valid) > 0]
            got = np.asarray(grid)[pos[:, 0], pos[:, 1]]
            want = np.asarray(vals)[np.asarray(p.valid) > 0]
            np.testing.assert_allclose(got, want, atol=2e-3)

    def test_constant_field_reproduced(self):
        """Any convex-weight interpolation must reproduce a constant."""
        from ce5g_tpu.physics import make_pattern

        p = make_pattern(jax.random.key(3), 14, 599, 0.05, "scattered")
        vals = jnp.where(p.valid > 0, 2.0 + 1.0j, 0.0)
        for method in ("nearest", "linear", "cubic"):
            grid = interpolate(vals, p.positions, p.valid, (14, 599), method)
            np.testing.assert_allclose(np.asarray(grid), 2.0 + 1.0j, atol=1e-4)

    def test_normalized_conv_constant(self):
        from ce5g_tpu.physics import make_pattern

        p = make_pattern(jax.random.key(4), 14, 599, 0.05, "scattered")
        grid = jnp.asarray(p.mask, jnp.complex64) * (1.5 - 0.5j)
        out = normalized_conv_interpolate(grid, p.mask)
        np.testing.assert_allclose(np.asarray(out), 1.5 - 0.5j, atol=0.05)


class TestLS:
    def test_noise_free_ls_exact_at_pilots(self, cfg):
        """At ∞ SNR, LS at pilots must equal the superposition channel."""
        f = simulate_frame(jax.random.key(1), params(snr=100.0), cfg=cfg)
        tx_grid = f.tx_symbols[:, 0, :]
        h_p = ls_at_pilots(
            jnp.moveaxis(f.rx_symbols, 1, 0), tx_grid, f.pilot_positions, f.pilot_valid
        )  # (R, P)
        h_sum = jnp.sum(f.channel, axis=2)  # (S, R, K) superposition Σ_tx H
        sy, sc = f.pilot_positions[:, 0], f.pilot_positions[:, 1]
        want = jnp.moveaxis(h_sum, 1, 0)[:, sy, sc] * f.pilot_valid
        np.testing.assert_allclose(np.asarray(h_p), np.asarray(want), atol=1e-3)

    def test_ls_nmse_reasonable(self, batch, cfg):
        """Reference contract (test_phase2_ls.py:104-108): NMSE < 10 dB.
        NOTE: LS estimates the 2-TX superposition (SURVEY §2.2), so its
        NMSE vs per-pair H_true is lower-bounded around 0 dB."""
        h_ls = estimate_batch(batch, cfg=cfg, estimator="ls", method="linear")
        v = float(nmse_db(batch.channel, h_ls))
        assert np.isfinite(v) and v < 10.0

    def test_identical_along_tx(self, batch, cfg):
        h_ls = estimate_batch(batch, cfg=cfg, estimator="ls")
        np.testing.assert_allclose(
            np.asarray(h_ls[:, :, :, 0]), np.asarray(h_ls[:, :, :, 1])
        )


class TestSISO:
    """1×1 configs remove the superposition quirk → real accuracy checks."""

    @pytest.fixture(scope="class")
    def siso(self):
        from ce5g_tpu import ExperimentConfig, MIMOConfig

        cfg = ExperimentConfig(mimo=MIMOConfig(num_tx=1, num_rx=1))
        B = 16
        keys = jax.random.split(jax.random.key(7), B)
        frames = simulate_batch(keys, params(snr=15.0, B=B), cfg=cfg)
        return cfg, frames

    def test_siso_ls_good(self, siso):
        cfg, frames = siso
        h = estimate_batch(frames, cfg=cfg, estimator="ls", method="linear")
        v = float(nmse_db(frames.channel, h))
        assert v < -8.0  # 15 dB SNR, 10% pilots → clearly sub −8 dB

    def test_siso_mmse_full_beats_ls(self, siso):
        cfg, frames = siso
        h_ls = estimate_batch(frames, cfg=cfg, estimator="ls", method="linear")
        h_w = estimate_batch(frames, cfg=cfg, estimator="mmse_full")
        ls_db = float(nmse_db(frames.channel, h_ls))
        w_db = float(nmse_db(frames.channel, h_w))
        assert w_db < ls_db - 2.0  # Wiener prior is worth ≥ 2 dB here
        assert w_db < -15.0

    def test_snr_monotonic(self, siso):
        """NMSE improves with SNR (reference test_phase2_snr_sweep.py)."""
        cfg, _ = siso
        out = []
        for snr in (0.0, 10.0, 20.0):
            B = 8
            keys = jax.random.split(jax.random.key(int(snr) + 11), B)
            frames = simulate_batch(keys, params(snr=snr, B=B), cfg=cfg)
            h = estimate_batch(frames, cfg=cfg, estimator="mmse_full")
            out.append(float(nmse_db(frames.channel, h)))
        assert out[0] > out[1] > out[2]


class TestMMSE:
    def test_diag_equals_reference_formula(self, cfg):
        """Scalar shrink must equal the dense R_h(R_h+σ²I)⁻¹ product the
        reference computes (numpy re-derivation, small size)."""
        rng = np.random.default_rng(0)
        n = 50
        h_ls = rng.normal(size=n) + 1j * rng.normal(size=n)
        snr_db = 12.0
        sigma2 = 10 ** (-snr_db / 10)
        p = np.mean(np.abs(h_ls) ** 2)
        r_h = np.eye(n) * p
        dense = r_h @ np.linalg.inv(r_h + sigma2 * np.eye(n)) @ h_ls

        from ce5g_tpu.estimators import mmse_diag_at_pilots

        ours = mmse_diag_at_pilots(
            jnp.asarray(h_ls, jnp.complex64), jnp.ones(n, jnp.float32), snr_db
        )
        np.testing.assert_allclose(np.asarray(ours), dense, atol=1e-5)

    def test_mmse_beats_ls_at_low_snr(self, cfg):
        """Reference contract (PHASE_2 report): MMSE(diag) ≥ LS at low SNR."""
        B = 8
        keys = jax.random.split(jax.random.key(5), B)
        frames = simulate_batch(keys, params(snr=0.0, B=B), cfg=cfg)
        h_ls = estimate_batch(frames, cfg=cfg, estimator="ls")
        h_m = estimate_batch(frames, cfg=cfg, estimator="mmse")
        assert float(nmse_db(frames.channel, h_m)) <= float(
            nmse_db(frames.channel, h_ls)
        ) + 0.1

    def test_mmse_full_beats_diag(self, batch, cfg):
        h_m = estimate_batch(batch, cfg=cfg, estimator="mmse")
        h_w = estimate_batch(batch, cfg=cfg, estimator="mmse_full")
        assert float(nmse_db(batch.channel, h_w)) < float(
            nmse_db(batch.channel, h_m)
        )

    def test_woodbury_equals_dense_solve(self, cfg):
        """Woodbury path must match the dense (R+σ²I)⁻¹h solve exactly."""
        table = table_for(cfg)
        from ce5g_tpu.physics import make_pattern

        pat = make_pattern(jax.random.key(6), 14, 599, 0.05, "scattered")
        pi = PROFILE_INDEX["ETU"]
        fm = jnp.asarray(table.freq_response)[pi]
        amp = jnp.asarray(table.amp_overwrite)[pi]
        prior = build_wiener_prior(
            fm, amp, 100.0, 1096 / 15.36e6, 14, pat.positions, pat.valid
        )
        p = int(pat.positions.shape[0])
        rng = np.random.default_rng(1)
        h = jnp.asarray(
            (rng.normal(size=p) + 1j * rng.normal(size=p)) * np.asarray(pat.valid),
            jnp.complex64,
        )
        sigma2 = 0.05
        x_wood = wiener_solve(prior, h, sigma2, obs_scale=2.0)

        phi = np.asarray(prior.phi) * np.sqrt(2.0)
        r_pp = phi @ phi.conj().T
        x_dense = np.linalg.solve(r_pp + sigma2 * np.eye(p), np.asarray(h))
        np.testing.assert_allclose(np.asarray(x_wood), x_dense, atol=2e-3)

    def test_grid_formulation_equals_pilot_formulation(self, cfg):
        """mmse_full's gather-free masked-grid contraction must equal the
        explicit Φ pilot-axis formulation (same math, reordered sums)."""
        from ce5g_tpu.estimators.ls import ls_at_pilots
        from ce5g_tpu.estimators.mmse import (
            mmse_full_estimate,
            wiener_reconstruct,
        )

        table = table_for(cfg)
        frame = simulate_frame(jax.random.key(11), params(snr=10.0), cfg=cfg)
        s, k = cfg.ofdm.num_symbols, cfg.ofdm.num_used_subcarriers
        num_tx = cfg.mimo.num_tx
        pi = PROFILE_INDEX["EVA"]
        fm = jnp.asarray(table.freq_response)[pi]
        amp = jnp.asarray(table.amp_overwrite)[pi]
        dop = frame.params.doppler_hz
        tsym = cfg.ofdm.symbol_duration

        h_grid = mmse_full_estimate(
            frame.rx_symbols, frame.tx_symbols[:, 0, :], frame.pilot_mask,
            (s, k), num_tx, frame.params.snr_db, fm, amp, dop, tsym,
        )

        # explicit pilot-axis Φ path
        rx_grids = jnp.moveaxis(frame.rx_symbols, 1, 0)
        h_p = ls_at_pilots(
            rx_grids, frame.tx_symbols[:, 0, :],
            frame.pilot_positions, frame.pilot_valid,
        )
        prior = build_wiener_prior(
            fm, amp, dop, tsym, s, frame.pilot_positions, frame.pilot_valid
        )
        p_ch = jnp.sum(prior.w_path)
        sigma2 = jnp.maximum(
            num_tx * p_ch / 10 ** (frame.params.snr_db / 10), 1e-8
        )
        x = wiener_solve(prior, h_p * frame.pilot_valid, sigma2, float(num_tx))
        h_phi = jnp.moveaxis(
            wiener_reconstruct(prior, x, frame.pilot_positions, (s, k)), 1, 0
        )
        scale = float(jnp.mean(jnp.abs(h_phi)))
        np.testing.assert_allclose(
            np.asarray(h_grid[:, :, 0, :]), np.asarray(h_phi),
            atol=5e-3 * scale,
        )

    def test_bessel_j0(self):
        from scipy.special import j0 as scipy_j0

        x = np.linspace(0, 20, 200)
        np.testing.assert_allclose(
            np.asarray(bessel_j0(x)), scipy_j0(x), atol=2e-6
        )


class TestEqualizer:
    def test_zf_recovers_symbols(self, cfg):
        """With perfect CSI and high SNR, ZF recovers tx symbols for
        orthogonal streams (independent per-antenna grids)."""
        f = simulate_frame(
            jax.random.key(8), params(snr=60.0), cfg=cfg, orthogonal_pilots=True
        )
        x_hat = equalize_channel(f.rx_symbols, f.channel, method="zf")
        err = float(
            jnp.mean(jnp.abs(x_hat - f.tx_symbols) ** 2)
            / jnp.mean(jnp.abs(f.tx_symbols) ** 2)
        )
        assert err < 1e-3

    def test_mmse_equals_zf_at_zero_noise(self, cfg):
        """With noise_var == the ZF ridge (1e-8) the two solves coincide."""
        f = simulate_frame(
            jax.random.key(9), params(snr=40.0), cfg=cfg, orthogonal_pilots=True
        )
        x_zf = equalize_channel(f.rx_symbols, f.channel, "zf")
        x_mm = equalize_channel(f.rx_symbols, f.channel, "mmse", noise_var=1e-8)
        np.testing.assert_allclose(
            np.asarray(x_zf), np.asarray(x_mm), atol=1e-4
        )


class TestTimeRank:
    """ADVICE r1: time_rank must scale with the configured Doppler instead
    of a hard-coded 8 that silently degrades above ~500 Hz."""

    def test_auto_rank_rule(self):
        from dataclasses import replace

        from ce5g_tpu import ChannelConfig, ExperimentConfig
        from ce5g_tpu.estimators.api import auto_time_rank

        base = ExperimentConfig()
        lo = replace(base, channel=ChannelConfig(doppler_hz=(10.0, 200.0)))
        hi = replace(base, channel=ChannelConfig(doppler_hz=(2000.0,)))
        vhi = replace(base, channel=ChannelConfig(doppler_hz=(5000.0,)))
        r_lo, r_hi = auto_time_rank(lo), auto_time_rank(hi)
        # numerically-sized rank: small at low Doppler, grows with fd,
        # full rank (None) above the projection's validity
        assert r_lo is not None and 2 <= r_lo <= 8
        assert r_hi is not None and r_hi > r_lo
        assert auto_time_rank(vhi) is None  # above validity → full rank

        # the chosen rank must actually reconstruct R_t to the 1e-5 tol
        import numpy as np
        from scipy.special import j0

        s = lo.ofdm.num_symbols
        ds = np.arange(s)
        rt = j0(2 * np.pi * 200.0 * (ds[:, None] - ds[None, :]) * lo.ofdm.symbol_duration)
        x = np.linspace(-1, 1, s)
        q, _ = np.linalg.qr(np.polynomial.legendre.legvander(x, r_lo - 1))
        rec = q @ (q.T @ rt @ q) @ q.T
        assert np.linalg.norm(rec - rt) <= 1e-5 * np.linalg.norm(rt)

    @pytest.mark.slow  # full-rank Woodbury at 500 Hz (~30s)
    def test_auto_matches_full_rank_at_high_doppler(self):
        """At 2 kHz Doppler (outside the old rank-8 validity bound) the
        auto-ranked estimate must agree with the exact full-rank solve."""
        from dataclasses import replace

        from ce5g_tpu import ChannelConfig, ExperimentConfig, MIMOConfig

        cfg = replace(
            ExperimentConfig(mimo=MIMOConfig(num_tx=1, num_rx=1)),
            channel=ChannelConfig(doppler_hz=(2000.0,)),
        )
        B = 4
        keys = jax.random.split(jax.random.key(21), B)
        frames = simulate_batch(keys, params(doppler=2000.0, snr=15.0, B=B), cfg=cfg)
        h_auto = estimate_batch(frames, cfg=cfg, estimator="mmse_full")
        h_full = estimate_batch(
            frames, cfg=cfg, estimator="mmse_full", time_rank=None
        )
        auto_db = float(nmse_db(frames.channel, h_auto))
        full_db = float(nmse_db(frames.channel, h_full))
        assert abs(auto_db - full_db) < 0.1
        # and the old hard-coded rank 8 is measurably worse here
        h_8 = estimate_batch(frames, cfg=cfg, estimator="mmse_full", time_rank=8)
        assert float(nmse_db(frames.channel, h_8)) > full_db + 0.2

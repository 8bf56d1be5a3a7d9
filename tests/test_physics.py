"""Physics-core tests.

Ports the behavioral contracts of the reference's phase-1 validation scripts
(test_phase1_channels.py, test_phase1_transmission.py) into deterministic
pytest checks: shape laws (incl. the 599 = 600−DC rule), pilot-density
tolerance, CIR power normalization, Doppler time-variation trend, OFDM
round-trip, and measured-SNR correctness.
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ce5g_tpu.physics import (
    FrameParams,
    PROFILE_INDEX,
    PROFILE_NAMES,
    build_profile_table,
    demodulate,
    make_pattern,
    modulate,
    path_gains_symbol_sampled,
    simulate_batch,
    simulate_frame,
    simulate_frame_time_domain,
    table_for,
    used_subcarrier_bins,
)


def frame_params(profile="EVA", doppler=50.0, snr=15.0, density=0.1):
    return FrameParams(
        jnp.int32(PROFILE_INDEX[profile]),
        jnp.float32(doppler),
        jnp.float32(snr),
        jnp.float32(density),
    )


class TestProfiles:
    def test_used_bins_dc_removed(self, cfg):
        shifted, raw = used_subcarrier_bins(1024, 600)
        assert len(shifted) == 599  # reference: 600 − DC
        assert 512 not in shifted
        assert shifted[0] == 212 and shifted[-1] == 811
        # raw bins are the unshifted FFT indices
        assert np.all(raw == (shifted + 512) % 1024)

    def test_delay_quantization(self, cfg):
        t = table_for(cfg)
        # ETU at 15.36 MHz: 5 µs → tap 77 (reference round(delay·fs))
        assert t.max_delay_samples[PROFILE_INDEX["ETU"]] == 77
        assert t.max_delay_samples[PROFILE_INDEX["EPA"]] == 6
        assert t.max_delay_samples[PROFILE_INDEX["EVA"]] == 39

    def test_power_normalization(self, cfg):
        t = table_for(cfg)
        # accumulate amps: sum of squares = 1 exactly (reference :78)
        np.testing.assert_allclose((t.amp_accumulate**2).sum(axis=1), 1.0, rtol=1e-6)
        # overwrite amps: EPA and EVA lose shadowed paths (EPA taps 0 and 1
        # collide pairwise; EVA paths 0/1 both quantize to tap 0) → less power
        for name in ("EPA", "EVA"):
            i = PROFILE_INDEX[name]
            assert (t.amp_overwrite[i] ** 2).sum() < 1.0
        # ETU has no collisions at fs=15.36 MHz → identical tables
        etu = PROFILE_INDEX["ETU"]
        np.testing.assert_allclose(t.amp_overwrite[etu], t.amp_accumulate[etu])

    def test_freq_matrix_matches_fft(self, cfg):
        """F[p,k] must equal fftshift(fft(delta at delay_p))[used]."""
        t = table_for(cfg)
        shifted, _ = used_subcarrier_bins(1024, 600)
        for pi in range(3):
            for p in range(9):
                d = t.delay_samples[pi, p]
                cir = np.zeros(1024, complex)
                cir[d] = 1.0
                h = np.fft.fftshift(np.fft.fft(cir))[shifted]
                np.testing.assert_allclose(t.freq_response[pi, p], h, atol=1e-5)


class TestJakes:
    def test_gain_power_and_shape(self, cfg):
        t = table_for(cfg)
        amp = jnp.asarray(t.amp_accumulate[PROFILE_INDEX["EVA"]])
        g = path_gains_symbol_sampled(
            jax.random.key(0), 100.0, amp, 14, 1096, 15.36e6, 2, 2, 20
        )
        assert g.shape == (14, 2, 2, 9)
        # Average power over many realizations ≈ sum of tap powers = 1
        keys = jax.random.split(jax.random.key(1), 200)
        gs = jax.vmap(
            lambda k: path_gains_symbol_sampled(k, 100.0, amp, 14, 1096, 15.36e6, 1, 1, 20)
        )(keys)
        # Reference-parity Jakes normalization gives E|h|² = 1/2 per path
        # (see jakes.py docstring) → total power ≈ 0.5·Σ powers = 0.5.
        total_power = float(jnp.mean(jnp.sum(jnp.abs(gs) ** 2, axis=-1)))
        assert 0.45 < total_power < 0.55

    def test_doppler_increases_time_variation(self, cfg):
        """Higher Doppler → lower symbol-to-symbol correlation
        (reference contract: test_phase1_channels.py:135-178)."""
        t = table_for(cfg)
        amp = jnp.asarray(t.amp_accumulate[PROFILE_INDEX["EVA"]])
        keys = jax.random.split(jax.random.key(2), 100)

        def corr(doppler):
            gs = jax.vmap(
                lambda k: path_gains_symbol_sampled(
                    k, doppler, amp, 14, 1096, 15.36e6, 1, 1, 20
                )
            )(keys)
            a, b = gs[:, :-1], gs[:, 1:]
            num = jnp.abs(jnp.mean(a * jnp.conj(b)))
            den = jnp.mean(jnp.abs(a) ** 2)
            return float(num / den)

        c10, c200 = corr(10.0), corr(200.0)
        assert c10 > 0.99
        assert c200 < c10

    def test_zero_doppler_static(self, cfg):
        t = table_for(cfg)
        amp = jnp.asarray(t.amp_accumulate[PROFILE_INDEX["EPA"]])
        g = path_gains_symbol_sampled(
            jax.random.key(3), 0.0, amp, 14, 1096, 15.36e6, 2, 2, 20
        )
        np.testing.assert_allclose(np.asarray(g[0]), np.asarray(g[-1]), atol=1e-5)


class TestPilots:
    @pytest.mark.parametrize("density", [0.01, 0.05, 0.10])
    def test_scattered_density(self, density):
        p = make_pattern(jax.random.key(0), 14, 599, density, "scattered")
        total = 14 * 599
        expected = int(total * density)
        assert int(p.num_pilots) == expected
        assert float(p.mask.sum()) == expected
        assert float(p.valid.sum()) == expected
        # positions of valid slots land on mask
        pos = np.asarray(p.positions)[np.asarray(p.valid) > 0]
        mask = np.asarray(p.mask)
        assert mask[pos[:, 0], pos[:, 1]].all()

    def test_scattered_is_uniform(self):
        # pooled over patterns, every symbol row gets ≈ density coverage
        keys = jax.random.split(jax.random.key(1), 50)
        masks = jax.vmap(
            lambda k: make_pattern(k, 14, 599, 0.1, "scattered").mask
        )(keys)
        per_sym = np.asarray(masks.mean(axis=(0, 2)))
        assert np.all(np.abs(per_sym - 0.1) < 0.02)

    @pytest.mark.parametrize("pattern", ["comb", "block"])
    def test_alt_patterns_density(self, pattern):
        p = make_pattern(jax.random.key(2), 14, 599, 0.1, pattern)
        realized = float(p.mask.sum()) / (14 * 599)
        assert abs(realized - 0.1) < 0.05  # reference tolerance ±5% absolute
        assert int(p.num_pilots) == float(p.valid.sum())

    @pytest.mark.parametrize("pattern", ["scattered", "comb", "block"])
    def test_mask_positions_consistent_at_max_density(self, pattern):
        """mask and (positions, valid) must describe the SAME pilot set even
        when rounding pushes the pattern past P_max capacity — mmse_full
        consumes the mask while LS consumes positions (VERDICT r2 item 7)."""
        for density in (0.1, 0.15):
            p = make_pattern(jax.random.key(3), 14, 599, density, pattern,
                             max_density=0.15)
            mask = np.asarray(p.mask)
            valid = np.asarray(p.valid)
            assert float(mask.sum()) == float(valid.sum())
            pos = np.asarray(p.positions)[valid > 0]
            assert mask[pos[:, 0], pos[:, 1]].all()
            # every mask-1 RE appears among the valid slots
            grid = np.zeros_like(mask)
            grid[pos[:, 0], pos[:, 1]] = 1.0
            np.testing.assert_array_equal(grid, mask)


class TestOFDM:
    def test_roundtrip_identity(self, cfg):
        """demodulate(modulate(x)) == x through an ideal channel."""
        key = jax.random.key(0)
        k = cfg.ofdm.num_used_subcarriers
        x = jax.random.normal(key, (14, k)) + 1j * jax.random.normal(
            jax.random.key(1), (14, k)
        )
        y = demodulate(modulate(x, cfg.ofdm), cfg.ofdm)
        np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-4)

    def test_unit_power_preserved(self, cfg):
        x = jnp.exp(
            1j * jax.random.uniform(jax.random.key(2), (14, 599), maxval=2 * np.pi)
        )
        t = modulate(x, cfg.ofdm)
        # Parseval: time power ≈ used_sc/fft_size of peak, scaled by √N conv
        body = t[..., cfg.ofdm.cp_length :]
        p = float(jnp.mean(jnp.abs(body) ** 2))
        assert abs(p - 599 / 1024) < 0.02


class TestSimulation:
    def test_frame_shapes(self, cfg):
        f = simulate_frame(jax.random.key(0), frame_params(), cfg=cfg)
        assert f.tx_symbols.shape == (14, 2, 599)
        assert f.rx_symbols.shape == (14, 2, 599)
        assert f.channel.shape == (14, 2, 2, 599)
        assert f.pilot_mask.shape == (14, 599)
        for arr in (f.tx_symbols, f.rx_symbols, f.channel):
            assert bool(jnp.all(jnp.isfinite(arr.real) & jnp.isfinite(arr.imag)))

    def test_tx_same_on_all_antennas(self, cfg):
        """Reference parity quirk (channel_simulator.py:402-404)."""
        f = simulate_frame(jax.random.key(1), frame_params(), cfg=cfg)
        np.testing.assert_allclose(
            np.asarray(f.tx_symbols[:, 0]), np.asarray(f.tx_symbols[:, 1])
        )
        assert bool(jnp.allclose(jnp.abs(f.tx_symbols), 1.0, atol=1e-5))

    def test_measured_snr(self, cfg):
        f = simulate_frame(jax.random.key(2), frame_params(snr=15.0), cfg=cfg)
        y_clean = jnp.einsum("srtk,stk->srk", f.channel, f.tx_symbols)
        noise = f.rx_symbols - y_clean
        snr = 10 * np.log10(
            float(jnp.mean(jnp.abs(y_clean) ** 2) / jnp.mean(jnp.abs(noise) ** 2))
        )
        assert abs(snr - 15.0) < 1.0  # reference tolerance (test_phase1:110-116)

    def test_batch_mixed_profiles(self, cfg):
        B = 6
        keys = jax.random.split(jax.random.key(3), B)
        p = FrameParams(
            jnp.arange(B, dtype=jnp.int32) % 3,
            jnp.full((B,), 50.0),
            jnp.full((B,), 10.0),
            jnp.full((B,), 0.05),
        )
        fb = simulate_batch(keys, p, cfg=cfg)
        assert fb.rx_symbols.shape == (B, 14, 2, 599)
        assert np.all(np.asarray(fb.num_pilots) == int(14 * 599 * 0.05))

    @pytest.mark.parametrize("ntx,nrx", [(1, 1), (2, 2), (4, 4)])
    def test_mimo_dims(self, cfg, ntx, nrx):
        """Reference contract: test_phase1_transmission.py:173-212."""
        from ce5g_tpu import ExperimentConfig, MIMOConfig

        c = ExperimentConfig(mimo=MIMOConfig(num_tx=ntx, num_rx=nrx))
        f = simulate_frame(jax.random.key(4), frame_params(), cfg=c)
        assert f.channel.shape == (14, nrx, ntx, 599)
        assert f.rx_symbols.shape == (14, nrx, 599)

    def test_channel_power_overwrite_vs_accumulate(self, cfg):
        """EPA: overwrite mode (parity) loses shadowed-tap power."""
        from ce5g_tpu import ExperimentConfig, ChannelConfig

        keys = jax.random.split(jax.random.key(5), 50)
        B = 50
        p = FrameParams(
            jnp.full((B,), PROFILE_INDEX["EPA"], jnp.int32),
            jnp.full((B,), 50.0),
            jnp.full((B,), 30.0),
            jnp.full((B,), 0.1),
        )
        pow_over = float(
            jnp.mean(jnp.abs(simulate_batch(keys, p, cfg=cfg).channel) ** 2)
        )
        c_acc = ExperimentConfig(channel=ChannelConfig(tap_collision="accumulate"))
        pow_acc = float(
            jnp.mean(jnp.abs(simulate_batch(keys, p, cfg=c_acc).channel) ** 2)
        )
        # 0.5 factor: reference Jakes normalization (see jakes.py docstring)
        expected_over = 0.5 * (0.505**2 + 0.401**2 + 0.226**2 + 0.078**2 + 0.052**2)
        assert abs(pow_over - expected_over) < 0.05
        assert abs(pow_acc - 0.5) < 0.06
        assert pow_acc > pow_over

    def test_time_domain_chain(self, small_cfg):
        """TD chain: static channel → demodulated rx ≈ H·x at high SNR."""
        p = FrameParams(
            jnp.int32(PROFILE_INDEX["EPA"]),
            jnp.float32(0.0),  # static channel: no intra-symbol variation
            jnp.float32(40.0),
            jnp.float32(0.1),
        )
        f = simulate_frame_time_domain(jax.random.key(6), p, cfg=small_cfg)
        y_pred = jnp.einsum("srtk,stk->srk", f.channel, f.tx_symbols)
        err = float(
            jnp.mean(jnp.abs(f.rx_symbols - y_pred) ** 2)
            / jnp.mean(jnp.abs(y_pred) ** 2)
        )
        # CP (8 samples) covers EPA max delay at this fs → near-exact match
        assert err < 2e-3


class TestPilotHelpers:
    def test_insert_extract_roundtrip(self):
        from ce5g_tpu.physics import extract_pilots, insert_pilots

        pat = make_pattern(jax.random.key(11), 14, 599, 0.1, "scattered")
        pilots = jnp.exp(1j * jax.random.uniform(jax.random.key(12), (14, 599),
                                                 maxval=2 * np.pi))
        data = 2.0 * jnp.exp(1j * jax.random.uniform(jax.random.key(13), (14, 599),
                                                     maxval=2 * np.pi))
        grid = insert_pilots(pat, data, pilots)
        # extracted pilots equal the pilot grid at pilot positions
        got = extract_pilots(pat, grid)
        sy, sc = np.asarray(pat.positions).T
        want = np.asarray(pilots)[sy, sc] * np.asarray(pat.valid)
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-6)
        # non-pilot REs hold data
        m = np.asarray(pat.mask) > 0
        np.testing.assert_allclose(np.abs(np.asarray(grid)[~m]), 2.0, atol=1e-5)


class TestAWGN:
    def test_awgn_power(self):
        from ce5g_tpu.utils import awgn_noise

        n = awgn_noise(jax.random.key(0), (4000,), snr_db=10.0, signal_power=2.0)
        # noise power = signal_power / SNR_lin = 0.2
        assert abs(float(jnp.mean(jnp.abs(n) ** 2)) - 0.2) < 0.02

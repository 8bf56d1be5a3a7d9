"""Measured end-to-end BER tests (QAM over the simulated channel)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ce5g_tpu import ExperimentConfig, MIMOConfig
from ce5g_tpu.eval.ber import ber_frame, ber_sweep, simulate_qam_frame
from ce5g_tpu.physics import FrameParams, PROFILE_INDEX, table_for
from ce5g_tpu.utils.qam import qam_demodulate, qam_modulate


class TestQAM:
    @pytest.mark.parametrize("M", [4, 16, 64])
    def test_mod_demod_roundtrip(self, M):
        import math

        k = int(math.log2(M))
        bits = jax.random.bernoulli(jax.random.key(0), 0.5, (120 * k,)).astype(
            jnp.int32
        )
        syms = qam_modulate(bits, M)
        assert syms.shape == (120,)
        # unit average power
        assert abs(float(jnp.mean(jnp.abs(syms) ** 2)) - 1.0) < 0.15
        out = qam_demodulate(syms, M)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(bits))

    def test_demod_with_noise_qpsk(self):
        bits = jax.random.bernoulli(jax.random.key(1), 0.5, (2000,)).astype(jnp.int32)
        syms = qam_modulate(bits, 4)
        noisy = syms + 0.1 * (
            jax.random.normal(jax.random.key(2), syms.shape)
            + 1j * jax.random.normal(jax.random.key(3), syms.shape)
        )
        out = qam_demodulate(noisy, 4)
        ber = float(jnp.mean(out != bits))
        assert ber < 0.01  # 20 dB SNR QPSK → essentially error-free


def _params(snr, B=None):
    def f(x, dt):
        v = jnp.asarray(x, dt)
        return jnp.full((B,), v) if B else v

    return FrameParams(
        f(PROFILE_INDEX["EVA"], jnp.int32), f(50.0, jnp.float32),
        f(snr, jnp.float32), f(0.1, jnp.float32),
    )


class TestBER:
    @pytest.fixture(scope="class")
    def siso_cfg(self):
        return ExperimentConfig(mimo=MIMOConfig(num_tx=1, num_rx=1))

    def test_qam_frame_structure(self, siso_cfg):
        frame, bits = simulate_qam_frame(
            jax.random.key(0), _params(20.0), cfg=siso_cfg
        )
        assert frame.tx_symbols.shape == (14, 1, 599)
        assert bits.shape == (14 * 599 * 2,)
        # pilot positions are unit-modulus
        mask = np.asarray(frame.pilot_mask) > 0
        tx = np.asarray(frame.tx_symbols)[:, 0, :]
        np.testing.assert_allclose(np.abs(tx[mask]), 1.0, atol=1e-5)

    def test_ber_decreases_with_snr(self, siso_cfg):
        bers = []
        for snr in (0.0, 10.0, 20.0):
            b = float(
                jax.jit(
                    lambda k, p: ber_frame(
                        k, p, cfg=siso_cfg, estimator="mmse_full"
                    )
                )(jax.random.key(5), _params(snr))
            )
            bers.append(b)
        assert bers[0] > bers[1] > bers[2]
        assert bers[2] < 0.01  # 20 dB QPSK with good CSI

    def test_ber_sweep_api(self, siso_cfg):
        out = ber_sweep(
            siso_cfg, (5.0, 15.0), frames_per_point=4, estimator="ls"
        )
        assert set(out) == {"5.0", "15.0"}
        assert out["15.0"] < out["5.0"]

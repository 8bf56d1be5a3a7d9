"""Grid-form row-scan interpolation (round-5 fast path,
estimators/interpolate.py interpolate_grid) vs the padded-slot path.

The row-scan path is the production hot loop for LS/diag-MMSE (it feeds
the dataset factory and bench.py); these tests pin its equivalence to the
slot path, whose own parity vs scipy.griddata is pinned by
tests/test_phase2_parity.py. Reference anchor for both:
src/baseline_estimators.py:44-81.
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ce5g_tpu.estimators.interpolate import interpolate, interpolate_grid
from ce5g_tpu.physics.pilots import make_pattern

S, K = 14, 599


def _pattern(density, pattern="scattered", seed=0):
    return make_pattern(jax.random.PRNGKey(seed), S, K, density, pattern)


def _masked_values(pat, r=2, seed=3):
    rng = np.random.default_rng(seed)
    v = (rng.standard_normal((r, S, K)) + 1j * rng.standard_normal((r, S, K)))
    return jnp.asarray(v.astype(np.complex64)) * pat.mask


@pytest.mark.parametrize(
    "density,pattern",
    [(0.01, "scattered"), (0.10, "scattered"), (0.05, "comb")],
)
def test_nearest_bit_exact(density, pattern):
    pat = _pattern(density, pattern)
    v = _masked_values(pat, r=1)
    pv = v[..., pat.positions[:, 0], pat.positions[:, 1]] * pat.valid
    old = interpolate(pv, pat.positions, pat.valid, (S, K), "nearest", impl="xla")
    new = interpolate_grid(v, pat.mask, "nearest")
    np.testing.assert_allclose(np.asarray(new), np.asarray(old), atol=1e-5)


@pytest.mark.parametrize("density", [0.01, 0.10])
def test_linear_pointwise_close(density):
    """k=3 IDW: identical except the rare same-row-3rd-neighbor case."""
    pat = _pattern(density)
    v = _masked_values(pat, r=1)
    pv = v[..., pat.positions[:, 0], pat.positions[:, 1]] * pat.valid
    old = np.asarray(
        interpolate(pv, pat.positions, pat.valid, (S, K), "linear", impl="xla")
    )
    new = np.asarray(interpolate_grid(v, pat.mask, "linear"))
    agree = (np.abs(old - new) < 1e-5).mean()
    assert agree > 0.97
    rel = np.linalg.norm(old - new) / np.linalg.norm(old)
    assert rel < 0.05  # iid worst case; on smooth channels ≈ 0 (below)


@pytest.mark.slow  # full-grid sim compile ~1 min on CPU; the small-grid
# equivalence tests above cover the numerics every run
def test_linear_nmse_equivalent_on_frames(cfg):
    """On real simulated channels the two linear paths must estimate
    equally well — the contract that matters for the factory."""
    from ce5g_tpu.estimators.api import estimate_batch
    from ce5g_tpu.physics.simulate import FrameParams, simulate_batch

    b = 3
    params = FrameParams(
        profile_idx=jnp.asarray([0, 1, 2], jnp.int32),
        doppler_hz=jnp.full((b,), 100.0, jnp.float32),
        snr_db=jnp.full((b,), 15.0, jnp.float32),
        pilot_density=jnp.asarray([0.02, 0.05, 0.10], jnp.float32),
    )
    frames = simulate_batch(
        jax.random.split(jax.random.PRNGKey(11), b), params, cfg=cfg
    )

    def nmse(h):
        ht, he = np.asarray(frames.channel), np.asarray(h)
        err = np.mean(np.abs(ht - he) ** 2, axis=(1, 2, 3, 4))
        return err / np.mean(np.abs(ht) ** 2, axis=(1, 2, 3, 4))

    out = {}
    for est in ("ls",):  # diag-MMSE shares the identical interp path
        grid = estimate_batch(frames, cfg=cfg, estimator=est, method="linear")
        # slot path: strip the mask so ls_estimate takes the old route
        slot_frames = frames._replace(pilot_mask=frames.pilot_mask)
        from ce5g_tpu.estimators.ls import ls_estimate
        from ce5g_tpu.estimators.mmse import mmse_diag_estimate

        gshape = (cfg.ofdm.num_symbols, cfg.ofdm.num_used_subcarriers)
        if est == "ls":
            fn = lambda f: ls_estimate(
                f.rx_symbols, f.tx_symbols[:, 0, :], f.pilot_positions,
                f.pilot_valid, gshape, cfg.mimo.num_tx, "linear",
            )
        else:
            fn = lambda f: mmse_diag_estimate(
                f.rx_symbols, f.tx_symbols[:, 0, :], f.pilot_positions,
                f.pilot_valid, gshape, cfg.mimo.num_tx, f.params.snr_db,
                "linear",
            )
        slot = jax.vmap(fn)(slot_frames)
        g_db = 10 * np.log10(nmse(grid).mean())
        s_db = 10 * np.log10(nmse(slot).mean())
        assert abs(g_db - s_db) < 0.05, (est, g_db, s_db)
        out[est] = (g_db, s_db)


def test_empty_mask_gives_zeros():
    mask = jnp.zeros((S, K), jnp.float32)
    v = jnp.zeros((2, S, K), jnp.complex64)
    for method in ("nearest", "linear"):
        out = interpolate_grid(v, mask, method)
        assert np.all(np.asarray(out) == 0)


def test_grid_path_used_by_ls_estimate(cfg):
    """ls_estimate(pilot_mask=...) must equal the slot path for nearest."""
    from ce5g_tpu.estimators.ls import ls_estimate

    pat = _pattern(0.05)
    rng = np.random.default_rng(9)
    rx = jnp.asarray(
        (rng.standard_normal((S, 2, K)) + 1j * rng.standard_normal((S, 2, K)))
        .astype(np.complex64)
    )
    tx = jnp.exp(1j * jnp.asarray(rng.uniform(0, 2 * np.pi, (S, K)), jnp.float32))
    a = ls_estimate(
        rx, tx, pat.positions, pat.valid, (S, K), 2, "nearest",
        pilot_mask=pat.mask,
    )
    b = ls_estimate(rx, tx, pat.positions, pat.valid, (S, K), 2, "nearest")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)

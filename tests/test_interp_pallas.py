"""Pallas interpolation kernel vs the XLA reference path.

Runs the kernel in interpreter mode (tests are CPU-hosted); TPU execution
is exercised by scripts/quick_start.py and bench paths.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ce5g_tpu.estimators.interpolate import interpolate
from ce5g_tpu.ops.interp_pallas import interpolate_pallas
from ce5g_tpu.physics import make_pattern


@pytest.mark.parametrize("density", [0.02, 0.10, 0.15])
@pytest.mark.parametrize("method", ["nearest", "linear", "cubic"])
def test_pallas_matches_xla(density, method):
    s, kk = 14, 599
    pat = make_pattern(jax.random.key(int(density * 997)), s, kk, density,
                       "scattered", max_density=0.15)
    p = int(pat.positions.shape[0])
    r = 2
    vals = (
        jax.random.normal(jax.random.key(1), (r, p))
        + 1j * jax.random.normal(jax.random.key(2), (r, p))
    ).astype(jnp.complex64) * pat.valid

    got = np.asarray(
        interpolate_pallas(vals, pat.positions, pat.valid, (s, kk), method,
                           interpret=True)
    )
    want = np.asarray(
        interpolate(vals, pat.positions, pat.valid, (s, kk), method,
                    impl="xla")
    )
    if method == "cubic":
        # different candidate windows (384 sorted vs 128 rank-nearest) give
        # slightly different Gaussian tails; compare NMSE-level agreement
        err = np.mean(np.abs(got - want) ** 2) / np.mean(np.abs(want) ** 2)
        assert err < 0.02, err
    else:
        # identical shell semantics; ties can differ only through float
        # associativity — require near-exact agreement on ~all points and
        # bounded energy in the mismatch
        diff = np.abs(got - want)
        assert np.mean(diff < 1e-3) > 0.99
        assert np.mean(diff**2) / np.mean(np.abs(want) ** 2) < 1e-3


def test_pallas_small_grid_and_single_rx():
    s, kk = 6, 100  # K not a multiple of 128, tiny pilot set
    pat = make_pattern(jax.random.key(5), s, kk, 0.10, "scattered")
    p = int(pat.positions.shape[0])
    vals = (
        jax.random.normal(jax.random.key(3), (1, p))
        + 1j * jax.random.normal(jax.random.key(4), (1, p))
    ).astype(jnp.complex64) * pat.valid
    got = np.asarray(
        interpolate_pallas(vals, pat.positions, pat.valid, (s, kk), "linear",
                           interpret=True)
    )
    want = np.asarray(
        interpolate(vals, pat.positions, pat.valid, (s, kk), "linear",
                    impl="xla")
    )
    assert got.shape == (1, s, kk)
    diff = np.abs(got - want)
    assert np.mean(diff < 1e-3) > 0.99

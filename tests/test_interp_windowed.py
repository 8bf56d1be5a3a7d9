"""Windowed k-NN candidate search must be exact vs brute-force all-pairs."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ce5g_tpu.estimators.interpolate import interp_weights, apply_interp
from ce5g_tpu.physics import make_pattern


@pytest.mark.parametrize("density", [0.02, 0.05, 0.10, 0.15])
@pytest.mark.parametrize("method", ["nearest", "linear", "cubic"])
def test_windowed_matches_bruteforce(density, method):
    s, kk = 14, 599
    pat = make_pattern(jax.random.key(int(density * 1000)), s, kk, density,
                       "scattered", max_density=0.15)
    w = interp_weights(pat.positions, pat.valid, (s, kk), method)

    # brute-force numpy distances
    pos = np.asarray(pat.positions).astype(float)
    valid = np.asarray(pat.valid)
    gs, gk = np.meshgrid(np.arange(s), np.arange(kk), indexing="ij")
    d2 = (gs.reshape(-1, 1) - pos[None, :, 0]) ** 2 + (
        gk.reshape(-1, 1) - pos[None, :, 1]
    ) ** 2
    d2[:, valid == 0] = np.inf

    k = {"nearest": 1, "linear": 3, "cubic": 8}[method]
    # compare the multiset of chosen distances (ties make indices ambiguous)
    chosen_d2 = np.take_along_axis(d2, np.asarray(w.idx), axis=1)
    best_d2 = np.sort(d2, axis=1)[:, :k]
    np.testing.assert_allclose(
        np.sort(chosen_d2, axis=1), best_d2, atol=1e-3
    )


def test_windowed_interpolation_values():
    """Interpolating a smooth field: windowed result == brute force values."""
    s, kk = 14, 599
    pat = make_pattern(jax.random.key(7), s, kk, 0.10, "scattered")
    pos = np.asarray(pat.positions)
    field = lambda sy, sc: np.exp(1j * (0.004 * sc + 0.03 * sy))
    vals = jnp.asarray(field(pos[:, 0], pos[:, 1]) * np.asarray(pat.valid),
                       jnp.complex64)
    w = interp_weights(pat.positions, pat.valid, (s, kk), "linear")
    grid = np.asarray(apply_interp(w, vals, (s, kk)))
    true = field(*np.meshgrid(np.arange(s), np.arange(kk), indexing="ij"))
    # smooth field → k-NN IDW is accurate away from edges
    err = np.abs(grid - true).mean()
    assert err < 0.05

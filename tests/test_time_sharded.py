"""Overlap-save time-sharded fading: must be (near) bit-identical to the
monolithic computation for every profile, including the 77-tap ETU."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ce5g_tpu import ExperimentConfig
from ce5g_tpu.parallel import make_mesh
from ce5g_tpu.parallel.time_sharded import (
    reference_time_domain_apply,
    sharded_time_domain_apply,
)
from ce5g_tpu.physics import PROFILE_INDEX, table_for


@pytest.mark.slow  # two dense-fading halo-exchange runs (~50s)
@pytest.mark.parametrize("profile", ["EPA", "ETU"])
def test_sharded_equals_monolithic(profile):
    cfg = ExperimentConfig()
    table = table_for(cfg)
    pi = PROFILE_INDEX[profile]
    amp = jnp.asarray(table.amp_overwrite[pi])
    delays = jnp.asarray(table.delay_samples[pi])
    valid = jnp.asarray(table.path_valid[pi])
    fs = 15.36e6

    n = 4096  # divisible by 8 devices → 512-sample blocks
    ntx, nrx = 2, 2
    key = jax.random.key(0)
    kx = jax.random.key(1)
    x = jax.lax.complex(
        jax.random.normal(kx, (ntx, n), jnp.float32),
        jax.random.normal(jax.random.key(2), (ntx, n), jnp.float32),
    )

    mono = reference_time_domain_apply(
        x, key, 200.0, amp, delays, valid, fs, nrx, ntx
    )
    mesh = make_mesh(data=8, model=1)
    shard = sharded_time_domain_apply(
        mesh, x, key, 200.0, amp, delays, valid, fs, nrx, ntx, halo=128
    )
    np.testing.assert_allclose(
        np.asarray(shard), np.asarray(mono), atol=2e-4
    )


@pytest.mark.slow
def test_halo_too_small_detected():
    """With halo < max delay, ETU must give a wrong (different) answer —
    guards that the halo actually matters (i.e. the test above is real)."""
    cfg = ExperimentConfig()
    table = table_for(cfg)
    pi = PROFILE_INDEX["ETU"]
    amp = jnp.asarray(table.amp_overwrite[pi])
    delays = jnp.asarray(table.delay_samples[pi])
    valid = jnp.asarray(table.path_valid[pi])
    n, ntx, nrx = 1024, 1, 1
    key = jax.random.key(3)
    x = jax.lax.complex(
        jax.random.normal(jax.random.key(4), (ntx, n), jnp.float32),
        jax.random.normal(jax.random.key(5), (ntx, n), jnp.float32),
    )
    mono = reference_time_domain_apply(x, key, 50.0, amp, delays, valid, 15.36e6, nrx, ntx)
    mesh = make_mesh(data=8, model=1)
    # halo must be ≥ max delay: 77 is the exact minimum for ETU, 40 breaks
    bad = sharded_time_domain_apply(
        mesh, x, key, 50.0, amp, delays, valid, 15.36e6, nrx, ntx, halo=40
    )
    ok = sharded_time_domain_apply(
        mesh, x, key, 50.0, amp, delays, valid, 15.36e6, nrx, ntx, halo=77
    )
    np.testing.assert_allclose(np.asarray(ok), np.asarray(mono), atol=2e-4)
    assert not np.allclose(np.asarray(bad), np.asarray(mono), atol=1e-3)

"""At-scale digest-manifest + fused generate->train (data/atscale.py)."""
import json

import numpy as np
import pytest

from ce5g_tpu.data import atscale


def test_digest_manifest_deterministic_and_verifies(small_cfg, tmp_path):
    m1 = atscale.generate_digest_split(
        small_cfg, str(tmp_path), num_samples=16, chunk_size=8, log=lambda *_: None
    )
    assert m1["num_chunks"] == 2
    # manifest written and JSON-round-trips
    mp = tmp_path / "atscale_digest_manifest.json"
    m_disk = json.loads(mp.read_text())
    assert m_disk["digests"].keys() == m1["digests"].keys()
    # every chunk regenerates to the exact same digest
    for i in range(m1["num_chunks"]):
        assert atscale.verify_digest_chunk(small_cfg, m1, i)
    # a tampered digest fails verification
    bad = json.loads(json.dumps(m1))
    bad["digests"]["H_true"][0][0] += 1.0
    assert not atscale.verify_digest_chunk(small_cfg, bad, 0)
    # a second full run is bit-identical (pure function of seed/split/idx)
    m2 = atscale.generate_digest_split(
        small_cfg, str(tmp_path), num_samples=16, chunk_size=8, log=lambda *_: None
    )
    for k in m1["digests"]:
        assert np.array_equal(m1["digests"][k], m2["digests"][k])


def test_digest_matches_materialized_chunk(small_cfg, tmp_path):
    """The digest of chunk i equals the digest computed from the arrays
    generator.generate_split would materialize for the same indices —
    the property that makes regenerate-and-verify meaningful."""
    import jax

    from ce5g_tpu.data import DatasetGenerator
    from ce5g_tpu.data.atscale import _array_digest

    m = atscale.generate_digest_split(
        small_cfg, str(tmp_path), num_samples=8, chunk_size=8, log=lambda *_: None
    )
    gen = DatasetGenerator(small_cfg, str(tmp_path))
    arrays = gen._run_chunk("atscale", np.arange(8))
    for k in m["digests"]:
        if k == "profile_idx":
            # materialized chunks store channel_type strings instead
            v = np.asarray(
                [{"EPA": 0, "EVA": 1, "ETU": 2}[c] for c in arrays["channel_type"]],
                np.int32,
            )
        else:
            v = arrays[k]
        got = np.asarray(jax.device_get(_array_digest(v)), np.float32)
        want = np.asarray(m["digests"][k][0], np.float32)
        np.testing.assert_allclose(got, want, rtol=2e-6)


def test_digest_rejects_partial_chunks(small_cfg, tmp_path):
    with pytest.raises(ValueError):
        atscale.generate_digest_split(
            small_cfg, str(tmp_path), num_samples=10, chunk_size=8
        )


def test_online_train_updates_and_reports(small_cfg):
    out = atscale.online_train(
        small_cfg, "cnn", total_samples=64, batch_size=16,
        steps_per_dispatch=2, log=lambda *_: None,
    )
    assert out["steps"] == 4
    assert out["total_samples"] == 64
    assert np.isfinite(out["first_loss"]) and np.isfinite(out["last_loss"])
    assert out["end_to_end_samples_per_second"] > 0

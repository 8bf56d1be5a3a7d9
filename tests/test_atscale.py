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
        # fused-program vs eager reduction orders differ; the alternating
        # component cancels toward 0, so it needs an absolute tolerance
        # scaled by the uncancelled magnitude sum (component 0)
        np.testing.assert_allclose(
            got, want, rtol=3e-5, atol=1e-4 * max(want[0], 1.0)
        )


def test_digest_rejects_partial_chunks(small_cfg, tmp_path):
    with pytest.raises(ValueError):
        atscale.generate_digest_split(
            small_cfg, str(tmp_path), num_samples=10, chunk_size=8
        )


def test_online_train_updates_and_reports(small_cfg, tmp_path):
    # steps_per_dispatch=1 keeps the scanned body single-step — the CPU
    # compile of sim+grad dominates this test's runtime
    out = atscale.online_train(
        small_cfg, "cnn", total_samples=32, batch_size=16,
        steps_per_dispatch=1, lr_schedule="cosine",
        checkpoint_dir=str(tmp_path / "cnn_online_best"),
        log=lambda *_: None,
    )
    assert out["steps"] == 2
    assert out["total_samples"] == 32
    assert np.isfinite(out["first_loss"]) and np.isfinite(out["last_loss"])
    assert out["end_to_end_samples_per_second"] > 0
    assert (tmp_path / "cnn_online_best" / "state.npz").exists()
    assert (tmp_path / "cnn_online_best" / "meta.json").exists()


@pytest.mark.slow  # compiles the blind-prior estimator inside the train scan
def test_online_train_blind_wiener_layout(small_cfg):
    import dataclasses

    # keep the density grid >= 5% on the tiny 6x40 grid: the default 1%
    # draw leaves 2 pilots per frame, and the blind-Wiener feature's
    # extrapolation from 2 points is (correctly) wild — the production
    # grids have >=84 pilots at 1% (K=599)
    cfg = dataclasses.replace(
        small_cfg,
        pilots=dataclasses.replace(small_cfg.pilots, density=(0.05, 0.1)),
    )
    out = atscale.online_train(
        cfg, "cnn", total_samples=32, batch_size=16,
        steps_per_dispatch=1, wiener_estimator="mmse_full_est",
        loss_type="nmse", log=lambda *_: None,
    )
    assert out["wiener_estimator"] == "mmse_full_est"
    assert out["loss_type"] == "nmse"
    assert np.isfinite(out["last_loss"])

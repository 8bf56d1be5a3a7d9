"""End-to-end L3+L4: dataset generation → verification → training →
checkpoint round-trip. Small numerology for CPU speed."""
import json

import jax
import numpy as np
import pytest

from ce5g_tpu import (
    ChannelConfig,
    DatasetConfig,
    ExperimentConfig,
    MIMOConfig,
    ModelConfig,
    OFDMConfig,
    PilotConfig,
    SimulationConfig,
    TrainingConfig,
)
from ce5g_tpu.data import DatasetGenerator, verify_dataset
from ce5g_tpu.train import ChannelDataset, Trainer, load_checkpoint, save_checkpoint


@pytest.fixture(scope="module")
def tiny_cfg(tmp_path_factory):
    return ExperimentConfig(
        ofdm=OFDMConfig(fft_size=64, cp_length=8, num_symbols=6, useful_subcarriers=40),
        mimo=MIMOConfig(num_tx=2, num_rx=2),
        channel=ChannelConfig(doppler_hz=(50.0,)),
        pilots=PilotConfig(density=(0.1,), max_density=0.15),
        simulation=SimulationConfig(snr_range_db=(10.0, 20.0)),
        dataset=DatasetConfig(chunk_size=8),
        model=ModelConfig(
            cnn_hidden_channels=(8, 8),
            lstm_hidden_size=8,
            lstm_num_layers=1,
        ),
        training=TrainingConfig(
            epochs=2,
            batch_size=4,
            mixed_precision=False,
            save_freq=100,
            early_stopping=False,
        ),
    )


@pytest.fixture(scope="module")
def data_dir(tiny_cfg, tmp_path_factory):
    d = tmp_path_factory.mktemp("data")
    gen = DatasetGenerator(tiny_cfg, str(d))
    logs = []
    gen.generate_split("train", 20, log=logs.append)
    gen.generate_split("val", 8, log=logs.append)
    return d


class TestGeneration:
    def test_manifest_and_chunks(self, data_dir):
        manifest = json.loads((data_dir / "train_manifest.json").read_text())
        assert manifest["completed"] == 20
        assert len(manifest["files"]) == 3  # 8+8+4
        assert manifest["samples_per_second"] > 0

    def test_verify_passes(self, data_dir):
        report = verify_dataset(str(data_dir / "train_manifest.json"))
        assert report["passed"], report

    def test_resume_skips_done(self, tiny_cfg, data_dir):
        gen = DatasetGenerator(tiny_cfg, str(data_dir))
        calls = []
        gen.generate_split("train", 20, resume=True, log=calls.append)
        assert calls == []  # nothing regenerated

    def test_deterministic_regeneration(self, tiny_cfg, tmp_path_factory):
        """Same seed → identical chunks (fold_in key determinism)."""
        d1 = tmp_path_factory.mktemp("g1")
        d2 = tmp_path_factory.mktemp("g2")
        for d in (d1, d2):
            DatasetGenerator(tiny_cfg, str(d)).generate_split(
                "val", 8, log=lambda *_: None
            )
        with np.load(d1 / "val_chunk_00000.npz") as a, np.load(
            d2 / "val_chunk_00000.npz"
        ) as b:
            np.testing.assert_allclose(a["H_true"], b["H_true"])
            np.testing.assert_allclose(a["rx_symbols"], b["rx_symbols"])

    def test_merge(self, tiny_cfg, data_dir):
        gen = DatasetGenerator(tiny_cfg, str(data_dir))
        out = gen.merge_split("train")
        with np.load(out) as z:
            assert z["rx_symbols"].shape[0] == 20
            assert str(z["channel_type"][0]) in ("EPA", "EVA", "ETU")


class TestTraining:
    def test_cnn_trains_and_improves(self, tiny_cfg, data_dir, tmp_path):
        train_ds = ChannelDataset(str(data_dir / "train_manifest.json"))
        val_ds = ChannelDataset(str(data_dir / "val_manifest.json"))
        trainer = Trainer(tiny_cfg, model_type="cnn", log=lambda *_: None)
        result = trainer.train(train_ds, val_ds, epochs=2, model_dir=str(tmp_path))
        assert result["epochs_run"] == 2
        assert np.isfinite(result["best_val_loss"])
        assert (tmp_path / "cnn_final" / "state.npz").exists()
        assert (tmp_path / "cnn_history.json").exists()

    def test_checkpoint_roundtrip(self, tiny_cfg, tmp_path):
        from ce5g_tpu.models import get_model
        import jax.numpy as jnp

        m1 = get_model("cnn", tiny_cfg.model, seed=1)
        save_checkpoint(tmp_path / "ck", m1, epoch=3, val_loss=0.5)
        m2 = get_model("cnn", tiny_cfg.model, seed=2)
        x = jnp.ones((1, 6, 39, 5))
        assert not np.allclose(np.asarray(m1(x)), np.asarray(m2(x)))
        meta = load_checkpoint(tmp_path / "ck", m2)
        assert meta["epoch"] == 3
        np.testing.assert_allclose(np.asarray(m1(x)), np.asarray(m2(x)), atol=1e-6)

    def test_resume_matches_unbroken_run(self, tiny_cfg, data_dir, tmp_path):
        """Kill-and-resume parity (reference run_phase4_training.py:241-259):
        2 epochs + resume + 2 epochs must produce the same loss trajectory
        as 4 unbroken epochs — optimizer state, scheduler counters, AND
        dropout RNG streams all restored from the rolling _last checkpoint."""
        train_ds = ChannelDataset(str(data_dir / "train_manifest.json"))
        val_ds = ChannelDataset(str(data_dir / "val_manifest.json"))

        dir_a, dir_b = tmp_path / "unbroken", tmp_path / "resumed"
        t_a = Trainer(tiny_cfg, model_type="cnn", log=lambda *_: None)
        res_a = t_a.train(train_ds, val_ds, epochs=4, model_dir=str(dir_a))

        t_b1 = Trainer(tiny_cfg, model_type="cnn", log=lambda *_: None)
        t_b1.train(train_ds, val_ds, epochs=2, model_dir=str(dir_b))
        # simulate a crash: fresh process state, new Trainer
        t_b2 = Trainer(tiny_cfg, model_type="cnn", log=lambda *_: None)
        start = t_b2.resume(dir_b / "cnn_last")
        assert start == 2
        res_b = t_b2.train(train_ds, val_ds, epochs=4, model_dir=str(dir_b))

        assert res_b["epochs_run"] == 4
        np.testing.assert_allclose(
            res_a["history"]["train_loss"], res_b["history"]["train_loss"], rtol=1e-5
        )
        np.testing.assert_allclose(
            res_a["history"]["val_loss"], res_b["history"]["val_loss"], rtol=1e-5
        )
        assert res_b["best_val_loss"] == pytest.approx(res_a["best_val_loss"], rel=1e-5)

    def test_wiener_residual_path(self, tiny_cfg, data_dir, tmp_path):
        """Round-4 wiener plumbing: sidecar → 7-channel dataset → residual
        head training → evaluation via the *_wiener model name. A
        zero-output model must reproduce the wiener feature exactly
        (models/inputs.py apply_output_residual)."""
        import dataclasses

        import jax.numpy as jnp

        from ce5g_tpu.data.wiener import compute_wiener_sidecar
        from ce5g_tpu.models.inputs import apply_output_residual

        wm = compute_wiener_sidecar(
            tiny_cfg, data_dir / "train_manifest.json", batch_size=8,
            log=lambda *_: None,
        )
        assert len(wm["files"]) == 3
        compute_wiener_sidecar(
            tiny_cfg, data_dir / "val_manifest.json", batch_size=8,
            log=lambda *_: None,
        )

        ds = ChannelDataset(str(data_dir / "train_manifest.json"), wiener=True)
        b = ds.make_batch(np.arange(4))
        assert b.inputs.shape[-1] == 7
        # zero residual ⇒ output IS the normalized wiener feature
        zero_pred = jnp.zeros(b.targets.shape, jnp.float32)
        out = np.asarray(apply_output_residual(zero_pred, jnp.asarray(b.inputs)))
        np.testing.assert_allclose(out, b.inputs[..., 5:7], atol=1e-7)
        # wiener channels share the TARGET normalizer
        hw = ds.arrays["H_wiener"][:4]
        np.testing.assert_allclose(
            b.inputs[..., 5], hw.real / ds.stats["h_std"], atol=1e-6
        )

        cfg7 = dataclasses.replace(
            tiny_cfg,
            model=dataclasses.replace(tiny_cfg.model, input_channels=7),
        )
        train_ds = ds
        val_ds = ChannelDataset(str(data_dir / "val_manifest.json"), wiener=True)
        trainer = Trainer(
            cfg7, model_type="cnn", log=lambda *_: None, name="cnn_wiener"
        )
        result = trainer.train(train_ds, val_ds, epochs=1, model_dir=str(tmp_path))
        assert np.isfinite(result["best_val_loss"])
        assert (tmp_path / "cnn_wiener_best" / "state.npz").exists()

        from ce5g_tpu.eval import ModelEvaluator

        ev = ModelEvaluator(cfg7, str(tmp_path), results_dir=str(tmp_path))
        r = ev.evaluate_model("cnn_wiener", val_ds, num_samples=4, batch_size=4)
        assert np.isfinite(r["nmse_db"])

    def test_lstm_path(self, tiny_cfg, data_dir, tmp_path):
        train_ds = ChannelDataset(str(data_dir / "train_manifest.json"))
        val_ds = ChannelDataset(str(data_dir / "val_manifest.json"))
        trainer = Trainer(tiny_cfg, model_type="lstm", log=lambda *_: None)
        result = trainer.train(train_ds, val_ds, epochs=1, model_dir=str(tmp_path))
        assert np.isfinite(result["best_val_loss"])
        # explicit device_data=True routes RNN models through the
        # device-resident per-step path (round 5) — same semantics
        t2 = Trainer(
            tiny_cfg, model_type="lstm", log=lambda *_: None, device_data=True
        )
        r2 = t2.train(train_ds, val_ds, epochs=1, model_dir=str(tmp_path / "d"))
        assert np.isfinite(r2["best_val_loss"])
        # evaluator must handle recurrent modules (nnx.RNN mutates RngCount
        # even at train=False → needs nnx.jit, round-4 regression)
        from ce5g_tpu.eval import ModelEvaluator

        ev = ModelEvaluator(tiny_cfg, str(tmp_path), results_dir=str(tmp_path))
        r = ev.evaluate_model("lstm", val_ds, num_samples=4, batch_size=4)
        assert np.isfinite(r["nmse_db"])


class TestSchedules:
    def test_lr_schedules(self, tiny_cfg):
        from dataclasses import replace

        from ce5g_tpu.train import lr_schedule_per_epoch

        c = replace(
            tiny_cfg, training=replace(tiny_cfg.training, epochs=100, lr_scheduler="cosine")
        )
        assert lr_schedule_per_epoch(c, 0) == pytest.approx(1e-3)
        assert lr_schedule_per_epoch(c, 100) == pytest.approx(0.0, abs=1e-9)
        c = replace(c, training=replace(c.training, lr_scheduler="step"))
        assert lr_schedule_per_epoch(c, 29) == pytest.approx(1e-3)
        assert lr_schedule_per_epoch(c, 30) == pytest.approx(1e-4)
        c = replace(c, training=replace(c.training, lr_scheduler="warm_restarts"))
        assert lr_schedule_per_epoch(c, 0) == pytest.approx(1e-3)
        assert lr_schedule_per_epoch(c, 10) == pytest.approx(1e-3)  # restart
        assert lr_schedule_per_epoch(c, 30) == pytest.approx(1e-3)  # 2nd restart


class TestResumeConsistency:
    """ADVICE r1 (medium): resume with a changed num_samples must never
    drop, duplicate, or mix samples."""

    def _gen(self, cfg, d, n, resume=False):
        g = DatasetGenerator(cfg, str(d))
        g.generate_split("train", n, resume=resume, log=lambda *_: None)
        return g

    def test_grow_after_partial_chunk(self, tiny_cfg, tmp_path):
        """chunk_size 8: 6 then resume→10 must equal a fresh 10-sample run."""
        from dataclasses import replace

        cfg = replace(tiny_cfg, dataset=DatasetConfig(chunk_size=4))
        d1, d2 = tmp_path / "a", tmp_path / "b"
        self._gen(cfg, d1, 6)
        g = self._gen(cfg, d1, 10, resume=True)
        self._gen(cfg, d2, 10)
        a = __import__("ce5g_tpu.data.generator", fromlist=["read_split"]).read_split(
            str(d1 / "train_manifest.json")
        )
        b = __import__("ce5g_tpu.data.generator", fromlist=["read_split"]).read_split(
            str(d2 / "train_manifest.json")
        )
        assert a["H_true"].shape[0] == 10
        np.testing.assert_allclose(a["H_true"], b["H_true"])
        report = verify_dataset(str(d1 / "train_manifest.json"))
        assert report["passed"] and report["checks"]["sample_count"]["passed"]

    def test_shrink_prunes(self, tiny_cfg, tmp_path):
        from dataclasses import replace

        from ce5g_tpu.data.generator import read_split

        cfg = replace(tiny_cfg, dataset=DatasetConfig(chunk_size=4))
        self._gen(cfg, tmp_path, 10)
        self._gen(cfg, tmp_path, 6, resume=True)
        a = read_split(str(tmp_path / "train_manifest.json"))
        assert a["H_true"].shape[0] == 6
        # stale chunk files deleted
        import json as _json

        manifest = _json.loads((tmp_path / "train_manifest.json").read_text())
        on_disk = sorted(p.name for p in tmp_path.glob("train_chunk_*"))
        assert on_disk == sorted(manifest["files"])

    def test_fingerprint_mismatch_restarts(self, tiny_cfg, tmp_path):
        """Changing save_format (or any content-relevant cfg) on resume must
        start fresh, not mix chunk formats in one manifest."""
        from dataclasses import replace

        self._gen(tiny_cfg, tmp_path, 8)
        cfg2 = replace(tiny_cfg, dataset=DatasetConfig(chunk_size=8, save_format="h5"))
        g2 = DatasetGenerator(cfg2, str(tmp_path))
        m = g2.generate_split("train", 8, resume=True, log=lambda *_: None)
        assert all(f.endswith(".h5") for f in m["files"])
        report = verify_dataset(str(tmp_path / "train_manifest.json"))
        assert report["passed"], report

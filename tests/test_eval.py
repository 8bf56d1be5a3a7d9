"""Evaluation-layer tests: baselines, model evaluation, SNR sweep,
pilot optimization, HP tuning, reports."""
import json

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
from ce5g_tpu.data import DatasetGenerator
from ce5g_tpu.eval import (
    HyperparameterTuner,
    ModelEvaluator,
    PilotOptimizer,
    evaluate_baselines,
    generate_evaluation_report,
    generate_final_report,
)
from ce5g_tpu.train import ChannelDataset, Trainer


@pytest.fixture(scope="module")
def tiny_cfg():
    return ExperimentConfig(
        ofdm=OFDMConfig(fft_size=64, cp_length=8, num_symbols=6, useful_subcarriers=40),
        mimo=MIMOConfig(num_tx=2, num_rx=2),
        channel=ChannelConfig(doppler_hz=(50.0,)),
        pilots=PilotConfig(density=(0.1,), max_density=0.15),
        # generation-relevant fields MATCH tests/test_data_train.py's
        # tiny_cfg so both files share one compiled generation pipeline
        # (data/generator.py _generation_key)
        simulation=SimulationConfig(snr_range_db=(10.0, 20.0)),
        dataset=DatasetConfig(chunk_size=8),
        model=ModelConfig(cnn_hidden_channels=(8,)),
        training=TrainingConfig(
            epochs=1, batch_size=4, mixed_precision=False,
            early_stopping=False, save_freq=100,
        ),
    )


@pytest.fixture(scope="module")
def setup(tiny_cfg, tmp_path_factory):
    root = tmp_path_factory.mktemp("eval")
    gen = DatasetGenerator(tiny_cfg, str(root / "data"))
    gen.generate_split("train", 16, log=lambda *_: None)
    gen.generate_split("val", 8, log=lambda *_: None)
    gen.generate_split("test", 8, log=lambda *_: None)
    train_ds = ChannelDataset(str(root / "data" / "train_manifest.json"))
    val_ds = ChannelDataset(str(root / "data" / "val_manifest.json"))
    test_ds = ChannelDataset(str(root / "data" / "test_manifest.json"))
    trainer = Trainer(tiny_cfg, model_type="cnn", log=lambda *_: None)
    trainer.train(train_ds, val_ds, epochs=1, model_dir=str(root / "models"))
    return root, train_ds, val_ds, test_ds


def test_baselines(setup):
    _, _, _, test_ds = setup
    r = evaluate_baselines(test_ds)
    assert np.isfinite(r["LS"]["nmse_db"])
    assert np.isfinite(r["MMSE"]["nmse_db"])
    # simplified MMSE shrinks toward zero → never (much) worse than LS here
    assert r["MMSE"]["nmse"] <= r["LS"]["nmse"] * 1.05


def test_evaluate_estimators_rerun(setup, tiny_cfg):
    """The real estimators re-run on stored frames must (a) carry a latency
    column (reference evaluate.py:60-80) and (b) reproduce the stored-H_ls
    NMSE for 'ls' — same algorithm, same inputs, so rebuilding Frames from
    the dataset arrays is validated end-to-end."""
    from ce5g_tpu.eval import evaluate_estimators

    _, _, _, test_ds = setup
    r = evaluate_estimators(test_ds, tiny_cfg, ("ls", "mmse_full"), batch_size=4)
    stored = evaluate_baselines(test_ds)
    assert r["ls"]["latency_ms_per_sample"] > 0
    assert r["mmse_full"]["latency_ms_per_sample"] > 0
    np.testing.assert_allclose(
        r["ls"]["nmse"], stored["LS"]["nmse"], rtol=1e-4
    )
    # the full Wiener estimator beats interpolated LS on average
    assert r["mmse_full"]["nmse_db"] < r["ls"]["nmse_db"]


def test_model_evaluation(setup, tiny_cfg):
    root, _, _, test_ds = setup
    ev = ModelEvaluator(tiny_cfg, str(root / "models"), str(root / "results"))
    r = ev.evaluate_model("cnn", test_ds, batch_size=4)
    assert np.isfinite(r["nmse_db"])
    assert r["latency_ms_per_sample"] > 0
    assert r["params"] > 0


def test_snr_sweep_and_report(setup, tiny_cfg):
    root, _, _, test_ds = setup
    ev = ModelEvaluator(tiny_cfg, str(root / "models"), str(root / "results"))
    sweep = ev.snr_sweep(test_ds, ["cnn"])
    assert set(sweep) == {"LS", "MMSE", "mmse_full", "cnn"}
    for by_snr in sweep.values():
        for cell in by_snr.values():
            assert np.isfinite(cell["nmse_db"])
            assert 0 < cell["ber"] <= 0.5

    results = {"LS": {"nmse_db": 1.0, "mse": 0.1},
               "cnn": {"nmse_db": -5.0, "mse": 0.01, "latency_ms_per_sample": 1.0,
                       "params": 100}}
    text = generate_evaluation_report(results, root / "results" / "rep.md")
    assert "Improvement vs LS" in text and "+6.00 dB" in text


def test_pilot_optimizer(tiny_cfg, tmp_path):
    opt = PilotOptimizer(tiny_cfg, str(tmp_path))
    res = opt.sweep(
        densities=(0.05, 0.10),
        snrs_db=(10.0,),
        estimators=("ls", "mmse_full"),
        frames_per_cell=4,
    )
    assert set(res["results"]) == {"ls", "mmse_full"}
    # more pilots → better (or equal) NMSE for mmse_full
    r = res["results"]["mmse_full"]
    assert r["0.1"]["10.0"] <= r["0.05"]["10.0"] + 0.5
    for est in ("ls", "mmse_full"):
        assert res["recommendation"][est]["best_density"] in (0.05, 0.10)
    opt.save(res)
    assert (tmp_path / "pilot_optimization_results.json").exists()


def test_tuner_random(setup, tiny_cfg, tmp_path):
    _, train_ds, val_ds, _ = setup
    tuner = HyperparameterTuner(
        tiny_cfg, train_ds, val_ds, str(tmp_path),
        quick_train=8, quick_val=4, epochs_per_trial=1, log=lambda *_: None,
    )
    space = {"learning_rate": [1e-3, 3e-3], "dropout": (0.0, 0.2),
             "hidden_channels": [(8,)]}
    results = tuner.random_search(num_trials=2, space=space)
    assert len(results) == 2
    assert results[0]["val_loss"] <= results[1]["val_loss"]
    assert (tmp_path / "random_search_results.json").exists()


def test_final_report(setup, tiny_cfg):
    root, *_ = setup
    rd = root / "results"
    rd.mkdir(exist_ok=True)
    (rd / "some_results.json").write_text(json.dumps({"a": 1}))
    text = generate_final_report(str(rd))
    assert "some_results" in text
    assert (rd / "FINAL_REPORT.md").exists()

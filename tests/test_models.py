"""Model smoke tests (porting reference ai_models.py:431-475 __main__):
forward shapes, parameter behavior, loss values, factory coverage."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

from ce5g_tpu import ModelConfig
from ce5g_tpu.models import (
    channel_estimation_loss,
    count_parameters,
    get_model,
    grid_inputs,
    lstm_inputs,
)

S, K = 6, 64  # small grid for speed; shape logic is size-agnostic


@pytest.mark.parametrize("mtype", ["cnn", "resnet", "hybrid", "transformer"])
def test_grid_model_shapes(mtype):
    cfg = ModelConfig(
        cnn_hidden_channels=(8, 16),
        hybrid_cnn_channels=(8, 16),
        hybrid_lstm_hidden=16,
        hybrid_lstm_layers=1,
        resnet_base_channels=8,
        resnet_num_blocks=2,
    )
    model = get_model(mtype, cfg)
    x = jnp.ones((2, S, K, 5))
    y = model(x)
    assert y.shape == (2, S, K, 2)
    assert y.dtype == jnp.float32
    assert count_parameters(model) > 0


def test_lstm_shape():
    cfg = ModelConfig(lstm_hidden_size=16, lstm_num_layers=2)
    model = get_model("lstm", cfg)
    x = jnp.ones((2, 32, 4))
    y = model(x)
    assert y.shape == (2, 32, 2)


def test_train_vs_eval_mode():
    """Dropout active only in train mode; BN uses batch stats in train."""
    cfg = ModelConfig(cnn_hidden_channels=(8,), cnn_dropout=0.5)
    model = get_model("cnn", cfg)
    x = jax.random.normal(jax.random.key(0), (4, S, K, 5))
    y_eval1 = model(x, train=False)
    y_eval2 = model(x, train=False)
    np.testing.assert_allclose(np.asarray(y_eval1), np.asarray(y_eval2))


def test_loss_parity_values():
    pred = jnp.zeros((2, S, K, 2))
    target = jnp.ones((2, S, K, 2))
    assert float(channel_estimation_loss(pred, target, loss_type="mse")) == 1.0
    assert float(channel_estimation_loss(pred, target, loss_type="mae")) == 1.0
    # huber with delta=1: 0.5 for unit error
    assert abs(float(channel_estimation_loss(pred, target, loss_type="huber")) - 0.5) < 1e-6
    # pilot-weighted term adds mask-restricted loss
    mask = jnp.zeros((2, S, K)).at[:, 0, 0].set(1.0)
    v = channel_estimation_loss(pred, target, mask, pilot_weight=1.0)
    expected = 1.0 + float(jnp.mean((mask[..., None] * 1.0) ** 2))
    assert abs(float(v) - expected) < 1e-6
    # nmse: mean over samples of ‖err‖²/‖target‖² — exactly the eval
    # metric; sample 1 scaled 2× must change nothing (scale-invariant)
    t2 = target.at[1].multiply(2.0)
    v_nmse = channel_estimation_loss(pred, t2, loss_type="nmse")
    assert abs(float(v_nmse) - 1.0) < 1e-5


def test_input_preparation(cfg):
    b, s, r, t, k = 3, 4, 2, 2, 16
    key = jax.random.key(0)
    rx = jax.random.normal(key, (b, s, r, k)) + 1j * jax.random.normal(key, (b, s, r, k))
    h = jax.random.normal(key, (b, s, r, t, k)) + 0j
    mask = jnp.zeros((b, s, k)).at[:, ::2, ::4].set(1.0)
    batch = grid_inputs(rx, h, h, mask)
    assert batch.inputs.shape == (b, s, k, 5)
    assert batch.targets.shape == (b, s, k, 2)
    np.testing.assert_allclose(np.asarray(batch.inputs[..., 4]), np.asarray(mask))
    x, y = lstm_inputs(batch)
    assert x.shape == (b, s * k, 4)
    assert y.shape == (b, s * k, 2)


def test_unknown_model_raises():
    with pytest.raises(ValueError):
        get_model("nope", ModelConfig())


def test_pilot_term_uses_base_loss_type():
    """ADVICE r1: the pilot-masked term must apply the configured base loss
    (reference feeds masked tensors through the same criterion)."""
    pred = jnp.zeros((2, S, K, 2))
    target = jnp.full((2, S, K, 2), 2.0)  # |err|=2 → mae≠mse≠huber
    mask = jnp.ones((2, S, K))
    for lt, base in (("mse", 4.0), ("mae", 2.0), ("huber", 1.5)):
        v = float(
            channel_estimation_loss(pred, target, mask, loss_type=lt,
                                    pilot_weight=1.0)
        )
        assert abs(v - 2 * base) < 1e-6, (lt, v)

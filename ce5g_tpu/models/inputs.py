"""ML input/target layouts.

Parity surface: reference src/train.py:63-94 and
run_phase4_training.py:95-103 — the 5-channel real grid
[rx_re, rx_im, H_ls_re, H_ls_im, pilot_mask] over the first antenna pair,
targets [H_re, H_im]; and run_phase6_advanced_training.py:96-105 — the
LSTM's flattened ``(S*K, 4)`` sequence layout (pilot-mask channel dropped).

Channel-last layout (NHWC) is deliberate: XLA:TPU convolutions want the
feature axis minor, so no transposes sit between the data pipeline and the
MXU.
"""
from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax.numpy as jnp


class MLBatch(NamedTuple):
    """One training batch: NHWC inputs/targets + pilot mask + host stats."""

    inputs: Any  # (B, S, K, 5) float32
    targets: Any  # (B, S, K, 2) float32
    pilot_mask: Any  # (B, S, K) float32
    stats: Optional[Dict[str, float]] = None


def grid_inputs(rx, h_ls, h_true, pilot_mask, stats: Optional[Dict] = None) -> MLBatch:
    """Build the 5-channel grid batch from complex frame tensors.

    Args:
        rx: (B, S, R, K) complex received grid.
        h_ls: (B, S, R, T, K) complex LS estimate (input feature).
        h_true: (B, S, R, T, K) complex true channel (target).
        pilot_mask: (B, S, K) float mask.
        stats: optional {rx_std, hls_std, h_std} normalizers.

    Uses the first (rx, tx) antenna pair, matching the reference's
    dataset layout (run_phase4_training.py:95-103).
    """
    st = stats or {"rx_std": 1.0, "hls_std": 1.0, "h_std": 1.0}
    rx0 = rx[:, :, 0, :]
    ls0 = h_ls[:, :, 0, 0, :]
    ht0 = h_true[:, :, 0, 0, :]
    mask = jnp.asarray(pilot_mask, jnp.float32)
    inputs = jnp.stack(
        [
            jnp.real(rx0) / st["rx_std"],
            jnp.imag(rx0) / st["rx_std"],
            jnp.real(ls0) / st["hls_std"],
            jnp.imag(ls0) / st["hls_std"],
            mask,
        ],
        axis=-1,
    ).astype(jnp.float32)
    targets = jnp.stack(
        [jnp.real(ht0) / st["h_std"], jnp.imag(ht0) / st["h_std"]], axis=-1
    ).astype(jnp.float32)
    return MLBatch(inputs, targets, mask, st)


def apply_output_residual(pred, inputs):
    """Residual-on-Wiener output head (round-4 extension, no reference
    counterpart).

    When the inputs carry the full-Wiener feature (channels 5:6 of the
    7-channel layout built by ``ChannelDataset(wiener=True)``), the model's
    output is interpreted as a RESIDUAL on top of that feature:
    ``Ĥ = Ĥ_wiener + f(x)``. A zero-output model is then exactly the
    conditional-mean classical estimator, so training can only improve on
    it. The check is on the STATIC channel count — jit-safe, and a no-op
    for the 5-channel parity layout.
    """
    if inputs.shape[-1] >= 7:
        return pred + inputs[..., 5:7].astype(pred.dtype)
    return pred


def lstm_inputs(batch: MLBatch) -> Tuple[Any, Any]:
    """Flattened sequence layout for the pure-LSTM model
    (run_phase6_advanced_training.py:96-105): drop the pilot-mask channel,
    fold the (S, K) grid into one S*K sequence."""
    x = jnp.asarray(batch.inputs)
    y = jnp.asarray(batch.targets)
    b, s, k, _ = x.shape
    return x[..., :4].reshape(b, s * k, 4), y.reshape(b, s * k, 2)

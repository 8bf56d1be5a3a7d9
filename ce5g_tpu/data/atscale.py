"""At-scale single-chip generation (BASELINE config #5's single-chip half).

Two demonstrations, both sized for >=100k frames on one chip:

1. **Digest-manifest materialization** (:func:`generate_digest_split`) —
   the full factory pipeline (param draws -> Jakes fading -> OFDM ->
   measured-power AWGN -> LS/interpolation feature; reference
   dataset_generator.py:114-117 + run_phase3_robust.py chunking) runs at
   device rate; what crosses the wire per chunk is a 3-scalar-per-array
   statistical digest instead of ~0.8 MB/frame of raw tensors. The
   manifest records the key schedule (seed, split, fingerprint, chunk
   grid) plus the per-chunk digests: every sample is a pure function of
   ``(seed, split, index)`` (generator.py fold_in design), so any host can
   later materialize any chunk independently and check it against its
   digest — exactly how a pod materializes a 1M-frame dataset with zero
   cross-host traffic (the multi-writer path, tests/test_multiwriter.py).
   :func:`verify_digest_chunk` re-generates one chunk and compares
   digests exactly (same program + same device => bit-identical sums).

2. **Fused generate->train** (:func:`online_train`) — the dataset never
   leaves the chip at all: one jit step generates a fresh batch from
   fold_in keys and feeds it straight into the model's SGD update.
   Samples/s here is true end-to-end (data production -> consumed
   gradient) with no storage in the loop — the TPU-native answer to
   "storage can't keep up with the factory", and the regime BASELINE
   config #5 actually cares about (the reference generates datasets in
   order to train on them).

Transport note: on this dev setup device->host runs ~3 MB/s through the
TPU tunnel (results/factory_throughput.json: fetch_bound_fraction
0.999), so full-fidelity byte materialization is transport-bound, not
framework-bound; the native codec writes ~340 MB/s on this 2-core host
(data/ce5g_format.py header) and threads with cores on a deployment
host colocated with the chip.
"""
from __future__ import annotations

import functools
import json
import time
from pathlib import Path
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ExperimentConfig
from ..estimators.api import estimate_batch
from ..physics.simulate import simulate_batch, table_for
from ..utils.rng import split_key
from .generator import CHUNK_KEYS, DatasetGenerator, draw_params, _generation_key


def _array_digest(v) -> jnp.ndarray:
    """(3,) f32 digest: sum|x|, sum|x|^2, alternating-sign sum|x|.

    The alternating-sign component makes the digest order-sensitive (a
    permutation of samples changes it), which plain moments are not.
    Deterministic: the same compiled program on the same device produces
    bit-identical sums, so exact comparison is valid for
    regenerate-and-verify. (Cross-device/backends agree only
    approximately — full bit-level verification of materialized bytes is
    data/verify.py's job.)
    """
    va = jnp.abs(v) if jnp.iscomplexobj(v) else jnp.asarray(v, jnp.float32)
    va = va.astype(jnp.float32).reshape(-1)
    sign = 1.0 - 2.0 * (jnp.arange(va.shape[0], dtype=jnp.float32) % 2.0)
    return jnp.stack([jnp.sum(va), jnp.sum(va * va), jnp.sum(va * sign)])


@functools.lru_cache(maxsize=4)
def _digest_fn_cached(cfg: ExperimentConfig) -> Callable:
    """jit: (chunk_size,) keys -> {array_name: (3,) f32 digest}.

    Same body as generator.generate_chunk_fn but the reduction happens
    ON DEVICE inside the same program, so XLA frees the frame tensors
    without a host round-trip and the chip never idles on the tunnel.
    """
    table = table_for(cfg)

    def dig(keys):
        kp = jax.vmap(lambda k: jax.random.fold_in(k, 0))(keys)
        ks = jax.vmap(lambda k: jax.random.fold_in(k, 1))(keys)
        params = draw_params(kp, cfg)
        frames = simulate_batch(ks, params, cfg=cfg, table=table)
        h_ls = estimate_batch(
            frames, cfg=cfg, estimator="ls", method=cfg.pilots.interpolation,
            table=table,
        )
        arrays = {
            "rx_symbols": frames.rx_symbols,
            "tx_symbols": frames.tx_symbols,
            "H_true": frames.channel,
            "H_ls": h_ls,
            "pilot_mask": frames.pilot_mask,
            "snr_db": params.snr_db,
            "doppler_hz": params.doppler_hz,
            "pilot_density": params.pilot_density,
            "profile_idx": params.profile_idx,
        }
        return {k: _array_digest(v) for k, v in arrays.items()}

    return jax.jit(dig)


def _chunk_keys(cfg: ExperimentConfig, split: str, chunk_idx: int, chunk_size: int):
    sk = split_key(cfg.seed, split)
    idxs = jnp.arange(chunk_idx * chunk_size, (chunk_idx + 1) * chunk_size)
    return jax.vmap(lambda i: jax.random.fold_in(sk, i))(idxs)


def generate_digest_split(
    cfg: ExperimentConfig,
    output_dir: str,
    split: str = "atscale",
    num_samples: int = 131072,
    chunk_size: int = 2048,
    log=print,
) -> Dict:
    """Run the factory over ``num_samples`` frames at device rate, fetching
    only per-chunk digests; write ``{split}_digest_manifest.json``.

    ``num_samples`` must be a multiple of ``chunk_size`` (digest chunks
    are never padded — a partial chunk would digest differently than its
    materialized counterpart)."""
    if num_samples % chunk_size:
        raise ValueError("num_samples must be a multiple of chunk_size")
    out = Path(output_dir)
    out.mkdir(parents=True, exist_ok=True)
    fn = _digest_fn_cached(_generation_key(cfg))
    num_chunks = num_samples // chunk_size

    # compile (not counted in the sustained rate)
    d0 = fn(_chunk_keys(cfg, split, 0, chunk_size))
    jax.block_until_ready(d0)
    # synchronous single-chunk time: corroborates the async sustained
    # rate below (per-chunk compute must be consistent with it)
    ts = time.perf_counter()
    jax.block_until_ready(fn(_chunk_keys(cfg, split, 0, chunk_size)))
    sync_chunk_s = time.perf_counter() - ts

    # async dispatch: enqueue every chunk, keep digests on device, block
    # once at the end — the chip never waits for the host between chunks.
    t0 = time.perf_counter()
    digests = [d0]
    for i in range(1, num_chunks):
        digests.append(fn(_chunk_keys(cfg, split, i, chunk_size)))
    jax.block_until_ready(digests)
    elapsed = time.perf_counter() - t0
    # chunk 0 re-ran nothing after compile; count num_chunks-1 dispatched
    # chunks in the timed window plus chunk 0's (cached) digest fetch cost
    rate = (num_chunks - 1) * chunk_size / max(elapsed, 1e-9)

    host = jax.device_get(digests)
    manifest = {
        "split": split,
        "total": num_samples,
        "chunk_size": chunk_size,
        "num_chunks": num_chunks,
        "seed": cfg.seed,
        "fingerprint": DatasetGenerator(cfg, str(out))._fingerprint(),
        "device_samples_per_second": rate,
        "sync_chunk_s": sync_chunk_s,
        "sync_samples_per_second": chunk_size / max(sync_chunk_s, 1e-9),
        "elapsed_s": elapsed,
        "backend": jax.devices()[0].platform,
        "digest_keys": list(CHUNK_KEYS),
        "digests": {
            k: [[float(x) for x in d[k]] for d in host] for k in host[0]
        },
        "note": "digest-manifest materialization: samples are pure "
        "functions of (seed, split, index); any writer can materialize "
        "any chunk independently (generator.generate_split) and verify "
        "it against these digests (atscale.verify_digest_chunk).",
    }
    mpath = out / f"{split}_digest_manifest.json"
    mpath.write_text(json.dumps(manifest, indent=2))
    log(
        f"[{split}] {num_samples} frames digested in {elapsed:.1f}s "
        f"({rate:.0f} samples/s device rate)"
    )
    return manifest


def verify_digest_chunk(
    cfg: ExperimentConfig, manifest: Dict, chunk_idx: int
) -> bool:
    """Regenerate one chunk and compare its digest exactly."""
    fn = _digest_fn_cached(_generation_key(cfg))
    d = jax.device_get(
        fn(_chunk_keys(cfg, manifest["split"], chunk_idx, manifest["chunk_size"]))
    )
    for k, v in d.items():
        want = np.asarray(manifest["digests"][k][chunk_idx], np.float32)
        if not np.array_equal(np.asarray(v, np.float32), want):
            return False
    return True


def online_train(
    cfg: ExperimentConfig,
    model_type: str = "cnn",
    total_samples: int = 131072,
    batch_size: int = 512,
    steps_per_dispatch: int = 16,
    stats: Optional[Dict[str, float]] = None,
    seed_split: str = "online",
    dtype=jnp.float32,
    wiener_estimator: Optional[str] = None,
    loss_type: Optional[str] = None,
    lr_schedule: str = "constant",
    checkpoint_dir: Optional[str] = None,
    log=print,
) -> Dict:
    """Fused generate->train: simulation, LS feature, and SGD update run in
    ONE device program — zero host I/O in the loop, infinite
    non-repeating data (sample i is ``fold_in(split_key, i)``, same
    schedule as a materialized dataset).

    ``steps_per_dispatch`` steps run under one ``lax.scan`` per dispatch
    (the trainer's device-resident epoch pattern, trainer.py
    _build_device_fns) so the tunneled runtime's per-dispatch latency
    amortizes; dispatches enqueue asynchronously and the host blocks once
    at the end.

    Returns sustained end-to-end samples/s plus the loss trajectory (the
    decreasing losses are evidence the updates are real, not a cached
    relay; cf. results/RESNET_MFU_NOTE.md).

    ``wiener_estimator`` (e.g. ``"mmse_full_est"``, the fully blind
    Wiener) switches to the 7-channel residual-on-Wiener layout
    (train/datasets.py make_batch ordering): the Wiener feature is
    computed INSIDE the fused step from the same fresh frames, so
    blind-residual training needs no sidecar files — the sidecar
    pipeline (scripts/compute_wiener.py) exists for materialized
    datasets; online training replaces it with the estimator itself.
    ``loss_type`` defaults to ``cfg.training.loss``; ``lr_schedule``
    'cosine' decays over the full run. ``checkpoint_dir`` saves the
    final model (train/checkpoint.py layout, loadable by
    eval/evaluate.py load_model).
    """
    import dataclasses
    import functools

    import optax
    from flax import nnx

    from ..models.factory import get_model
    from ..models.inputs import apply_output_residual, grid_inputs
    from ..models.loss import channel_estimation_loss
    from .generator import _generation_key as _gk
    from .generator import draw_params as _draw

    table = table_for(cfg)
    st = stats or {"rx_std": 1.0, "hls_std": 1.0, "h_std": 1.0}
    tr = cfg.training
    loss_type = loss_type or tr.loss
    gen_cfg = _gk(cfg)
    model_cfg = cfg.model
    if wiener_estimator:
        model_cfg = dataclasses.replace(model_cfg, input_channels=7)
    model = get_model(model_type, model_cfg, seed=cfg.seed, dtype=dtype)

    num_steps = max(total_samples // batch_size, 2 * steps_per_dispatch)
    num_windows = num_steps // steps_per_dispatch
    num_steps = num_windows * steps_per_dispatch

    if lr_schedule == "cosine":
        lr = optax.cosine_decay_schedule(tr.learning_rate, num_steps)
    else:
        lr = tr.learning_rate
    # same clip policy as Trainer (make_optimizer): online batches at the
    # low-pilot-count corner of the density grid can produce wild Wiener
    # extrapolations and loss spikes — unclipped, one such batch NaNs the
    # run
    parts = []
    if tr.gradient_clip > 0:
        parts.append(optax.clip_by_global_norm(tr.gradient_clip))
    parts.append(optax.adamw(lr, weight_decay=tr.weight_decay))
    optimizer = nnx.Optimizer(model, optax.chain(*parts), wrt=nnx.Param)
    graphdef, state = nnx.split((model, optimizer))
    sk = split_key(cfg.seed, seed_split)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def window_fn(state, step_idxs):
        def body(stt, i):
            mdl, opt = nnx.merge(graphdef, stt)
            idxs = i * batch_size + jnp.arange(batch_size)
            keys = jax.vmap(lambda j: jax.random.fold_in(sk, j))(idxs)
            kp = jax.vmap(lambda k: jax.random.fold_in(k, 0))(keys)
            ks = jax.vmap(lambda k: jax.random.fold_in(k, 1))(keys)
            params = _draw(kp, gen_cfg)
            frames = simulate_batch(ks, params, cfg=gen_cfg, table=table)
            h_ls = estimate_batch(
                frames, cfg=gen_cfg, estimator="ls",
                method=gen_cfg.pilots.interpolation, table=table,
            )
            batch = grid_inputs(
                frames.rx_symbols, h_ls, frames.channel, frames.pilot_mask, st
            )
            inputs = batch.inputs
            if wiener_estimator:
                hw = estimate_batch(
                    frames, cfg=gen_cfg, estimator=wiener_estimator,
                    table=table,
                )[:, :, 0, 0, :]
                inputs = jnp.concatenate(
                    [
                        inputs,
                        jnp.stack(
                            [hw.real / st["h_std"], hw.imag / st["h_std"]],
                            axis=-1,
                        ).astype(jnp.float32),
                    ],
                    axis=-1,
                )

            def loss_fn(m):
                pred = apply_output_residual(m(inputs, train=True), inputs)
                return channel_estimation_loss(
                    pred, batch.targets, batch.pilot_mask, loss_type,
                    tr.channel_weight, tr.pilot_weight,
                )

            loss, grads = nnx.value_and_grad(loss_fn)(mdl)
            opt.update(mdl, grads)
            return nnx.state((mdl, opt)), loss

        return jax.lax.scan(body, state, step_idxs)

    def window_idxs(w):
        return jnp.arange(
            w * steps_per_dispatch, (w + 1) * steps_per_dispatch
        )

    # compile + warm window (not counted)
    state, l0 = window_fn(state, window_idxs(0))
    jax.block_until_ready(l0)
    first_loss = float(l0[0])

    t0 = time.perf_counter()
    losses = [l0]
    for w in range(1, num_windows):
        state, lw = window_fn(state, window_idxs(w))
        losses.append(lw)
    jax.block_until_ready(state)
    elapsed = time.perf_counter() - t0
    rate = (num_windows - 1) * steps_per_dispatch * batch_size / max(
        elapsed, 1e-9
    )
    all_losses = np.concatenate([np.asarray(x) for x in losses])
    out = {
        "model": model_type,
        "total_samples": num_steps * batch_size,
        "batch_size": batch_size,
        "steps": num_steps,
        "steps_per_dispatch": steps_per_dispatch,
        "dtype": jnp.dtype(dtype).name,
        "wiener_estimator": wiener_estimator,
        "loss_type": loss_type,
        "lr_schedule": lr_schedule,
        "end_to_end_samples_per_second": rate,
        "elapsed_s": elapsed,
        "first_loss": first_loss,
        "last_loss": float(all_losses[-1]),
        "loss_every_16_steps": [float(x) for x in all_losses[::16]],
        "backend": jax.devices()[0].platform,
    }
    if checkpoint_dir is not None:
        from ..train.checkpoint import save_checkpoint

        model, optimizer = nnx.merge(graphdef, state)
        save_checkpoint(
            checkpoint_dir, model, optimizer,
            epoch=num_steps,  # step count; online training has no epochs
            online=True,
            **{k: out[k] for k in (
                "total_samples", "batch_size", "wiener_estimator",
                "loss_type", "last_loss",
            )},
        )
        out["checkpoint"] = str(checkpoint_dir)
    log(
        f"[online {model_type}] {out['total_samples']} samples in "
        f"{elapsed:.1f}s ({rate:.0f} samples/s end-to-end), loss "
        f"{first_loss:.4f} -> {out['last_loss']:.4f}"
    )
    return out

"""Online (dataset-free) training CLI.

The fused generate->train loop (ce5g_tpu/data/atscale.py online_train):
every SGD step simulates a fresh batch on-chip from deterministic fold_in
keys and consumes it in the same device program — no dataset files, no
host I/O in the loop, infinite non-repeating data. With
``--wiener-estimator mmse_full_est`` the 7-channel BLIND residual-on-
Wiener layout is computed in-step, so blind-residual training needs no
sidecar pipeline at all.

This is the TPU-native extension of the reference's phase-4/6 training
(which materializes datasets first, run_phase3/4): the factory outruns
any consumer by ~70x (results/at_scale_generation.json), so the dataset
can live nowhere and the model never sees a sample twice.

Example (the round-5 blind-SIMO capstone run):
    python scripts/train_online.py --config configs/simo_identifiable.yaml \
        --model cnn --wiener-estimator mmse_full_est --loss nmse \
        --samples 2097152 --batch 256 --stats-from data_simo \
        --name cnn_wiener_blind_online --model-dir models_simo
"""
import argparse
import json
from pathlib import Path

from _common import add_config_arg, load_cfg


def main():
    parser = add_config_arg(argparse.ArgumentParser(description=__doc__))
    parser.add_argument("--model", default="cnn")
    parser.add_argument("--samples", type=int, default=1048576)
    parser.add_argument("--batch", type=int, default=256)
    parser.add_argument("--steps-per-dispatch", type=int, default=16)
    parser.add_argument("--wiener-estimator", default=None,
                        choices=[None, "mmse_full", "mmse_full_est"],
                        help="7-channel residual-on-Wiener layout with the "
                        "feature computed in-step (mmse_full_est = blind)")
    parser.add_argument("--loss", default=None,
                        help="override cfg.training.loss (e.g. nmse)")
    parser.add_argument("--lr", type=float, default=None)
    parser.add_argument("--lr-schedule", default="cosine",
                        choices=["constant", "cosine"])
    parser.add_argument("--bf16", action="store_true")
    parser.add_argument("--stats-from", default=None,
                        help="data dir whose test split provides the "
                        "normalization stats (the same stats evaluation "
                        "uses); default: unit stats")
    parser.add_argument("--name", default=None,
                        help="checkpoint name (default <model>_online)")
    parser.add_argument("--model-dir", default="models")
    args = parser.parse_args()

    import dataclasses

    cfg = load_cfg(args)
    if args.lr is not None:
        cfg = dataclasses.replace(
            cfg, training=dataclasses.replace(cfg.training, learning_rate=args.lr)
        )

    import jax.numpy as jnp

    from ce5g_tpu.data import atscale

    stats = None
    if args.stats_from:
        from ce5g_tpu.train import ChannelDataset

        d = Path(args.stats_from)
        p = d / "test.npz"
        stats = ChannelDataset(
            str(p if p.exists() else d / "test_manifest.json")
        ).stats
        print(f"stats from {args.stats_from}: "
              + ", ".join(f"{k}={v:.4f}" for k, v in stats.items()))

    name = args.name or f"{args.model}_online"
    ckpt = Path(args.model_dir) / f"{name}_best"
    out = atscale.online_train(
        cfg,
        args.model,
        total_samples=args.samples,
        batch_size=args.batch,
        steps_per_dispatch=args.steps_per_dispatch,
        stats=stats,
        dtype=jnp.bfloat16 if args.bf16 else jnp.float32,
        wiener_estimator=args.wiener_estimator,
        loss_type=args.loss,
        lr_schedule=args.lr_schedule,
        checkpoint_dir=str(ckpt),
    )
    hist = Path(args.model_dir) / f"{name}_history.json"
    hist.write_text(json.dumps(out, indent=2))
    print(f"checkpoint → {ckpt}\nhistory → {hist}")


if __name__ == "__main__":
    main()

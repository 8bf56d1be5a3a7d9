"""Model training CLI.

Parity surface: reference src/train.py main (:297-379),
run_phase4_training.py (CNN) and run_phase6_advanced_training.py
(LSTM/Hybrid/ResNet): --model/--epochs/--batch-size/--seed, best/final
checkpoints, history JSON, post-training test evaluation.
"""
import argparse

from _common import add_config_arg, load_cfg


def main():
    parser = add_config_arg(argparse.ArgumentParser(description=__doc__))
    parser.add_argument(
        "--model",
        default="cnn",
        choices=["cnn", "lstm", "hybrid", "resnet", "transformer"],
    )
    parser.add_argument("--data-dir", default="data")
    parser.add_argument("--model-dir", default="models")
    parser.add_argument("--results-dir", default=None,
                        help="where --evaluate writes results (default cfg.results_dir)")
    parser.add_argument("--epochs", type=int, default=None)
    parser.add_argument("--batch-size", type=int, default=None)
    parser.add_argument("--seed", type=int, default=None)
    parser.add_argument("--loss", default=None,
                        choices=["mse", "mae", "huber", "nmse"],
                        help="override cfg.training.loss ('nmse' = per-sample "
                        "normalized MSE, matches the eval metric)")
    parser.add_argument("--lr-scheduler", default=None,
                        choices=["cosine", "step", "plateau", "warm_restarts"])
    parser.add_argument("--shard", action="store_true", help="DP over local devices")
    parser.add_argument(
        "--host-staging", action="store_true",
        help="force per-batch host staging instead of the device-resident "
        "epoch scan (smaller per-step programs; workaround for runtime "
        "faults in very large scanned programs)",
    )
    parser.add_argument(
        "--advanced", action="store_true",
        help="phase-6 per-model optimizer policy (warm restarts etc.)",
    )
    parser.add_argument(
        "--wiener", action="store_true",
        help="7-channel wiener-residual layout (needs compute_wiener.py "
        "sidecars); checkpoints saved as <model>_wiener_*",
    )
    parser.add_argument(
        "--wiener-tag", default="wiener",
        help="which sidecar to join: 'wiener' (oracle priors, default) or "
        "'bwiener' (blind priors); non-default tags suffix the run name "
        "(e.g. cnn_wiener_blind for --wiener-tag bwiener)",
    )
    parser.add_argument("--evaluate", action="store_true", help="evaluate on test split")
    parser.add_argument(
        "--resume", action="store_true",
        help="continue from <model-dir>/<model>_last (model+optimizer+epoch)",
    )
    args = parser.parse_args()

    import dataclasses
    from pathlib import Path

    cfg = load_cfg(args)
    tr = cfg.training
    if args.epochs:
        tr = dataclasses.replace(tr, epochs=args.epochs)
    if args.batch_size:
        tr = dataclasses.replace(tr, batch_size=args.batch_size)
    if args.loss:
        tr = dataclasses.replace(tr, loss=args.loss)
    if args.lr_scheduler:
        tr = dataclasses.replace(tr, lr_scheduler=args.lr_scheduler)
    cfg = dataclasses.replace(cfg, training=tr)
    if args.seed is not None:
        cfg = dataclasses.replace(cfg, seed=args.seed)
    if args.wiener:
        cfg = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model, input_channels=7)
        )

    from ce5g_tpu.train import ChannelDataset, Trainer, advanced_policy

    if args.advanced:
        cfg = advanced_policy(cfg, args.model)

    def split_path(split):
        d = Path(args.data_dir)
        merged = d / f"{split}.npz"
        return str(merged if merged.exists() else d / f"{split}_manifest.json")

    wiener_arg = args.wiener_tag if args.wiener else False
    train_ds = ChannelDataset(split_path("train"), wiener=wiener_arg)
    val_ds = ChannelDataset(split_path("val"), wiener=wiener_arg)

    mesh = None
    if args.shard:
        from ce5g_tpu.parallel import make_mesh

        mesh = make_mesh()

    run_name = args.model
    if args.wiener:
        run_name += "_wiener"
        if args.wiener_tag == "bwiener":
            run_name += "_blind"
        elif args.wiener_tag != "wiener":
            run_name += f"_{args.wiener_tag}"
    trainer = Trainer(
        cfg, model_type=args.model, mesh=mesh, name=run_name,
        device_data=False if args.host_staging else None,
    )
    if args.resume:
        last = Path(args.model_dir) / f"{run_name}_last"
        if last.exists():
            trainer.resume(last)
        else:
            print(f"no resumable checkpoint at {last}; starting fresh")
    result = trainer.train(train_ds, val_ds, model_dir=args.model_dir)
    print(f"best val loss: {result['best_val_loss']:.6f} "
          f"({result['epochs_run']} epochs)")

    if args.evaluate:
        from ce5g_tpu.eval import ModelEvaluator

        test_ds = ChannelDataset(split_path("test"), wiener=wiener_arg)
        ev = ModelEvaluator(cfg, args.model_dir, results_dir=args.results_dir)
        r = ev.evaluate_model(run_name, test_ds)
        r.pop("per_sample_nmse", None)
        print(r)
        ev.save_results(r, f"{run_name}_test_results.json")


if __name__ == "__main__":
    main()

"""Hyperparameter search CLI (reference run_phase9_hyperparameter_tuning.py)."""
import argparse

from _common import add_config_arg, load_cfg


def main():
    parser = add_config_arg(argparse.ArgumentParser(description=__doc__))
    parser.add_argument("--data-dir", default="data")
    parser.add_argument("--results-dir", default="results")
    parser.add_argument("--mode", choices=["grid", "random"], default="random")
    parser.add_argument("--trials", type=int, default=10)
    parser.add_argument("--epochs", type=int, default=5)
    parser.add_argument("--quick-train", type=int, default=2000)
    parser.add_argument("--quick-val", type=int, default=500)
    args = parser.parse_args()

    from pathlib import Path

    cfg = load_cfg(args)
    from ce5g_tpu.eval import HyperparameterTuner
    from ce5g_tpu.train import ChannelDataset

    d = Path(args.data_dir)

    def split_path(split):
        merged = d / f"{split}.npz"
        return str(merged if merged.exists() else d / f"{split}_manifest.json")

    tuner = HyperparameterTuner(
        cfg,
        ChannelDataset(split_path("train")),
        ChannelDataset(split_path("val")),
        args.results_dir,
        quick_train=args.quick_train,
        quick_val=args.quick_val,
        epochs_per_trial=args.epochs,
    )
    if args.mode == "grid":
        results = tuner.grid_search(max_trials=args.trials)
    else:
        results = tuner.random_search(num_trials=args.trials)
    best = results[0]
    print(f"best: val {best['val_loss']:.6f} with {best['params']}")


if __name__ == "__main__":
    main()

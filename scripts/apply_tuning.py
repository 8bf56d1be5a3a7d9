"""Apply the phase-9 hyperparameter-search winner: retrain + evaluate.

Reference anchor: run_phase9_hyperparameter_tuning.py treats the sorted
search results as the deliverable; this closes the loop the reference
leaves open — the winner is actually retrained at full budget and
evaluated on the test split as ``cnn_tuned``, so the study answers
"did the search move the number?".
"""
import argparse
import dataclasses
import json
from pathlib import Path

from _common import add_config_arg, load_cfg


def main():
    parser = add_config_arg(argparse.ArgumentParser(description=__doc__))
    parser.add_argument("--data-dir", default="data")
    parser.add_argument("--model-dir", default="models")
    parser.add_argument("--results-dir", default="results")
    parser.add_argument(
        "--tuning-results", default=None,
        help="search results JSON (default <results-dir>/random_search_results.json)",
    )
    parser.add_argument("--epochs", type=int, default=60)
    parser.add_argument("--name", default="cnn_tuned")
    args = parser.parse_args()

    cfg = load_cfg(args)
    rd = Path(args.results_dir)
    tr_path = Path(args.tuning_results or rd / "random_search_results.json")
    results = json.loads(tr_path.read_text())
    best = results[0]["params"]
    print(f"winner (val {results[0]['val_loss']:.6f}): {best}")

    model = dataclasses.replace(
        cfg.model,
        type="cnn",
        cnn_hidden_channels=tuple(best.get("hidden_channels", cfg.model.cnn_hidden_channels)),
        cnn_kernel_size=int(best.get("kernel_size", cfg.model.cnn_kernel_size)),
        cnn_dropout=float(best.get("dropout", cfg.model.cnn_dropout)),
    )
    training = dataclasses.replace(
        cfg.training,
        learning_rate=float(best.get("learning_rate", cfg.training.learning_rate)),
        batch_size=int(best.get("batch_size", cfg.training.batch_size)),
        weight_decay=float(best.get("weight_decay", cfg.training.weight_decay)),
        epochs=args.epochs,
    )
    cfg = dataclasses.replace(cfg, model=model, training=training)

    from ce5g_tpu.eval import ModelEvaluator
    from ce5g_tpu.train import ChannelDataset, Trainer

    d = Path(args.data_dir)

    def split_path(split):
        merged = d / f"{split}.npz"
        return str(merged if merged.exists() else d / f"{split}_manifest.json")

    train_ds = ChannelDataset(split_path("train"))
    val_ds = ChannelDataset(split_path("val"))
    trainer = Trainer(cfg, model_type="cnn", name=args.name)
    result = trainer.train(train_ds, val_ds, model_dir=args.model_dir)
    print(f"best val loss: {result['best_val_loss']:.6f} "
          f"({result['epochs_run']} epochs)")

    test_ds = ChannelDataset(split_path("test"))
    ev = ModelEvaluator(cfg, args.model_dir, results_dir=args.results_dir)
    r = ev.evaluate_model(args.name, test_ds)
    r.pop("per_sample_nmse", None)
    r["tuning_winner"] = best
    print(r)
    ev.save_results(r, f"{args.name}_test_results.json")


if __name__ == "__main__":
    main()

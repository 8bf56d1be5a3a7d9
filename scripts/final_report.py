"""Final aggregate report CLI (reference run_phase10_final_report.py)."""
import argparse
import json
from pathlib import Path

from _common import add_config_arg, load_cfg


def main():
    parser = add_config_arg(argparse.ArgumentParser(description=__doc__))
    parser.add_argument("--results-dir", default="results")
    parser.add_argument("--model-dir", default="models")
    args = parser.parse_args()

    load_cfg(args)
    from ce5g_tpu.eval import generate_final_report, plot_training_curves

    histories = {}
    for f in Path(args.model_dir).glob("*_history.json"):
        histories[f.stem.replace("_history", "")] = json.loads(f.read_text())
    extra = {}
    if histories:
        p = Path(args.results_dir) / "training_curves.png"
        p.parent.mkdir(parents=True, exist_ok=True)
        plot_training_curves(histories, p)
        extra["Training curves"] = f"![training curves]({p.name})"

    generate_final_report(args.results_dir, extra_sections=extra)
    print(f"report → {Path(args.results_dir) / 'FINAL_REPORT.md'}")


if __name__ == "__main__":
    main()

"""Precompute full-Wiener (mmse_full) estimates as dataset sidecars.

Round-4 feature plumbing (VERDICT r3 "Next round" #1): for every sample of
a generated split, run the gather-free full-Wiener estimator
(estimators/mmse.py mmse_full_estimate) on TPU and store the first-antenna-
pair slice Ĥ_w[s, k] as `H_wiener` sidecar chunks + a
`<split>_wiener_manifest.json` (ce5g_tpu/data/wiener.py).
ChannelDataset(wiener=True) then emits 7-channel inputs for
residual-on-Wiener training.
"""
import argparse
from pathlib import Path

from _common import add_config_arg, load_cfg


def main():
    parser = add_config_arg(argparse.ArgumentParser(description=__doc__))
    parser.add_argument("--data-dir", default="data")
    parser.add_argument("--splits", nargs="*", default=["train", "val", "test"])
    parser.add_argument("--batch-size", type=int, default=64)
    parser.add_argument(
        "--estimator", default="mmse_full",
        choices=["mmse_full", "mmse_full_est"],
        help="'mmse_full' = oracle priors (default); 'mmse_full_est' = "
        "BLIND priors estimated from each frame (estimators/blind.py)",
    )
    parser.add_argument(
        "--tag", default=None,
        help="sidecar file tag (default: 'wiener' for mmse_full, "
        "'bwiener' for mmse_full_est)",
    )
    args = parser.parse_args()

    cfg = load_cfg(args)
    from ce5g_tpu.data.wiener import compute_wiener_sidecar

    tag = args.tag or ("bwiener" if args.estimator == "mmse_full_est" else "wiener")
    for split in args.splits:
        mp = Path(args.data_dir) / f"{split}_manifest.json"
        if not mp.exists():
            print(f"{split}: no manifest at {mp}, skipping")
            continue
        wm = compute_wiener_sidecar(
            cfg, mp, args.batch_size, estimator=args.estimator, tag=tag
        )
        print(
            f"{split}: {tag} sidecar complete "
            f"({wm['samples_per_second']:.1f} samples/s)"
        )


if __name__ == "__main__":
    main()

"""Diagnose the −2 dB NMSE plateau of the trained models.

Round-4 deliverable (VERDICT r3 "What's weak" #2 / "Next round" #4): a
per-SNR / per-channel-type / per-density breakdown of every method on the
SAME test samples, plus the information-theoretic floor of the dataset.

The floor: the generator keeps the reference's superposition quirk — the
SAME pilot grid is transmitted on all T TX antennas
(reference src/channel_model.py simulate_transmission; our
physics/simulate.py:94-171) — so each (s, k) observation is
    Y_r = (Σ_t H_{r,t}) · X + N,
one equation in T unknowns.  The per-TX channel is NOT identifiable; with
i.i.d. per-TX fading, the conditional-mean estimate of H_{r,0} given the
(noiselessly known) sum is (Σ_t H_{r,t})/T, whose NMSE is exactly

    E|H − Σ/T|² / E|H|² = (T−1)/T   →  −3.01 dB for T = 2.

NO estimator — classical or learned — can beat this on this dataset at any
SNR.  This script computes that oracle empirically from the stored H_true
("sum_oracle": Ĥ_{r,t} = mean_t' H_true[·, r, t', ·]) next to every real
method, so the plateau is pinned to the dataset, not the pipeline.
"""
import argparse
import json

import numpy as np

from _common import add_config_arg, load_cfg


def _group(per_sample: np.ndarray, key: np.ndarray):
    """Mean NMSE (dB) of `per_sample` grouped by the values of `key`."""
    out = {}
    for v in sorted(set(key.tolist())):
        m = key == v
        out[str(v)] = float(10 * np.log10(per_sample[m].mean() + 1e-12))
    return out


def main():
    parser = add_config_arg(argparse.ArgumentParser(description=__doc__))
    parser.add_argument("--data-dir", default="data")
    parser.add_argument("--model-dir", default="models")
    parser.add_argument("--results-dir", default="results")
    parser.add_argument("--num-samples", type=int, default=None)
    parser.add_argument(
        "--models", nargs="*", default=["cnn", "resnet"],
        help="trained model checkpoints to break down",
    )
    args = parser.parse_args()

    cfg = load_cfg(args)
    from pathlib import Path

    from ce5g_tpu.eval.evaluate import (
        ModelEvaluator,
        _nmse_per_sample,
        evaluate_baselines,
        evaluate_estimators,
    )
    from ce5g_tpu.train.datasets import ChannelDataset

    has_wiener = (Path(args.data_dir) / "test_wiener_manifest.json").exists()
    ds = ChannelDataset(
        str(Path(args.data_dir) / "test_manifest.json"), wiener=has_wiener
    )
    n = min(args.num_samples or len(ds), len(ds))
    h_true = ds.arrays["H_true"][:n]
    snr = ds.arrays["snr_db"][:n]
    ctype = ds.arrays["channel_type"][:n]
    dens = ds.arrays["pilot_density"][:n]
    dopp = ds.arrays["doppler_hz"][:n]
    num_tx = h_true.shape[3]

    per_sample = {}

    # --- the non-identifiability oracle: perfect knowledge of Σ_t H_t
    sum_est = np.broadcast_to(
        h_true.mean(axis=3, keepdims=True), h_true.shape
    )
    per_sample["sum_oracle"] = _nmse_per_sample(h_true, sum_est)

    # --- stored-H_ls baselines (LS + phase-5 scalar MMSE)
    base = evaluate_baselines(ds, n)
    per_sample["ls_stored"] = np.asarray(base["per_sample"]["LS"])
    per_sample["mmse_scalar"] = np.asarray(base["per_sample"]["MMSE"])

    # --- real re-run estimators on TPU
    est = evaluate_estimators(ds, cfg, ("mmse", "mmse_full"), n)
    for k, r in est.items():
        per_sample[k] = np.asarray(r["per_sample"])

    # --- trained models (first-antenna-pair NMSE, same convention)
    ev = ModelEvaluator(cfg, args.model_dir, results_dir=args.results_dir)
    model_meta = {}
    for mt in args.models:
        try:
            r = ev.evaluate_model(mt, ds, n)
        except FileNotFoundError:
            print(f"no checkpoint for {mt}; skipping")
            continue
        per_sample[mt] = np.asarray(r["per_sample_nmse"])
        model_meta[mt] = {
            "checkpoint_epoch": r["checkpoint_epoch"],
            "latency_ms_per_sample": r["latency_ms_per_sample"],
        }

    floor_db = float(10 * np.log10((num_tx - 1) / num_tx))
    out = {
        "num_samples": int(n),
        "num_tx": int(num_tx),
        "analytic_floor_db": floor_db,
        "analytic_floor_note": (
            "same-pilot-grid superposition (reference parity quirk): only "
            "Σ_t H_t is observable; best possible NMSE = (T−1)/T"
        ),
        "overall_db": {
            k: float(10 * np.log10(v.mean() + 1e-12))
            for k, v in per_sample.items()
        },
        "by_snr_db": {k: _group(v, snr) for k, v in per_sample.items()},
        "by_channel_type": {k: _group(v, ctype) for k, v in per_sample.items()},
        "by_pilot_density": {k: _group(v, dens) for k, v in per_sample.items()},
        "by_doppler_hz": {k: _group(v, dopp) for k, v in per_sample.items()},
        "models": model_meta,
        "estimator_latency_ms": {
            k: r["latency_ms_per_sample"] for k, r in est.items()
        },
    }

    rd = Path(args.results_dir)
    rd.mkdir(parents=True, exist_ok=True)
    (rd / "plateau_diagnosis.json").write_text(json.dumps(out, indent=2))

    # --- human-readable note
    ov = out["overall_db"]
    lines = [
        "# Plateau diagnosis (round 4)",
        "",
        f"Test split, {n} samples, {num_tx}×{num_tx} MIMO, SNR −5…30 dB mix.",
        "",
        f"**Analytic floor: {floor_db:.2f} dB.** The dataset keeps the "
        "reference's superposition quirk (same pilot grid on every TX "
        "antenna, physics/simulate.py:94-171), so only the SUM of per-TX "
        "channels is observable; with i.i.d. per-TX fading the best "
        "possible estimate of one antenna's channel is the sum divided by "
        f"T, i.e. NMSE = (T−1)/T = {floor_db:.2f} dB — at EVERY SNR.",
        "",
        "| method | overall dB |",
        "|---|---|",
    ]
    for k in sorted(ov, key=lambda k: ov[k]):
        lines.append(f"| {k} | {ov[k]:.2f} |")
    lines += [
        "",
        "Per-SNR (dB):",
        "",
        "| method | " + " | ".join(
            str(s) for s in sorted(set(snr.tolist()))) + " |",
        "|" + "---|" * (1 + len(set(snr.tolist()))),
    ]
    for k, g in out["by_snr_db"].items():
        lines.append(
            f"| {k} | " + " | ".join(f"{g[str(s)]:.2f}" for s in sorted(set(snr.tolist()))) + " |"
        )
    gap_cnn = ov.get("cnn", 0.0) - ov["sum_oracle"]
    lines += [
        "",
        "## Reading",
        "",
        f"- `sum_oracle` ({ov['sum_oracle']:.2f} dB) matches the analytic "
        f"floor ({floor_db:.2f} dB): the plateau is an INFORMATION limit "
        "of the parity dataset, not a pipeline defect.",
        f"- `mmse_full` ({ov['mmse_full']:.2f} dB) sits essentially at the "
        "floor — it is already the conditional-mean estimator for this "
        "observation model; a ≤ −4 dB target on THIS dataset is provably "
        "unreachable by any method.",
        f"- the CNN trails the floor by {gap_cnn:.2f} dB — that residual "
        "gap (not the −2 dB absolute) is what model/feature work can close.",
        "- the constructive path to a genuinely better estimator is the "
        "`orthogonal_pilots` dataset (physics/simulate.py opt-out), where "
        "the per-TX channel is identifiable and the floor vanishes — see "
        "results/ORTHOGONAL_STUDY.md (round-4 companion).",
        "",
    ]
    (rd / "PLATEAU_DIAGNOSIS.md").write_text("\n".join(lines))
    print(json.dumps({k: round(v, 2) for k, v in ov.items()}, indent=2))
    print(f"floor {floor_db:.2f} dB; wrote plateau_diagnosis.json + PLATEAU_DIAGNOSIS.md")


if __name__ == "__main__":
    main()

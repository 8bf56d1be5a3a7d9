"""Pilot-density sweep CLI (reference run_phase8_pilot_optimization.py).

Round 5: --models adds the phase-8 core comparison the reference runs —
trained models next to the classical estimators across densities
(run_phase8_pilot_optimization.py:113-160) — with slice-basis NMSE and
measured QPSK BER per cell, plus an identifiable-regime (SIMO config) BER
sweep where BER actually falls with SNR (the quirk-mode BER floor is a
superposition artifact, see results/PLATEAU_DIAGNOSIS.md).
"""
import argparse

from _common import add_config_arg, load_cfg


def main():
    parser = add_config_arg(argparse.ArgumentParser(description=__doc__))
    parser.add_argument("--densities", nargs="*", type=float,
                        default=[0.05, 0.08, 0.10, 0.12, 0.15])
    parser.add_argument("--model-densities", nargs="*", type=float,
                        default=[0.01, 0.02, 0.05, 0.08, 0.10])
    parser.add_argument("--snrs", nargs="*", type=float, default=[5, 10, 15, 20])
    parser.add_argument("--estimators", nargs="*", default=["ls", "mmse", "mmse_full"])
    parser.add_argument("--models", nargs="*", default=[],
                        help="trained models (e.g. cnn cnn_wiener) for the "
                        "phase-8 core comparison; needs --model-dir/--data-dir")
    parser.add_argument("--model-dir", default="models")
    parser.add_argument("--data-dir", default="data",
                        help="dataset whose stats normalized the models")
    parser.add_argument("--channel", default="EVA")
    parser.add_argument("--doppler", type=float, default=50.0)
    parser.add_argument("--frames", type=int, default=64)
    parser.add_argument("--simo-ber-config", default=None,
                        help="config for the identifiable-regime BER sweep "
                        "(e.g. configs/simo_identifiable.yaml); skipped if unset")
    parser.add_argument("--results-dir", default="results")
    args = parser.parse_args()

    cfg = load_cfg(args)
    from ce5g_tpu.eval import PilotOptimizer

    opt = PilotOptimizer(cfg, args.results_dir)
    res = opt.sweep(
        densities=args.densities,
        snrs_db=args.snrs,
        estimators=args.estimators,
        channel_type=args.channel,
        doppler_hz=args.doppler,
        frames_per_cell=args.frames,
    )

    if args.models:
        from pathlib import Path

        from ce5g_tpu.train import ChannelDataset

        d = Path(args.data_dir)
        stats_path = d / "test.npz"
        ds = ChannelDataset(
            str(stats_path if stats_path.exists() else d / "test_manifest.json")
        )
        res["model_sweep"] = opt.model_sweep(
            args.models,
            args.model_dir,
            ds.stats,
            densities=args.model_densities,
            snrs_db=args.snrs,
            channel_type=args.channel,
            doppler_hz=args.doppler,
            frames_per_cell=args.frames,
        )

    if args.simo_ber_config:
        import dataclasses

        from ce5g_tpu.config import load_config
        from ce5g_tpu.eval.ber import ber_sweep

        simo_cfg = load_config(args.simo_ber_config)
        res["ber_identifiable"] = {
            "note": "1×TX config — no superposition, so BER falls with SNR "
            "(contrast with the quirk-mode BER floor above); density 5%, "
            "EVA, 50 Hz, QPSK, measured by full demodulation.",
            "ber_vs_snr": {
                est: ber_sweep(
                    simo_cfg, [0.0, 5.0, 10.0, 15.0, 20.0, 25.0, 30.0],
                    estimator=est, density=0.05, frames_per_point=32,
                )
                for est in ("ls", "mmse_full", "mmse_full_est")
            },
        }

    path = opt.save(res)
    for est, rec in res["recommendation"].items():
        print(f"{est}: best density {rec['best_density']:.0%}")
    if "model_sweep" in res:
        for name, rec in res["model_sweep"]["recommendation"].items():
            print(f"[model sweep] {name}: best density {rec['best_density']:.0%}")
    print(f"results → {path}")


if __name__ == "__main__":
    main()

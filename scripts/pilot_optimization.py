"""Pilot-density sweep CLI (reference run_phase8_pilot_optimization.py)."""
import argparse

from _common import add_config_arg, load_cfg


def main():
    parser = add_config_arg(argparse.ArgumentParser(description=__doc__))
    parser.add_argument("--densities", nargs="*", type=float,
                        default=[0.05, 0.08, 0.10, 0.12, 0.15])
    parser.add_argument("--snrs", nargs="*", type=float, default=[5, 10, 15, 20])
    parser.add_argument("--estimators", nargs="*", default=["ls", "mmse", "mmse_full"])
    parser.add_argument("--channel", default="EVA")
    parser.add_argument("--doppler", type=float, default=50.0)
    parser.add_argument("--frames", type=int, default=64)
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
    path = opt.save(res)
    for est, rec in res["recommendation"].items():
        print(f"{est}: best density {rec['best_density']:.0%}")
    print(f"results → {path}")


if __name__ == "__main__":
    main()

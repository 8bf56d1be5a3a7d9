"""End-to-end demo: simulate → LS → MMSE (diag + full) → figures.

Parity surface: reference quick_start.py:27-230 (EVA, 50 Hz, 15 dB, 10%
pilots; NMSE printout; 6-panel heatmap + frequency-response figure).
"""
import argparse
import time
from pathlib import Path

from _common import add_config_arg, load_cfg


def main():
    parser = add_config_arg(argparse.ArgumentParser(description=__doc__))
    parser.add_argument("--channel", default="EVA", choices=["EPA", "EVA", "ETU"])
    parser.add_argument("--doppler", type=float, default=50.0)
    parser.add_argument("--snr", type=float, default=15.0)
    parser.add_argument("--density", type=float, default=0.1)
    parser.add_argument("--results-dir", default="results")
    parser.add_argument("--no-plots", action="store_true")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ce5g_tpu.estimators import estimate_frame
    from ce5g_tpu.physics import FrameParams, PROFILE_INDEX, simulate_frame, table_for
    from ce5g_tpu.utils import evaluate_estimator, get_numpy

    cfg = load_cfg(args)
    if args.density > cfg.pilots.max_density:
        parser.error(
            f"--density {args.density} exceeds pilots.max_density "
            f"{cfg.pilots.max_density} (pilot slots beyond it are dropped); "
            "raise max_density in the config"
        )
    table = table_for(cfg)
    print("=" * 60)
    print("TPU-native 5G Channel Estimation — quick start")
    print(f"channel {args.channel}  doppler {args.doppler} Hz  "
          f"SNR {args.snr} dB  pilots {args.density:.0%}")
    print("=" * 60)

    import functools

    params = FrameParams(
        jnp.int32(PROFILE_INDEX[args.channel]),
        jnp.float32(args.doppler),
        jnp.float32(args.snr),
        jnp.float32(args.density),
    )
    t0 = time.time()
    sim = jax.jit(functools.partial(simulate_frame, cfg=cfg, table=table))
    frame = sim(jax.random.key(cfg.seed), params)
    jax.block_until_ready(frame.rx_symbols)
    print(f"simulated frame in {time.time() - t0:.2f}s incl. compile "
          f"(rx {frame.rx_symbols.shape}, H {frame.channel.shape})")

    results = {}
    for est, label in (("ls", "LS"), ("mmse", "MMSE (diag)"), ("mmse_full", "MMSE (Wiener)")):
        t0 = time.time()
        fn = jax.jit(
            functools.partial(estimate_frame, cfg=cfg, estimator=est, table=table)
        )
        h = jax.block_until_ready(fn(frame))
        dt = time.time() - t0
        m = jax.jit(evaluate_estimator)(frame.channel, h)
        results[label] = (h, m)
        print(f"{label:>14}: NMSE {float(m['nmse_db']):7.2f} dB   ({dt:.2f}s incl. compile)")

    if args.no_plots:
        return
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    out = Path(args.results_dir)
    out.mkdir(parents=True, exist_ok=True)
    h_true = get_numpy(frame.channel)[:, 0, 0, :]
    fig, axes = plt.subplots(2, 3, figsize=(16, 7))
    host_h = {label: get_numpy(h)[:, 0, 0, :] for label, (h, _) in results.items()}
    panels = [("True |H|", np.abs(h_true)), ("Pilot mask", np.asarray(frame.pilot_mask))]
    for label, hh in host_h.items():
        panels.append((f"{label} |Ĥ|", np.abs(hh)))
    panels.append(("LS error", np.abs(host_h["LS"] - h_true)))
    for ax, (title, img) in zip(axes.flat, panels):
        im = ax.imshow(img, aspect="auto", cmap="viridis")
        ax.set_title(title)
        ax.set_xlabel("subcarrier")
        ax.set_ylabel("symbol")
        fig.colorbar(im, ax=ax)
    fig.tight_layout()
    fig.savefig(out / "quick_start_results.png", dpi=120)

    fig2, ax = plt.subplots(figsize=(10, 4))
    ax.plot(np.abs(h_true[0]), label="|H| true (symbol 0)")
    for label, hh in host_h.items():
        ax.plot(np.abs(hh[0]), alpha=0.7, label=label)
    ax.set_xlabel("subcarrier")
    ax.set_ylabel("magnitude")
    ax.legend()
    ax.grid(True, alpha=0.3)
    fig2.tight_layout()
    fig2.savefig(out / "frequency_response.png", dpi=120)
    print(f"figures → {out}/quick_start_results.png, {out}/frequency_response.png")


if __name__ == "__main__":
    main()

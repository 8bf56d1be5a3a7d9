"""Channel visualization CLI.

Parity surface: reference visualize_channel_phase1.py:17-228 — per-model
channel heatmaps, Doppler-sweep figures, temporal autocorrelation (with an
extended 50-symbol frame).
"""
import argparse
from pathlib import Path

from _common import add_config_arg, load_cfg


def main():
    parser = add_config_arg(argparse.ArgumentParser(description=__doc__))
    parser.add_argument("--results-dir", default="results")
    parser.add_argument("--snr", type=float, default=20.0)
    args = parser.parse_args()

    import dataclasses

    import jax
    import jax.numpy as jnp
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np

    from ce5g_tpu.utils import get_numpy
    from ce5g_tpu.physics import (
        FrameParams,
        PROFILE_INDEX,
        PROFILE_NAMES,
        simulate_frame,
        table_for,
    )

    cfg = load_cfg(args)
    out = Path(args.results_dir)
    out.mkdir(parents=True, exist_ok=True)
    table = table_for(cfg)

    import functools

    _sims = {}

    def frame_for(profile, doppler, c=cfg, t=table):
        p = FrameParams(
            jnp.int32(PROFILE_INDEX[profile]),
            jnp.float32(doppler),
            jnp.float32(args.snr),
            jnp.float32(0.1),
        )
        key = id(c)
        if key not in _sims:  # jit once per config (eager ops unsupported on axon)
            _sims[key] = jax.jit(functools.partial(simulate_frame, cfg=c, table=t))
        return _sims[key](jax.random.key(cfg.seed), p)

    # 1. per-model heatmaps (|H| over time-frequency)
    fig, axes = plt.subplots(1, 3, figsize=(16, 4))
    for ax, name in zip(axes, PROFILE_NAMES):
        f = frame_for(name, 100.0)
        im = ax.imshow(
            np.abs(get_numpy(f.channel)[:, 0, 0, :]), aspect="auto", cmap="viridis"
        )
        ax.set_title(f"{name} |H| (100 Hz)")
        ax.set_xlabel("subcarrier")
        ax.set_ylabel("symbol")
        fig.colorbar(im, ax=ax)
    fig.tight_layout()
    fig.savefig(out / "channel_models.png", dpi=120)
    plt.close(fig)

    # 2. Doppler sweep: same profile, increasing time variation
    fig, axes = plt.subplots(1, 4, figsize=(18, 4))
    for ax, fd in zip(axes, cfg.channel.doppler_hz):
        f = frame_for("EVA", fd)
        im = ax.imshow(
            np.abs(get_numpy(f.channel)[:, 0, 0, :]), aspect="auto", cmap="viridis"
        )
        ax.set_title(f"EVA {fd:.0f} Hz")
        ax.set_xlabel("subcarrier")
    fig.tight_layout()
    fig.savefig(out / "doppler_sweep.png", dpi=120)
    plt.close(fig)

    # 3. temporal autocorrelation over an extended 50-symbol frame
    # (reference visualize_channel_phase1.py:160-165)
    ext_cfg = dataclasses.replace(
        cfg, ofdm=dataclasses.replace(cfg.ofdm, num_symbols=50)
    )
    ext_table = table_for(ext_cfg)
    fig, ax = plt.subplots(figsize=(8, 5))
    for fd in cfg.channel.doppler_hz:
        f = frame_for("EVA", fd, c=ext_cfg, t=ext_table)
        h = get_numpy(f.channel)[:, 0, 0, :]  # (50, K)
        ac = []
        for lag in range(25):
            a = h[: 50 - lag]
            b = h[lag:]
            ac.append(np.abs(np.mean(a * np.conj(b))) / np.mean(np.abs(h) ** 2))
        ax.plot(range(25), ac, marker=".", label=f"{fd:.0f} Hz")
    ax.set_xlabel("lag (symbols)")
    ax.set_ylabel("|autocorrelation|")
    ax.set_title("Temporal channel correlation (EVA)")
    ax.legend()
    ax.grid(True, alpha=0.3)
    fig.tight_layout()
    fig.savefig(out / "temporal_autocorrelation.png", dpi=120)
    plt.close(fig)

    print(f"figures → {out}/channel_models.png, doppler_sweep.png, "
          "temporal_autocorrelation.png")


if __name__ == "__main__":
    main()

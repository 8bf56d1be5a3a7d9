"""Component benchmark suite.

Measures steady-state throughput of each pipeline stage on the current
backend. Careful measurement notes for the tunneled axon TPU runtime:
  * inputs VARY per iteration (fresh PRNG keys) — identical (program,
    inputs) pairs can be served from a relay cache and report fantasy
    numbers;
  * completion is forced by fetching a scalar VALUE (``float(...)``) —
    ``block_until_ready`` alone has been observed not to block there.
"""
import argparse
import json
import sys
import time

from _common import add_config_arg, load_cfg


def main():
    parser = add_config_arg(argparse.ArgumentParser(description=__doc__))
    parser.add_argument("--batch", type=int, default=256)
    parser.add_argument("--iters", type=int, default=5)
    parser.add_argument("--ntx", type=int, default=4)
    parser.add_argument("--nrx", type=int, default=4)
    parser.add_argument("--channel", default="ETU")
    parser.add_argument("--out", default=None, help="write JSON results here")
    args = parser.parse_args()

    import dataclasses
    import functools

    import jax
    import jax.numpy as jnp

    from ce5g_tpu import MIMOConfig
    from ce5g_tpu.estimators.api import estimate_batch
    from ce5g_tpu.physics import FrameParams, PROFILE_INDEX, simulate_batch, table_for

    cfg = dataclasses.replace(
        load_cfg(args), mimo=MIMOConfig(num_tx=args.ntx, num_rx=args.nrx)
    )
    table = table_for(cfg)
    b = args.batch

    def params_for(i):
        return FrameParams(
            jnp.full((b,), PROFILE_INDEX[args.channel], jnp.int32),
            jnp.full((b,), 200.0, jnp.float32),
            jnp.full((b,), 10.0, jnp.float32),
            jnp.full((b,), 0.1, jnp.float32),
        )

    results = {}

    def bench(name, fn):
        float(fn(jax.random.split(jax.random.key(10**6), b), params_for(0)))
        t0 = time.time()
        for i in range(args.iters):
            keys = jax.random.split(jax.random.key(i + 1), b)
            float(fn(keys, params_for(i)))
        dt = (time.time() - t0) / args.iters
        fps = b / dt
        results[name] = {"ms_per_batch": dt * 1e3, "frames_per_s": fps}
        print(f"{name:26s} {dt * 1e3:8.1f} ms/batch  {fps:10.0f} frames/s",
              file=sys.stderr)

    def sim_only(keys, params):
        f = simulate_batch(keys, params, cfg=cfg, table=table)
        return (
            jnp.sum(jnp.abs(f.rx_symbols) ** 2)
            + jnp.sum(jnp.abs(f.channel) ** 2)
            + jnp.sum(f.pilot_mask)
        )

    bench("simulate", jax.jit(sim_only))

    for est, meth in [
        ("ls", "nearest"),
        ("ls", "linear"),
        ("mmse", "linear"),
        ("mmse_full", "linear"),
    ]:
        def full(keys, params, est=est, meth=meth):
            f = simulate_batch(keys, params, cfg=cfg, table=table)
            h = estimate_batch(f, cfg=cfg, estimator=est, method=meth, table=table)
            return jnp.sum(jnp.abs(h) ** 2)

        bench(f"sim+{est}/{meth}", jax.jit(full))

    print(json.dumps(results))
    if args.out:
        from pathlib import Path

        Path(args.out).write_text(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()

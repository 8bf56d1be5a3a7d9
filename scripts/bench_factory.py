"""TPU dataset-factory throughput (VERDICT r3 "Next round" #9).

Measures the sharded generation pipeline (parallel/sharded.py
sharded_generate_fn ≡ data.generator.generate_chunk_fn) two ways:

  * ``device_samples_per_s`` — SUSTAINED on-device rate: a lax.scan of
    fresh-key chunk generations inside ONE jit, each chunk reduced to a
    checksum scalar on device (same methodology as bench.py — per-call
    dispatch/fetch through the tunneled dev chip is ~28 ms and relay
    caching would otherwise serve repeated (program, input) pairs).
  * ``end_to_end_samples_per_s`` — per-chunk jit call + full host fetch of
    every output array (the planar complex shim), i.e. what a real
    dataset-writing run achieves on THIS dev setup. The gap between the
    two numbers is the documented reason commit f1623d8 generates datasets
    with CE5G_PLATFORM=cpu here: the tunnel's device→host bandwidth, not
    the TPU, binds the end-to-end path. On non-tunneled hardware the
    end-to-end rate approaches the device rate (chunk bytes / PCIe-class
    bandwidth ≪ generation time).

Writes results/factory_throughput.json.
"""
import argparse
import json
import time

import numpy as np

from _common import add_config_arg, load_cfg


def main():
    parser = add_config_arg(argparse.ArgumentParser(description=__doc__))
    parser.add_argument("--batch", type=int, default=256, help="frames per chunk")
    parser.add_argument("--iters", type=int, default=8, help="chunks per jit (scan)")
    parser.add_argument("--reps", type=int, default=3)
    parser.add_argument("--results-dir", default="results")
    args = parser.parse_args()

    cfg = load_cfg(args)

    import jax
    import jax.numpy as jnp

    from ce5g_tpu.data.generator import generate_chunk_fn
    from ce5g_tpu.parallel import make_mesh
    from ce5g_tpu.parallel.sharded import sharded_generate_fn
    from ce5g_tpu.physics.simulate import table_for
    from ce5g_tpu.utils.host import get_numpy

    mesh = make_mesh()  # all local devices on 'data' (1 on the dev chip)
    fn = sharded_generate_fn(cfg, mesh)
    raw = generate_chunk_fn(cfg, table_for(cfg))
    b = args.batch

    # --- sustained device rate: scan fresh-key chunks inside one jit
    @jax.jit
    def sustained(key):
        def body(c, k):
            chunk = raw.__wrapped__(jax.random.split(k, b))
            s = sum(
                jnp.sum(jnp.abs(v) ** 2)
                for k2, v in chunk.items()
                if v.dtype != jnp.int32
            )
            return c + s, None

        tot, _ = jax.lax.scan(body, jnp.float32(0.0), jax.random.split(key, args.iters))
        return tot

    float(sustained(jax.random.key(0)))  # compile
    t0 = time.time()
    for r in range(args.reps):
        float(sustained(jax.random.key(r + 1)))
    dt = (time.time() - t0) / args.reps
    dev_rate = b * args.iters / dt

    # --- end-to-end: one sharded call + full host fetch per chunk
    keys = jax.random.split(jax.random.key(99), b)
    chunk = fn(keys)
    get_numpy(chunk)  # warm (compile + first fetch)
    t0 = time.time()
    for r in range(args.reps):
        keys = jax.random.split(jax.random.key(100 + r), b)
        host = get_numpy(fn(keys))
    e2e_dt = (time.time() - t0) / args.reps
    e2e_rate = b / e2e_dt
    chunk_mb = sum(np.asarray(v).nbytes for v in host.values()) / 1e6

    out = {
        "batch": b,
        "iters": args.iters,
        "device_samples_per_s": dev_rate,
        "end_to_end_samples_per_s": e2e_rate,
        "chunk_mb": chunk_mb,
        "fetch_bound_fraction": 1.0 - (b / dev_rate) / e2e_dt,
        "backend": jax.default_backend(),
        "note": (
            "device rate = scan-amortized generation+LS on chip; "
            "end-to-end adds full chunk device->host fetch (tunnel-bound "
            "on this dev setup; see module docstring)"
        ),
    }
    from pathlib import Path

    rd = Path(args.results_dir)
    rd.mkdir(parents=True, exist_ok=True)
    (rd / "factory_throughput.json").write_text(json.dumps(out, indent=2))
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()

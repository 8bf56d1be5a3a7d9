"""Single-chip at-scale generation demo (BASELINE config #5's single-chip
half; VERDICT r4 "Next round" #9).

Three measurements, one JSON (results/scale_100k.json):

1. ``device``: a REAL ≥100k-frame generation run at device rate — chunks
   of the full pipeline (param draws → simulate → LS feature) scanned
   inside one jit; every chunk is reduced to checksums on device (the
   methodology of bench.py: the tunneled dev chip adds ~28 ms per host
   round-trip, and fetching 84 GB through the dev tunnel at ~15 MB/s
   would measure the tunnel, not the factory). The checksums are fetched
   and sanity-checked, so all frames provably exist.
2. ``writer``: a real sharded-writer run — ``--writers`` writers each own
   a balanced chunk range (data.generator.chunk_range_for_writer), chunks
   land as .ce5g files with per-writer manifests + the union manifest.
   End-to-end rate recorded; on this dev setup it is tunnel-bound at
   ~99.6% fetch share (results/factory_throughput.json — overlapping
   fetch with generation is a ≤0.4% lever here), so on non-tunneled
   hardware (PCIe-class host link) the end-to-end rate is
   min(device rate, storage rate), both reported here.
3. ``storage``: local codec write bandwidth measured on the fetched
   chunks (the non-tunnel-bound storage leg).

The written dataset lands in --output-dir (default data_scale/, not
committed; the manifests + JSON are).
"""
import argparse
import json
import time
from pathlib import Path

import numpy as np

from _common import add_config_arg, load_cfg


def main():
    parser = add_config_arg(argparse.ArgumentParser(description=__doc__))
    parser.add_argument("--device-samples", type=int, default=100096)
    parser.add_argument("--write-samples", type=int, default=8192)
    parser.add_argument("--writers", type=int, default=2)
    parser.add_argument("--batch", type=int, default=256)
    parser.add_argument("--output-dir", default="data_scale")
    parser.add_argument("--results-dir", default="results")
    args = parser.parse_args()

    cfg = load_cfg(args)

    import jax
    import jax.numpy as jnp

    from ce5g_tpu.data.generator import DatasetGenerator, generate_chunk_fn
    from ce5g_tpu.physics.simulate import table_for
    from ce5g_tpu.utils.rng import split_key

    b = args.batch
    iters = max(args.device_samples // b, 1)
    raw = generate_chunk_fn(cfg, table_for(cfg))
    sk = split_key(cfg.seed, "scale100k")

    # ---- 1. device-sustained: iters × b frames in one scanned jit
    @jax.jit
    def sustained(base):
        def body(carry, i):
            keys = jax.vmap(
                lambda j: jax.random.fold_in(base, i * b + j)
            )(jnp.arange(b))
            chunk = raw.__wrapped__(keys)
            s = sum(
                jnp.sum(jnp.abs(v).astype(jnp.float32))
                for v in chunk.values()
                if v.dtype != jnp.int32
            )
            return carry + s, s
        tot, per = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(iters))
        return tot, per

    t0 = time.time()
    tot, per = jax.block_until_ready(sustained(sk))
    compile_first = time.time() - t0
    t0 = time.time()
    tot, per = jax.block_until_ready(sustained(jax.random.fold_in(sk, 7)))
    dt = time.time() - t0
    per = np.asarray(per)
    assert np.all(np.isfinite(per)) and np.all(per > 0), "checksum sanity"
    device_rate = iters * b / dt
    print(f"device: {iters * b} frames in {dt:.1f}s = {device_rate:.0f} "
          f"frames/s (compile+first {compile_first:.1f}s)", flush=True)

    # ---- 2. sharded writer run (per-writer manifests + union manifest)
    out = Path(args.output_dir)
    n_write = args.write_samples
    gen = DatasetGenerator(cfg, str(out))
    t0 = time.time()
    for w in range(args.writers):
        gen.generate_split(
            "scale", n_write, writer_id=w, num_writers=args.writers,
            log=lambda m, w=w: print(f"  [w{w}] {m}", flush=True),
        )
    wall = time.time() - t0
    gen.write_global_manifest("scale", args.writers)
    writer_rate = n_write / wall
    print(f"writer: {n_write} samples in {wall:.1f}s = "
          f"{writer_rate:.1f} samples/s end-to-end (tunnel-bound)", flush=True)

    # ---- 3. local storage bandwidth on a fetched chunk
    from ce5g_tpu.data.generator import read_chunk, _write_chunk

    manifest = json.loads((out / "scale_manifest.json").read_text())
    chunk0 = read_chunk(out / manifest["files"][0])
    nbytes = sum(v.nbytes for v in chunk0.values())
    t0 = time.time()
    reps = 3
    for i in range(reps):
        _write_chunk(out / f"_storage_probe_{i}.ce5g", chunk0, "ce5g")
    w_dt = (time.time() - t0) / reps
    for i in range(reps):
        (out / f"_storage_probe_{i}.ce5g").unlink()
    storage_mbps = nbytes / w_dt / 1e6
    storage_rate = b / w_dt
    print(f"storage: {storage_mbps:.0f} MB/s codec write = "
          f"{storage_rate:.0f} samples/s per writer thread", flush=True)

    res = {
        "device_frames": iters * b,
        "device_samples_per_s": round(device_rate, 1),
        "device_seconds": round(dt, 2),
        "writer_samples": n_write,
        "writer_samples_per_s_end_to_end": round(writer_rate, 2),
        "writers": args.writers,
        "storage_codec_MBps": round(storage_mbps, 1),
        "storage_samples_per_s_per_thread": round(storage_rate, 1),
        "projected_end_to_end_non_tunnel": round(
            min(device_rate, storage_rate * args.writers), 1
        ),
        "note": "device rate = full factory pipeline on chip over "
        f"{iters * b} real frames (checksum-verified). The writer run is "
        "tunnel-bound on this dev rig (~15 MB/s device→host; "
        "results/factory_throughput.json); on PCIe-class hosts the "
        "end-to-end rate is min(device, storage·writers) — both measured "
        "here.",
    }
    rd = Path(args.results_dir)
    rd.mkdir(parents=True, exist_ok=True)
    (rd / "scale_100k.json").write_text(json.dumps(res, indent=2))
    print(json.dumps(res))


if __name__ == "__main__":
    main()

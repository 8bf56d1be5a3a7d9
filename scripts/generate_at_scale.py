"""At-scale single-chip generation demo (BASELINE config #5, single-chip half).

Runs the dataset factory over >=100k frames at device rate three ways and
writes results/at_scale_generation.json:

  1. digest-manifest materialization (only per-chunk digests cross the
     tunnel; manifest + deterministic keys = pod-scale materialization
     recipe), with a regenerate-and-verify check on a random chunk;
  2. fused generate->train on the CNN (end-to-end samples/s with the
     gradient update as the consumer — no storage in the loop);
  3. the native .ce5g codec's host write rate on one real materialized
     chunk (the storage half, measured on this host's cores).

See ce5g_tpu/data/atscale.py for the design and the transport-bound note.
"""
import argparse
import json
import time
from pathlib import Path

from _common import add_config_arg, load_cfg


def main():
    parser = add_config_arg(argparse.ArgumentParser(description=__doc__))
    parser.add_argument("--samples", type=int, default=131072)
    parser.add_argument("--chunk-size", type=int, default=2048)
    parser.add_argument("--online-samples", type=int, default=131072)
    parser.add_argument("--online-batch", type=int, default=512)
    parser.add_argument("--skip-online", action="store_true")
    parser.add_argument("--skip-codec", action="store_true")
    parser.add_argument("--codec-chunk", type=int, default=256,
                        help="samples in the codec-probe chunk (kept small: "
                        "materializing it pays the dev tunnel's ~3 MB/s once)")
    parser.add_argument("--verify-chunk", type=int, default=None,
                        help="chunk index to regenerate+verify "
                        "(default: middle chunk)")
    parser.add_argument("--output-dir", default="data_atscale")
    parser.add_argument("--results-dir", default="results")
    args = parser.parse_args()

    cfg = load_cfg(args)
    import jax

    from ce5g_tpu.data import atscale

    out = {"backend": jax.devices()[0].platform,
           "config": {"samples": args.samples, "chunk_size": args.chunk_size}}

    manifest = atscale.generate_digest_split(
        cfg, args.output_dir, num_samples=args.samples,
        chunk_size=args.chunk_size,
    )
    vchunk = (
        args.verify_chunk
        if args.verify_chunk is not None
        else manifest["num_chunks"] // 2
    )
    ok = atscale.verify_digest_chunk(cfg, manifest, vchunk)
    print(f"verify chunk {vchunk}: {'PASS' if ok else 'FAIL'}")
    out["digest_run"] = {
        "samples": manifest["total"],
        "device_samples_per_second": manifest["device_samples_per_second"],
        "elapsed_s": manifest["elapsed_s"],
        "manifest": f"{args.output_dir}/{manifest['split']}_digest_manifest.json",
        "verified_chunk": vchunk,
        "verify_pass": bool(ok),
    }

    if not args.skip_online:
        import jax.numpy as jnp

        out["online_train"] = atscale.online_train(
            cfg, "cnn", total_samples=args.online_samples,
            batch_size=args.online_batch,
        )
        out["online_train_bf16"] = atscale.online_train(
            cfg, "cnn", total_samples=args.online_samples,
            batch_size=args.online_batch, dtype=jnp.bfloat16,
        )
        # context: train_step_cnn/b256 alone runs ~2.98k (f32) / 3.69k
        # (bf16) samples/s (results/benchmark_suite.json) — the fused
        # loop runs at the CONSUMER's roofline; generation adds ~nothing
        # (digest run above: the factory side alone sustains >200k/s).

    if not args.skip_codec:
        # storage half: materialize ONE chunk (pays the tunnel once),
        # then time the native codec writing it repeatedly.
        import numpy as np

        from ce5g_tpu.data import DatasetGenerator
        from ce5g_tpu.data.ce5g_format import write_ce5g

        gen = DatasetGenerator(cfg, args.output_dir)
        arrays = gen._run_chunk("atscale", np.arange(args.codec_chunk))
        nbytes = sum(v.nbytes for v in arrays.values())
        p = Path(args.output_dir) / "codec_probe.ce5g"
        write_ce5g(p, arrays)  # warm (thread pool, page cache)
        reps, t0 = 3, time.perf_counter()
        for _ in range(reps):
            write_ce5g(p, arrays)
        dt = (time.perf_counter() - t0) / reps
        p.unlink()
        out["codec_write"] = {
            "chunk_samples": args.codec_chunk,
            "chunk_mb": nbytes / 1e6,
            "write_mb_per_s": nbytes / 1e6 / dt,
            "write_samples_per_s": args.codec_chunk / dt,
            "note": "host-side .ce5g write rate (threaded native codec, "
            "this host's cores); scales with cores on a deployment host",
        }
        print(
            f"codec: {out['codec_write']['write_mb_per_s']:.0f} MB/s "
            f"({out['codec_write']['write_samples_per_s']:.0f} samples/s)"
        )

    rp = Path(args.results_dir) / "at_scale_generation.json"
    rp.parent.mkdir(parents=True, exist_ok=True)
    rp.write_text(json.dumps(out, indent=2))
    print(f"wrote {rp}")


if __name__ == "__main__":
    main()

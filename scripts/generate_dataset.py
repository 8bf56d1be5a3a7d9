"""Dataset generation CLI.

Parity surface: reference src/dataset_generator.py main (:230-315) +
run_phase3_robust.py (chunked, --resume, merge): splits, sample counts,
npz output, seed control — batched and (multi-device) sharded here.
"""
import argparse

from _common import add_config_arg, load_cfg


def main():
    parser = add_config_arg(argparse.ArgumentParser(description=__doc__))
    parser.add_argument("--output-dir", default="data")
    parser.add_argument("--train-samples", type=int, default=None)
    parser.add_argument("--val-samples", type=int, default=None)
    parser.add_argument("--test-samples", type=int, default=None)
    parser.add_argument("--chunk-size", type=int, default=None)
    parser.add_argument(
        "--format",
        choices=("npz", "h5", "ce5g"),
        default=None,
        help="chunk file format; 'ce5g' uses the native threaded codec "
        "(~7-15x faster writes than npz on this host)",
    )
    parser.add_argument("--seed", type=int, default=None)
    parser.add_argument("--resume", action="store_true", default=True)
    parser.add_argument("--no-resume", dest="resume", action="store_false")
    parser.add_argument("--merge", action="store_true", help="merge chunks per split")
    parser.add_argument("--verify", action="store_true", help="verify after generation")
    parser.add_argument(
        "--shard", action="store_true", help="shard frames over all local devices"
    )
    args = parser.parse_args()

    import dataclasses

    cfg = load_cfg(args)
    if args.seed is not None:
        cfg = dataclasses.replace(cfg, seed=args.seed)
    if args.chunk_size is not None:
        cfg = dataclasses.replace(
            cfg, dataset=dataclasses.replace(cfg.dataset, chunk_size=args.chunk_size)
        )
    if args.format is not None:
        cfg = dataclasses.replace(
            cfg, dataset=dataclasses.replace(cfg.dataset, save_format=args.format)
        )

    from ce5g_tpu.data import DatasetGenerator, verify_dataset

    mesh = None
    if args.shard:
        from ce5g_tpu.parallel import make_mesh

        mesh = make_mesh()

    gen = DatasetGenerator(cfg, args.output_dir, mesh=mesh)
    def _count(flag, default):
        return default if flag is None else flag  # 0 is a valid "skip split"

    counts = {
        "train": _count(args.train_samples, cfg.dataset.train_samples),
        "val": _count(args.val_samples, cfg.dataset.val_samples),
        "test": _count(args.test_samples, cfg.dataset.test_samples),
    }
    import jax

    nproc = jax.process_count()
    for split, n in counts.items():
        if n <= 0:
            continue
        # multi-host: each process generates only its contiguous chunk
        # block (generate_split defaults writer_id/num_writers from the
        # process index); process 0 assembles the global manifest after a
        # barrier so no host serializes the others' output
        manifest = gen.generate_split(split, n, resume=args.resume)
        print(f"{split}: {manifest['completed']} samples "
              f"@ {manifest['samples_per_second']:.1f}/s")
        if nproc > 1:
            from jax.experimental import multihost_utils

            multihost_utils.sync_global_devices(f"ce5g_gen_{split}")
            if jax.process_index() == 0:
                gen.write_global_manifest(split, nproc)
            multihost_utils.sync_global_devices(f"ce5g_gen_{split}_manifest")
        if jax.process_index() != 0:
            continue
        if args.merge:
            print(f"merged → {gen.merge_split(split)}")
        if args.verify:
            report = verify_dataset(f"{args.output_dir}/{split}_manifest.json")
            print(f"verify {split}: {'PASS' if report['passed'] else 'FAIL'}")


if __name__ == "__main__":
    main()

"""Component benchmark suite.

Measures SUSTAINED on-device throughput of each pipeline stage (scan of
fresh-key batches inside one jit, like bench.py — per-call dispatch/fetch
through the tunneled dev TPU is ~28 ms and would otherwise dominate), plus
host-side codec throughput and the Pallas-vs-XLA HPD solve. Careful
measurement notes for the tunneled axon TPU runtime:
  * inputs VARY per iteration (fresh PRNG keys) — identical (program,
    inputs) pairs can be served from a relay cache and report fantasy
    numbers;
  * completion is forced by fetching a scalar VALUE (``float(...)``) —
    ``block_until_ready`` alone has been observed not to block there.

`--roundtrip` additionally reports per-call numbers (one jit call + fetch
per batch) for the pipeline stages.
"""
import argparse
import os
import json
import sys
import time

from _common import add_config_arg, load_cfg

# Failure markers that are genuine capability/capacity gaps of the backend
# (relay UNIMPLEMENTED ops, HBM exhaustion at infeasible sweep cells).
# Anything else — shape errors, solver regressions — is a real bug and is
# re-raised so the suite exits nonzero instead of silently recording a SKIP.
_EXPECTED_FAILURE_MARKERS = (
    "UNIMPLEMENTED",
    "RESOURCE_EXHAUSTED",
    "UNAVAILABLE",
    "out of memory",
    "Out of memory",
)


def expected_failure(e: BaseException) -> bool:
    msg = str(e)
    return any(m in msg for m in _EXPECTED_FAILURE_MARKERS)


def main():
    parser = add_config_arg(argparse.ArgumentParser(description=__doc__))
    parser.add_argument("--batch", type=int, default=256)
    parser.add_argument("--iters", type=int, default=16, help="scan length per jit call")
    parser.add_argument("--reps", type=int, default=3)
    parser.add_argument("--ntx", type=int, default=4)
    parser.add_argument("--nrx", type=int, default=4)
    parser.add_argument("--channel", default="ETU")
    parser.add_argument("--roundtrip", action="store_true")
    parser.add_argument("--train", action="store_true", help="include train-step bench")
    parser.add_argument(
        "--train-models", nargs="*", default=["cnn"],
        help="model types for the train-step sweep (with --train)",
    )
    parser.add_argument(
        "--train-batches", nargs="*", type=int, default=[64],
        help="batch sizes for the train-step sweep (with --train)",
    )
    parser.add_argument("--out", default=None, help="write JSON results here")
    args = parser.parse_args()

    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("CE5G_CACHE_DIR", "/tmp/ce5g_jax_cache"),
    )

    from ce5g_tpu import MIMOConfig
    from ce5g_tpu.estimators.api import estimate_batch
    from ce5g_tpu.physics import FrameParams, PROFILE_INDEX, simulate_batch, table_for

    cfg = dataclasses.replace(
        load_cfg(args), mimo=MIMOConfig(num_tx=args.ntx, num_rx=args.nrx)
    )
    table = table_for(cfg)
    b, iters, reps = args.batch, args.iters, args.reps

    params = FrameParams(
        jnp.full((b,), PROFILE_INDEX[args.channel], jnp.int32),
        jnp.full((b,), 200.0, jnp.float32),
        jnp.full((b,), 10.0, jnp.float32),
        jnp.full((b,), 0.1, jnp.float32),
    )
    results = {}

    # ---- roofline peaks for MFU accounting (per chip). TPU v5e (aka
    # "TPU v5 lite"): 197 TFLOP/s bf16 MXU, ~1/2 that for f32-accumulated
    # work, 819 GB/s HBM. Unknown devices fall back to v5e numbers with a
    # note — utilization is then indicative, not exact.
    dev_kind = jax.devices()[0].device_kind.lower()
    PEAKS = {
        "tpu v5 lite": {"flops": 197e12, "hbm_Bps": 819e9},
        "tpu v4": {"flops": 275e12, "hbm_Bps": 1228e9},
        "cpu": {"flops": 1e11, "hbm_Bps": 50e9},
    }
    peak = PEAKS.get(dev_kind) or PEAKS["tpu v5 lite" if "tpu" in dev_kind else "cpu"]

    def cost_per_iter(compiled, n_iters):
        """XLA's own per-program cost model → (flops, HBM bytes) per scan
        iteration. Returns (0, 0) where the backend exposes no analysis."""
        try:
            c = compiled.cost_analysis()
            if isinstance(c, (list, tuple)):
                c = c[0]
            return (
                float(c.get("flops", 0.0)) / n_iters,
                float(c.get("bytes accessed", 0.0)) / n_iters,
            )
        except Exception:
            return 0.0, 0.0

    def add_roofline(name, dt_s, flops, hbm_bytes):
        """Record achieved-vs-peak utilization and the binding resource."""
        if not flops and not hbm_bytes:
            return
        mfu = flops / dt_s / peak["flops"]
        hbm = hbm_bytes / dt_s / peak["hbm_Bps"]
        results[name].update(
            {
                "flops_per_batch": flops,
                "hbm_bytes_per_batch": hbm_bytes,
                "mfu": mfu,
                "hbm_util": hbm,
                "bound": "hbm" if hbm >= mfu else "mxu",
            }
        )
        print(
            f"{'':28s} roofline: {mfu * 100:5.1f}% MXU  {hbm * 100:5.1f}% HBM "
            f"→ {results[name]['bound']}-bound",
            file=sys.stderr, flush=True,
        )

    def keys_for(seed):
        return jax.random.split(jax.random.key(seed), iters * b).reshape(iters, b)

    def bench_sustained(name, per_batch_fn):
        @jax.jit
        def many(keys2d):
            def body(c, ks):
                return c + per_batch_fn(ks), None

            tot, _ = jax.lax.scan(body, jnp.float32(0.0), keys2d)
            return tot

        compiled = many.lower(keys_for(0)).compile()
        float(compiled(keys_for(0)))  # warm
        t0 = time.time()
        for r in range(reps):
            float(compiled(keys_for(r + 1)))
        dt = (time.time() - t0) / reps / iters
        results[name] = {"ms_per_batch": dt * 1e3, "frames_per_s": b / dt}
        print(f"{name:28s} {dt * 1e3:8.2f} ms/batch  {b / dt:10.0f} frames/s",
              file=sys.stderr, flush=True)
        add_roofline(name, dt, *cost_per_iter(compiled, iters))
        if args.roundtrip:
            one = jax.jit(per_batch_fn)
            float(one(keys_for(0)[0]))
            t0 = time.time()
            for r in range(reps):
                float(one(keys_for(r + 1)[0]))
            rt = (time.time() - t0) / reps
            results[name]["roundtrip_ms"] = rt * 1e3
            print(f"{'':28s} {rt * 1e3:8.2f} ms round-trip", file=sys.stderr)

    def sim_only(ks):
        f = simulate_batch(ks, params, cfg=cfg, table=table)
        return (
            jnp.sum(jnp.abs(f.rx_symbols) ** 2)
            + jnp.sum(jnp.abs(f.channel) ** 2)
            + jnp.sum(f.pilot_mask)
        )

    bench_sustained("simulate", sim_only)

    for est, meth in [
        ("ls", "nearest"),
        ("ls", "linear"),
        ("mmse", "linear"),
        ("mmse_full", "linear"),
    ]:
        def full(ks, est=est, meth=meth):
            f = simulate_batch(ks, params, cfg=cfg, table=table)
            h = estimate_batch(f, cfg=cfg, estimator=est, method=meth, table=table)
            return jnp.sum(jnp.abs(h) ** 2)

        bench_sustained(f"sim+{est}/{meth}", full)

    # ---- batched HPD solve: Pallas kernel vs XLA custom-calls
    from ce5g_tpu.ops.hpd_solve_pallas import MAX_N, _xla_solve, hpd_solve

    # Inputs are built host-side and shipped as PLANAR float32 (re, im):
    # the tunneled axon relay supports neither eager op-by-op execution
    # (jnp.ones, a+b, …) nor complex64 host↔device transfers — only
    # compiled executables over real-dtype buffers. The complex view is
    # formed inside the jitted program; a per-rep diagonal load (scalar
    # argument) defeats relay (program, input) result caching.
    n, r_rhs = 45, args.nrx
    rng_hpd = np.random.default_rng(5)
    # NOTE (round 4): real and imag parts are INDEPENDENT draws. Before
    # round 3 one PRNG key was reused, making re==im (a degenerate,
    # better-conditioned Gram); hpd_solve timings from BENCH_r01/r02 are
    # therefore not directly comparable to r03+ numbers.
    x_h = rng_hpd.standard_normal((b, n, n)) + 1j * rng_hpd.standard_normal((b, n, n))
    gram_h = (np.einsum("bij,bkj->bik", x_h, np.conj(x_h)) + n * np.eye(n)).astype(
        np.complex64
    )
    g_re = jnp.asarray(gram_h.real)
    g_im = jnp.asarray(gram_h.imag)
    rhs_re = jnp.asarray(rng_hpd.standard_normal((b, n, r_rhs)).astype(np.float32))
    eye_n = jnp.asarray(np.eye(n, dtype=np.float32))
    on_tpu = jax.default_backend() == "tpu"

    def _planar(solver):
        def run(gr, gi, rr, load):
            g = (gr + load * eye_n) + 1j * gi
            r = rr.astype(jnp.complex64)
            return jnp.sum(jnp.abs(solver(g, r)))

        return jax.jit(run)

    for name, fn in [
        ("hpd_solve/xla", _planar(_xla_solve)),
    ] + (
        [("hpd_solve/pallas", _planar(lambda g, r: hpd_solve(g, r, force="pallas")))]
        if on_tpu and n <= MAX_N
        else []
    ):
        try:
            float(fn(g_re, g_im, rhs_re, jnp.float32(0.0)))
            t0 = time.time()
            for r in range(reps):
                float(fn(g_re, g_im, rhs_re, jnp.float32((r + 1) * 1e-3)))
            dt = (time.time() - t0) / reps
        except Exception as e:  # relay/backend capability gaps (UNIMPLEMENTED)
            if not expected_failure(e):
                raise
            results[name] = {"error": str(e).splitlines()[0][:200]}
            print(f"{name:28s} SKIPPED: {results[name]['error']}",
                  file=sys.stderr, flush=True)
            continue
        results[name] = {"ms_per_batch": dt * 1e3}
        print(f"{name:28s} {dt * 1e3:8.2f} ms/batch({b}x{n}x{n})",
              file=sys.stderr, flush=True)

    # ---- host codec throughput (native vs npz) on one realistic chunk
    from ce5g_tpu.data.ce5g_format import read_ce5g, write_ce5g
    from ce5g_tpu.native import have_native
    import tempfile
    from pathlib import Path

    rng = np.random.default_rng(0)
    s_sym, k_sc = cfg.ofdm.num_symbols, cfg.ofdm.num_used_subcarriers
    chunk = {
        "H_true": (rng.standard_normal((64, s_sym, args.nrx, args.ntx, k_sc))
                   + 1j * rng.standard_normal((64, s_sym, args.nrx, args.ntx, k_sc))
                   ).astype(np.complex64),
        "rx_symbols": (rng.standard_normal((64, s_sym, args.nrx, k_sc))).astype(np.float32),
    }
    nbytes = sum(a.nbytes for a in chunk.values())
    with tempfile.TemporaryDirectory() as td:
        p = Path(td) / "c.ce5g"
        t0 = time.time(); write_ce5g(p, chunk); w = time.time() - t0
        t0 = time.time(); read_ce5g(p); r = time.time() - t0
        ratio = os.path.getsize(p) / nbytes
        t0 = time.time(); np.savez_compressed(Path(td) / "c.npz", **chunk)
        wn = time.time() - t0
    results["codec"] = {
        "native": have_native(),
        "write_MBps": nbytes / w / 1e6,
        "read_MBps": nbytes / r / 1e6,
        "npz_write_MBps": nbytes / wn / 1e6,
        "ratio": ratio,
    }
    print(
        f"{'codec (native=' + str(have_native()) + ')':28s} "
        f"write {nbytes / w / 1e6:6.0f} MB/s  read {nbytes / r / 1e6:6.0f} MB/s  "
        f"(npz write {nbytes / wn / 1e6:5.0f} MB/s)  ratio {ratio:.3f}",
        file=sys.stderr, flush=True,
    )

    # ---- train-step sweep: models × batch sizes × dtypes, with roofline
    # and an input-staging overlap probe (does host batch prep hide behind
    # device compute under async dispatch?)
    if args.train:
        from flax import nnx
        import optax
        from ce5g_tpu.models import get_model
        from ce5g_tpu.models.loss import channel_estimation_loss

        # Round-5 finding: the estimator sections' live jitted programs +
        # buffers left so little free HBM that XLA scheduled the resnet
        # b256 train step 8× slower (57.4 ms in-suite vs 6.9 ms in a
        # clean process — same step, bit-identical formulation, verified
        # by a 5-way bisect). Benchmarks must not inherit another
        # section's memory pressure: drop compiled programs first (their
        # input/output buffers go with them). For fully clean numbers run
        # --train in its own process (the committed artifact does).
        jax.clear_caches()

        rng_host = np.random.default_rng(0)
        for model_type in args.train_models:
            for bt in args.train_batches:
                # host-built constants: eager jnp.ones is an op the relay
                # cannot execute (see note above)
                xb = jnp.asarray(np.ones((bt, s_sym, k_sc, 5), np.float32))
                yb = jnp.asarray(np.ones((bt, s_sym, k_sc, 2), np.float32))
                mb = jnp.asarray(np.ones((bt, s_sym, k_sc), np.float32))
                for dtype, dname in [(jnp.float32, "f32"), (jnp.bfloat16, "bf16")]:
                    model = get_model(model_type, cfg.model, dtype=dtype, seed=0)
                    opt = nnx.Optimizer(model, optax.adam(1e-3), wrt=nnx.Param)

                    @nnx.jit
                    def step(model, opt, x, y, m):
                        def loss_fn(mm):
                            pred = mm(x, train=True)
                            return channel_estimation_loss(
                                pred.astype(jnp.float32), y, m, "mse"
                            )

                        loss, grads = nnx.value_and_grad(loss_fn)(model)
                        opt.update(model, grads)
                        return loss

                    name = f"train_step_{model_type}/b{bt}/{dname}"
                    try:
                        float(step(model, opt, xb, yb, mb))
                    except Exception as e:
                        # e.g. activation OOM at large batch in f32 — record
                        # the infeasible cell, keep sweeping
                        if not expected_failure(e):
                            raise
                        results[name] = {"error": str(e).splitlines()[0][:200]}
                        print(f"{name:28s} SKIPPED: {results[name]['error']}",
                              file=sys.stderr, flush=True)
                        continue
                    nst = 10
                    t0 = time.time()
                    last = None
                    for _ in range(nst):
                        last = step(model, opt, xb, yb, mb)
                    jax.block_until_ready(last)
                    dt = (time.time() - t0) / nst
                    results[name] = {
                        "ms_per_step": dt * 1e3,
                        "samples_per_s": bt / dt,
                    }
                    print(f"{name:28s} {dt * 1e3:8.1f} ms/step "
                          f"{bt / dt:10.0f} samples/s", file=sys.stderr, flush=True)
                    # Per-step roofline via XLA cost analysis on the jitted
                    # step (nnx.jit caches by state structure; re-lowering
                    # gives the compiled's cost tables).
                    try:
                        c = step.lower(model, opt, xb, yb, mb).compile()
                        fl, byt = cost_per_iter(c, 1)
                        add_roofline(name, dt, fl, byt)
                    except Exception:
                        pass

                    if dname == "bf16":
                        # Overlap probe: same step but every iteration
                        # stages a FRESH host numpy batch (Trainer path).
                        # ratio ≈ 1.0 → staging fully hidden by compute.
                        try:
                            hx = rng_host.standard_normal(
                                (nst, bt, s_sym, k_sc, 5)).astype(np.float32)
                            t0 = time.time()
                            last = None
                            for i in range(nst):
                                last = step(model, opt, jnp.asarray(hx[i]), yb, mb)
                            jax.block_until_ready(last)
                        except Exception as e:
                            # ten in-flight staged batches can exceed HBM at
                            # the largest batch size — record, keep sweeping
                            if not expected_failure(e):
                                raise
                            results[name]["staging_error"] = (
                                str(e).splitlines()[0][:200]
                            )
                            print(f"{'':28s} host-staged: SKIPPED "
                                  f"({results[name]['staging_error']})",
                                  file=sys.stderr, flush=True)
                            continue
                        dt_staged = (time.time() - t0) / nst
                        results[name]["staged_ms_per_step"] = dt_staged * 1e3
                        results[name]["staging_overhead"] = dt_staged / dt - 1.0
                        print(
                            f"{'':28s} host-staged: {dt_staged * 1e3:8.1f} ms/step "
                            f"({(dt_staged / dt - 1) * 100:+.0f}% vs device-resident)",
                            file=sys.stderr, flush=True,
                        )

    print(json.dumps(results))
    if args.out:
        Path(args.out).write_text(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()

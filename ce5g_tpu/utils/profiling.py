"""Tracing / profiling harness (SURVEY §5.1).

The reference's only "profiling" is wall-clock ``time.time()`` deltas
(test_phase2_comparison.py:76-99, evaluate.py:69-77) and samples/s logs
(run_phase3_robust.py:232-234). TPU equivalents here:

  * :func:`trace` — context manager around ``jax.profiler`` emitting a
    TensorBoard-loadable trace (xplane) for per-kernel timeline and
    roofline inspection;
  * :class:`Stopwatch` — compile-aware wall-clock timing of jitted
    callables with ``block_until_ready`` (the cuda.synchronize analog,
    reference run_phase4_training.py:283-288);
  * :func:`annotate` — named ``TraceAnnotation`` scopes so pipeline
    stages are labeled inside device traces.
"""
from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict, List, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str, create_perfetto_link: bool = False):
    """Capture a device+host profiler trace under ``log_dir``.

    View with TensorBoard's profile plugin or Perfetto. Usage::

        with profiling.trace("logs/profile"):
            jax.block_until_ready(step(...))
    """
    jax.profiler.start_trace(log_dir, create_perfetto_link=create_perfetto_link)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named scope that shows up on the device timeline."""
    return jax.profiler.TraceAnnotation(name)


class Stopwatch:
    """Compile-aware timing of jitted callables.

    Separates the first (compile-including) call from steady-state
    iterations, forcing completion with ``block_until_ready`` — the
    reference's cuda.synchronize latency methodology, correctly applied
    to XLA's async dispatch.
    """

    def __init__(self):
        self.records: Dict[str, Dict[str, float]] = {}

    def measure(
        self,
        name: str,
        fn: Callable,
        *args,
        iters: int = 5,
        make_args: Optional[Callable[[int], tuple]] = None,
        **kwargs,
    ) -> Dict[str, float]:
        """Time ``fn``: one compile call + ``iters`` steady-state calls.

        ``make_args(i)`` (optional) builds fresh positional args per
        iteration — use it to defeat input-identity caching.
        """
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args, **kwargs))
        compile_s = time.perf_counter() - t0

        times: List[float] = []
        for i in range(iters):
            a = make_args(i) if make_args is not None else args
            t0 = time.perf_counter()
            jax.block_until_ready(fn(*a, **kwargs))
            times.append(time.perf_counter() - t0)
        times.sort()
        rec = {
            "compile_s": compile_s,
            "median_s": times[len(times) // 2],
            "best_s": times[0],
            "iters": float(iters),
        }
        self.records[name] = rec
        return rec

    def report(self) -> str:
        lines = [f"{'stage':<28} {'compile':>9} {'median':>9} {'best':>9}"]
        for name, r in self.records.items():
            lines.append(
                f"{name:<28} {r['compile_s']:>8.2f}s {r['median_s'] * 1e3:>7.1f}ms"
                f" {r['best_s'] * 1e3:>7.1f}ms"
            )
        return "\n".join(lines)

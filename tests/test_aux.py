"""Auxiliary-subsystem tests: profiling stopwatch, numeric sanitizers
(SURVEY §5.1-§5.2 TPU equivalents)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ce5g_tpu.utils.profiling import Stopwatch
from ce5g_tpu.utils.sanitize import assert_finite, debug_nans, finite_report


def test_stopwatch_measures_compile_and_steady():
    sw = Stopwatch()

    @jax.jit
    def f(x):
        return jnp.sum(x * 2.0)

    rec = sw.measure("double", f, jnp.ones((64, 64)), iters=3)
    assert rec["compile_s"] > 0
    assert rec["median_s"] > 0
    # steady-state must not exceed the compile-including first call by much
    assert rec["best_s"] <= rec["compile_s"] * 10
    assert "double" in sw.report()


def test_stopwatch_fresh_args():
    sw = Stopwatch()
    f = jax.jit(jnp.sum)
    rec = sw.measure(
        "sum", f, jnp.ones(8), iters=2, make_args=lambda i: (jnp.full(8, float(i)),)
    )
    assert rec["iters"] == 2.0


def test_assert_finite_pass_and_fail():
    good = {"a": jnp.ones(4), "b": jnp.ones(3) + 1j * jnp.ones(3), "c": jnp.arange(3)}
    assert bool(assert_finite(good))
    bad = {"a": jnp.array([1.0, jnp.nan])}
    assert not bool(assert_finite(bad))
    with pytest.raises(FloatingPointError):
        assert_finite(bad, "bad", hard=True)


def test_assert_finite_under_jit():
    @jax.jit
    def check(x):
        return assert_finite(x)

    assert bool(check(jnp.ones(5)))
    assert not bool(check(jnp.array([jnp.inf, 1.0])))


def test_finite_report_census():
    tree = {
        "ok": jnp.ones(4),
        "bad": jnp.array([jnp.nan, jnp.inf, 1.0]),
        "cbad": jnp.array([jnp.nan + 0j]),
    }
    rep = finite_report(tree)
    keys = "".join(rep)
    assert "bad" in keys and "ok" not in rep
    total = sum(v["nan"] + v["inf"] for v in rep.values())
    assert total == 3


def test_debug_nans_context():
    prev = jax.config.jax_debug_nans
    with debug_nans(True):
        assert jax.config.jax_debug_nans
        with pytest.raises(FloatingPointError):
            jnp.log(-jnp.ones(())) + 0  # NaN raises under jax_debug_nans
    assert jax.config.jax_debug_nans == prev

"""Shared CLI bootstrapping for scripts/ entry points."""
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _enable_compile_cache():
    """Persistent XLA compile cache: cold compiles of the scan pipelines run
    minutes on the tunneled chip; every CLI should amortize them."""
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/ce5g_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    # CE5G_PLATFORM=cpu forces host execution even where the container's
    # site hook pins JAX_PLATFORMS to the tunneled TPU before user code
    # runs (env overrides are rewritten at interpreter start, so a plain
    # JAX_PLATFORMS=cpu on the command line is ineffective here).
    platform = os.environ.get("CE5G_PLATFORM")
    if platform:
        jax.config.update("jax_platforms", platform)


_enable_compile_cache()


def add_config_arg(parser):
    parser.add_argument(
        "--config",
        type=str,
        default=None,
        help="YAML config (reference experiment_config.yaml schema); defaults built-in",
    )
    return parser


def load_cfg(args):
    from ce5g_tpu import load_config

    return load_config(args.config)

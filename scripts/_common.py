"""Shared CLI bootstrapping for scripts/ entry points."""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _enable_compile_cache():
    """Persistent XLA compile cache: cold compiles of the scan pipelines run
    minutes on the tunneled chip; every CLI should amortize them."""
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/ce5g_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


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

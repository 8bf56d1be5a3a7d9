"""Shared CLI bootstrapping for scripts/ entry points."""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


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

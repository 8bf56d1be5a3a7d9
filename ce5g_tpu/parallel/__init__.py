from .mesh import (
    data_sharding,
    make_mesh,
    psum_mean,
    replicated,
    shard_batch,
    shard_model_state,
)
from .sharded import sharded_eval_stats_fn, sharded_generate_fn
from .time_sharded import reference_time_domain_apply, sharded_time_domain_apply
from .train_sharded import (
    make_sharded_train_state,
    make_sharded_train_step,
    run_one_sharded_step,
)

__all__ = [
    "data_sharding",
    "make_mesh",
    "psum_mean",
    "replicated",
    "shard_batch",
    "shard_model_state",
    "sharded_eval_stats_fn",
    "reference_time_domain_apply",
    "sharded_time_domain_apply",
    "sharded_generate_fn",
    "make_sharded_train_state",
    "make_sharded_train_step",
    "run_one_sharded_step",
]

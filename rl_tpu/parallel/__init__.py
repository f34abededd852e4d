from .mesh import (
    make_mesh,
    shard_leading_axis,
    replicated,
    shard_batch,
    device_count,
)
from .launch import free_port, global_batch, initialize_multiprocess

__all__ = [
    "make_mesh",
    "shard_leading_axis",
    "replicated",
    "shard_batch",
    "device_count",
    "initialize_multiprocess",
    "free_port",
    "global_batch",
]
from .pipeline import pipeline_apply, pipeline_fn, stack_stage_params  # noqa: F401,E402
from .llm_tp import lm_tp_spec, shard_lm_cache, shard_lm_params  # noqa: F401,E402

__all__ += ["pipeline_apply", "pipeline_fn", "stack_stage_params",
            "lm_tp_spec", "shard_lm_cache", "shard_lm_params"]

from .timeit import timeit
from .subproc import cpu_worker_env
from .seeding import seed_generator, key_from_seed, split_key, fold_in
from .profiling import (
    profiling_enabled,
    set_profiling_enabled,
    maybe_named_scope,
    trace_to,
    device_memory_stats,
)

__all__ = [
    "cpu_worker_env",
    "timeit",
    "seed_generator",
    "key_from_seed",
    "split_key",
    "fold_in",
    "profiling_enabled",
    "set_profiling_enabled",
    "maybe_named_scope",
    "trace_to",
    "device_memory_stats",
]

from .collector import Collector, split_trajectories
from .multiproc import MultiSyncCollector, MultiAsyncCollector
from .llm import AsyncBatchedCollector, LLMCollector

__all__ = [
    "Collector",
    "split_trajectories",
    "MultiSyncCollector",
    "MultiAsyncCollector",
    "LLMCollector",
    "AsyncBatchedCollector",
    "RayCollector",
    "RayLLMCollector",
    "RPCCollector",
    "DistributedSyncCollector",
]
from .gated import (RayCollector, RayLLMCollector, RPCCollector,
                    DistributedSyncCollector)

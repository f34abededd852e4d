from .collector import Collector, split_trajectories
from .multiproc import MultiSyncCollector, MultiAsyncCollector

__all__ = [
    "Collector",
    "split_trajectories",
    "MultiSyncCollector",
    "MultiAsyncCollector",
    "RayCollector",
    "RPCCollector",
    "DistributedSyncCollector",
]
from .gated import RayCollector, RPCCollector, DistributedSyncCollector

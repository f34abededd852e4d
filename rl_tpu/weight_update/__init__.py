from .schemes import (
    WeightStrategy,
    WeightSyncScheme,
    DeviceWeightSyncScheme,
    NoWeightSyncScheme,
    MultiProcessWeightSyncScheme, SharedMemWeightSyncScheme,
)

__all__ = [
    "WeightStrategy",
    "WeightSyncScheme",
    "DeviceWeightSyncScheme",
    "NoWeightSyncScheme",
    "MultiProcessWeightSyncScheme",
    "SharedMemWeightSyncScheme",
]

from .schemes import (
    WeightStrategy,
    WeightSyncScheme,
    DeviceWeightSyncScheme,
    NoWeightSyncScheme,
    MultiProcessWeightSyncScheme,
)

__all__ = [
    "WeightStrategy",
    "WeightSyncScheme",
    "DeviceWeightSyncScheme",
    "NoWeightSyncScheme",
    "MultiProcessWeightSyncScheme",
]

from .schemes import (
    WeightStrategy,
    WeightSyncScheme,
    DeviceWeightSyncScheme,
    NoWeightSyncScheme,
    MultiProcessWeightSyncScheme, SharedMemWeightSyncScheme,
)
from .llm import LLMEngineWeightSync

__all__ = [
    "WeightStrategy",
    "WeightSyncScheme",
    "DeviceWeightSyncScheme",
    "NoWeightSyncScheme",
    "MultiProcessWeightSyncScheme",
    "SharedMemWeightSyncScheme",
    "LLMEngineWeightSync",
]

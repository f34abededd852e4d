from .storages import TensorStorage, LazyTensorStorage, ListStorage, LazyMemmapStorage
from .writers import RoundRobinWriter, MaxValueWriter, ImmutableDatasetWriter
from .samplers import (
    RandomSampler,
    SamplerWithoutReplacement,
    PrioritizedSampler,
    SliceSampler,
)
from .buffers import ReplayBuffer, TensorDictReplayBuffer, PrioritizedReplayBuffer

__all__ = [
    "TensorStorage",
    "LazyTensorStorage",
    "ListStorage",
    "LazyMemmapStorage",
    "RoundRobinWriter",
    "MaxValueWriter",
    "ImmutableDatasetWriter",
    "RandomSampler",
    "SamplerWithoutReplacement",
    "PrioritizedSampler",
    "SliceSampler",
    "ReplayBuffer",
    "TensorDictReplayBuffer",
    "PrioritizedReplayBuffer",
]

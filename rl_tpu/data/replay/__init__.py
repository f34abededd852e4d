from .storages import (
    TensorStorage,
    LazyTensorStorage,
    ListStorage,
    LazyMemmapStorage,
    LazyStackStorage,
    CompressedListStorage,
    StorageEnsemble,
    StoreStorage,
    save_storage,
    load_storage,
)
from .writers import RoundRobinWriter, MaxValueWriter, ImmutableDatasetWriter, WriterEnsemble
from .samplers import (
    RandomSampler,
    SamplerWithoutReplacement,
    PrioritizedSampler,
    SliceSampler,
    SliceSamplerWithoutReplacement,
    PrioritizedSliceSampler,
    HostPrioritizedSampler,
    ConsumingSampler,
    StalenessAwareSampler,
    PromptGroupSampler,
    SamplerEnsemble,
)
from .buffers import ReplayBuffer, TensorDictReplayBuffer, PrioritizedReplayBuffer
from .checkpointers import (
    FlatStorageCheckpointer,
    H5StorageCheckpointer,
    NestedStorageCheckpointer,
    checkpointer_for,
)
from .ensemble import ReplayBufferEnsemble, OfflineToOnlineBuffer

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
    "ReplayBufferEnsemble",
    "OfflineToOnlineBuffer",
    "LazyStackStorage",
    "CompressedListStorage",
    "StorageEnsemble",
    "StoreStorage",
    "WriterEnsemble",
    "SliceSamplerWithoutReplacement",
    "PrioritizedSliceSampler",
    "HostPrioritizedSampler",
    "ConsumingSampler",
    "StalenessAwareSampler",
    "PromptGroupSampler",
    "SamplerEnsemble",
    "save_storage",
    "FlatStorageCheckpointer",
    "NestedStorageCheckpointer",
    "H5StorageCheckpointer",
    "checkpointer_for",
    "load_storage",
]

from .her import HERReplayBuffer, her_relabel
__all__ += ["HERReplayBuffer", "her_relabel"]

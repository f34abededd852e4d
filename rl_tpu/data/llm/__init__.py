from .controllers import AdaptiveKLController, ConstantKLController
from .history import ContentBlock, History, Message
from .preference import PairwiseDataset, tokenize_batch
from .topk import TopKRewardSelector

__all__ = [
    "AdaptiveKLController",
    "ConstantKLController",
    "ContentBlock",
    "History",
    "Message",
    "PairwiseDataset",
    "TopKRewardSelector",
    "tokenize_batch",
]

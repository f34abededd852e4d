from .controllers import AdaptiveKLController, ConstantKLController
from .dataset import (TokenizedDatasetLoader, create_infinite_iterator,
                      get_dataloader)
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
    "TokenizedDatasetLoader",
    "TopKRewardSelector",
    "create_infinite_iterator",
    "get_dataloader",
    "tokenize_batch",
]

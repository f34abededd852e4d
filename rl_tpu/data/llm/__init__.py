from .history import History, Message
from .topk import TopKRewardSelector

__all__ = ["History", "Message", "TopKRewardSelector"]

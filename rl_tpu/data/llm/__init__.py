from .history import ContentBlock, History, Message
from .topk import TopKRewardSelector

__all__ = ["ContentBlock", "History", "Message", "TopKRewardSelector"]

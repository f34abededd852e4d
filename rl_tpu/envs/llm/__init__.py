from .chat import ChatEnv, DatasetChatEnv

__all__ = ["ChatEnv", "DatasetChatEnv"]

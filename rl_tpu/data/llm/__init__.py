from .history import History, Message

__all__ = ["History", "Message"]

from .request_reply import (
    RequestReplyTransport,
    ThreadingTransport,
    TCPTransport,
    TCPServer,
)
from .services import ServiceRegistry, services

__all__ = [
    "RequestReplyTransport",
    "ThreadingTransport",
    "TCPTransport",
    "TCPServer",
    "ServiceRegistry",
    "services",
]

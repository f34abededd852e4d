from .request_reply import (
    RequestReplyTransport,
    ThreadingTransport,
    TCPTransport,
    TCPServer,
)
from .services import ServiceRegistry, services
from .mailbox import (
    Mailbox,
    MailboxClient,
    MailboxFuture,
    MailboxTransportError,
    MailboxPeerClosedError,
    watch_process_liveness,
)
from .rendezvous import (
    Rendezvous,
    MappingRendezvous,
    TCPStoreRendezvous,
    TCPStoreServer,
)
from .replay_service import ReplayService, DistributedReplayClient

__all__ = [
    "RequestReplyTransport",
    "ThreadingTransport",
    "TCPTransport",
    "TCPServer",
    "ServiceRegistry",
    "services",
    "Mailbox",
    "MailboxClient",
    "MailboxFuture",
    "MailboxTransportError",
    "MailboxPeerClosedError",
    "watch_process_liveness",
    "Rendezvous",
    "MappingRendezvous",
    "TCPStoreRendezvous",
    "TCPStoreServer",
    "ReplayService",
    "DistributedReplayClient",
]

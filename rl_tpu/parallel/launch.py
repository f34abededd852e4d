"""Multi-process runtime bring-up — ``jax.distributed`` over the framework's
own TCP rendezvous.

Counterpart of the reference's distributed launch plumbing
(``/root/reference/torchrl/collectors/distributed/generic.py:351`` submitit/
torch.distributed init; ``test/test_distributed.py:292-345`` spawns real
localhost worker processes).  The reference wires processes with
``torch.distributed`` TCPStore + NCCL/gloo; here the control plane is
:class:`rl_tpu.comm.TCPStoreRendezvous` and the data plane is XLA GSPMD —
after ``initialize_multiprocess`` every process sees ONE global device list
and jitted programs partition across all hosts exactly like the single
-process mesh path (same code, bigger mesh).

Usage (each process)::

    store = TCPStoreRendezvous(host, port)
    initialize_multiprocess(store, process_id=rank, num_processes=2)
    mesh = make_mesh()          # now spans all processes' devices
"""
from __future__ import annotations

import socket
from typing import Any

import jax

__all__ = ["initialize_multiprocess", "free_port", "global_batch"]


def free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def initialize_multiprocess(store, process_id: int, num_processes: int,
                            *, coordinator_key: str = "jax_coordinator",
                            timeout: float = 60.0) -> None:
    """Bring up the cross-process XLA runtime.

    Rank 0 picks a free port and publishes ``host:port`` under
    ``coordinator_key`` in the rendezvous ``store``; every rank (0 included)
    waits for it and calls ``jax.distributed.initialize``.  After this,
    ``jax.devices()`` is the GLOBAL device list and ``jax.process_index()``
    reports the rank.
    """
    if process_id == 0:
        addr = f"127.0.0.1:{free_port()}"
        store.publish(coordinator_key, addr)
    addr = store.wait(coordinator_key, timeout=timeout)
    jax.distributed.initialize(
        coordinator_address=addr,
        num_processes=num_processes,
        process_id=process_id,
    )


def global_batch(tree: Any):
    """Gather a (possibly sharded) pytree to host numpy on EVERY process
    (the reference's all_gather of worker batches).  ``tiled=True`` returns
    each leaf at its full GLOBAL shape (the only mode supported for
    non-fully-addressable inputs)."""
    from jax.experimental import multihost_utils

    return multihost_utils.process_allgather(tree, tiled=True)

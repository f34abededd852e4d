"""Gated collector backends for dependencies absent from this image.

API-parity markers for the reference's Ray and torch.rpc collector fleets
(``/root/reference/torchrl/collectors/distributed/ray.py:450``,
``rpc.py:107``, ``generic.py:490``): constructing one raises ImportError
with the local alternative.  The TPU-native scale-out path is
:class:`rl_tpu.collectors.DistributedCollector` (GSPMD mesh sharding) for
on-chip parallelism and :class:`MultiSyncCollector`/``MultiAsyncCollector``
for host-process fleets; cross-host control runs over ``rl_tpu.comm``.
"""
from __future__ import annotations

__all__ = ["RayCollector", "RPCCollector", "DistributedSyncCollector",
           "RayLLMCollector"]


class _Gated:
    _dep = "ray"
    _alt = "MultiSyncCollector / DistributedCollector"

    def __init__(self, *a, **k):
        raise ImportError(
            f"{type(self).__name__} needs {self._dep}, which is not in "
            f"this image; use {self._alt} instead")


class RayCollector(_Gated):
    """Reference distributed/ray.py — Ray-actor collector fleet."""


class RPCCollector(_Gated):
    """Reference distributed/rpc.py:107 — torch.rpc collector fleet."""

    _dep = "torch.distributed.rpc"


class DistributedSyncCollector(_Gated):
    """Reference distributed/generic.py — torch.distributed (gloo/nccl)
    process-group collector; superseded by the GSPMD DistributedCollector."""

    _dep = "torch.distributed process groups"
    _alt = "DistributedCollector (jax.sharding mesh)"


class RayLLMCollector(_Gated):
    """Reference collectors/llm/ray_collector.py — Ray-remote LLM collector;
    the local path is :class:`rl_tpu.collectors.AsyncBatchedCollector`
    (worker-thread conversations) or ``LLMCollector`` in a process fleet."""

    _alt = "AsyncBatchedCollector / LLMCollector"

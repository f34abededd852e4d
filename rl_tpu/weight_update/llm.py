"""LLM engine weight push — trained params into generation engines.

Counterpart of the reference's trainer→engine weight pushes
(``/root/reference/torchrl/collectors/llm/weight_update/vllm_nccl.py:46-97``
— there a NCCL broadcast group from the trainer rank into the vLLM worker
ranks; ``vllm_double_buffer.py`` — a double-buffered staging variant).

TPU-native split:

* **colocated engines** (the common case here — a jitted ``TransformerLM``
  sampler or a ``TransformersWrapper`` in the trainer process): the "push"
  is handing the new params to the engine; no bytes move.  Registered
  engines expose either ``update_weights(params)`` or a settable
  ``params`` attribute, or register a plain callable.
* **cross-process engines**: the payload rides the shared-memory seqlock
  box (one writer, many reader processes, writer never blocks) — the same
  no-pickle transport the SharedMem scheme uses; this is the NCCL
  broadcast's role with ICI/PCIe replaced by shm on one host.  The
  ``double_buffer`` staging of the reference is inherent to the seqlock
  (readers always see the last complete version).

Both directions stamp a monotonically increasing version so collectors
(``LLMCollector.policy_version``) can tag rollouts with the policy that
produced them.
"""
from __future__ import annotations

from typing import Any, Callable

import jax

from .schemes import SharedMemWeightSyncScheme, WeightStrategy

__all__ = ["LLMEngineWeightSync"]


class LLMEngineWeightSync:
    """Fan out new policy weights to registered engines + optional shm.

    Trainer side::

        sync = LLMEngineWeightSync.create("grpo", num_params=n)  # or ()
        sync.register_engine(my_wrapper)          # colocated
        ...
        sync.push_weights(params)                 # every learner step

    Engine-worker process::

        sync = LLMEngineWeightSync.attach("grpo")
        fresh = sync.pull(template=params)        # None if nothing new
    """

    def __init__(self, scheme: SharedMemWeightSyncScheme | None = None):
        self._scheme = scheme
        self._engines: list[Any] = []
        self._version = 0

    # -- construction -------------------------------------------------------
    @classmethod
    def create(cls, name: str, num_params: int | None = None,
               **kwargs) -> "LLMEngineWeightSync":
        """With ``num_params``, also opens a shm box for cross-process
        engines; without, colocated-only."""
        scheme = (SharedMemWeightSyncScheme.create(f"llm_{name}", num_params,
                                                   **kwargs)
                  if num_params else None)
        return cls(scheme)

    @classmethod
    def attach(cls, name: str, **kwargs) -> "LLMEngineWeightSync":
        return cls(SharedMemWeightSyncScheme.attach(f"llm_{name}", **kwargs))

    # -- trainer side -------------------------------------------------------
    def register_engine(self, engine: Any) -> None:
        self._engines.append(engine)

    def push_weights(self, params) -> int:
        """Hand params to every colocated engine and (if open) the shm box.
        Returns the new version number."""
        for engine in self._engines:
            if callable(engine) and not hasattr(engine, "update_weights"):
                engine(params)
            elif hasattr(engine, "update_weights"):
                engine.update_weights(params)
            elif hasattr(engine, "params"):
                engine.params = params
            else:
                raise TypeError(
                    f"engine {type(engine).__name__} exposes neither "
                    f"update_weights(params) nor a params attribute")
        if self._scheme is not None:
            self._scheme.push(params)
        self._version += 1
        return self._version

    @property
    def version(self) -> int:
        return self._version

    # -- engine-worker side -------------------------------------------------
    def pull(self, template=None, *, timeout: float = 0.0):
        if self._scheme is None:
            raise RuntimeError("no shm transport open (created without "
                               "num_params) — colocated engines get pushes "
                               "directly")
        return self._scheme.pull(template=template, timeout=timeout)

    def close(self) -> None:
        if self._scheme is not None:
            self._scheme.close()

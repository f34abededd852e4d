"""ReplayBufferEnsemble — sample across a family of buffers.

Counterpart of the reference ensemble composition
(``/root/reference/torchrl/data/replay_buffers/replay_buffers.py``:
``ReplayBufferEnsemble`` :3064, with ``StorageEnsemble`` storages.py:2266,
``SamplerEnsemble`` samplers.py:3992, ``WriterEnsemble`` writers.py:736).

Host-level composition: each sub-buffer keeps its own (possibly jitted)
functional core; the ensemble draws a ``buffer_id`` per sample call from the
mixture weights ``p`` and delegates.  Used for e.g. mixing offline datasets
with online experience at a fixed ratio (the reference's
offline_to_online.py:14 mixed buffer is the 2-member special case, exposed
here as :class:`OfflineToOnlineBuffer`).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from rl_tpu.data.tdict import TDict
from .buffers import ReplayBuffer

__all__ = ["ReplayBufferEnsemble", "OfflineToOnlineBuffer"]


class ReplayBufferEnsemble:
    """Mixture-of-buffers (reference replay_buffers.py:3064)."""

    def __init__(self, *buffers: ReplayBuffer, p=None, batch_size=None,
                 seed: int = 0):
        self.buffers = list(buffers)
        if p is None:
            p = [1.0 / len(self.buffers)] * len(self.buffers)
        self.p = jnp.asarray(p, jnp.float32) / jnp.sum(jnp.asarray(p, jnp.float32))
        self.batch_size = batch_size
        self._key = jax.random.PRNGKey(seed)

    def __getitem__(self, i) -> ReplayBuffer:
        return self.buffers[i]

    def __len__(self):
        return sum(len(b) for b in self.buffers)

    def extend(self, data: TDict, buffer_id: int = 0):
        return self.buffers[buffer_id].extend(data)

    def sample(self, batch_size: int | None = None, return_info: bool = False,
               buffer_id: int | None = None):
        bs = batch_size or self.batch_size
        if buffer_id is None:
            self._key, k = jax.random.split(self._key)
            buffer_id = int(jax.random.choice(k, len(self.buffers), p=self.p))
        batch, info = self.buffers[buffer_id].sample(bs, return_info=True)
        info = info.set("buffer_ids", jnp.full((bs,), buffer_id, jnp.int32))
        return (batch, info) if return_info else batch

    def update_priority(self, buffer_id: int, idx, priority):
        self.buffers[buffer_id].update_priority(idx, priority)


class OfflineToOnlineBuffer(ReplayBufferEnsemble):
    """Fixed-ratio offline/online mixture (reference
    offline_to_online.py:14): each sampled batch takes ``offline_fraction``
    of its rows from the offline dataset buffer and the rest from the online
    buffer — per-batch deterministic split rather than stochastic mixture,
    matching the reference's concatenated-batch behaviour."""

    def __init__(self, offline: ReplayBuffer, online: ReplayBuffer,
                 offline_fraction: float = 0.5, batch_size=None, seed: int = 0):
        super().__init__(offline, online, batch_size=batch_size, seed=seed)
        self.offline_fraction = float(offline_fraction)

    def sample(self, batch_size: int | None = None, return_info: bool = False,
               buffer_id: int | None = None):
        bs = batch_size or self.batch_size
        if buffer_id is not None:
            return super().sample(bs, return_info=return_info, buffer_id=buffer_id)
        n_off = int(round(bs * self.offline_fraction))
        n_on = bs - n_off
        parts, ids = [], []
        if n_off:
            parts.append(self.buffers[0].sample(n_off))
            ids.append(jnp.zeros((n_off,), jnp.int32))
        if n_on:
            parts.append(self.buffers[1].sample(n_on))
            ids.append(jnp.ones((n_on,), jnp.int32))
        batch = parts[0] if len(parts) == 1 else jax.tree.map(
            lambda *xs: jnp.concatenate(xs, axis=0), *parts
        )
        info = TDict(buffer_ids=jnp.concatenate(ids))
        return (batch, info) if return_info else batch

"""Distributed collection over a device mesh.

Counterpart of the reference distributed-collector family
(``/root/reference/torchrl/collectors/distributed/``: ``DistributedCollector``
generic.py:351, ``DistributedSyncCollector`` sync.py:136, ``RPCCollector``
rpc.py:107, ``RayCollector`` ray.py:81).  The reference shards collection
over PROCESSES wired with torch.distributed/rpc/ray; on TPU collection
shards over DEVICES: the env batch (and every carried state leaf) is laid
out over the mesh's ``dp`` axis, the jitted scan runs SPMD on all chips at
once, and the learner consumes the already-sharded batch — the "transport"
is XLA's partitioning, there are no pipes to manage.

Multi-host: the same code runs under ``jax.distributed.initialize`` — each
host owns its slice of the global env batch (the reference's per-node
collectors) and GSPMD moves data over ICI/DCN as the learner's shardings
demand.
"""
from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from rl_tpu.data import TDict
from rl_tpu.envs.base import Env
from rl_tpu.parallel import make_mesh, replicated, shard_batch
from .collector import Collector

__all__ = ["DistributedCollector"]


class DistributedCollector(Collector):
    """Collector whose env batch is sharded across a mesh axis.

    ``env`` must be a batched env whose leading batch dim is divisible by
    the mesh axis size.  Params are kept replicated (the reference's
    broadcast weight sync, weight_update/_distributed.py:36 — here a single
    ``device_put``).
    """

    def __init__(
        self,
        env: Env,
        policy,
        *,
        frames_per_batch: int,
        mesh: Mesh | None = None,
        axis: str = "dp",
        **kwargs,
    ):
        super().__init__(env, policy, frames_per_batch=frames_per_batch, **kwargs)
        self.mesh = mesh if mesh is not None else make_mesh()
        self.axis = axis
        n_dev = self.mesh.shape[axis]
        if self.num_envs % n_dev:
            raise ValueError(
                f"env batch ({self.num_envs}) must divide by mesh axis "
                f"'{axis}' size ({n_dev})"
            )

    # -- placement ----------------------------------------------------------
    def place_params(self, params):
        """Replicate learner params across the collection mesh (the weight
        'sync')."""
        return jax.device_put(params, replicated(self.mesh))

    def init(self, key) -> TDict:
        cstate = super().init(key)
        return TDict(
            env_state=shard_batch(cstate["env_state"], self.mesh, self.axis),
            root=shard_batch(cstate["root"], self.mesh, self.axis),
            key=jax.device_put(cstate["key"], replicated(self.mesh)),
            traj_ids=shard_batch(cstate["traj_ids"], self.mesh, self.axis),
            next_traj_id=jax.device_put(cstate["next_traj_id"], replicated(self.mesh)),
            frames=jax.device_put(cstate["frames"], replicated(self.mesh)),
        )

    def collect(self, params, cstate: TDict):
        cstate, batch = self._jit_collect(params, cstate)
        if self.postproc is not None:
            batch = self.postproc(batch)
        return cstate, batch

    def batch_sharding(self) -> NamedSharding:
        """The sharding of yielded batches: [T, B_global/n, ...] per device."""
        return NamedSharding(self.mesh, P(None, self.axis))

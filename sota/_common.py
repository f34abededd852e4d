"""Shared helpers for the sota-implementation scripts.

Counterpart of the per-algo ``utils_*.py`` files under
``/root/reference/sota-implementations/`` — model factories and the
in-process offline-dataset recipe (no dataset downloads in this image).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from rl_tpu.collectors import Collector
from rl_tpu.modules import (MLP, NormalParamExtractor, ProbabilisticActor,
                            Seq, TanhNormal, TDModule, ValueOperator)


def gaussian_actor(action_dim: int, *, low=-1.0, high=1.0,
                   num_cells=(256, 256), activation="relu"):
    net = Seq(
        TDModule(MLP(out_features=2 * action_dim, num_cells=num_cells,
                     activation=activation), ["observation"], ["pre"]),
        TDModule(NormalParamExtractor(), ["pre"], ["loc", "scale"]),
    )
    return ProbabilisticActor(net, TanhNormal,
                              dist_kwargs={"low": low, "high": high})


def q_module(num_cells=(256, 256), activation="relu"):
    return TDModule(MLP(out_features=1, num_cells=num_cells,
                        activation=activation),
                    ["observation", "action"], ["state_action_value"])


def value_module(num_cells=(256, 256), activation="relu"):
    return ValueOperator(MLP(out_features=1, num_cells=num_cells,
                             activation=activation))


def collect_dataset(env, frames: int, seed: int, policy=None):
    """Flat [N] offline dataset from a (default random) policy rollout."""
    if policy is None:
        def policy(p, td, k):
            return td.set("action", env.action_spec.rand(
                k, td["observation"].shape[:-1]))
    nb = env.batch_size[0] if env.batch_size else 1
    frames = max(nb, (frames // nb) * nb)
    coll = Collector(env, policy, frames_per_batch=frames)
    cstate = coll.init(jax.random.PRNGKey(seed))
    _, batch = coll._collect(None, cstate)
    return jax.tree.map(lambda x: x.reshape((-1,) + x.shape[2:]), batch)

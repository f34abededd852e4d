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


def pendulum_expert(td, *, max_torque=2.0):
    """Scripted energy-shaping swing-up + PD stabilizer for Pendulum.

    Used as the "expert" for the imitation scripts (BC/GAIL/DT/diffusion)
    where the reference loads a D4RL expert dataset (no dataset downloads
    in this image).  obs = [cos th, sin th, thdot], th = 0 upright.
    """
    obs = jnp.asarray(td["observation"])
    cos, sin, thdot = obs[..., 0], obs[..., 1], obs[..., 2]
    th = jnp.arctan2(sin, cos)
    energy = 0.5 * thdot**2 + 10.0 * cos          # top at rest: E = 10
    u_pump = 2.0 * thdot * (10.0 - energy)        # energy pumping
    u_pd = -8.0 * th - 2.0 * thdot                # near-top stabilizer
    u = jnp.where(cos > 0.95, u_pd, u_pump)
    return jnp.clip(u, -max_torque, max_torque)[..., None]


def expert_policy(env):
    def policy(p, td, k):
        return td.set("action", pendulum_expert(td))
    return policy


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


def collect_trajectories(env, steps: int, seed: int, policy=None,
                         gamma: float = 1.0):
    """[B, T] trajectory dataset with a ``return_to_go`` key (DT recipe —
    reference sota-implementations/decision_transformer/utils.py)."""
    if policy is None:
        def policy(p, td, k):
            return td.set("action", env.action_spec.rand(
                k, td["observation"].shape[:-1]))
    nb = env.batch_size[0] if env.batch_size else 1
    coll = Collector(env, policy, frames_per_batch=steps * nb)
    cstate = coll.init(jax.random.PRNGKey(seed))
    _, batch = coll._collect(None, cstate)          # [T, B, ...]
    batch = jax.tree.map(lambda x: jnp.swapaxes(x, 0, 1), batch)  # [B, T]
    rew = jnp.asarray(batch["next", "reward"])
    if rew.ndim == 3:
        rew = rew[..., 0]

    def rtg_scan(carry, r):
        carry = r + gamma * carry
        return carry, carry

    _, rtg = jax.lax.scan(rtg_scan, jnp.zeros(rew.shape[0]),
                          rew.T[::-1])
    rtg = rtg[::-1].T                                # [B, T]
    return batch.set("return_to_go", rtg[..., None])

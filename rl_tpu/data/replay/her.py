"""Hindsight experience replay.

Counterpart of ``/root/reference/torchrl/data/replay_buffers/her.py``:
``HindsightStrategy`` :32, ``HERReplayBuffer`` :49.

Relabeling is a pure batched transform over [T, B?] trajectory batches:
achieved goals from later steps replace desired goals and rewards are
recomputed — applied at extend time (the reference relabels on write too).
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from rl_tpu.data.tdict import TDict
from .buffers import ReplayBuffer

__all__ = ["her_relabel", "HERReplayBuffer"]


def her_relabel(
    batch: TDict,
    reward_fn: Callable[[jax.Array, jax.Array], jax.Array],
    key,
    *,
    strategy: str = "future",
    achieved_goal_key=("next", "achieved_goal"),
    desired_goal_key="desired_goal",
) -> TDict:
    """Relabel a time-first [T, ...] trajectory batch with hindsight goals.

    strategies (reference HindsightStrategy :32):
    * ``final``  — goal := achieved goal of the last step;
    * ``future`` — goal := achieved goal of a random later step;
    * ``episode``— goal := achieved goal of a random step of the episode.

    ``reward_fn(achieved, goal) -> reward`` recomputes rewards.
    """
    achieved = jnp.asarray(batch[achieved_goal_key])  # [T, ..., G]
    T = achieved.shape[0]
    t_idx = jnp.arange(T)
    if strategy == "final":
        pick = jnp.full((T,), T - 1)
    elif strategy == "future":
        u = jax.random.uniform(key, (T,))
        pick = (t_idx + (u * (T - t_idx)).astype(jnp.int32)).clip(0, T - 1)
    elif strategy == "episode":
        pick = jax.random.randint(key, (T,), 0, T)
    else:
        raise ValueError(f"unknown strategy {strategy}")
    new_goal = achieved[pick]  # [T, ..., G]
    new_reward = reward_fn(achieved, new_goal)
    out = batch.set(desired_goal_key, new_goal)
    out = out.set(("next", "reward"), jnp.asarray(new_reward, jnp.float32))
    if ("next", desired_goal_key) in out:
        out = out.set(("next", desired_goal_key), new_goal)
    return out


class HERReplayBuffer(ReplayBuffer):
    """ReplayBuffer that writes both the original and a hindsight-relabeled
    copy of every trajectory (reference her.py:49)."""

    def __init__(self, *, reward_fn, strategy: str = "future",
                 samples_per_traj: int = 1, seed: int = 0, **rb_kwargs):
        super().__init__(**rb_kwargs)
        self.reward_fn = reward_fn
        self.strategy = strategy
        self.samples_per_traj = int(samples_per_traj)
        self._her_key = jax.random.PRNGKey(seed)

    def extend_trajectory(self, traj: TDict):
        """``traj``: time-first [T, ...] single-trajectory TDict."""
        self.extend(traj)
        for _ in range(self.samples_per_traj):
            self._her_key, k = jax.random.split(self._her_key)
            relabeled = her_relabel(
                traj, self.reward_fn, k, strategy=self.strategy
            )
            self.extend(relabeled)

"""Offline dataset loading into replay buffers.

Counterpart of the reference offline-data layer
(``/root/reference/torchrl/data/datasets/``: ``BaseDatasetExperienceReplay``
common.py:21 and the D4RL/Minari/OpenX wrappers).  This image has no
network egress, so the loaders read LOCAL files in the standard interchange
formats (D4RL-style npz/hdf5 key layout) and fill a ReplayBuffer; the
download layers of the reference become a documented file contract.
"""
from __future__ import annotations

import os
from typing import Any

import jax.numpy as jnp
import numpy as np

from rl_tpu.data.tdict import TDict
from rl_tpu.data.replay import ReplayBuffer, SamplerWithoutReplacement, TensorStorage

__all__ = ["load_d4rl_npz", "OfflineDatasetBuffer"]

_D4RL_KEYS = ("observations", "actions", "rewards", "terminals", "timeouts",
              "next_observations")


def load_d4rl_npz(path: str) -> TDict:
    """Read a D4RL-format .npz/.npy dir into a transition TDict.

    Expected arrays: observations [N, obs], actions [N, act], rewards [N],
    terminals [N], optional timeouts [N], optional next_observations.
    Missing next_observations are reconstructed by shifting.
    """
    if os.path.isdir(path):
        data = {
            k: np.load(os.path.join(path, f"{k}.npy"))
            for k in _D4RL_KEYS
            if os.path.exists(os.path.join(path, f"{k}.npy"))
        }
    else:
        with np.load(path) as f:
            data = {k: f[k] for k in f.files}
    obs = np.asarray(data["observations"], np.float32)
    n = len(obs)
    actions = np.asarray(data["actions"], np.float32)
    rewards = np.asarray(data["rewards"], np.float32).reshape(n, 1)
    terminals = np.asarray(data["terminals"], bool).reshape(n, 1)
    timeouts = np.asarray(data.get("timeouts", np.zeros(n)), bool).reshape(n, 1)
    if "next_observations" in data:
        next_obs = np.asarray(data["next_observations"], np.float32)
    else:
        next_obs = np.concatenate([obs[1:], obs[-1:]], axis=0)
    done = terminals | timeouts
    return TDict(
        observation=jnp.asarray(obs),
        action=jnp.asarray(actions),
        next={
            "observation": jnp.asarray(next_obs),
            "reward": jnp.asarray(rewards),
            "terminated": jnp.asarray(terminals),
            "truncated": jnp.asarray(timeouts),
            "done": jnp.asarray(done),
        },
    )


class OfflineDatasetBuffer(ReplayBuffer):
    """ReplayBuffer preloaded from an offline dataset file (the reference's
    dataset experience-replay surface: sample() over a fixed dataset)."""

    def __init__(self, path: str, *, batch_size: int = 256,
                 without_replacement: bool = False):
        data = load_d4rl_npz(path)
        n = int(jnp.asarray(data["observation"]).shape[0])
        sampler = SamplerWithoutReplacement(n) if without_replacement else None
        super().__init__(storage=TensorStorage(n), sampler=sampler,
                         batch_size=batch_size)
        self.extend(data)
        self.num_transitions = n

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

__all__ = ["load_d4rl_npz", "load_hdf5", "OfflineDatasetBuffer",
           "BaseDatasetExperienceReplay", "D4RLExperienceReplay",
           "MinariExperienceReplay", "AtariDQNExperienceReplay",
           "OpenXExperienceReplay", "RobosetExperienceReplay",
           "VD4RLExperienceReplay", "GenDGRLExperienceReplay",
           "OpenMLExperienceReplay", "LeRobotExperienceReplay"]

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
    return _normalize_transitions(data)


def _normalize_transitions(data: dict) -> TDict:
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


def load_hdf5(path: str) -> TDict:
    """Read a D4RL/Minari-style HDF5 file into a transition TDict
    (reference d4rl.py `_load_from_file`; h5py is available here)."""
    import h5py

    with h5py.File(path, "r") as f:
        data = {}
        for k in _D4RL_KEYS:
            if k in f:
                data[k] = np.asarray(f[k])
            elif f"data/{k}" in f:
                data[k] = np.asarray(f[f"data/{k}"])
    return _normalize_transitions(data)


class BaseDatasetExperienceReplay(OfflineDatasetBuffer):
    """Named-dataset surface (reference datasets/common.py:21).

    The reference downloads from each dataset's hub on first use; this
    image has zero egress, so every wrapper documents a LOCAL file
    contract instead: pass ``root`` pointing at a D4RL-format ``.npz`` /
    ``.hdf5`` file (or directory of ``.npy`` arrays) holding the named
    dataset, obtained out-of-band.  ``download=True`` raises with that
    explanation rather than silently failing mid-run.
    """

    #: subclasses set: hub name used in error messages
    hub = "dataset hub"

    def __init__(self, dataset_id: str, *, root: str | None = None,
                 download: bool = False, batch_size: int = 256, **kw):
        if download:
            raise RuntimeError(
                f"{type(self).__name__}: this environment has no network "
                f"egress; fetch {dataset_id!r} from the {self.hub} "
                f"elsewhere and pass root=<path to npz/hdf5/npy-dir>")
        if root is None:
            raise ValueError(
                f"{type(self).__name__} needs root=<local path> for "
                f"{dataset_id!r} (no downloads in this image)")
        path = root
        if os.path.isdir(root):
            for cand in (f"{dataset_id}.npz", f"{dataset_id}.hdf5",
                         dataset_id):
                p = os.path.join(root, cand)
                if os.path.exists(p):
                    path = p
                    break
        self.dataset_id = dataset_id
        if str(path).endswith((".hdf5", ".h5")):
            data = load_hdf5(path)
            n = int(jnp.asarray(data["observation"]).shape[0])
            ReplayBuffer.__init__(self, storage=TensorStorage(n),
                                  batch_size=batch_size)
            self.extend(data)
            self.num_transitions = n
        else:
            super().__init__(path, batch_size=batch_size, **kw)


class D4RLExperienceReplay(BaseDatasetExperienceReplay):
    """Reference d4rl.py:30 — D4RL mujoco/antmaze/adroit datasets."""

    hub = "D4RL bucket"


class MinariExperienceReplay(BaseDatasetExperienceReplay):
    """Reference minari_data.py:75 — Minari (Farama) datasets."""

    hub = "Minari registry"


class AtariDQNExperienceReplay(BaseDatasetExperienceReplay):
    """Reference atari_dqn.py:36 — the DQN Replay (Atari checkpoints)."""

    hub = "atari-replay-datasets GCS bucket"


class OpenXExperienceReplay(BaseDatasetExperienceReplay):
    """Reference openx.py:36 — Open X-Embodiment robot episodes."""

    hub = "Open X-Embodiment bucket"


class RobosetExperienceReplay(BaseDatasetExperienceReplay):
    """Reference roboset.py:39 — RoboSet manipulation datasets."""

    hub = "RoboSet hub"


class VD4RLExperienceReplay(BaseDatasetExperienceReplay):
    """Reference vd4rl.py:38 — pixel-based V-D4RL datasets."""

    hub = "V-D4RL hub"


class GenDGRLExperienceReplay(BaseDatasetExperienceReplay):
    """Reference gen_dgrl.py:29 — procgen generalization datasets."""

    hub = "GenDGRL release"


class OpenMLExperienceReplay(BaseDatasetExperienceReplay):
    """Reference openml.py:23 — OpenML tabular tasks (bandits)."""

    hub = "OpenML"


class LeRobotExperienceReplay(BaseDatasetExperienceReplay):
    """Reference lerobot.py:321 — LeRobot episode datasets."""

    hub = "HuggingFace LeRobot"

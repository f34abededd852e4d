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

__all__ = ["load_d4rl_npz", "load_hdf5", "load_minari_hdf5",
           "load_atari_dqn_shard", "OfflineDatasetBuffer",
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
    done = terminals | timeouts
    if "next_observations" in data:
        next_obs = np.asarray(data["next_observations"], np.float32)
    else:
        # per-EPISODE shift (reference d4rl.py `_shift` semantics): the
        # naive global shift would leak the next episode's first frame
        # into the last transition of the previous episode
        next_obs = np.concatenate([obs[1:], obs[-1:]], axis=0)
        ends = done.reshape(-1)
        next_obs[ends] = obs[ends]  # terminal next-obs: hold (bootstrap is
        # gated on `terminated` anyway; never the NEXT episode's reset)
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
    """Read a D4RL-format HDF5 file into a transition TDict (reference
    d4rl.py `_load_from_file`): top-level or ``data/``-nested
    observations/actions/rewards/terminals[/timeouts/next_observations],
    plus ``infos/*`` passthrough keys."""
    import h5py

    with h5py.File(path, "r") as f:
        data = {}
        infos = {}
        for k in _D4RL_KEYS:
            if k in f:
                data[k] = np.asarray(f[k])
            elif f"data/{k}" in f:
                data[k] = np.asarray(f[f"data/{k}"])
        if "infos" in f:
            for k in f["infos"]:
                infos[k] = np.asarray(f["infos"][k])
    out = _normalize_transitions(data)
    for k, v in infos.items():
        out = out.set(("info", k), jnp.asarray(v))
    return out


def load_minari_hdf5(path: str) -> TDict:
    """Decode the Minari episode-group HDF5 layout (reference
    minari_data.py:75): groups ``episode_<i>`` each holding
    ``observations [T+1]``, ``actions [T]``, ``rewards [T]``,
    ``terminations [T]``, ``truncations [T]`` — the T+1 observation row
    gives the true per-step next observation with no reconstruction."""
    import h5py

    obs_l, nobs_l, act_l, rew_l, term_l, trunc_l = [], [], [], [], [], []
    with h5py.File(path, "r") as f:
        names = sorted((n for n in f if n.startswith("episode_")),
                       key=lambda n: int(n.split("_")[1]))
        for name in names:
            g = f[name]
            obs = np.asarray(g["observations"], np.float32)
            act = np.asarray(g["actions"], np.float32)
            T = len(act)
            if len(obs) != T + 1:
                raise ValueError(
                    f"{name}: observations must have T+1={T + 1} rows, "
                    f"got {len(obs)} (Minari layout)")
            obs_l.append(obs[:-1])
            nobs_l.append(obs[1:])
            act_l.append(act)
            rew_l.append(np.asarray(g["rewards"], np.float32))
            term_l.append(np.asarray(g["terminations"], bool))
            trunc_l.append(np.asarray(g["truncations"], bool))
    term = np.concatenate(term_l).reshape(-1, 1)
    trunc = np.concatenate(trunc_l).reshape(-1, 1)
    return TDict(
        observation=jnp.asarray(np.concatenate(obs_l)),
        action=jnp.asarray(np.concatenate(act_l)),
        next={
            "observation": jnp.asarray(np.concatenate(nobs_l)),
            "reward": jnp.asarray(np.concatenate(rew_l).reshape(-1, 1)),
            "terminated": jnp.asarray(term),
            "truncated": jnp.asarray(trunc),
            "done": jnp.asarray(term | trunc),
        },
    )


_ATARI_FIELDS = ("observation", "action", "reward", "terminal")


def load_atari_dqn_shard(directory: str, ckpt: int) -> TDict:
    """Decode one DQN-Replay checkpoint shard (reference atari_dqn.py
    ``_AtariStorage`` :742): gzipped ``np.save`` arrays named
    ``$store$_<field>_ckpt.<N>.gz`` holding uint8 frames [N, 84, 84],
    int actions, float rewards and terminal flags.  Next-observation is
    the following frame within the shard, held at terminals."""
    import gzip

    arrs = {}
    for field in _ATARI_FIELDS:
        p = os.path.join(directory, f"$store$_{field}_ckpt.{ckpt}.gz")
        if not os.path.exists(p):
            raise FileNotFoundError(
                f"DQN-Replay shard field missing: {p} (expected the "
                f"atari-replay-datasets layout)")
        with gzip.open(p, "rb") as f:
            arrs[field] = np.load(f, allow_pickle=False)
    obs = arrs["observation"]
    n = len(obs) - 1  # last frame has no successor inside the shard
    term = arrs["terminal"][:n].astype(bool).reshape(-1, 1)
    next_obs = obs[1:n + 1].copy()
    next_obs[term.reshape(-1)] = obs[:n][term.reshape(-1)]
    return TDict(
        observation=jnp.asarray(obs[:n]),
        action=jnp.asarray(arrs["action"][:n].astype(np.int32)),
        next={
            "observation": jnp.asarray(next_obs),
            "reward": jnp.asarray(
                arrs["reward"][:n].astype(np.float32).reshape(-1, 1)),
            "terminated": jnp.asarray(term),
            "truncated": jnp.asarray(np.zeros_like(term)),
            "done": jnp.asarray(term),
        },
    )


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
        data = self._decode(str(path))
        n = int(jnp.asarray(data["observation"]).shape[0])
        ReplayBuffer.__init__(self, storage=TensorStorage(n),
                              batch_size=batch_size)
        self.extend(data)
        self.num_transitions = n

    @classmethod
    def _decode(cls, path: str) -> TDict:
        """Format decoder — subclasses override for their native layout."""
        if path.endswith((".hdf5", ".h5")):
            return load_hdf5(path)
        return load_d4rl_npz(path)


class D4RLExperienceReplay(BaseDatasetExperienceReplay):
    """Reference d4rl.py:30 — D4RL mujoco/antmaze/adroit datasets."""

    hub = "D4RL bucket"


class MinariExperienceReplay(BaseDatasetExperienceReplay):
    """Reference minari_data.py:75 — Minari (Farama) datasets, decoded
    from the episode-group HDF5 layout (``episode_<i>/observations`` with
    T+1 rows, terminations/truncations per step)."""

    hub = "Minari registry"

    @classmethod
    def _decode(cls, path: str) -> TDict:
        if path.endswith((".hdf5", ".h5")):
            return load_minari_hdf5(path)
        return load_d4rl_npz(path)


class AtariDQNExperienceReplay(BaseDatasetExperienceReplay):
    """Reference atari_dqn.py:36 — the DQN Replay (Atari checkpoints),
    decoded from the gzipped ``$store$_<field>_ckpt.<N>.gz`` shard layout.
    Pass ``root=<shard dir>`` and ``dataset_id="<game>/<ckpt>"`` (ckpt
    defaults to 0)."""

    hub = "atari-replay-datasets GCS bucket"

    def __init__(self, dataset_id: str, *, root: str | None = None,
                 download: bool = False, batch_size: int = 256, **kw):
        self._ckpt = 0
        if "/" in dataset_id and dataset_id.rsplit("/", 1)[-1].isdigit():
            dataset_id, ck = dataset_id.rsplit("/", 1)
            self._ckpt = int(ck)
        super().__init__(dataset_id, root=root, download=download,
                         batch_size=batch_size, **kw)

    def _decode(self, path: str) -> TDict:
        directory = path if os.path.isdir(path) else os.path.dirname(path)
        return load_atari_dqn_shard(directory, self._ckpt)


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

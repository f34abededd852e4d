"""Pipelined host-env collection — overlap device policy compute with host
env stepping.

VERDICT r2 item #3 / SURVEY §7.3: the MuJoCo BASELINE configs live on the
host↔device bridge, and the plain ``GymEnv`` io_callback scan serializes
[host step] → [device policy] → [host step] …  This collector double
-buffers instead: the env fleet is split into two groups, and while group
A's actions are being computed on the device, group B's envs are stepping
on the host (MuJoCo releases the GIL), hiding one side's latency behind
the other — the same overlap the reference gets from async
ParallelEnv+pinned-memory pipelines (reference
benchmarks/ecosystem/gym_env_throughput.py measures exactly this path).

Yields time-major ``[T, B]`` TDict batches with the standard step contract
(``("next", ...)``, ``("collector","traj_ids")``), so the output feeds
replay buffers / trainers exactly like :class:`Collector` output.
"""
from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from rl_tpu.data import TDict

__all__ = ["PipelinedHostCollector"]


class PipelinedHostCollector:
    """Double-buffered collection over two host env groups.

    Args:
        make_env: ``() -> gymnasium.Env`` factory.
        num_envs: total fleet size (split into two groups).
        policy: ``(params, td, key) -> td`` writing ``"action"`` — the same
            signature :class:`Collector` takes; it runs on the device via
            one jitted call per group per step.
        frames_per_batch: frames per :meth:`collect` call.
    """

    def __init__(self, make_env: Callable, num_envs: int, policy,
                 *, frames_per_batch: int, num_threads: int | None = None):
        from rl_tpu.envs.libs.gym import HostEnvPool

        if num_envs % 2:
            raise ValueError("num_envs must be even (two pipeline groups)")
        if frames_per_batch % num_envs:
            raise ValueError("frames_per_batch must divide by num_envs")
        self.num_envs = num_envs
        self.frames_per_batch = int(frames_per_batch)
        self.steps_per_batch = frames_per_batch // num_envs
        half = num_envs // 2
        self.pools = [
            HostEnvPool([make_env for _ in range(half)],
                        num_threads=num_threads),
            HostEnvPool([make_env for _ in range(half)],
                        num_threads=num_threads),
        ]
        self.policy = policy
        self._jit_policy = jax.jit(self._policy_impl)
        self._exec = ThreadPoolExecutor(max_workers=2)
        self._obs = [None, None]          # current root obs per group
        self._traj = [None, None]         # per-env traj ids
        self._next_traj = num_envs
        self._primed = False

    def _policy_impl(self, params, obs, key):
        td = self.policy(params, TDict(observation=obs), key)
        return td["action"]

    # -- lifecycle ----------------------------------------------------------
    def init(self, key) -> None:
        half = self.num_envs // 2
        seeds = np.asarray(jax.random.randint(key, (self.num_envs,), 0,
                                              2 ** 31 - 1))
        for g in (0, 1):
            self._obs[g] = self.pools[g].reset(seeds[g * half:(g + 1) * half])
            self._traj[g] = np.arange(g * half, (g + 1) * half, dtype=np.int64)
        self._primed = True

    def collect(self, params, key) -> TDict:
        """One [T, B] batch; device compute of group g overlaps host
        stepping of group 1-g."""
        if not self._primed:
            self.init(key)
        T, half = self.steps_per_batch, self.num_envs // 2
        keys = jax.random.split(key, 2 * T + 2)
        rows: list[list[dict]] = [[], []]  # per-group step records
        seeds = np.random.RandomState(
            int(np.asarray(jax.random.randint(keys[-1], (), 0, 2 ** 31 - 1))))

        # software pipeline: compute A's action, then at every tick submit
        # one group's host step while computing the OTHER group's action
        futures = [None, None]
        actions = [None, None]
        obs_before = [None, None]
        ki = 0

        def compute(g):
            a = self._jit_policy(params, jnp.asarray(self._obs[g]), keys[ki])
            return np.asarray(a)

        def submit(g):
            obs_before[g] = self._obs[g]
            futures[g] = self._exec.submit(
                self.pools[g].step_and_reset, actions[g],
                seeds.randint(0, 2 ** 31 - 1, size=half))

        def land(g, t):
            obs, root_obs, reward, term, trunc = futures[g].result()
            done = (term | trunc).reshape(-1)
            rows[g].append(dict(
                observation=obs_before[g], action=actions[g], next_obs=obs,
                reward=reward, terminated=term, truncated=trunc,
                traj=self._traj[g].copy()))
            # renumber finished trajectories
            n_done = int(done.sum())
            if n_done:
                self._traj[g] = self._traj[g].copy()
                self._traj[g][done] = self._next_traj + np.arange(n_done)
                self._next_traj += n_done
            self._obs[g] = root_obs
            futures[g] = None

        actions[0] = compute(0)
        ki += 1
        for t in range(T):
            submit(0)                 # host steps group 0 ...
            if t > 0:
                land(1, t - 1)        # (must land BEFORE computing group 1:
                #  computing from the pre-landing obs would act on stale
                #  state — the classic pipeline-skew bug, caught by the
                #  action-matches-stored-obs test)
            actions[1] = compute(1)   # ... while device computes group 1
            ki += 1
            submit(1)                 # host steps group 1 ...
            land(0, t)
            if t < T - 1:
                actions[0] = compute(0)   # ... while device computes group 0
                ki += 1
        land(1, T - 1)

        return self._assemble(rows)

    def _assemble(self, rows) -> TDict:
        T, half = self.steps_per_batch, self.num_envs // 2

        def cat(field):
            a = np.stack([r[field] for r in rows[0]])  # [T, half, ...]
            b = np.stack([r[field] for r in rows[1]])
            return jnp.asarray(np.concatenate([a, b], axis=1))

        term = cat("terminated")
        trunc = cat("truncated")
        return TDict(
            observation=cat("observation"),
            action=cat("action"),
            collector=TDict(traj_ids=cat("traj")),
            next=TDict(
                observation=cat("next_obs"),
                reward=cat("reward"),
                terminated=term, truncated=trunc, done=term | trunc,
            ),
        )

    def close(self):
        for p in self.pools:
            p.close()
        self._exec.shutdown()

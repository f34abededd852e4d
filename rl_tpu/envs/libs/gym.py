"""Gymnasium bridge — host envs feeding the device pipeline.

Counterpart of the reference ``GymLikeEnv``/``GymEnv``
(``/root/reference/torchrl/envs/gym_like.py``, ``libs/gym.py``) and of
``ParallelEnv``'s process workers (batched_envs.py:1805): host (non-jittable)
envs run in a pool (serial or thread-parallel — MuJoCo steps release the
GIL) and are bridged into jitted programs with ``jax.experimental.io_callback``,
so the collector's fused scan still works; the callback is the analogue of
the reference's pipe+shared-memory hop (§3.3), with autoreset handled
host-side so the device sees the exact TorchRL step/reset contract.
"""
from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from rl_tpu.data import Composite, TDict
from ..base import Env
from .spaces import gym_space_to_spec

__all__ = ["GymEnv", "GoalGymEnv", "HostEnvPool"]


class HostEnvPool:
    """N host gym envs with immediate (same-call) autoreset.

    ``step_and_reset(actions)`` returns the pre-reset final observation plus
    the post-reset root observation — matching ``Env.step_and_maybe_reset``.
    """

    def __init__(self, env_fns: Sequence[Callable[[], Any]], num_threads: int | None = None):
        self.envs = [fn() for fn in env_fns]
        self.num_envs = len(self.envs)
        self._pool = (
            ThreadPoolExecutor(max_workers=num_threads or min(self.num_envs, 16))
            if self.num_envs > 1
            else None
        )

    def _map(self, fn, *args_lists):
        if self._pool is None:
            return [fn(*(a[0] for a in args_lists))]
        return list(self._pool.map(fn, *args_lists))

    def reset(self, seeds: np.ndarray):
        def one(env, seed):
            obs, info = env.reset(seed=int(seed))
            return obs

        obs = self._map(one, self.envs, list(seeds))
        return np.stack(obs).astype(np.float32)

    def step_and_reset(self, actions: np.ndarray, seeds: np.ndarray):
        def one(env, action, seed):
            obs, reward, terminated, truncated, info = env.step(action)
            if terminated or truncated:
                root_obs, _ = env.reset(seed=int(seed))
            else:
                root_obs = obs
            return obs, root_obs, reward, terminated, truncated

        out = self._map(one, self.envs, list(actions), list(seeds))
        obs, root_obs, reward, term, trunc = zip(*out)
        return (
            np.stack(obs).astype(np.float32),
            np.stack(root_obs).astype(np.float32),
            np.asarray(reward, np.float32).reshape(self.num_envs, 1),
            np.asarray(term, bool).reshape(self.num_envs, 1),
            np.asarray(trunc, bool).reshape(self.num_envs, 1),
        )

    def close(self):
        for e in self.envs:
            e.close()
        if self._pool:
            self._pool.shutdown()


class GymEnv(Env):
    """Batched gymnasium env bridged via io_callback.

    The env state on device is just an ordering token — real state lives in
    the host pool.  Works inside jit/scan (ordered callbacks); not vmappable
    (batching is the pool's job).
    """

    host_autoreset = True

    def __init__(self, env_name: str, num_envs: int = 1,
                 num_threads: int | None = None, **make_kwargs):
        import gymnasium

        self.env_name = env_name
        self.num_envs = int(num_envs)
        self.batch_size = (self.num_envs,)
        self._pool = HostEnvPool(
            [lambda: gymnasium.make(env_name, **make_kwargs) for _ in range(num_envs)],
            num_threads=num_threads,
        )
        proto = self._pool.envs[0]
        self._obs_spec = gym_space_to_spec(proto.observation_space)
        self._act_spec = gym_space_to_spec(proto.action_space)
        self._obs_shape = tuple(self._obs_spec.shape)
        self._act_is_discrete = not hasattr(proto.action_space, "low")

    # -- specs --------------------------------------------------------------
    @property
    def observation_spec(self) -> Composite:
        return Composite(observation=self._obs_spec)

    def _action_spec(self):
        return self._act_spec

    # -- host callbacks -----------------------------------------------------
    def _host_reset(self, seed):
        return self._pool.reset(np.asarray(seed))

    def _host_step(self, action, seed):
        return self._pool.step_and_reset(np.asarray(action), np.asarray(seed))

    def _seeds(self, key):
        return jax.random.randint(key, (self.num_envs,), 0, 2**31 - 1)

    # -- Env API ------------------------------------------------------------
    def reset(self, key):
        obs_shape = jax.ShapeDtypeStruct((self.num_envs,) + self._obs_shape, jnp.float32)
        obs = jax.experimental.io_callback(
            self._host_reset, obs_shape, self._seeds(key), ordered=True
        )
        state = TDict(token=jnp.zeros((self.num_envs, 1), jnp.int32))
        return state, TDict(observation=obs).update(self._false_dones())

    def step(self, state, td, key):
        raise NotImplementedError(
            "GymEnv only exposes step_and_maybe_reset (host autoreset); use "
            "rollout/collector, or a native env for raw step semantics"
        )

    def step_and_maybe_reset(self, state, td, key):
        n = self.num_envs
        shapes = (
            jax.ShapeDtypeStruct((n,) + self._obs_shape, jnp.float32),
            jax.ShapeDtypeStruct((n,) + self._obs_shape, jnp.float32),
            jax.ShapeDtypeStruct((n, 1), jnp.float32),
            jax.ShapeDtypeStruct((n, 1), jnp.bool_),
            jax.ShapeDtypeStruct((n, 1), jnp.bool_),
        )
        action = td["action"]
        obs, root_obs, reward, term, trunc = jax.experimental.io_callback(
            self._host_step, shapes, action, self._seeds(key), ordered=True
        )
        done = term | trunc
        next_td = TDict(
            observation=obs, reward=reward,
            terminated=term, truncated=trunc, done=done,
        )
        root = TDict(
            observation=root_obs, done=jnp.zeros_like(done),
            terminated=jnp.zeros_like(term), truncated=jnp.zeros_like(trunc),
        )
        new_state = state.set("token", state["token"] + 1)
        return new_state, td.set("next", next_td), root

    def rollout(self, max_steps, policy=None, *, key, state=None, td=None,
                auto_reset=True, break_when_any_done=False):
        # identical to Env.rollout but via step_and_maybe_reset only
        if policy is None:
            policy = self.rand_action_policy()
        if state is None or td is None:
            key, k0 = jax.random.split(key)
            state, td = self.reset(k0)

        def body(carry, k):
            state, td = carry
            k_pol, k_env = jax.random.split(k)
            td = policy(td, k_pol)
            state, full_td, root = self.step_and_maybe_reset(state, td, k_env)
            return (state, root), full_td

        ks = jax.random.split(key, max_steps)
        (state, last_root), ys = jax.lax.scan(body, (state, td), ks)
        return state, ys, last_root

    def close(self):
        self._pool.close()

    def __repr__(self):
        return f"GymEnv({self.env_name!r}, num_envs={self.num_envs})"


class _GoalHostPool(HostEnvPool):
    """Pool variant for goal-conditioned dict observations
    (observation/achieved_goal/desired_goal — gymnasium-robotics)."""

    KEYS = ("observation", "achieved_goal", "desired_goal")

    def _stack(self, dicts):
        return tuple(
            np.stack([np.asarray(d[k], np.float32) for d in dicts])
            for k in self.KEYS
        )

    def reset(self, seeds: np.ndarray):
        def one(env, seed):
            obs, info = env.reset(seed=int(seed))
            return obs

        return self._stack(self._map(one, self.envs, list(seeds)))

    def step_and_reset(self, actions: np.ndarray, seeds: np.ndarray):
        def one(env, action, seed):
            obs, reward, terminated, truncated, info = env.step(action)
            if terminated or truncated:
                root_obs, _ = env.reset(seed=int(seed))
            else:
                root_obs = obs
            return obs, root_obs, reward, terminated, truncated

        out = self._map(one, self.envs, list(actions), list(seeds))
        obs, root_obs, reward, term, trunc = zip(*out)
        return (
            *self._stack(obs), *self._stack(root_obs),
            np.asarray(reward, np.float32).reshape(self.num_envs, 1),
            np.asarray(term, bool).reshape(self.num_envs, 1),
            np.asarray(trunc, bool).reshape(self.num_envs, 1),
        )


class GoalGymEnv(Env):
    """Goal-conditioned gymnasium envs (dict observations) via io_callback —
    the reference's gym wrapper handles these through TensorDict nesting
    (gym_like.py `read_obs`); pairs with :class:`rl_tpu.data.replay.her.
    HERReplayBuffer` for Hindsight Experience Replay on Fetch/Hand tasks.
    """

    host_autoreset = True

    KEYS = _GoalHostPool.KEYS

    def __init__(self, env_name: str, num_envs: int = 1,
                 num_threads: int | None = None, **make_kwargs):
        import gymnasium

        try:  # register robotics envs when the package is present
            import gymnasium_robotics

            gymnasium.register_envs(gymnasium_robotics)
        except ImportError:
            pass
        self.env_name = env_name
        self.num_envs = int(num_envs)
        self.batch_size = (self.num_envs,)
        self._pool = _GoalHostPool(
            [lambda: gymnasium.make(env_name, **make_kwargs)
             for _ in range(num_envs)],
            num_threads=num_threads,
        )
        proto = self._pool.envs[0]
        space = proto.observation_space
        self._shapes = {k: tuple(space[k].shape) for k in self.KEYS}
        self._act_spec = gym_space_to_spec(proto.action_space)

    @property
    def observation_spec(self) -> Composite:
        from rl_tpu.data import Unbounded

        return Composite(**{
            k: Unbounded(self._shapes[k], jnp.float32) for k in self.KEYS
        })

    def _action_spec(self):
        return self._act_spec

    def _seeds(self, key):
        return jax.random.randint(key, (self.num_envs,), 0, 2**31 - 1)

    def _obs_structs(self):
        return tuple(
            jax.ShapeDtypeStruct((self.num_envs,) + self._shapes[k], jnp.float32)
            for k in self.KEYS
        )

    def reset(self, key):
        out = jax.experimental.io_callback(
            lambda s: self._pool.reset(np.asarray(s)),
            self._obs_structs(), self._seeds(key), ordered=True)
        state = TDict(token=jnp.zeros((self.num_envs, 1), jnp.int32))
        td = TDict(**dict(zip(self.KEYS, out)))
        return state, td.update(self._false_dones())

    def step(self, state, td, key):
        raise NotImplementedError("GoalGymEnv: use step_and_maybe_reset")

    def step_and_maybe_reset(self, state, td, key):
        n = self.num_envs
        shapes = (*self._obs_structs(), *self._obs_structs(),
                  jax.ShapeDtypeStruct((n, 1), jnp.float32),
                  jax.ShapeDtypeStruct((n, 1), jnp.bool_),
                  jax.ShapeDtypeStruct((n, 1), jnp.bool_))
        out = jax.experimental.io_callback(
            lambda a, s: self._pool.step_and_reset(np.asarray(a),
                                                   np.asarray(s)),
            shapes, td["action"], self._seeds(key), ordered=True)
        obs = dict(zip(self.KEYS, out[:3]))
        root_obs = dict(zip(self.KEYS, out[3:6]))
        reward, term, trunc = out[6:]
        done = term | trunc
        next_td = TDict(**obs, reward=reward, terminated=term,
                        truncated=trunc, done=done)
        root = TDict(**root_obs, done=jnp.zeros_like(done),
                     terminated=jnp.zeros_like(term),
                     truncated=jnp.zeros_like(trunc))
        return (state.set("token", state["token"] + 1),
                td.set("next", next_td), root)

    def rollout(self, max_steps, policy=None, *, key, state=None, td=None,
                auto_reset=True, break_when_any_done=False):
        if policy is None:
            policy = self.rand_action_policy()
        if state is None or td is None:
            key, k0 = jax.random.split(key)
            state, td = self.reset(k0)

        def body(carry, k):
            state, td = carry
            k_pol, k_env = jax.random.split(k)
            td = policy(td, k_pol)
            state, full_td, root = self.step_and_maybe_reset(state, td, k_env)
            return (state, root), full_td

        ks = jax.random.split(key, max_steps)
        (state, last_root), ys = jax.lax.scan(body, (state, td), ks)
        return state, ys, last_root

    def close(self):
        self._pool.close()

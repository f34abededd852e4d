"""PettingZoo bridge — multi-agent host envs feeding the device pipeline.

Counterpart of the reference ``PettingZooWrapper``/``PettingZooEnv``
(``/root/reference/torchrl/envs/libs/pettingzoo.py``): Parallel-API
PettingZoo environments run in a host pool and bridge into jitted programs
via ``io_callback`` (same design as :class:`rl_tpu.envs.libs.GymEnv`), with
the framework's ``("agents", ...)`` grouping contract
(:class:`rl_tpu.envs.MultiAgentNavEnv`): per-agent observations/actions
under ``("agents", ...)``, a shared team reward (sum of agent rewards) at
the root, and per-agent rewards under ``("agents", "reward")``.

Only homogeneous agent groups are supported (every agent shares one
observation/action space) — the reference's heterogeneous lazy-stack path
needs ragged containers that XLA's static shapes make a poor fit (use
``rl_tpu.data.stacked_specs`` padding manually for that case).
"""
from __future__ import annotations

from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from rl_tpu.data import Bounded, Categorical, Composite, TDict, Unbounded
from ..base import Env

__all__ = ["PettingZooWrapper", "PettingZooEnv"]


class _PZPool:
    """N parallel-API PettingZoo envs with immediate host-side autoreset."""

    def __init__(self, env_fns: Sequence[Callable[[], Any]]):
        self.envs = [fn() for fn in env_fns]
        self.num_envs = len(self.envs)
        probe = self.envs[0]
        probe.reset(seed=0)
        self.agents = list(probe.agents)
        self.n_agents = len(self.agents)
        spaces_o = [probe.observation_space(a) for a in self.agents]
        spaces_a = [probe.action_space(a) for a in self.agents]
        if any(s != spaces_o[0] for s in spaces_o) or any(
                s != spaces_a[0] for s in spaces_a):
            raise ValueError(
                "PettingZooWrapper supports homogeneous agent groups only "
                "(identical obs/action spaces across agents)")
        self.obs_space = spaces_o[0]
        self.act_space = spaces_a[0]

    def _stack_obs(self, obs_dict: dict) -> np.ndarray:
        rows = []
        for a in self.agents:
            o = obs_dict[a]
            if isinstance(o, dict):  # classic envs: {observation, action_mask}
                o = o["observation"]
            rows.append(np.asarray(o, np.float32))
        return np.stack(rows)

    def reset(self, seeds: np.ndarray) -> np.ndarray:
        out = []
        for env, seed in zip(self.envs, seeds):
            obs, _ = env.reset(seed=int(seed))
            out.append(self._stack_obs(obs))
        return np.stack(out)  # [E, A, ...]

    def step_and_reset(self, actions: np.ndarray, seeds: np.ndarray):
        obs_l, root_l, rew_l, term_l, trunc_l = [], [], [], [], []
        aterm_l, atrunc_l = [], []
        for env, act_row, seed in zip(self.envs, actions, seeds):
            acts = {a: act_row[i].item() if act_row[i].ndim == 0
                    else np.asarray(act_row[i])
                    for i, a in enumerate(self.agents)}
            obs, rew, term, trunc, _ = env.step(acts)
            rew_row = np.asarray([rew.get(a, 0.0) for a in self.agents],
                                 np.float32)
            # per-agent flags: an agent missing from the step dicts died on
            # an earlier step (PettingZoo drops finished agents) ->
            # terminated.  The reference keeps these under ('agents','done').
            aterm = np.asarray([bool(term[a]) if a in term else True
                                for a in self.agents])
            atrunc = np.asarray([bool(trunc[a]) if a in trunc else False
                                 for a in self.agents])
            done = bool(np.all(aterm | atrunc)) or not env.agents
            terminated = bool(np.all(aterm))
            if done:
                final = (self._stack_obs(obs) if obs
                         else np.zeros_like(root_l[-1]) if root_l else None)
                robs, _ = env.reset(seed=int(seed))
                root = self._stack_obs(robs)
                if final is None:
                    final = root
            else:
                final = self._stack_obs(obs)
                root = final
            obs_l.append(final)
            root_l.append(root)
            rew_l.append(rew_row)
            term_l.append(terminated)
            trunc_l.append(done and not terminated)
            aterm_l.append(aterm)
            atrunc_l.append(atrunc)
        E = self.num_envs
        return (np.stack(obs_l), np.stack(root_l),
                np.stack(rew_l)[..., None],
                np.asarray(term_l, bool).reshape(E, 1),
                np.asarray(trunc_l, bool).reshape(E, 1),
                np.stack(aterm_l)[..., None],
                np.stack(atrunc_l)[..., None])

    def close(self):
        for e in self.envs:
            e.close()


class PettingZooWrapper(Env):
    """Batched parallel-API PettingZoo envs bridged via io_callback."""

    host_autoreset = True

    def __init__(self, env_fn: Callable[[], Any], num_envs: int = 1):
        self._pool = _PZPool([env_fn for _ in range(num_envs)])
        self.num_envs = int(num_envs)
        self.batch_size = (self.num_envs,)
        self.n_agents = self._pool.n_agents
        o = self._pool.obs_space
        a = self._pool.act_space
        if isinstance(getattr(o, "shape", None), tuple) and o.shape:
            self._obs_shape = tuple(o.shape)
        else:  # classic dict space: use the inner observation
            self._obs_shape = tuple(o["observation"].shape)
        self._discrete = hasattr(a, "n")
        self._act_shape = () if self._discrete else tuple(a.shape)
        self._n_actions = int(getattr(a, "n", 0))
        self._act_low = None if self._discrete else np.asarray(a.low)
        self._act_high = None if self._discrete else np.asarray(a.high)

    # -- specs --------------------------------------------------------------
    @property
    def observation_spec(self) -> Composite:
        return Composite(agents=Composite(
            observation=Unbounded((self.n_agents,) + self._obs_shape,
                                  jnp.float32),
            reward=Unbounded((self.n_agents, 1), jnp.float32),
            terminated=Unbounded((self.n_agents, 1), jnp.bool_),
            truncated=Unbounded((self.n_agents, 1), jnp.bool_),
            done=Unbounded((self.n_agents, 1), jnp.bool_),
        ))

    @property
    def full_action_spec(self) -> Composite:
        if self._discrete:
            leaf = Categorical(self._n_actions, (self.n_agents,), jnp.int32)
        else:
            leaf = Bounded(float(self._act_low.min()),
                           float(self._act_high.max()),
                           (self.n_agents,) + self._act_shape, jnp.float32)
        return Composite(agents=Composite(action=leaf))

    def _action_spec(self):
        return self.full_action_spec["agents", "action"]

    # -- host callbacks -----------------------------------------------------
    def _seeds(self, key):
        return jax.random.randint(key, (self.num_envs,), 0, 2**31 - 1)

    def reset(self, key):
        E, A = self.num_envs, self.n_agents
        obs = jax.experimental.io_callback(
            lambda s: self._pool.reset(np.asarray(s)),
            jax.ShapeDtypeStruct((E, A) + self._obs_shape, jnp.float32),
            self._seeds(key), ordered=True)
        zero_r = jnp.zeros((E, A, 1), jnp.float32)
        zero_d = jnp.zeros((E, A, 1), jnp.bool_)
        state = TDict(token=jnp.zeros((E, 1), jnp.int32))
        td = TDict(agents=TDict(observation=obs, reward=zero_r,
                                terminated=zero_d, truncated=zero_d,
                                done=zero_d))
        return state, td.update(self._false_dones())

    def step(self, state, td, key):
        raise NotImplementedError(
            "PettingZooWrapper exposes step_and_maybe_reset (host autoreset)")

    def step_and_maybe_reset(self, state, td, key):
        E, A = self.num_envs, self.n_agents
        act_dtype = jnp.int32 if self._discrete else jnp.float32
        shapes = (
            jax.ShapeDtypeStruct((E, A) + self._obs_shape, jnp.float32),
            jax.ShapeDtypeStruct((E, A) + self._obs_shape, jnp.float32),
            jax.ShapeDtypeStruct((E, A, 1), jnp.float32),
            jax.ShapeDtypeStruct((E, 1), jnp.bool_),
            jax.ShapeDtypeStruct((E, 1), jnp.bool_),
            jax.ShapeDtypeStruct((E, A, 1), jnp.bool_),
            jax.ShapeDtypeStruct((E, A, 1), jnp.bool_),
        )
        action = jnp.asarray(td["agents", "action"], act_dtype)
        (obs, root_obs, rew, term, trunc, aterm,
         atrunc) = jax.experimental.io_callback(
            lambda a, s: self._pool.step_and_reset(np.asarray(a),
                                                   np.asarray(s)),
            shapes, action, self._seeds(key), ordered=True)
        done = term | trunc
        adone = aterm | atrunc
        next_td = TDict(
            agents=TDict(observation=obs, reward=rew,
                         terminated=aterm, truncated=atrunc, done=adone),
            reward=rew.sum(1),  # shared team reward at the root
            terminated=term, truncated=trunc, done=done,
        )
        root = TDict(
            agents=TDict(observation=root_obs, reward=jnp.zeros_like(rew),
                         terminated=jnp.zeros_like(aterm),
                         truncated=jnp.zeros_like(atrunc),
                         done=jnp.zeros_like(adone)),
            done=jnp.zeros_like(done), terminated=jnp.zeros_like(term),
            truncated=jnp.zeros_like(trunc),
        )
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

    def rand_action_policy(self):
        spec = self._action_spec()

        def policy(td, k):
            return td.set(("agents", "action"),
                          spec.rand(k, (self.num_envs,)))

        return policy

    def close(self):
        self._pool.close()


def PettingZooEnv(task: str, num_envs: int = 1, *, parallel: bool = True,
                  **kwargs) -> PettingZooWrapper:
    """Build from a task path like ``"sisl/pursuit_v4"`` (reference
    ``PettingZooEnv`` constructor surface)."""
    import importlib

    family, name = task.split("/")
    mod = importlib.import_module(f"pettingzoo.{family}.{name}")
    if not parallel:
        raise NotImplementedError(
            "AEC (turn-based) mode: wrap the parallel_env conversion or use "
            "the native turn-based envs (TicTacToeEnv)")
    return PettingZooWrapper(lambda: mod.parallel_env(**kwargs), num_envs)

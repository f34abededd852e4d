"""Native multi-agent cooperative-navigation env (VMAS "simple spread"
pattern — the reference's multiagent sota scripts run on VMAS/PettingZoo
(``/root/reference/sota-implementations/multiagent/``); those simulators are
not in this image, so this pure-JAX env provides the same contract:
``("agents", ...)`` keys with an agent axis, shared team reward).

N agents move on a 2D plane toward N landmarks; reward is the negative sum
of each landmark's distance to its closest agent (cooperative coverage),
minus a collision penalty.  Discrete 5-way actions (stay/up/down/left/right)
by default, or continuous 2-D velocity with ``continuous_actions=True``.
Fully jittable: state is a TDict of positions; episodes truncate at
``max_steps``.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from rl_tpu.data import Bounded, Categorical, Composite, TDict, Unbounded
from ..base import Env

__all__ = ["MultiAgentNavEnv"]

_MOVES = jnp.array([[0.0, 0.0], [0.0, 1.0], [0.0, -1.0],
                    [-1.0, 0.0], [1.0, 0.0]])


class MultiAgentNavEnv(Env):
    """Cooperative navigation with ``("agents", ...)`` keys.

    Per-agent observation: own position, landmark offsets, other-agent
    offsets — shape ``[n_agents, 2 + 2*n_landmarks + 2*(n_agents-1)]``.
    Team reward (shared, root key): coverage − collision penalty.
    """

    def __init__(self, n_agents: int = 3, *, continuous_actions: bool = False,
                 max_steps: int = 50, arena: float = 1.0, dt: float = 0.1,
                 collision_radius: float = 0.1,
                 collision_penalty: float = 0.5):
        self.n_agents = int(n_agents)
        self.continuous_actions = bool(continuous_actions)
        self.max_steps = int(max_steps)
        self.arena = float(arena)
        self.dt = float(dt)
        self.collision_radius = float(collision_radius)
        self.collision_penalty = float(collision_penalty)

    # -- specs --------------------------------------------------------------
    @property
    def _obs_dim(self) -> int:
        return 2 + 2 * self.n_agents + 2 * (self.n_agents - 1)

    @property
    def observation_spec(self) -> Composite:
        return Composite(agents=Composite(
            observation=Unbounded((self.n_agents, self._obs_dim),
                                  jnp.float32)))

    @property
    def full_action_spec(self) -> Composite:
        if self.continuous_actions:
            leaf = Bounded(-1.0, 1.0, (self.n_agents, 2), jnp.float32)
        else:
            leaf = Categorical(5, (self.n_agents,), jnp.int32)
        return Composite(agents=Composite(action=leaf))

    def _action_spec(self):
        return self.full_action_spec["agents", "action"]

    # -- dynamics -----------------------------------------------------------
    def _obs(self, pos, landmarks):
        # per-agent: own pos, all landmark offsets, other-agent offsets
        n = self.n_agents
        lm_off = landmarks[None, :, :] - pos[:, None, :]     # [n, n, 2]
        ag_off = pos[None, :, :] - pos[:, None, :]           # [n, n, 2]
        import numpy as _np  # concrete mask: shape is static under jit

        others = ag_off[~_np.eye(n, dtype=bool)].reshape(n, n - 1, 2)
        obs = jnp.concatenate(
            [pos, lm_off.reshape(n, -1), others.reshape(n, -1)], -1)
        return TDict(agents=TDict(observation=obs))

    def _reward(self, pos, landmarks):
        d = jnp.linalg.norm(landmarks[:, None, :] - pos[None, :, :], axis=-1)
        coverage = -d.min(axis=1).sum()
        ag_d = jnp.linalg.norm(pos[:, None, :] - pos[None, :, :], axis=-1)
        coll = (ag_d < self.collision_radius) & ~jnp.eye(self.n_agents,
                                                         dtype=bool)
        penalty = self.collision_penalty * coll.sum() / 2.0
        return (coverage - penalty).reshape(1)

    def _reset(self, key):
        k1, k2 = jax.random.split(key)
        pos = jax.random.uniform(k1, (self.n_agents, 2), minval=-self.arena,
                                 maxval=self.arena)
        landmarks = jax.random.uniform(k2, (self.n_agents, 2),
                                       minval=-self.arena, maxval=self.arena)
        state = TDict(pos=pos, landmarks=landmarks,
                      t=jnp.zeros((), jnp.int32))
        return state, self._obs(pos, landmarks)

    def _step(self, state, td, key):
        action = td["agents", "action"]
        if self.continuous_actions:
            vel = jnp.clip(jnp.asarray(action, jnp.float32), -1.0, 1.0)
        else:
            vel = _MOVES[jnp.asarray(action, jnp.int32)]
        pos = jnp.clip(state["pos"] + self.dt * vel, -self.arena, self.arena)
        t = state["t"] + 1
        landmarks = state["landmarks"]
        new_state = TDict(pos=pos, landmarks=landmarks, t=t)
        step_td = self._obs(pos, landmarks).update(TDict(
            reward=self._reward(pos, landmarks),
            terminated=jnp.zeros((1,), jnp.bool_),
            truncated=(t >= self.max_steps).reshape(1),
        ))
        return new_state, step_td

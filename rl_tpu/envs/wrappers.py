"""Env-control wrappers that intercept stepping itself.

The reference implements frame-skip and noop-reset as transforms with parent
-env access (``FrameSkipTransform`` transforms/_env.py:74, ``NoopResetEnv``
:111).  In the functional design they are env combinators: they own the
inner step loop (``lax.scan``), which keeps the whole thing one fused XLA
program.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from rl_tpu.data import Composite, TDict
from .base import Env

__all__ = ["FrameSkipEnv", "NoopResetEnv"]


class _DelegateEnv(Env):
    def __init__(self, env: Env):
        self.env = env
        self.batch_size = env.batch_size

    @property
    def observation_spec(self):
        return self.env.observation_spec

    @property
    def full_action_spec(self):
        return self.env.full_action_spec

    @property
    def reward_spec(self):
        return self.env.reward_spec

    @property
    def full_reward_spec(self):
        return self.env.full_reward_spec

    @property
    def full_done_spec(self):
        return self.env.full_done_spec

    @property
    def state_spec(self):
        return self.env.state_spec

    def _reset(self, key):
        return self.env._reset(key)

    def _step(self, state, td, key):
        return self.env._step(state, td, key)


class FrameSkipEnv(_DelegateEnv):
    """Repeat each action ``frame_skip`` times, summing rewards; stops
    accumulating state updates once done (reference FrameSkipTransform
    semantics, transforms/_env.py:74)."""

    def __init__(self, env: Env, frame_skip: int):
        super().__init__(env)
        self.frame_skip = int(frame_skip)

    def step(self, state, td, key):
        def body(carry, k):
            state, acc_reward, done_any, last_next = carry
            new_state, td2 = self.env.step(state, td, k)
            next_td = td2["next"]
            # freeze once done: keep previous state/next output
            from .base import _where_done

            new_state = _where_done(done_any, state, new_state)
            next_td = _where_done(done_any, last_next, next_td)
            reward = jnp.where(
                done_any, jnp.zeros_like(next_td["reward"]), next_td["reward"]
            )
            acc_reward = acc_reward + reward
            done_any = done_any | next_td["done"]
            return (new_state, acc_reward, done_any, next_td), None

        ks = jax.random.split(key, self.frame_skip)
        zero_r = jnp.zeros(
            self.batch_size + (1,), jnp.float32
        )
        done0 = jnp.zeros(self.batch_size + (1,), jnp.bool_)
        # seed last_next with a first step to get the right structure
        (state, acc, done, next_td), _ = jax.lax.scan(
            body, (state, zero_r, done0, self._seed_next(state, td, ks[0])), ks
        )
        next_td = next_td.set("reward", acc)
        return state, td.set("next", next_td)

    def _seed_next(self, state, td, key):
        _, td2 = self.env.step(state, td, key)
        return td2["next"].apply(jnp.zeros_like)


class NoopResetEnv(_DelegateEnv):
    """On reset, take up to ``noop_max`` random no-op steps
    (reference transforms/_env.py:111). ``noop_action`` defaults to the
    zero action."""

    def __init__(self, env: Env, noop_max: int = 30, noop_action=None):
        super().__init__(env)
        self.noop_max = int(noop_max)
        self.noop_action = noop_action

    def reset(self, key):
        k_reset, k_n, k_steps = jax.random.split(key, 3)
        state, td = self.env.reset(k_reset)
        n = jax.random.randint(k_n, (), 0, self.noop_max + 1)
        action = (
            self.noop_action
            if self.noop_action is not None
            else self.env.full_action_spec.zero(self.batch_size)["action"]
        )

        def body(carry, xs):
            i, k = xs
            state, td = carry
            td_a = td.set("action", action)
            new_state, full, root = self.env.step_and_maybe_reset(state, td_a, k)
            from .base import _where_done

            take = jnp.broadcast_to(i < n, (1,)) if not self.batch_size else jnp.broadcast_to(i < n, self.batch_size + (1,))
            state = _where_done(take, new_state, state)
            td = _where_done(take, root, td)
            return (state, td), None

        ks = jax.random.split(k_steps, self.noop_max)
        idx = jnp.arange(self.noop_max)
        (state, td), _ = jax.lax.scan(body, (state, td), (idx, ks))
        return state, td

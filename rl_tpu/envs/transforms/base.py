"""Transform system: composable pure wrappers over envs.

TPU-native re-design of the reference transform stack
(``/root/reference/torchrl/envs/transforms/_base.py``: ``Transform`` :178,
``TransformedEnv`` :940, ``Compose`` :1642).  Differences forced by the
functional design:

* transform state (frame buffers, counters, running stats) lives in the env
  state pytree, threaded explicitly — the reference's buffers-on-nn.Module
  become ``tstate`` pytrees;
* auto-reset state handling is per-transform: ``on_done`` merges the
  freshly-reset and stepped transform states under the done mask (default:
  select reset), so e.g. VecNorm keeps its running stats across episode
  boundaries while StepCounter zeroes;
* the root td keeps the *policy-space* action after ``step`` (the reference
  keeps the ``inv``-transformed action in the td; storing policy-space
  actions is what losses need, so we deviate and document it).

Hooks mirror the reference: ``transform_observation_spec`` /
``transform_reward_spec`` / ``transform_done_spec`` /
``transform_action_spec``; ``step`` ≙ ``_call``, ``inv`` ≙ ``_inv_call``.
"""
from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp

from rl_tpu.data import Composite, TDict, TensorSpec
from ..base import Env, _where_done, step_mdp

__all__ = ["Transform", "Compose", "TransformedEnv"]

PyTree = Any


class Transform:
    """Base transform. Stateless by default (``init`` returns empty TDict)."""

    #: True for transforms carrying *per-env-row* state (frame buffers,
    #: step counters, episode accumulators).  Host-autoreset envs (GymEnv &
    #: co) apply ``reset()`` to every row each step, which corrupts such
    #: state — TransformedEnv.step_and_maybe_reset raises when one is
    #: composed over a host_autoreset env (ADVICE r3 #2).
    row_stateful = False

    def __init__(
        self,
        in_keys: Sequence | None = None,
        out_keys: Sequence | None = None,
        in_keys_inv: Sequence | None = None,
        out_keys_inv: Sequence | None = None,
    ):
        self.in_keys = list(in_keys or [])
        self.out_keys = list(out_keys or self.in_keys)
        self.in_keys_inv = list(in_keys_inv or [])
        self.out_keys_inv = list(out_keys_inv or self.in_keys_inv)

    # -- state lifecycle ----------------------------------------------------
    def reset(self, key, tstate: PyTree | None, td: TDict) -> tuple[PyTree, TDict]:
        """Called on reset output. ``tstate`` is None on cold start, else the
        pre-reset state (persistent transforms carry it through)."""
        return TDict(), self._apply(td)

    def step(self, tstate: PyTree, next_td: TDict) -> tuple[PyTree, TDict]:
        """Forward map on the step result (reference ``_call``)."""
        return tstate, self._apply(next_td)

    def inv(self, tstate: PyTree, td: TDict) -> TDict:
        """Inverse map on env input (reference ``_inv_call``)."""
        return self._apply_inv(td)

    def on_done(self, tstate_reset: PyTree, tstate_stepped: PyTree, done) -> PyTree:
        """Merge transform state at auto-reset boundaries."""
        return _where_done(done, tstate_reset, tstate_stepped)

    # -- default keyed application -----------------------------------------
    def _apply(self, td: TDict) -> TDict:
        for kin, kout in zip(self.in_keys, self.out_keys):
            if kin in td:
                td = td.set(kout, self._apply_value(td[kin]))
        return td

    def _apply_inv(self, td: TDict) -> TDict:
        for kin, kout in zip(self.in_keys_inv, self.out_keys_inv):
            if kin in td:
                td = td.set(kout, self._apply_value_inv(td[kin]))
        return td

    def _apply_value(self, value):
        return value

    def _apply_value_inv(self, value):
        return value

    # -- spec hooks ---------------------------------------------------------
    def transform_observation_spec(self, spec: Composite) -> Composite:
        return spec

    def transform_reward_spec(self, spec: Composite) -> Composite:
        return spec

    def transform_done_spec(self, spec: Composite) -> Composite:
        return spec

    def transform_action_spec(self, spec: Composite) -> Composite:
        return spec

    def transform_state_spec(self, spec: Composite) -> Composite:
        return spec

    def __repr__(self):
        return f"{type(self).__name__}()"


class Compose(Transform):
    """Chain of transforms (reference _base.py:1642). State is a TDict keyed
    by position."""

    def __init__(self, *transforms: Transform):
        super().__init__()
        self.transforms = list(transforms)

    @property
    def row_stateful(self):
        return any(t.row_stateful for t in self.transforms)

    def reset(self, key, tstate, td):
        keys = jax.random.split(key, max(len(self.transforms), 1))
        states = TDict()
        for i, (t, k) in enumerate(zip(self.transforms, keys)):
            sub = tstate.get(str(i), None) if tstate is not None else None
            ts, td = t.reset(k, sub, td)
            states = states.set(str(i), ts)
        return states, td

    def step(self, tstate, next_td):
        states = TDict()
        for i, t in enumerate(self.transforms):
            ts, next_td = t.step(tstate[str(i)], next_td)
            states = states.set(str(i), ts)
        return states, next_td

    def inv(self, tstate, td):
        for i, t in reversed(list(enumerate(self.transforms))):
            td = t.inv(tstate[str(i)], td)
        return td

    def on_done(self, tstate_reset, tstate_stepped, done):
        out = TDict()
        for i, t in enumerate(self.transforms):
            out = out.set(
                str(i), t.on_done(tstate_reset[str(i)], tstate_stepped[str(i)], done)
            )
        return out

    def transform_observation_spec(self, spec):
        for t in self.transforms:
            spec = t.transform_observation_spec(spec)
        return spec

    def transform_reward_spec(self, spec):
        for t in self.transforms:
            spec = t.transform_reward_spec(spec)
        return spec

    def transform_done_spec(self, spec):
        for t in self.transforms:
            spec = t.transform_done_spec(spec)
        return spec

    def transform_action_spec(self, spec):
        for t in reversed(self.transforms):
            spec = t.transform_action_spec(spec)
        return spec

    def append(self, t: Transform) -> "Compose":
        return Compose(*self.transforms, t)

    def insert(self, index: int, t: Transform) -> "Compose":
        ts = list(self.transforms)
        ts.insert(index, t)
        return Compose(*ts)

    def __getitem__(self, i):
        return self.transforms[i]

    def __len__(self):
        return len(self.transforms)

    def __repr__(self):
        inner = ", ".join(repr(t) for t in self.transforms)
        return f"Compose({inner})"


class TransformedEnv(Env):
    """Env wrapped by a transform stack (reference _base.py:940).

    State layout: ``TDict(env=<inner state>, t=<transform state>)``.
    """

    def __init__(self, env: Env, transform: Transform | Sequence[Transform] | None = None):
        self.env = env
        if transform is None:
            transform = Compose()
        elif isinstance(transform, (list, tuple)):
            transform = Compose(*transform)
        elif not isinstance(transform, Compose):
            transform = Compose(transform)
        self.transform = transform
        self.batch_size = env.batch_size

    def append_transform(self, t: Transform) -> "TransformedEnv":
        return TransformedEnv(self.env, self.transform.append(t))

    def insert_transform(self, index: int, t: Transform) -> "TransformedEnv":
        return TransformedEnv(self.env, self.transform.insert(index, t))

    @property
    def base_env(self) -> Env:
        return self.env

    # -- specs --------------------------------------------------------------
    @property
    def observation_spec(self) -> Composite:
        return self.transform.transform_observation_spec(self.env.observation_spec.clone())

    @property
    def full_action_spec(self) -> Composite:
        return self.transform.transform_action_spec(self.env.full_action_spec.clone())

    @property
    def reward_spec(self) -> TensorSpec:
        spec = self.full_reward_spec
        return spec["reward"]

    @property
    def full_reward_spec(self) -> Composite:
        return self.transform.transform_reward_spec(self.env.full_reward_spec.clone())

    @property
    def full_done_spec(self) -> Composite:
        return self.transform.transform_done_spec(self.env.full_done_spec.clone())

    @property
    def state_spec(self) -> Composite:
        return self.transform.transform_state_spec(self.env.state_spec.clone())

    # -- dynamics -----------------------------------------------------------
    def reset(self, key, prev_state: PyTree | None = None):
        k_env, k_t = jax.random.split(key)
        env_state, td = self.env.reset(k_env)
        prev_t = prev_state["t"] if prev_state is not None else None
        tstate, td = self.transform.reset(k_t, prev_t, td)
        return TDict(env=env_state, t=tstate), td

    def step(self, state, td, key):
        td_in = self.transform.inv(state["t"], td)
        env_state, td2 = self.env.step(state["env"], td_in, key)
        tstate, next_td = self.transform.step(state["t"], td2["next"])
        # keep the policy-space root (original td), transformed next
        return TDict(env=env_state, t=tstate), td.set("next", next_td)

    def step_and_maybe_reset(self, state, td, key):
        if getattr(self.env, "host_autoreset", False):
            # host-bridge envs (GymEnv & co) reset on the host inside the
            # same callback and only expose step_and_maybe_reset; apply the
            # transform's step() to the pre-reset next (stats update) and
            # its reset() to the post-reset root (normalize WITHOUT a
            # second stats update — VecNorm.reset keeps carried stats).
            # Row-stateful transforms (CatFrames primers) need the native
            # path; stat/stateless transforms are exact here.
            bad = [
                type(t).__name__
                for t in getattr(self.transform, "transforms", [self.transform])
                if t.row_stateful
            ]
            if bad:
                raise ValueError(
                    f"Transforms with per-row state ({', '.join(bad)}) cannot "
                    "be composed over a host-autoreset env: the host bridge "
                    "resets rows inside its callback, so the transform's "
                    "reset() would be applied to every row each step. Use an "
                    "on-device env, or move the transform host-side (e.g. "
                    "gymnasium wrappers)."
                )
            k_step, k_reset = jax.random.split(key)
            td_in = self.transform.inv(state["t"], td)
            env_state, full_td, root = self.env.step_and_maybe_reset(
                state["env"], td_in, k_step)
            tstate, next_td = self.transform.step(state["t"], full_td["next"])
            tstate, root_td = self.transform.reset(k_reset, tstate, root)
            return (TDict(env=env_state, t=tstate),
                    td.set("next", next_td), root_td)
        k_step, k_reset = jax.random.split(key)
        new_state, full_td = self.step(state, td, k_step)
        done = full_td["next", "done"]
        reset_state, reset_td = self.reset(k_reset, prev_state=new_state)
        merged_env = _where_done(done, reset_state["env"], new_state["env"])
        merged_t = self.transform.on_done(reset_state["t"], new_state["t"], done)
        root = step_mdp(full_td)
        root = _where_done(done, reset_td, root)
        return TDict(env=merged_env, t=merged_t), full_td, root

    def __repr__(self):
        return f"TransformedEnv({self.env!r}, {self.transform!r})"

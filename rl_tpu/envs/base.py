"""Functional environment core.

TPU-native re-design of the reference ``EnvBase``
(``/root/reference/torchrl/envs/common.py:2340`` step, ``:3108`` reset,
``:3449`` rollout, ``:4090`` step_and_maybe_reset, ``:3869`` step_mdp).

Design: an ``Env`` instance holds only *static* configuration (hashable,
jit-constant).  All mutable state is an explicit pytree threaded through
``reset``/``step``.  The reference's stateful nn.Module + in-place TensorDict
mutation collapses to::

    state, td0           = env.reset(key)
    state, td            = env.step(state, td_with_action, key)   # writes ("next", ...)
    state, td, td_root   = env.step_and_maybe_reset(state, td, key)

Auto-reset (the reference's ``_reset`` partial-reset masks, common.py:2360)
becomes a ``where``-select between the stepped state and a freshly reset
state — no host sync, fully inside ``jit``/``lax.scan``.

Key conventions (identical to TorchRL so algorithms translate key-for-key):
step results live under ``("next", ...)``; ``done = terminated | truncated``;
reset tds carry done flags (False) but no reward.
"""
from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp

from rl_tpu.data import Composite, TDict, TensorSpec, Unbounded

__all__ = ["Env", "step_mdp", "check_env_specs", "EnvMetaData"]

PyTree = Any


def _where_done(done: jax.Array, if_done: PyTree, if_not: PyTree) -> PyTree:
    """Per-element select of two same-structure pytrees on a done mask.

    ``done`` has shape ``[*B, 1]`` (or ``[*B]``); leaves have shape
    ``[*B, ...]``.  The mask is broadcast against trailing dims per leaf.
    This implements the reference's partial-reset ``"_reset"`` mask semantics
    (batched_envs partial reset; common.py:3104) as a pure select.
    """
    d = jnp.asarray(done)
    if d.ndim and d.shape[-1] == 1:
        d = d.squeeze(-1)

    def sel(a, b):
        a = jnp.asarray(a)
        extra = a.ndim - d.ndim
        mask = d.reshape(d.shape + (1,) * extra) if extra > 0 else d
        return jnp.where(mask, a, b)

    return jax.tree.map(sel, if_done, if_not)


class Env:
    """Base class for pure-functional environments.

    Subclasses implement ``_reset``/``_step`` and the spec properties
    (mirroring reference ``_step`` common.py:3097 / ``_reset`` :3104):

    * ``_reset(key) -> (state, obs_td)`` — obs_td holds observation keys only.
    * ``_step(state, td, key) -> (state, step_td)`` — step_td holds
      observation keys + ``reward`` + ``terminated`` (+ optionally
      ``truncated``).

    The public ``reset``/``step`` add done-flag bookkeeping and the
    ``("next", ...)`` layout.
    """

    # Mirrors reference EnvBase.batch_locked (common.py): True for envs with
    # an intrinsic batch dim (e.g. vectorized wrappers).
    batch_size: tuple[int, ...] = ()

    # -- specs (reference: composite spec properties, common.py) -----------
    @property
    def observation_spec(self) -> Composite:
        raise NotImplementedError

    @property
    def action_spec(self) -> TensorSpec:
        """The single-leaf action spec (reference ``action_spec`` sugar)."""
        spec = self.full_action_spec
        keys = list(spec.keys(include_nested=True, leaves_only=True))
        if len(keys) != 1:
            raise RuntimeError("Env has multiple action keys; use full_action_spec")
        return spec[keys[0]]

    @property
    def full_action_spec(self) -> Composite:
        return Composite(action=self._action_spec())

    def _action_spec(self) -> TensorSpec:
        raise NotImplementedError

    @property
    def reward_spec(self) -> TensorSpec:
        return Unbounded((1,), jnp.float32)

    @property
    def full_reward_spec(self) -> Composite:
        return Composite(reward=self.reward_spec)

    @property
    def full_done_spec(self) -> Composite:
        flag = Unbounded((1,), jnp.bool_)
        return Composite(done=flag, terminated=flag, truncated=flag)

    @property
    def state_spec(self) -> Composite:
        """Spec of extra input (root) keys beyond actions, if any."""
        return Composite()

    # -- subclass interface -------------------------------------------------
    def _reset(self, key: jax.Array) -> tuple[PyTree, TDict]:
        raise NotImplementedError

    def _step(self, state: PyTree, td: TDict, key: jax.Array) -> tuple[PyTree, TDict]:
        raise NotImplementedError

    # -- public API ---------------------------------------------------------
    def reset(self, key: jax.Array) -> tuple[PyTree, TDict]:
        """Reset; returns ``(state, td0)`` with obs + False done flags."""
        state, obs = self._reset(key)
        td0 = obs.update(self._false_dones())
        return state, td0

    def step(self, state: PyTree, td: TDict, key: jax.Array) -> tuple[PyTree, TDict]:
        """Step; returns ``(state, td)`` with results under ``("next", ...)``.

        Reference: ``EnvBase.step`` common.py:2340 — results are written
        under the ``next`` subtree and root is left untouched.
        """
        state, step_td = self._step(state, td, key)
        step_td = self._complete_dones(step_td)
        # merge, don't replace: policies may pre-write carried keys under
        # ("next", ...) (e.g. recurrent states — reference rnn.py:650 writes
        # updated state under next so step_mdp promotes it)
        prev_next = td.get("next", None)
        if prev_next is not None:
            step_td = prev_next.update(step_td)
        return state, td.set("next", step_td)

    def step_and_maybe_reset(
        self, state: PyTree, td: TDict, key: jax.Array
    ) -> tuple[PyTree, TDict, TDict]:
        """Step, then auto-reset the entries that finished.

        Returns ``(new_state, td_with_next, td_root_for_next_step)``.
        Reference: common.py:4090.  On TPU the conditional reset is a
        ``where``-select of states — every step executes both the step and
        (lazily, as part of the same program) a reset; XLA dead-code
        eliminates nothing here, but resets are cheap relative to policy
        dispatch and this keeps the whole rollout one fused program.
        """
        k_step, k_reset = jax.random.split(key)
        state, td = self.step(state, td, k_step)
        next_td = td["next"]
        done = next_td["done"]
        reset_state, reset_td = self.reset(k_reset)
        new_state = _where_done(done, reset_state, state)
        root = step_mdp(td)
        root = _where_done(done, reset_td, root)
        return new_state, td, root

    def rollout(
        self,
        max_steps: int,
        policy: Callable[[TDict, jax.Array], TDict] | None = None,
        *,
        key: jax.Array,
        state: PyTree | None = None,
        td: TDict | None = None,
        auto_reset: bool = True,
        break_when_any_done: bool = False,
    ) -> tuple[PyTree, TDict, TDict]:
        """Unrolled env interaction via ``lax.scan``.

        Returns ``(state, stacked_td[T, ...], final_root_td)`` where the
        stacked TDict has the reference rollout layout (common.py:3449):
        root keys at time t plus the ``("next", ...)`` subtree.

        ``break_when_any_done`` can't early-exit a scan; instead, once any
        element is done the remaining steps freeze (mask) — callers use the
        done flags to truncate, matching fixed-shape XLA semantics.
        """
        if policy is None:
            policy = self.rand_action_policy()
        if state is None or td is None:
            key, k0 = jax.random.split(key)
            state, td = self.reset(k0)

        frozen = jnp.zeros_like(jnp.asarray(td["done"]))

        def body(carry, k):
            state, td, frozen = carry
            k_pol, k_env = jax.random.split(k)
            td = policy(td, k_pol)
            new_state, full_td, root = self.step_and_maybe_reset(state, td, k_env)
            if break_when_any_done:
                new_state = _where_done(frozen, state, new_state)
                prev_root = td.select(*root.keys(include_nested=True, leaves_only=True))
                root = _where_done(frozen, prev_root, root)
                new_frozen = frozen | full_td["next", "done"]
            else:
                new_frozen = frozen
            return (new_state, root, new_frozen), full_td

        ks = jax.random.split(key, max_steps)
        (state, last_root, _), ys = jax.lax.scan(body, (state, td, frozen), ks)
        return state, ys, last_root

    # -- helpers ------------------------------------------------------------
    def rand_action_policy(self) -> Callable[[TDict, jax.Array], TDict]:
        """A policy sampling uniformly from the action spec.

        Reference: ``RandomPolicy`` (modules/tensordict_module/
        exploration.py:771) / ``EnvBase.rand_action``.
        """
        spec = self.full_action_spec
        batch = self.batch_size

        def policy(td: TDict, key: jax.Array) -> TDict:
            return td.update(spec.rand(key, batch))

        return policy

    def rand_action(self, td: TDict, key: jax.Array) -> TDict:
        return self.rand_action_policy()(td, key)

    def _false_dones(self) -> TDict:
        flags = self.full_done_spec.zero(self.batch_size)
        return flags

    def _complete_dones(self, step_td: TDict) -> TDict:
        term = step_td.get("terminated", None)
        trunc = step_td.get("truncated", None)
        if term is None and trunc is None:
            raise RuntimeError("_step must write terminated and/or truncated")
        if term is None:
            term = jnp.zeros_like(trunc)
        if trunc is None:
            trunc = jnp.zeros_like(term)
        return (
            step_td.set("terminated", term)
            .set("truncated", trunc)
            .set("done", term | trunc)
        )

    @property
    def specs(self) -> Composite:
        """Full I/O contract (reference ``EnvBase.specs``)."""
        out = Composite()
        out["output_spec"] = Composite(
            observation=self.observation_spec,
            reward=self.full_reward_spec,
            done=self.full_done_spec,
        )
        out["input_spec"] = Composite(action=self.full_action_spec, state=self.state_spec)
        return out

    def __repr__(self) -> str:
        return f"{type(self).__name__}()"


# Keys excluded when promoting ``next`` to root for the following step.
_STEP_MDP_DROP = ("reward",)


def step_mdp(td: TDict, keep_other: bool = False) -> TDict:
    """Promote the ``("next", ...)`` subtree to root for the next step.

    Reference: ``step_mdp`` envs/utils.py:327 + precompiled ``_StepMDP``
    :79.  Drops ``reward`` (absent at root) and the stale ``action``.
    """
    next_td = td["next"]
    root = next_td.exclude(*_STEP_MDP_DROP)
    if keep_other:
        other = td.exclude("next", "action")
        root = other.update(root)
    return root


def check_env_specs(env: Env, key: jax.Array, num_steps: int = 10) -> None:
    """Golden contract test: rollout and assert spec/data parity.

    Reference: ``check_env_specs`` envs/utils.py:686.
    """
    k0, k1, k2 = jax.random.split(key, 3)
    state, td0 = env.reset(k0)
    obs_spec = env.observation_spec
    done_spec = env.full_done_spec
    batch = env.batch_size

    for k in obs_spec.keys(include_nested=True, leaves_only=True):
        assert k in td0, f"reset td missing observation key {k}"
        leaf = obs_spec[k].expand(batch) if batch else obs_spec[k]
        assert leaf.is_in(td0[k]), f"reset value for {k} not in spec {leaf}: {td0[k]!r}"
    for k in done_spec.keys(include_nested=True, leaves_only=True):
        assert k in td0, f"reset td missing done key {k}"

    # fake vs real data parity over a rollout
    _, ys, _ = env.rollout(num_steps, key=k1)
    for k in obs_spec.keys(include_nested=True, leaves_only=True):
        kk = ("next",) + (k if isinstance(k, tuple) else (k,))
        leaf = obs_spec[k].expand((num_steps,) + batch)
        assert leaf.is_in(ys[kk]), f"rollout value for {kk} not in spec {leaf}"
    reward_spec = env.full_reward_spec
    for k in reward_spec.keys(include_nested=True, leaves_only=True):
        kk = ("next",) + (k if isinstance(k, tuple) else (k,))
        leaf = reward_spec[k].expand((num_steps,) + batch)
        assert leaf.is_in(ys[kk]), f"rollout reward {kk} not in spec {leaf}"

    # step keys present
    for flag in ("done", "terminated", "truncated"):
        assert ("next", flag) in ys, f"rollout missing ('next', {flag})"


class EnvMetaData:
    """Pickle-able env structure for workers (reference common.py:124)."""

    def __init__(self, env: Env):
        self.observation_spec = env.observation_spec
        self.full_action_spec = env.full_action_spec
        self.full_reward_spec = env.full_reward_spec
        self.full_done_spec = env.full_done_spec
        self.batch_size = env.batch_size

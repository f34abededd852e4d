"""Macro-action primitives — high-level actions expanded to low-level
sequences.

Counterpart of ``/root/reference/torchrl/envs/transforms/_primitive.py``
(``MacroPrimitive`` :47, ``MacroAction`` :77, ``TargetMacroAction`` :131,
``MacroPrimitiveTransform`` :199) and ``mean_action_selector.py:13``
(``MeanActionSelector``).

The reference expands macros on the inverse-action path and executes them
via ``MultiAction``; here the expansion is a pure function
(:func:`expand_macro`) and :func:`make_macro_env` fuses expansion +
execution into one env whose ``step`` consumes a macro action and runs the
interpolated low-level sequence under an inner ``lax.scan`` — the whole
macro executes on-device in one XLA program.
"""
from __future__ import annotations

import enum

import jax
import jax.numpy as jnp

from rl_tpu.data import Composite, TDict, Unbounded
from .base import Transform

__all__ = ["MacroPrimitive", "TargetMacroAction", "expand_macro",
           "make_macro_env", "MeanActionSelector"]


class MacroPrimitive(enum.IntEnum):
    """Generic primitive ids (reference _primitive.py:47): hold the current
    low-level action (WAIT) or interpolate toward a target (MOVE)."""

    WAIT = 0
    MOVE = 1


class TargetMacroAction:
    """Structured macro action: primitive ``mode`` + ``target`` + durations
    (reference _primitive.py:77/131) expressed as a TDict builder."""

    @staticmethod
    def move(target, *, steps: int = 16, settle_steps: int = 0) -> TDict:
        target = jnp.atleast_2d(jnp.asarray(target, jnp.float32))
        b = target.shape[:-1]
        return TDict(
            mode=jnp.full(b + (1,), int(MacroPrimitive.MOVE), jnp.int32),
            target=target,
            steps=jnp.full(b + (1,), int(steps), jnp.int32),
            settle_steps=jnp.full(b + (1,), int(settle_steps), jnp.int32),
        )

    @staticmethod
    def wait(action_dim: int, batch=(), *, steps: int = 16) -> TDict:
        b = tuple(batch)
        return TDict(
            mode=jnp.full(b + (1,), int(MacroPrimitive.WAIT), jnp.int32),
            target=jnp.zeros(b + (action_dim,), jnp.float32),
            steps=jnp.full(b + (1,), int(steps), jnp.int32),
            settle_steps=jnp.zeros(b + (1,), jnp.int32),
        )


def expand_macro(macro: TDict, start, horizon: int):
    """Expand a macro into ``[..., horizon, A]`` low-level actions + a
    validity mask ``[..., horizon]``.

    WAIT holds ``start``; MOVE linearly interpolates ``start → target`` over
    ``steps`` then holds ``target`` for ``settle_steps``.  ``horizon`` is
    the static unroll length (steps beyond ``steps + settle_steps`` are
    masked out and repeat the final action).
    """
    start = jnp.asarray(start, jnp.float32)
    target = jnp.asarray(macro["target"], jnp.float32)
    mode = jnp.asarray(macro["mode"])[..., 0]
    steps = jnp.asarray(macro["steps"])[..., 0]
    settle = jnp.asarray(macro["settle_steps"])[..., 0]
    t = jnp.arange(1, horizon + 1)  # [T]
    # fraction of the way to the target at step t (clipped at 1)
    frac = jnp.minimum(t[..., :, None] / jnp.maximum(steps[..., None, None], 1), 1.0)
    interp = start[..., None, :] + frac * (target - start)[..., None, :]
    hold = jnp.broadcast_to(start[..., None, :], interp.shape)
    is_move = (mode == int(MacroPrimitive.MOVE))[..., None, None]
    actions = jnp.where(is_move, interp, hold)
    valid = t[..., :, None].squeeze(-1) <= (steps + settle)[..., None]
    return actions, valid


def make_macro_env(env, horizon: int, action_key: str = "action"):
    """Env whose step consumes a TargetMacroAction TDict and executes the
    expanded low-level sequence via an inner scan (reference
    ``MacroPrimitiveTransform(execute=True)`` ≙ Compose(MultiAction, ·)).

    Rewards are summed over valid low-level steps; done is OR-ed, and steps
    after a done (or past the macro duration) are frozen no-ops on the
    state (scan semantics — see CLAUDE.md break_when_any_done note).
    """
    from ..base import Env

    class _MacroEnv(Env):
        def __init__(self):
            self.env = env
            self.batch_size = env.batch_size

        @property
        def observation_spec(self):
            return env.observation_spec

        @property
        def full_action_spec(self):
            a = env.action_spec
            A = a.shape[-1] if a.shape else 1
            return Composite(**{
                action_key: Composite(
                    mode=Unbounded((1,), jnp.int32),
                    target=Unbounded((A,), jnp.float32),
                    steps=Unbounded((1,), jnp.int32),
                    settle_steps=Unbounded((1,), jnp.int32),
                )
            })

        @property
        def reward_spec(self):
            return env.reward_spec

        def reset(self, key, options=None):
            state, td = env.reset(key)
            # the carried low-level start action (declared on reset so the
            # step/where-select structures match — TensorDictPrimer pattern)
            a = env.action_spec
            A = a.shape[-1] if a.shape else 1
            zeros = jnp.zeros(tuple(self.batch_size) + (A,), jnp.float32)
            return state, td.set("_prev_action", zeros)

        def step(self, state, td, key):
            macro = td[action_key]
            start = jnp.asarray(td.get(("_prev_action",),
                                       jnp.zeros_like(macro["target"])))
            actions, valid = expand_macro(macro, start, horizon)

            def body(carry, xs):
                st, cur, done, prev = carry
                a_t, v_t, k = xs
                td_t = cur.set(action_key, a_t)
                st2, full, nxt = env.step_and_maybe_reset(st, td_t, k)
                live = jnp.logical_and(
                    v_t.reshape(v_t.shape + (1,)), ~done)
                rew = jnp.where(live, full["next", "reward"], 0.0)
                done = jnp.logical_or(done, full["next", "done"])
                prev = jnp.where(live, a_t, prev)
                # freeze state once invalid/done
                st = jax.tree.map(
                    lambda new, old: jnp.where(
                        live.reshape(live.shape[:1] + (1,) * (new.ndim - 1))
                        if new.ndim else live.any(), new, old)
                    if hasattr(new, "ndim") else new, st2, st)
                cur = jax.tree.map(
                    lambda new, old: jnp.where(
                        live.reshape(live.shape[:1] + (1,) * (new.ndim - 1))
                        if new.ndim else live.any(), new, old), nxt, cur)
                return (st, cur, done, prev), (rew, full)

            T = actions.shape[-2]
            keys = jax.random.split(key, T)
            done0 = jnp.zeros(td["done"].shape, bool)
            a_seq = jnp.moveaxis(actions, -2, 0)
            v_seq = jnp.moveaxis(valid, -1, 0)
            (state, cur, done, prev), (rews, fulls) = jax.lax.scan(
                body, (state, td.exclude(action_key, "_prev_action"), done0,
                       start),
                (a_seq, v_seq, keys))
            last = jax.tree.map(lambda x: x[-1], fulls)
            out = last.set(("next", "reward"), rews.sum(0))
            out = out.set(("next", "done"), done)
            out = out.set(action_key, macro)
            # carry the final executed low-level action: WAIT holds it, MOVE
            # interpolates from it (docstring contract)
            out = out.set(("next", "_prev_action"), prev)
            out = out.set("_prev_action", start)
            return state, out, cur.set("_prev_action", prev)

    return _MacroEnv()


class MeanActionSelector(Transform):
    """Bridge belief-space Gaussian policies (PILCO-style) to standard envs
    (reference mean_action_selector.py:13): forward wraps ``observation``
    into ``(mean, var)`` sub-keys; inverse extracts ``("action","mean")``
    as the flat env action."""

    def __init__(self, observation_key: str = "observation",
                 action_key: str = "action"):
        super().__init__([observation_key], [observation_key],
                         [action_key], [action_key])
        self.obs_key = observation_key
        self.action_key = action_key

    def _wrap(self, td: TDict) -> TDict:
        obs = td[self.obs_key]
        if isinstance(obs, TDict):
            return td
        obs = jnp.asarray(obs, jnp.float32)
        return td.set(self.obs_key,
                      TDict(mean=obs, var=jnp.zeros_like(obs)))

    def reset(self, key, tstate, td):
        return TDict(), self._wrap(td)

    def step(self, tstate, next_td):
        return tstate, self._wrap(next_td)

    def inv(self, tstate, td: TDict) -> TDict:
        a = td.get(self.action_key, None)
        if isinstance(a, TDict) and "mean" in a:
            td = td.set(self.action_key, jnp.asarray(a["mean"]))
        return td

    def transform_observation_spec(self, spec: Composite) -> Composite:
        if self.obs_key in spec:
            leaf = spec[self.obs_key]
            spec[self.obs_key] = Composite(
                mean=Unbounded(leaf.shape, jnp.float32),
                var=Unbounded(leaf.shape, jnp.float32),
            )
        return spec

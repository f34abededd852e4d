"""Stateful actor wrappers: action chunks, DT inference, vmap, safe specs.

Counterparts of ``/root/reference/torchrl/modules/tensordict_module/``:
``MultiStepActorWrapper`` actors.py:2280, ``DecisionTransformerInferenceWrapper``
actors.py:1844, ``VmapModule`` common.py:415, ``SafeModule`` common.py:97.

Per the house convention, wrappers that carry state across env steps write
it under ``("next", <key>)`` (promoted by ``step_mdp``) and the carried keys
must be declared via ``TensorDictPrimer`` so reset structures match.  All
control flow is ``where``-selects — jittable, per-batch-element.
"""
from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp

from rl_tpu.data import TDict

__all__ = [
    "MultiStepActorWrapper",
    "DecisionTransformerInferenceWrapper",
    "VmapModule",
    "SafeModule",
]


class MultiStepActorWrapper:
    """Execute an action-chunk policy one action per env step
    (reference actors.py:2280).

    The inner policy writes a chunk ``[*B, n_steps, action_dim]`` under
    ``chunk_key``.  This wrapper carries (buffer, counter) state: when an
    element's counter reaches ``n_steps`` — or its episode restarts
    (``is_init``) — the inner policy is re-queried and the buffer refreshed
    for that element.  Under jit the inner policy runs every step for the
    whole batch; stale elements keep their old buffer via a where-select
    (the price of static control flow; the MXU cost is usually trivial
    next to the env).

    State keys (prime with TensorDictPrimer): ``action_buffer`` and
    ``chunk_counter``.
    """

    def __init__(self, actor, n_steps: int, *, action_key="action",
                 chunk_key="action_chunk", init_key="is_init",
                 buffer_key: str = "action_buffer",
                 counter_key: str = "chunk_counter"):
        self.actor = actor
        self.n_steps = int(n_steps)
        self.action_key = action_key
        self.chunk_key = chunk_key
        self.init_key = init_key
        self.buffer_key = buffer_key
        self.counter_key = counter_key

    def init(self, key, td: TDict):
        return self.actor.init(key, td)

    def primer_spec(self, action_shape: tuple, dtype=jnp.float32) -> dict:
        """Shapes/dtypes for the TensorDictPrimer carrying the state."""
        return {
            self.buffer_key: ((self.n_steps,) + tuple(action_shape), dtype),
            self.counter_key: ((), jnp.int32),
        }

    def __call__(self, params, td: TDict, key=None) -> TDict:
        td = self.actor(params, td, key)
        new_chunk = jnp.asarray(td[self.chunk_key])
        batch_shape = new_chunk.shape[:-2]
        counter = (
            jnp.asarray(td[self.counter_key])
            if self.counter_key in td
            else jnp.full(batch_shape, self.n_steps, jnp.int32)
        )
        buffer = (
            jnp.asarray(td[self.buffer_key])
            if self.buffer_key in td
            else jnp.zeros_like(new_chunk)
        )
        need = counter >= self.n_steps
        if self.init_key in td:
            is_init = jnp.asarray(td[self.init_key], bool).reshape(batch_shape)
            need = need | is_init
        sel = need.reshape(batch_shape + (1, 1))
        buffer = jnp.where(sel, new_chunk, buffer)
        counter = jnp.where(need, 0, counter)
        action = jnp.take_along_axis(
            buffer, counter.reshape(batch_shape + (1, 1)), axis=-2
        )[..., 0, :]
        counter = counter + 1
        return (
            td.set(self.action_key, action)
              .set(("next", self.buffer_key), buffer)
              .set(("next", self.counter_key), counter)
        )


class DecisionTransformerInferenceWrapper:
    """Rolling-context DT inference (reference actors.py:1844).

    Maintains fixed-length [B, L] contexts of (observation, action,
    return-to-go); each step appends the fresh observation/RTG, runs the
    DT over the window, emits the last predicted action, and records it in
    the action context.  The return-to-go is decremented by the observed
    reward (via ``("next","reward")`` at the previous step — supplied by
    the TargetReturn transform when used in an env pipeline).

    State keys (prime with TensorDictPrimer): ``dt_obs_ctx``, ``dt_act_ctx``,
    ``dt_rtg_ctx``.
    """

    def __init__(self, dt_module, context_len: int, *,
                 obs_key="observation", action_key="action",
                 rtg_key="return_to_go", deterministic: bool = True):
        self.dt = dt_module
        self.context_len = int(context_len)
        self.obs_key = obs_key
        self.action_key = action_key
        self.rtg_key = rtg_key
        self.deterministic = deterministic

    def init(self, key, td: TDict):
        obs = jnp.asarray(td[self.obs_key])
        B = obs.shape[0]
        L = self.context_len
        obs_ctx = jnp.zeros((B, L) + obs.shape[1:])
        act_ctx = jnp.zeros((B, L, self.dt.action_dim))
        rtg_ctx = jnp.zeros((B, L, 1))
        variables = self.dt.init(key, obs_ctx, act_ctx, rtg_ctx)
        return variables["params"]

    def primer_spec(self, obs_shape: tuple) -> dict:
        L = self.context_len
        return {
            "dt_obs_ctx": ((L,) + tuple(obs_shape), jnp.float32),
            "dt_act_ctx": ((L, self.dt.action_dim), jnp.float32),
            "dt_rtg_ctx": ((L, 1), jnp.float32),
        }

    @staticmethod
    def _shift_append(ctx, new):
        return jnp.concatenate([ctx[:, 1:], new[:, None]], axis=1)

    def __call__(self, params, td: TDict, key=None) -> TDict:
        obs = jnp.asarray(td[self.obs_key], jnp.float32)
        rtg = jnp.asarray(td[self.rtg_key], jnp.float32).reshape(
            obs.shape[0], 1
        )
        B = obs.shape[0]
        L = self.context_len
        obs_ctx = (
            jnp.asarray(td["dt_obs_ctx"]) if "dt_obs_ctx" in td
            else jnp.zeros((B, L) + obs.shape[1:])
        )
        act_ctx = (
            jnp.asarray(td["dt_act_ctx"]) if "dt_act_ctx" in td
            else jnp.zeros((B, L, self.dt.action_dim))
        )
        rtg_ctx = (
            jnp.asarray(td["dt_rtg_ctx"]) if "dt_rtg_ctx" in td
            else jnp.zeros((B, L, 1))
        )
        obs_ctx = self._shift_append(obs_ctx, obs)
        rtg_ctx = self._shift_append(rtg_ctx, rtg)
        p = params.to_dict() if isinstance(params, TDict) else params
        out = self.dt.apply(
            {"params": p}, obs_ctx, act_ctx, rtg_ctx,
            deterministic=self.deterministic,
        )
        action_seq = out[0] if isinstance(out, tuple) else out
        action = action_seq[:, -1]
        act_ctx = jnp.concatenate(
            [act_ctx[:, 1:], action[:, None]], axis=1
        )
        return (
            td.set(self.action_key, action)
              .set(("next", "dt_obs_ctx"), obs_ctx)
              .set(("next", "dt_act_ctx"), act_ctx)
              .set(("next", "dt_rtg_ctx"), rtg_ctx)
        )


class VmapModule:
    """vmap a TDModule over a leading dim of its in/out keys
    (reference common.py:415 — used e.g. to apply a single-agent module
    across the agent dim)."""

    def __init__(self, module, vmap_dim: int = 0):
        self.module = module
        self.in_keys = module.in_keys
        self.out_keys = module.out_keys
        self.vmap_dim = vmap_dim

    def init(self, key, td: TDict):
        ins = [jnp.asarray(td[k]) for k in self.in_keys]
        slim = TDict({
            k: jnp.take(v, 0, axis=self.vmap_dim)
            for k, v in zip(self.in_keys, ins)
        })
        return self.module.init(key, slim)

    def __call__(self, params, td: TDict, key=None) -> TDict:
        ins = [jnp.asarray(td[k]) for k in self.in_keys]

        def one(*xs):
            inner = TDict(dict(zip(self.in_keys, xs)))
            out = self.module(params, inner, key)
            return tuple(out[k] for k in self.out_keys)

        outs = jax.vmap(one, in_axes=self.vmap_dim,
                        out_axes=self.vmap_dim)(*ins)
        for k, v in zip(self.out_keys, outs):
            td = td.set(k, v)
        return td


class SafeModule:
    """TDModule whose outputs are projected into their specs
    (reference common.py:97 ``SafeModule``: ``safe=True`` clamps/projects
    out-of-domain outputs instead of erroring)."""

    def __init__(self, module, spec, *, safe: bool = True):
        """``spec``: mapping out_key → TensorSpec (or a Composite)."""
        self.module = module
        self.in_keys = module.in_keys
        self.out_keys = module.out_keys
        self.spec = spec
        self.safe = safe

    def init(self, key, td: TDict):
        return self.module.init(key, td)

    def _spec_for(self, k):
        try:
            return self.spec[k]
        except (KeyError, TypeError):
            return None

    def __call__(self, params, td: TDict, key=None) -> TDict:
        td = self.module(params, td, key)
        if self.safe:
            for k in self.out_keys:
                s = self._spec_for(k)
                if s is not None and hasattr(s, "project"):
                    td = td.set(k, s.project(td[k]))
        return td

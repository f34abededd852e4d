"""Action-space transforms.

Reference originals (``/root/reference/torchrl/envs/transforms/_action.py``):
``DiscreteActionProjection`` :64, ``ActionDiscretizer`` :300, ``MultiAction``
:662, ``FlattenAction`` :1525, ``ActionChunkTransform`` :1812; ``gSDENoise``
``_env.py``:667.

All act on the ``inv`` path (policy action → env action) and rewrite the
action spec the policy sees — pure index/arithmetic maps that fuse into the
collection scan.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from rl_tpu.data import Bounded, Categorical, Composite, TDict, Unbounded
from .base import Transform

__all__ = [
    "ActionTokenizerTransform",
    "DiscreteActionProjection",
    "ActionDiscretizer",
    "MultiAction",
    "FlattenAction",
    "ActionChunkTransform",
    "gSDENoise",
]


class DiscreteActionProjection(Transform):
    """Map a policy acting in ``num_actions_effective`` onto an env with
    ``max_actions`` (reference _action.py:64 — e.g. one DQN head shared
    across Atari games with different action counts).  Out-of-range actions
    are remapped modulo the env's action count."""

    def __init__(self, num_actions_effective: int, max_actions: int,
                 action_key: str = "action"):
        super().__init__(in_keys_inv=(action_key,))
        self.num_actions_effective = int(num_actions_effective)
        self.max_actions = int(max_actions)

    def _apply_value_inv(self, value):
        return jnp.asarray(value) % self.max_actions

    def transform_action_spec(self, spec: Composite) -> Composite:
        for k in self.in_keys_inv:
            leaf = spec[k]
            spec[k] = Categorical(self.num_actions_effective, leaf.shape, leaf.dtype)
        return spec


class ActionDiscretizer(Transform):
    """Expose a continuous Bounded action space as ``num_intervals`` discrete
    bins per dimension (reference _action.py:300).  The policy emits integer
    bin indices; ``inv`` maps them to bin centers in env space."""

    def __init__(self, num_intervals: int, low, high, action_key: str = "action"):
        super().__init__(in_keys_inv=(action_key,))
        self.num_intervals = int(num_intervals)
        self.low = np.asarray(low, np.float32)
        self.high = np.asarray(high, np.float32)

    def _apply_value_inv(self, value):
        low, high = jnp.asarray(self.low), jnp.asarray(self.high)
        step = (high - low) / self.num_intervals
        return low + (jnp.asarray(value, jnp.float32) + 0.5) * step

    def transform_action_spec(self, spec: Composite) -> Composite:
        for k in self.in_keys_inv:
            leaf = spec[k]
            spec[k] = Categorical(self.num_intervals, leaf.shape, jnp.int32)
        return spec


class MultiAction(Transform):
    """Unroll a chunk of K stacked actions through K inner env steps in one
    outer step (reference _action.py:662).  The policy emits ``[..., K, A]``
    actions; each outer ``step`` consumes one chunk via an inner
    ``lax.scan`` over the wrapped env — rewards are summed, dones OR-ed.

    Implemented as an env wrapper rather than a pure transform because it
    changes the step arity; kept here for zoo parity.  Use
    :func:`make_multi_action_env`.
    """

    def __init__(self, num_actions: int, action_key: str = "action"):
        super().__init__()
        self.num_actions = int(num_actions)
        self.action_key = action_key

    def transform_action_spec(self, spec: Composite) -> Composite:
        for k in list(spec.keys(include_nested=True, leaves_only=True)):
            leaf = spec[k]
            spec[k] = leaf.expand((self.num_actions,) + tuple(leaf.shape))
        return spec


def make_multi_action_env(env, num_actions: int, action_key: str = "action"):
    """Wrap ``env`` so each step consumes ``[..., K, A]`` action chunks
    (the functional form of ``MultiAction``; reference _action.py:662)."""
    from ..base import Env

    class _MultiActionEnv(Env):
        def __init__(self):
            self.env = env
            self.batch_size = env.batch_size

        @property
        def observation_spec(self):
            return env.observation_spec

        @property
        def full_action_spec(self):
            spec = env.full_action_spec.clone()
            return MultiAction(num_actions, action_key).transform_action_spec(spec)

        @property
        def full_reward_spec(self):
            return env.full_reward_spec

        @property
        def full_done_spec(self):
            return env.full_done_spec

        def reset(self, key, prev_state=None):
            return env.reset(key)

        def step(self, state, td, key):
            actions = jnp.asarray(td[action_key])  # [..., K, A] or [..., K]
            K = num_actions
            keys = jax.random.split(key, K)
            # move the chunk axis to the front for scan
            ndim_batch = len(self.batch_size) if self.batch_size else 0
            chunk_axis = ndim_batch
            acts = jnp.moveaxis(actions, chunk_axis, 0)

            def body(carry, inp):
                st, cur = carry
                a, k = inp
                st2, out = env.step(st, cur.set(action_key, a), k)
                nxt = out["next"]
                cur2 = cur.update(
                    {kk: nxt[kk] for kk, _ in nxt.items(include_nested=True,
                                                        leaves_only=True)
                     if kk not in ("reward",)}
                )
                return (st2, cur2), nxt

            base = td.exclude(action_key)
            (state2, _), nexts = jax.lax.scan(body, (state, base), (acts, keys))
            reward = jnp.sum(jnp.asarray(nexts["reward"]), axis=0)
            done = jnp.any(jnp.asarray(nexts["done"]), axis=0)
            term = jnp.any(jnp.asarray(nexts["terminated"]), axis=0)
            trunc = jnp.any(jnp.asarray(nexts["truncated"]), axis=0)
            last = jax.tree.map(lambda x: x[-1], nexts)
            last = last.set("reward", reward).set("done", done) \
                       .set("terminated", term).set("truncated", trunc)
            return state2, td.set("next", last)

    return _MultiActionEnv()


class FlattenAction(Transform):
    """Flatten nested multi-part actions into one vector on the way in the
    policy sees, unflattened per-part for the env (reference
    _action.py:1525).  ``parts`` maps env action keys to their shapes."""

    def __init__(self, parts: dict, out_key: str = "action"):
        super().__init__(in_keys_inv=(out_key,))
        self.parts = {k: tuple(v) for k, v in parts.items()}
        self.out_key = out_key

    def inv(self, tstate, td):
        if self.out_key not in td:
            return td
        flat = jnp.asarray(td[self.out_key])
        off = 0
        for k, shape in self.parts.items():
            n = int(np.prod(shape)) if shape else 1
            chunk = flat[..., off:off + n]
            td = td.set(k, chunk.reshape(flat.shape[:-1] + shape))
            off += n
        return td.exclude(self.out_key) if self.out_key not in self.parts else td

    def transform_action_spec(self, spec: Composite) -> Composite:
        total = sum(int(np.prod(s)) if s else 1 for s in self.parts.values())
        out = Composite()
        out[self.out_key] = Bounded(-1.0, 1.0, (total,), jnp.float32)
        return out


class ActionChunkTransform(Transform):
    """Execute pre-computed action chunks one step at a time (reference
    _action.py:1812 — pairs with ``MultiStepActorWrapper``: the policy emits
    ``[..., K, A]`` every K steps; this transform plays them back).

    State: the current chunk and a cursor.  On ``inv``, if the incoming
    action has a chunk axis, it refreshes the buffer; each step consumes one
    slice.
    """
    row_stateful = True

    def __init__(self, chunk_len: int, action_key: str = "action"):
        super().__init__()
        self.chunk_len = int(chunk_len)
        self.action_key = action_key

    def reset(self, key, tstate, td):
        return TDict(cursor=jnp.zeros((), jnp.int32)), td

    def step(self, tstate, next_td):
        return tstate.set("cursor", tstate["cursor"] + 1), next_td

    def inv(self, tstate, td):
        if self.action_key not in td:
            return td
        a = jnp.asarray(td[self.action_key])
        # chunked action: play back the slice at the cursor (the actor
        # wrapper emits a fresh chunk whenever the cursor wraps)
        if a.ndim >= 2 and a.shape[-2] == self.chunk_len:
            cur = tstate["cursor"] if "cursor" in tstate else jnp.zeros((), jnp.int32)
            sel = jnp.take(a, cur % self.chunk_len, axis=-2)
            return td.set(self.action_key, sel)
        return td


class gSDENoise(Transform):
    """Prime the gSDE exploration-noise matrix at reset (reference
    _env.py:667): writes ``_eps_gSDE`` ~ N(0,1) of shape
    ``[batch, noise_dim, action_dim]`` for state-dependent exploration."""
    row_stateful = True

    def __init__(self, noise_dim: int, action_dim: int, key_name: str = "_eps_gSDE"):
        super().__init__()
        self.noise_dim = int(noise_dim)
        self.action_dim = int(action_dim)
        self.key_name = key_name

    def reset(self, key, tstate, td):
        done = jnp.asarray(td["done"])
        batch = done.shape[:-1]
        eps = jax.random.normal(key, batch + (self.noise_dim, self.action_dim))
        return TDict(), td.set(self.key_name, eps)

    def transform_observation_spec(self, spec: Composite) -> Composite:
        spec[self.key_name] = Unbounded((self.noise_dim, self.action_dim))
        return spec


class ActionTokenizerTransform(Transform):
    """Bidirectional action ↔ token codec over an action tokenizer
    (reference _action.py:2105).

    ``mode="encode"`` (default): forward maps the continuous action at
    ``in_key`` to token ids at ``out_key`` (building token targets on the
    replay-buffer path); ``inv`` decodes the policy's tokens at ``out_key``
    back into a continuous ``in_key`` action before the base env consumes
    it, and the advertised action spec becomes a Categorical over the
    tokenizer vocabulary.  ``mode="decode"`` swaps the directions.
    """

    def __init__(self, tokenizer, *, in_key="action",
                 out_key=("vla_action", "tokens"), mode: str = "encode"):
        if mode not in ("encode", "decode"):
            raise ValueError(f"mode must be 'encode' or 'decode', got {mode}")
        super().__init__()
        self.tokenizer = tokenizer
        self.in_key = in_key
        self.out_key = out_key
        self.mode = mode

    def step(self, tstate, next_td: TDict):
        return tstate, self._forward(next_td)

    def reset(self, key, tstate, td: TDict):
        return TDict(), self._forward(td)

    def _forward(self, td: TDict) -> TDict:
        if self.mode == "encode":
            if self.in_key in td:
                td = td.set(
                    self.out_key, self.tokenizer.encode(td[self.in_key])
                )
        else:
            if self.out_key in td:
                td = td.set(
                    self.in_key, self.tokenizer.decode(td[self.out_key])
                )
        return td

    def inv(self, tstate, td: TDict) -> TDict:
        if self.mode == "encode":
            # policy emitted tokens: decode them into the env action
            if self.out_key in td:
                td = td.set(
                    self.in_key, self.tokenizer.decode(td[self.out_key])
                )
        else:
            if self.in_key in td:
                td = td.set(
                    self.out_key, self.tokenizer.encode(td[self.in_key])
                )
        return td

    def transform_action_spec(self, spec: Composite) -> Composite:
        if self.mode == "encode" and self.in_key in spec:
            leaf = spec[self.in_key]
            spec[self.out_key] = Categorical(
                self.tokenizer.vocab_size, tuple(leaf.shape), jnp.int32
            )
        return spec

"""Env-control, key-ops, and replay-side transforms (zoo completion).

Reference originals: ``torchrl/envs/transforms/_env.py`` (``TerminateTransform``
:1175, ``RandomTruncationTransform`` :1256, ``BatchSizeTransform`` :1807),
``gym_transforms.py`` (``EndOfLifeTransform`` :20), ``_misc.py``
(``ConditionalSkip`` :658, ``ConditionalPolicySwitch`` :773,
``PinMemoryTransform`` :74), ``_keys.py`` (``RemoveEmptySpecs`` :453,
``FlattenTensorDict`` :673), ``_tensor.py`` (``Stack`` :991, ``Hash`` :475,
``Tokenizer`` :688), ``_timer.py`` (``Timer`` :34), ``_device.py``
(``DeviceCastTransform`` :541), ``rb_transforms.py`` (``MultiStepTransform``
:25, ``NextStateReconstructor`` :230, ``PolicyAgeFilter`` :466).

TPU notes: skip/switch semantics become where-selects (compute both branches,
select — the scan-friendly form of control flow); replay-side transforms are
pure batch→batch functions usable as ``ReplayBuffer(transform=...)``.
"""
from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from rl_tpu.data import Composite, TDict, Unbounded
from .base import Transform

__all__ = [
    "TerminateTransform",
    "RandomTruncationTransform",
    "BatchSizeTransform",
    "EndOfLifeTransform",
    "ConditionalSkip",
    "make_conditional_skip_env",
    "ConditionalPolicySwitch",
    "Timer",
    "RemoveEmptySpecs",
    "Stack",
    "Hash",
    "Tokenizer",
    "DeviceCastTransform",
    "PinMemoryTransform",
    "FlattenTensorDict",
    "MultiStepTransform",
    "NextStateReconstructor",
    "PolicyAgeFilter",
]


class TerminateTransform(Transform):
    """OR a user predicate over the post-step td into ``terminated`` (and,
    by default, ``done``) — goal-terminated rollouts without a bespoke loop
    (reference _env.py:1175)."""

    def __init__(self, stop: Callable[[TDict], jax.Array], write_done: bool = True):
        super().__init__()
        self.stop = stop
        self.write_done = write_done

    def step(self, tstate, next_td):
        flag = jnp.asarray(self.stop(next_td))
        term = jnp.asarray(next_td["terminated"])
        flag = jnp.broadcast_to(flag.reshape(flag.shape + (1,) * (term.ndim - flag.ndim)),
                                term.shape)
        next_td = next_td.set("terminated", term | flag)
        if self.write_done:
            next_td = next_td.set("done", jnp.asarray(next_td["done"]) | flag)
        return tstate, next_td


class RandomTruncationTransform(Transform):
    """Decorrelate synchronized batched envs by giving each env a random
    horizon (reference _env.py:1256).  First reset: horizon ~ U(1, max) so
    envs spread across episode phases immediately; later resets: with prob
    ``prob`` a horizon ~ U(min, max), else the full ``max_horizon``.
    Must sit after :class:`StepCounter` (needs ``step_count``)."""
    row_stateful = True

    def __init__(self, min_horizon: int, max_horizon: int, prob: float = 0.0,
                 step_count_key: str = "step_count"):
        super().__init__()
        self.min_horizon = int(min_horizon)
        self.max_horizon = int(max_horizon)
        self.prob = float(prob)
        self.step_count_key = step_count_key

    def reset(self, key, tstate, td):
        done = jnp.asarray(td["done"])
        shape = done.shape
        k1, k2 = jax.random.split(key)
        first = tstate is None or "horizon" not in tstate
        if first:
            horizon = jax.random.randint(k1, shape, 1, self.max_horizon + 1)
        else:
            rand_h = jax.random.randint(k1, shape, self.min_horizon,
                                        self.max_horizon + 1)
            use_rand = jax.random.uniform(k2, shape) < self.prob
            horizon = jnp.where(use_rand, rand_h, self.max_horizon)
        return TDict(horizon=horizon.astype(jnp.int32)), td

    def step(self, tstate, next_td):
        count = jnp.asarray(next_td[self.step_count_key])
        trunc = jnp.asarray(next_td["truncated"]) | (count >= tstate["horizon"])
        next_td = next_td.set("truncated", trunc).set(
            "done", jnp.asarray(next_td["terminated"]) | trunc
        )
        return tstate, next_td

    def on_done(self, tstate_reset, tstate_stepped, done):
        # per-env horizons refresh where done
        from ..base import _where_done

        return _where_done(done, tstate_reset, tstate_stepped)


class BatchSizeTransform(Transform):
    """Reshape the env's leading batch dims (reference _env.py:1807 — e.g.
    present a ``[N]`` vmapped env as ``[N1, N2]``)."""

    def __init__(self, batch_size: Sequence[int]):
        super().__init__()
        self.batch_size = tuple(int(b) for b in batch_size)

    def _reshape(self, td: TDict, ndim_in: int) -> TDict:
        return td.apply(
            lambda x: jnp.asarray(x).reshape(
                self.batch_size + jnp.asarray(x).shape[ndim_in:]
            )
        )

    def reset(self, key, tstate, td):
        done = jnp.asarray(td["done"])
        ndim_in = done.ndim - 1
        return TDict(ndim=jnp.asarray(ndim_in)), self._reshape(td, ndim_in)

    def step(self, tstate, next_td):
        # infer original batch rank from done: stored at reset
        nprod = int(np.prod(self.batch_size))
        def fix(x):
            x = jnp.asarray(x)
            # find split point: leading dims multiplying to nprod
            if x.shape[: len(self.batch_size)] == self.batch_size:
                return x
            assert x.shape[0] == nprod, (x.shape, self.batch_size)
            return x.reshape(self.batch_size + x.shape[1:])
        return tstate, next_td.apply(fix)


class EndOfLifeTransform(Transform):
    """Atari life-loss bootstrapping (reference gym_transforms.py:20): read
    the ``lives`` counter from step info, write ``eol = lives < prev_lives``
    and optionally OR it into ``done`` (life loss treated as episode end for
    the value target while the game keeps running)."""
    row_stateful = True

    def __init__(self, lives_key: str = "lives", eol_key: str = "eol",
                 done_key: str | None = "done"):
        super().__init__()
        self.lives_key = lives_key
        self.eol_key = eol_key
        self.done_key = done_key

    def reset(self, key, tstate, td):
        if self.lives_key in td:
            lives = jnp.asarray(td[self.lives_key])
        else:
            done = jnp.asarray(td["done"])
            lives = jnp.zeros(done.shape[:-1], jnp.int32)
        return TDict(lives=lives), td.set(
            self.eol_key, jnp.zeros(jnp.asarray(td["done"]).shape, jnp.bool_)
        )

    def step(self, tstate, next_td):
        prev = tstate["lives"]
        if self.lives_key in next_td:
            lives = jnp.asarray(next_td[self.lives_key])
        else:
            lives = prev
        eol = (lives < prev)[..., None]
        next_td = next_td.set(self.eol_key, eol)
        if self.done_key is not None:
            next_td = next_td.set(
                self.done_key, jnp.asarray(next_td[self.done_key]) | eol
            )
        return TDict(lives=lives), next_td

    def transform_observation_spec(self, spec: Composite) -> Composite:
        spec[self.eol_key] = Unbounded((1,), jnp.bool_)
        return spec


class ConditionalSkip(Transform):
    """Marker transform carrying a skip predicate (reference _misc.py:658).

    On TPU the skip is a where-select — both branches are computed, the
    skipped env keeps its previous state/output (scan semantics forbid
    early exit).  ``TransformedEnv`` can't suppress the inner step from a
    transform hook, so the executable form is
    :func:`make_conditional_skip_env`; this class exists for config parity
    and delegates to it via ``bind``.
    """

    def __init__(self, cond: Callable[[TDict], jax.Array]):
        super().__init__()
        self.cond = cond

    def bind(self, env):
        return make_conditional_skip_env(env, self.cond)


def make_conditional_skip_env(env, cond: Callable[[TDict], jax.Array]):
    """Wrap ``env`` so steps where ``cond(td)`` is True are skipped: the env
    state and outputs are held (where-select of stepped vs held)."""
    from ..base import Env, _where_done

    class _SkipEnv(Env):
        def __init__(self):
            self.env = env
            self.batch_size = env.batch_size

        @property
        def observation_spec(self):
            return env.observation_spec

        @property
        def full_action_spec(self):
            return env.full_action_spec

        @property
        def full_reward_spec(self):
            return env.full_reward_spec

        @property
        def full_done_spec(self):
            return env.full_done_spec

        def reset(self, key, prev_state=None):
            return env.reset(key)

        def step(self, state, td, key):
            skip = jnp.asarray(cond(td))
            state2, td2 = env.step(state, td, key)
            next_td = td2["next"]
            done = jnp.asarray(next_td["done"])
            skip_b = jnp.broadcast_to(
                skip.reshape(skip.shape + (1,) * (done.ndim - skip.ndim)), done.shape
            )
            # held branch: observation unchanged, zero reward, not done
            held = next_td.update(
                {
                    k: td[k]
                    for k, _ in next_td.items(include_nested=True, leaves_only=True)
                    if k in td and k not in ("reward", "done", "terminated", "truncated")
                }
            )
            held = held.set("reward", jnp.zeros_like(jnp.asarray(next_td["reward"])))
            held = held.set("done", jnp.zeros_like(done))
            held = held.set("terminated", jnp.zeros_like(done))
            held = held.set("truncated", jnp.zeros_like(done))
            merged_next = _where_done(skip_b, held, next_td)
            merged_state = _where_done(skip_b, state, state2)
            return merged_state, td.set("next", merged_next)

    return _SkipEnv()


class ConditionalPolicySwitch:
    """Policy combinator: where ``condition(td)`` holds, act with
    ``policy_switch``, else with the wrapped main policy (reference
    _misc.py:773 — turn-taking games, scripted overrides).

    Functional form: both policies run, outputs are where-selected — the
    compiled branch-free equivalent of the reference's data-dependent
    dispatch.  Use as ``Collector(env, ConditionalPolicySwitch(main, alt,
    cond), ...)``.
    """

    def __init__(self, policy, policy_switch, condition: Callable[[TDict], jax.Array]):
        self.policy = policy
        self.policy_switch = policy_switch
        self.condition = condition

    def __call__(self, *args):
        """Accepts either the rollout-policy arity ``(td, key)`` or the
        collector-policy arity ``(params, td, key)``; sub-policies are
        called with whichever was used."""
        from ..base import _where_done

        td, key = args[-2], args[-1]
        head = args[:-2]
        k1, k2 = jax.random.split(key)
        out_main = self.policy(*head, td, k1)
        out_alt = self.policy_switch(*head, td, k2)
        cond = jnp.asarray(self.condition(td))
        return _where_done(cond, out_alt, out_main)


class Timer(Transform):
    """Stamp wall-clock step/reset durations (reference _timer.py:34).

    Host-side only: meaningful when the env is driven eagerly (host pools,
    debugging); inside jit the stamps are compile-time constants, so the
    transform degrades to writing zeros (documented deviation — TPU step
    timing comes from the profiling layer instead, rl_tpu.utils.timeit).
    """

    def __init__(self, out_key: str = "time"):
        super().__init__()
        self.out_key = out_key

    def _now(self):
        import time

        try:
            return jnp.asarray(time.perf_counter(), jnp.float64)
        except Exception:
            return jnp.zeros(())

    def reset(self, key, tstate, td):
        return TDict(t=self._now()), td.set(self.out_key, jnp.zeros(()))

    def step(self, tstate, next_td):
        now = self._now()
        dt = now - tstate["t"]
        return TDict(t=now), next_td.set(self.out_key, dt.astype(jnp.float32))


class RemoveEmptySpecs(Transform):
    """Drop empty sub-composites from specs and empty sub-TDicts from
    outputs (reference _keys.py:453)."""

    def _prune_td(self, td: TDict) -> TDict:
        def prune(d):
            out = TDict()
            for k in d.keys():
                v = d[k]
                if isinstance(v, TDict):
                    v = prune(v)
                    if len(list(v.keys())) == 0:
                        continue
                out = out.set(k, v)
            return out

        return prune(td)

    def reset(self, key, tstate, td):
        return TDict(), self._prune_td(td)

    def step(self, tstate, next_td):
        return tstate, self._prune_td(next_td)

    def transform_observation_spec(self, spec: Composite) -> Composite:
        for k in list(spec.keys()):
            sub = spec[k]
            if isinstance(sub, Composite) and len(list(sub.keys())) == 0:
                del spec[k]
        return spec


class Stack(Transform):
    """Stack same-shaped keys into one entry along a new dim (reference
    _tensor.py:991 — MARL grouping: per-agent keys → one batched key)."""

    def __init__(self, in_keys: Sequence, out_key, del_keys: bool = True,
                 axis: int = -1):
        super().__init__(list(in_keys), [out_key])
        self.out_key = out_key
        self.del_keys = del_keys
        self.axis = axis

    def _stack(self, td: TDict) -> TDict:
        if not all(k in td for k in self.in_keys):
            return td
        vals = [jnp.asarray(td[k]) for k in self.in_keys]
        td = td.set(self.out_key, jnp.stack(vals, axis=self.axis))
        if self.del_keys:
            td = td.exclude(*self.in_keys)
        return td

    def reset(self, key, tstate, td):
        return TDict(), self._stack(td)

    def step(self, tstate, next_td):
        return tstate, self._stack(next_td)

    def transform_observation_spec(self, spec: Composite) -> Composite:
        if all(k in spec for k in self.in_keys):
            leaf = spec[self.in_keys[0]]
            n = len(self.in_keys)
            shape = list(leaf.shape)
            ax = self.axis if self.axis >= 0 else len(shape) + 1 + self.axis
            shape.insert(ax, n)
            spec[self.out_key] = Unbounded(tuple(shape), leaf.dtype)
            if self.del_keys:
                for k in self.in_keys:
                    del spec[k]
        return spec


def _fnv1a_rolling(x: jax.Array) -> jax.Array:
    """Jit-safe FNV-1a-style rolling hash over the trailing axis of an int32
    view — the device counterpart of the reference's reproducible_hash
    (_tensor.py:475)."""
    x = jnp.asarray(x)
    if x.dtype != jnp.int32:
        if jnp.issubdtype(x.dtype, jnp.floating):
            x = jax.lax.bitcast_convert_type(x.astype(jnp.float32), jnp.int32)
        else:
            x = x.astype(jnp.int32)
    flat = x.reshape(x.shape[:1] + (-1,)) if x.ndim > 1 else x.reshape(1, -1)
    prime = jnp.int32(16777619)

    def body(h, v):
        return (h ^ v) * prime, None

    h0 = jnp.full((flat.shape[0],), np.int32(-2128831035))
    h, _ = jax.lax.scan(body, h0, flat.T)
    return h if x.ndim > 1 else h[0]


class Hash(Transform):
    """Write a reproducible hash of selected keys (reference _tensor.py:475).
    Device path: FNV-1a rolling hash over the bit pattern (int32); host
    NonTensor values fall back to python ``hash``."""

    def __init__(self, in_keys: Sequence, out_keys: Sequence, hash_fn=None):
        super().__init__(list(in_keys), list(out_keys))
        self.hash_fn = hash_fn or _fnv1a_rolling

    def _apply_value(self, value):
        try:
            return self.hash_fn(value)
        except TypeError:
            return jnp.asarray(hash(value) & 0x7FFFFFFF, jnp.int32)

    def transform_observation_spec(self, spec: Composite) -> Composite:
        for kout in self.out_keys:
            spec[kout] = Unbounded((), jnp.int32)
        return spec


class Tokenizer(Transform):
    """Tokenize string keys with a HuggingFace tokenizer (reference
    _tensor.py:688).  Host-side (strings aren't jittable): use on ChatEnv /
    dataset pipelines, not inside a scan."""

    def __init__(self, in_keys: Sequence, out_keys: Sequence,
                 tokenizer=None, max_length: int = 128, padding: str = "max_length"):
        super().__init__(list(in_keys), list(out_keys))
        if isinstance(tokenizer, str) or tokenizer is None:
            from transformers import AutoTokenizer

            tokenizer = AutoTokenizer.from_pretrained(tokenizer or "bert-base-uncased")
        self.tokenizer = tokenizer
        self.max_length = int(max_length)
        self.padding = padding

    def _apply_value(self, value):
        if isinstance(value, (list, tuple)):
            enc = self.tokenizer(
                list(value), padding=self.padding, max_length=self.max_length,
                truncation=True, return_tensors="np",
            )
            return jnp.asarray(enc["input_ids"], jnp.int32)
        enc = self.tokenizer(
            str(value), padding=self.padding, max_length=self.max_length,
            truncation=True,
        )
        return jnp.asarray(enc["input_ids"], jnp.int32)


class DeviceCastTransform(Transform):
    """Move keys to a device (reference _device.py:541).  On TPU this is the
    host↔HBM boundary: `jax.device_put` with an optional sharding."""

    def __init__(self, device=None, in_keys=None, out_keys=None):
        super().__init__(in_keys or [], out_keys)
        self.device = device

    def _apply_value(self, value):
        return jax.device_put(value, self.device)

    def _move(self, td: TDict) -> TDict:
        if self.in_keys:
            return self._apply(td)
        return jax.device_put(td, self.device)

    def reset(self, key, tstate, td):
        return TDict(), self._move(td)

    def step(self, tstate, next_td):
        return tstate, self._move(next_td)


class PinMemoryTransform(Transform):
    """Host-pinned staging is implicit in JAX's transfer pipeline — no-op
    kept for config parity (reference _misc.py:74)."""


# -- replay-buffer-side transforms (pure batch → batch callables) ------------


class FlattenTensorDict:
    """RB write-path transform: flatten ``[B, T]`` batches to ``[B*T]``
    before storage (reference _keys.py:673).  Use as the collector postproc
    or wrap ``rb.extend``."""

    def __call__(self, batch: TDict) -> TDict:
        return batch.apply(lambda x: jnp.asarray(x).reshape(
            (-1,) + jnp.asarray(x).shape[2:]
        ))


class MultiStepTransform:
    """RB-side n-step return builder (reference rb_transforms.py:25) — the
    transform-form of :class:`rl_tpu.data.postprocs.MultiStep`, applied to
    time-major batches before they enter the buffer."""

    def __init__(self, n_steps: int, gamma: float):
        from rl_tpu.data.postprocs import MultiStep

        self._ms = MultiStep(gamma=gamma, n_steps=n_steps)
        self.n_steps = n_steps
        self.gamma = gamma

    def __call__(self, batch: TDict) -> TDict:
        return self._ms(batch)


class NextStateReconstructor:
    """Rebuild compacted ``("next", k)`` keys at sample time by shifting the
    flat batch (reference rb_transforms.py:230): ``next[k][i] = k[i+1]`` when
    ``i+1`` is in-batch and same-trajectory, else ``fill``."""

    def __init__(self, keys: Sequence = ("observation",),
                 traj_key=("collector", "traj_ids"), fill: float = jnp.nan):
        self.keys = list(keys)
        self.traj_key = traj_key
        self.fill = fill

    def __call__(self, batch: TDict) -> TDict:
        traj = jnp.asarray(batch[self.traj_key]) if self.traj_key in batch else None
        for k in self.keys:
            if k not in batch:
                continue
            x = jnp.asarray(batch[k])
            nxt = jnp.concatenate([x[1:], jnp.zeros_like(x[:1])], axis=0)
            if traj is not None:
                same = jnp.concatenate(
                    [traj[1:] == traj[:-1], jnp.zeros((1,), bool)], axis=0
                )
            else:
                same = jnp.concatenate(
                    [jnp.ones((x.shape[0] - 1,), bool), jnp.zeros((1,), bool)]
                )
            fill = jnp.full_like(nxt, self.fill) if jnp.issubdtype(
                nxt.dtype, jnp.floating
            ) else jnp.zeros_like(nxt)
            shape = same.shape + (1,) * (nxt.ndim - same.ndim)
            nxt = jnp.where(same.reshape(shape), nxt, fill)
            batch = batch.set(("next",) + ((k,) if isinstance(k, str) else tuple(k)), nxt)
        return batch


class PolicyAgeFilter:
    """Mask out items whose stamped policy version lags the live version by
    more than ``max_policy_lag`` (reference rb_transforms.py:466).  Returns
    the batch with a ``mask`` ANDed in (static shapes: dropping = masking)."""

    def __init__(self, current_version: int | Callable[[], int],
                 max_policy_lag: int, version_key=("collector", "policy_version")):
        self.current_version = current_version
        self.max_policy_lag = int(max_policy_lag)
        self.version_key = version_key

    def __call__(self, batch: TDict) -> TDict:
        if self.version_key not in batch:
            return batch
        cur = self.current_version() if callable(self.current_version) \
            else self.current_version
        v = jnp.asarray(batch[self.version_key])
        fresh = (cur - v) <= self.max_policy_lag
        if "mask" in batch:
            m = jnp.asarray(batch["mask"])
            fresh_b = jnp.broadcast_to(
                fresh.reshape(fresh.shape + (1,) * (m.ndim - fresh.ndim)), m.shape
            )
            return batch.set("mask", m & fresh_b)
        return batch.set("mask", fresh)

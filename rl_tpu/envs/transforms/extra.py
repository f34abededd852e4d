"""Additional transforms from the reference zoo.

Reference originals (``/root/reference/torchrl/envs/transforms/``):
``Reward2GoTransform`` _reward.py:637, ``TargetReturn`` :63, ``TimeMaxPool``
_misc.py:93, ``TrajCounter`` _env.py:2307, ``BurnInTransform`` _env.py:1651,
``RandomCropTensorDict`` _misc.py:277, ``FiniteTensorDictCheck`` _misc.py:55,
``ExpandAs`` _clip.py:168, ``SuccessReward`` _reward.py:997,
``LineariseRewards`` :881, ``NextObservationDelta`` _observation.py:1521.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from rl_tpu.data import Composite, TDict, Unbounded
from rl_tpu.objectives.value.functional import reward2go
from .base import Transform

__all__ = [
    "Reward2GoTransform",
    "TargetReturn",
    "TimeMaxPool",
    "TrajCounter",
    "BurnInTransform",
    "RandomCropTensorDict",
    "FiniteTensorDictCheck",
    "ExpandAs",
    "SuccessReward",
    "LineariseRewards",
    "NextObservationDelta",
]


class Reward2GoTransform:
    """Replay-buffer-side transform writing discounted reward-to-go
    (reference _reward.py:637).  Operates on time-first [T, ...] batches at
    WRITE time (inv), like the reference (it is an inverse-only transform)."""

    def __init__(self, gamma: float = 1.0, in_key=("next", "reward"),
                 out_key="reward_to_go"):
        self.gamma = float(gamma)
        self.in_key = in_key
        self.out_key = out_key

    def __call__(self, batch: TDict) -> TDict:
        r = jnp.asarray(batch[self.in_key], jnp.float32)
        done = jnp.asarray(batch["next", "done"])
        return batch.set(self.out_key, reward2go(r, done, self.gamma))


class TargetReturn(Transform):
    """Decision-Transformer style return conditioning (reference _reward.py:63):
    carry a target return that decreases by collected rewards ("reduce" mode)
    or stays constant."""
    row_stateful = True

    def __init__(self, target_return: float, mode: str = "reduce",
                 out_key: str = "target_return"):
        super().__init__()
        self.target_return = float(target_return)
        if mode not in ("reduce", "constant"):
            raise ValueError(f"mode must be reduce|constant, got {mode}")
        self.mode = mode
        self.out_key = out_key

    def reset(self, key, tstate, td):
        done = jnp.asarray(td["done"])
        tr = jnp.full(done.shape, self.target_return, jnp.float32)
        return TDict(tr=tr), td.set(self.out_key, tr)

    def step(self, tstate, next_td):
        tr = tstate["tr"]
        if self.mode == "reduce":
            tr = tr - jnp.asarray(next_td["reward"], jnp.float32)
        return TDict(tr=tr), next_td.set(self.out_key, tr)

    def transform_observation_spec(self, spec: Composite) -> Composite:
        spec[self.out_key] = Unbounded((1,), jnp.float32)
        return spec


class TimeMaxPool(Transform):
    """Max over the last T observations (reference _misc.py:93) — the classic
    Atari flicker-removal."""
    row_stateful = True

    def __init__(self, in_keys=("observation",), out_keys=None, T: int = 1):
        super().__init__(in_keys, out_keys)
        self.T = int(T)

    def reset(self, key, tstate, td):
        state = TDict()
        for kin, kout in zip(self.in_keys, self.out_keys):
            obs = jnp.asarray(td[kin])
            buf = jnp.broadcast_to(obs[None], (self.T,) + obs.shape)
            state = state.set(kout, buf)
            td = td.set(kout, buf.max(axis=0))
        return state, td

    def step(self, tstate, next_td):
        for kin, kout in zip(self.in_keys, self.out_keys):
            obs = jnp.asarray(next_td[kin])
            buf = jnp.roll(tstate[kout], -1, axis=0).at[-1].set(obs)
            tstate = tstate.set(kout, buf)
            next_td = next_td.set(kout, buf.max(axis=0))
        return tstate, next_td


class TrajCounter(Transform):
    """Global trajectory counter across resets (reference _env.py:2307)."""
    row_stateful = True

    def __init__(self, out_key: str = "traj_count"):
        super().__init__()
        self.out_key = out_key

    def reset(self, key, tstate, td):
        done = jnp.asarray(td["done"])
        if tstate is not None and "count" in tstate:
            count = tstate["count"] + 1
        else:
            count = jnp.zeros(done.shape, jnp.int32)
        return TDict(count=count), td.set(self.out_key, count)

    def step(self, tstate, next_td):
        return tstate, next_td.set(self.out_key, tstate["count"])

    def on_done(self, tstate_reset, tstate_stepped, done):
        from ..base import _where_done

        # finished elements advance their trajectory number
        return _where_done(
            done, TDict(count=tstate_stepped["count"] + 1), tstate_stepped
        )

    def transform_observation_spec(self, spec: Composite) -> Composite:
        spec[self.out_key] = Unbounded((1,), jnp.int32)
        return spec


class BurnInTransform:
    """Replay-side: run an RNN over the first ``burn_in`` steps to warm the
    recurrent state, then strip them (reference _env.py:1651)."""

    def __init__(self, rnn_module, params_getter, burn_in: int):
        self.rnn = rnn_module
        self.params_getter = params_getter
        self.burn_in = int(burn_in)

    def __call__(self, batch: TDict) -> TDict:
        from rl_tpu.modules.rnn import set_recurrent_mode

        burn = jax.tree.map(lambda x: x[: self.burn_in], batch)
        rest = jax.tree.map(lambda x: x[self.burn_in:], batch)
        params = self.params_getter()
        with set_recurrent_mode(True):
            out = self.rnn(params, burn)
        for n in self.rnn.state_names:
            rest = rest.set(
                (self.rnn.recurrent_key, n),
                jax.lax.stop_gradient(out["final", self.rnn.recurrent_key, n]),
            )
        return rest


class RandomCropTensorDict:
    """Replay-side: random fixed-length window along time (reference
    _misc.py:277)."""

    def __init__(self, sub_seq_len: int, seed: int = 0):
        self.sub_seq_len = int(sub_seq_len)
        self._key = jax.random.PRNGKey(seed)

    def __call__(self, batch: TDict) -> TDict:
        T = jnp.asarray(jax.tree.leaves(batch)[0]).shape[0]
        self._key, k = jax.random.split(self._key)
        start = int(jax.random.randint(k, (), 0, max(T - self.sub_seq_len + 1, 1)))
        return jax.tree.map(
            lambda x: jax.lax.dynamic_slice_in_dim(x, start, self.sub_seq_len, 0),
            batch,
        )


class FiniteTensorDictCheck(Transform):
    """NaN/inf guard (reference _misc.py:55).  Host-side check when data is
    concrete; inside jit it clamps non-finite values and counts them into
    ``nonfinite_count`` (raising is impossible under tracing)."""

    def step(self, tstate, next_td):
        count = jnp.zeros((), jnp.int32)
        out = next_td
        for k, v in next_td.items(include_nested=True, leaves_only=True):
            v = jnp.asarray(v)
            if jnp.issubdtype(v.dtype, jnp.floating):
                bad = ~jnp.isfinite(v)
                count = count + bad.sum().astype(jnp.int32)
                out = out.set(k, jnp.where(bad, jnp.zeros_like(v), v))
        return tstate, out.set("nonfinite_count", count)

    def reset(self, key, tstate, td):
        return TDict(), td.set("nonfinite_count", jnp.zeros((), jnp.int32))

    def transform_observation_spec(self, spec: Composite) -> Composite:
        spec["nonfinite_count"] = Unbounded((), jnp.int32)
        return spec


class ExpandAs(Transform):
    """Broadcast a key to another key's shape (reference _clip.py:168)."""

    def __init__(self, in_keys: Sequence, like_key, out_keys=None):
        super().__init__(in_keys, out_keys)
        self.like_key = like_key

    def _expand(self, td: TDict) -> TDict:
        target = jnp.asarray(td[self.like_key]).shape
        for kin, kout in zip(self.in_keys, self.out_keys):
            td = td.set(kout, jnp.broadcast_to(jnp.asarray(td[kin]), target))
        return td

    def reset(self, key, tstate, td):
        return TDict(), self._expand(td)

    def step(self, tstate, next_td):
        return tstate, self._expand(next_td)


class SuccessReward(Transform):
    """Flag success when the episode return exceeds a threshold
    (reference _reward.py:997)."""

    def __init__(self, threshold: float, reward_key=("reward",),
                 out_key: str = "success"):
        super().__init__()
        self.threshold = float(threshold)
        self.reward_key = reward_key[0] if isinstance(reward_key, tuple) else reward_key
        self.out_key = out_key

    def reset(self, key, tstate, td):
        done = jnp.asarray(td["done"])
        acc = jnp.zeros(done.shape, jnp.float32)
        return TDict(acc=acc), td.set(self.out_key, jnp.zeros(done.shape, jnp.bool_))

    def step(self, tstate, next_td):
        acc = tstate["acc"] + jnp.asarray(next_td[self.reward_key], jnp.float32)
        return TDict(acc=acc), next_td.set(self.out_key, acc >= self.threshold)

    def transform_observation_spec(self, spec: Composite) -> Composite:
        spec[self.out_key] = Unbounded((1,), jnp.bool_)
        return spec


class LineariseRewards(Transform):
    """Weighted sum of a multi-objective reward vector (reference _reward.py:881)."""

    def __init__(self, weights: Sequence[float], in_key="reward", out_key=None):
        super().__init__()
        self.weights = np.asarray(weights, np.float32)
        self.in_key = in_key
        self.out_key = out_key or in_key

    def step(self, tstate, next_td):
        r = jnp.asarray(next_td[self.in_key], jnp.float32)
        lin = jnp.sum(r * jnp.asarray(self.weights), axis=-1, keepdims=True)
        return tstate, next_td.set(self.out_key, lin)

    def transform_reward_spec(self, spec: Composite) -> Composite:
        if self.in_key in spec:
            spec[self.out_key] = Unbounded((1,), jnp.float32)
        return spec


class NextObservationDelta(Transform):
    """Write obs_{t+1} − obs_t (reference _observation.py:1521)."""

    def __init__(self, in_keys=("observation",), out_keys=None):
        out = out_keys or [f"{k}_delta" for k in in_keys]
        super().__init__(in_keys, out)

    def reset(self, key, tstate, td):
        state = TDict()
        for kin, kout in zip(self.in_keys, self.out_keys):
            obs = jnp.asarray(td[kin])
            state = state.set(kout, obs)
            td = td.set(kout, jnp.zeros_like(obs))
        return state, td

    def step(self, tstate, next_td):
        for kin, kout in zip(self.in_keys, self.out_keys):
            obs = jnp.asarray(next_td[kin])
            next_td = next_td.set(kout, obs - tstate[kout])
            tstate = tstate.set(kout, obs)
        return tstate, next_td

    def transform_observation_spec(self, spec: Composite) -> Composite:
        for kin, kout in zip(self.in_keys, self.out_keys):
            leaf = spec[kin]
            spec[kout] = Unbounded(leaf.shape, leaf.dtype)
        return spec

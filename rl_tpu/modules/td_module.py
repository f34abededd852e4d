"""TDict-aware module wrappers — the policy/value plumbing layer.

Functional counterparts of the reference tensordict_module layer
(``/root/reference/torchrl/modules/tensordict_module/``): ``Actor``
actors.py:36, ``ProbabilisticActor`` :146, ``ValueOperator`` :427,
``QValueModule`` :500, ``QValueActor`` :1108, ``ActorValueOperator`` :1415,
``TanhModule`` :2066; plus the exploration-type context
(``ExplorationType``/``set_exploration_type``, envs/utils.py:34).

A TDModule is ``(params, td, key) -> td``: reads ``in_keys``, writes
``out_keys``.  Parameters are explicit pytrees (flax params), never module
state — so the same wrapper works under jit/vmap/scan/pjit and "target
network update" is pytree arithmetic.
"""
from __future__ import annotations

import contextlib
from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp

from rl_tpu.data import TDict, NestedKey

__all__ = [
    "ExplorationType",
    "set_exploration_type",
    "exploration_type",
    "TDModule",
    "Seq",
    "NormalParamExtractor",
    "Actor",
    "ProbabilisticActor",
    "ValueOperator",
    "QValueModule",
    "QValueActor",
    "ActorValueOperator",
    "TanhModule",
]


class ExplorationType:
    RANDOM = "RANDOM"
    MODE = "MODE"
    MEAN = "MEAN"
    DETERMINISTIC = "DETERMINISTIC"


_EXPLORATION = [ExplorationType.RANDOM]


@contextlib.contextmanager
def set_exploration_type(etype: str):
    """Trace-time-static exploration mode (reference set_exploration_type)."""
    _EXPLORATION.append(etype)
    try:
        yield
    finally:
        _EXPLORATION.pop()


def exploration_type() -> str:
    return _EXPLORATION[-1]


def _as_tuple(x):
    return x if isinstance(x, (list, tuple)) else (x,)


class TDModule:
    """Wrap a flax module (or pure fn) with in/out key routing."""

    def __init__(self, module: Any, in_keys: Sequence[NestedKey], out_keys: Sequence[NestedKey]):
        self.module = module
        self.in_keys = list(in_keys)
        self.out_keys = list(out_keys)
        self._is_flax = hasattr(module, "init") and hasattr(module, "apply")

    def init(self, key, td: TDict):
        """Create parameters from example data."""
        if not self._is_flax:
            return TDict()
        ins = [jnp.asarray(td[k]) for k in self.in_keys]
        variables = self.module.init(key, *ins)
        return variables["params"]

    def _raw_call(self, params, *ins, key=None):
        if self._is_flax:
            rngs = {"noise": key} if key is not None else None
            if isinstance(params, TDict):
                # param trees are carried as TDicts (uniform pytree ops);
                # flax wants plain nested dicts at the apply boundary
                params = params.to_dict()
            return self.module.apply({"params": params}, *ins, rngs=rngs)
        return self.module(*ins)

    def __call__(self, params, td: TDict, key=None) -> TDict:
        ins = [jnp.asarray(td[k]) for k in self.in_keys]
        out = self._raw_call(params, *ins, key=key)
        out = _as_tuple(out) if not isinstance(out, jax.Array) else (out,)
        for k, v in zip(self.out_keys, out):
            td = td.set(k, v)
        return td

    def __repr__(self):
        return (
            f"{type(self).__name__}({type(self.module).__name__}, "
            f"in_keys={self.in_keys}, out_keys={self.out_keys})"
        )


class Seq:
    """Sequential composition of TDModules (reference SafeSequential,
    tensordict_module/sequence.py:15).  Params: TDict keyed by position or
    given names."""

    def __init__(self, *modules, names: Sequence[str] | None = None):
        self.modules = list(modules)
        self.names = list(names) if names else [str(i) for i in range(len(modules))]
        self.in_keys = list(
            dict.fromkeys(k for m in self.modules for k in m.in_keys)
        )
        self.out_keys = list(
            dict.fromkeys(k for m in self.modules for k in m.out_keys)
        )

    def init(self, key, td: TDict):
        params = TDict()
        keys = jax.random.split(key, len(self.modules))
        for name, m, k in zip(self.names, self.modules, keys):
            p = m.init(k, td)
            td = m(p, td, key=k)
            params = params.set(name, p)
        return params

    def __call__(self, params, td: TDict, key=None) -> TDict:
        keys = (
            jax.random.split(key, len(self.modules))
            if key is not None
            else [None] * len(self.modules)
        )
        for name, m, k in zip(self.names, self.modules, keys):
            td = m(params[name], td, key=k)
        return td

    def __getitem__(self, i):
        return self.modules[i]


class NormalParamExtractor:
    """Split a feature vector into (loc, scale) with positive scale mapping.

    Reference: tensordict's ``NormalParamExtractor`` as used throughout the
    reference model builders; ``biased_softplus_1.0`` default.
    """

    def __init__(self, scale_mapping: str = "biased_softplus_1.0", scale_lb: float = 1e-4):
        self.scale_lb = scale_lb
        if scale_mapping.startswith("biased_softplus_"):
            bias = float(scale_mapping.split("_")[-1])
            # softplus(x + inv_softplus(bias)) so scale starts at `bias`
            inv = jnp.log(jnp.expm1(bias))
            self.fn = lambda x: jax.nn.softplus(x + inv)
        elif scale_mapping == "exp":
            self.fn = jnp.exp
        elif scale_mapping == "softplus":
            self.fn = jax.nn.softplus
        else:
            raise ValueError(f"unknown scale_mapping {scale_mapping}")

    def __call__(self, x):
        loc, raw = jnp.split(x, 2, axis=-1)
        return loc, jnp.maximum(self.fn(raw), self.scale_lb)


class Actor(TDModule):
    """Deterministic actor: out_keys default to ["action"]
    (reference actors.py:36)."""

    def __init__(self, module, in_keys=("observation",), out_keys=("action",)):
        super().__init__(module, in_keys, out_keys)


class ProbabilisticActor:
    """Distribution-constructing policy (reference actors.py:146 +
    SafeProbabilisticModule probabilistic.py:33).

    ``module`` produces distribution parameters under ``dist_keys``; the
    actor builds ``dist_class(**params)``, samples according to the ambient
    exploration type, and writes ``action`` (+ ``sample_log_prob``).
    """

    def __init__(
        self,
        module,
        dist_class,
        dist_keys: Sequence[str] = ("loc", "scale"),
        dist_kwargs: dict | None = None,
        out_key: NestedKey = "action",
        log_prob_key: NestedKey = "sample_log_prob",
        return_log_prob: bool = True,
        default_interaction: str | None = None,
        safe_spec=None,
    ):
        self.module = module
        self.dist_class = dist_class
        self.dist_keys = list(dist_keys)
        self.dist_kwargs = dist_kwargs or {}
        self.out_key = out_key
        self.log_prob_key = log_prob_key
        self.return_log_prob = return_log_prob
        self.default_interaction = default_interaction
        self.safe_spec = safe_spec
        self.in_keys = module.in_keys
        self.out_keys = [out_key] + ([log_prob_key] if return_log_prob else [])

    def init(self, key, td: TDict):
        return self.module.init(key, td)

    def get_dist(self, params, td: TDict, key=None):
        td = self.module(params, td, key=key)
        kwargs = {k: td[k] for k in self.dist_keys}
        return self.dist_class(**kwargs, **self.dist_kwargs), td

    def __call__(self, params, td: TDict, key=None) -> TDict:
        k_mod, k_sample = (
            jax.random.split(key) if key is not None else (None, None)
        )
        dist, td = self.get_dist(params, td, key=k_mod)
        etype = self.default_interaction or exploration_type()
        action = dist.deterministic_sample(etype, key=k_sample)
        if self.safe_spec is not None:
            action = self.safe_spec.project(action)
        td = td.set(self.out_key, action)
        if self.return_log_prob:
            td = td.set(self.log_prob_key, dist.log_prob(action))
        return td

    def log_prob(self, params, td: TDict):
        """Recompute log-prob of the stored action (used by losses)."""
        dist, _ = self.get_dist(params, td)
        return dist.log_prob(td[self.out_key])


class ValueOperator(TDModule):
    """Value head writing ``state_value`` (reference actors.py:427)."""

    def __init__(self, module, in_keys=("observation",), out_keys=("state_value",)):
        super().__init__(module, in_keys, out_keys)


class QValueModule:
    """Argmax head for Q-value vectors (reference actors.py:500).

    Reads ``action_value`` [.., n_actions]; writes categorical ``action``
    and ``chosen_action_value``.
    """

    def __init__(
        self,
        action_value_key: NestedKey = "action_value",
        action_key: NestedKey = "action",
        one_hot: bool = False,
    ):
        self.action_value_key = action_value_key
        self.action_key = action_key
        self.one_hot = one_hot
        self.in_keys = [action_value_key]
        self.out_keys = [action_key, "chosen_action_value"]

    def init(self, key, td):
        return TDict()

    def __call__(self, params, td: TDict, key=None) -> TDict:
        q = jnp.asarray(td[self.action_value_key])
        idx = jnp.argmax(q, axis=-1)
        chosen = jnp.take_along_axis(q, idx[..., None], axis=-1)
        action = (
            jax.nn.one_hot(idx, q.shape[-1], dtype=jnp.bool_) if self.one_hot else idx.astype(jnp.int32)
        )
        return td.set(self.action_key, action).set("chosen_action_value", chosen)


class QValueActor(Seq):
    """net → QValueModule (reference actors.py:1108)."""

    def __init__(self, module, in_keys=("observation",), action_value_key="action_value",
                 one_hot: bool = False):
        net = TDModule(module, in_keys, [action_value_key])
        super().__init__(net, QValueModule(action_value_key, one_hot=one_hot),
                         names=["net", "qvalue"])


class ActorValueOperator:
    """Shared-trunk actor-critic (reference actors.py:1415).

    params: TDict(trunk=…, actor=…, value=…).  ``get_policy_operator`` /
    ``get_value_operator`` return callables reusing the same params tree.
    """

    def __init__(self, trunk: TDModule, actor, value: TDModule):
        self.trunk = trunk
        self.actor = actor
        self.value = value

    def init(self, key, td: TDict):
        k1, k2, k3 = jax.random.split(key, 3)
        p_trunk = self.trunk.init(k1, td)
        td_h = self.trunk(p_trunk, td)
        return TDict(trunk=p_trunk, actor=self.actor.init(k2, td_h),
                     value=self.value.init(k3, td_h))

    def __call__(self, params, td: TDict, key=None) -> TDict:
        td = self.trunk(params["trunk"], td)
        td = self.actor(params["actor"], td, key=key)
        td = self.value(params["value"], td)
        return td

    def get_policy_operator(self):
        trunk, actor = self.trunk, self.actor

        def fn(params, td, key=None):
            td = trunk(params["trunk"], td)
            return actor(params["actor"], td, key=key)

        fn.in_keys = trunk.in_keys
        fn.out_keys = actor.out_keys
        return fn

    def get_value_operator(self):
        trunk, value = self.trunk, self.value

        def fn(params, td, key=None):
            td = trunk(params["trunk"], td)
            return value(params["value"], td)

        fn.in_keys = trunk.in_keys
        fn.out_keys = value.out_keys
        return fn

    def policy_call(self, params, td, key=None):
        td = self.trunk(params["trunk"], td)
        return self.actor(params["actor"], td, key=key)

    def value_call(self, params, td, key=None):
        td = self.trunk(params["trunk"], td)
        return self.value(params["value"], td)

    def get_dist(self, params, td, key=None):
        """Distribution through the shared trunk (for shared-params losses:
        PPOLoss(..., shared_params=True))."""
        td = self.trunk(params["trunk"], td)
        return self.actor.get_dist(params["actor"], td, key=key)

    @property
    def out_key(self):
        return getattr(self.actor, "out_key", "action")


class TanhModule:
    """Map an unbounded key into bounds via tanh (reference actors.py:2066)."""

    def __init__(self, in_keys=("action",), out_keys=None, low=-1.0, high=1.0):
        self.in_keys = list(in_keys)
        self.out_keys = list(out_keys or in_keys)
        self.low = low
        self.high = high

    def init(self, key, td):
        return TDict()

    def __call__(self, params, td: TDict, key=None) -> TDict:
        for kin, kout in zip(self.in_keys, self.out_keys):
            x = jnp.tanh(jnp.asarray(td[kin]))
            td = td.set(kout, self.low + (x + 1.0) * 0.5 * (self.high - self.low))
        return td

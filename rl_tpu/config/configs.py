"""Structured config dataclass library — declarative component graph.

Counterpart of the reference's hydra ConfigStore registry
(``/root/reference/torchrl/trainers/algorithms/configs/`` — ~230 explicit
``@dataclass`` configs across envs/transforms/modules/data/collectors/
objectives/trainers/logging/weight_update, rooted at ``Config``
configs/common.py:31).  The load-bearing property is identical: **a YAML
file fully specifies the component graph** and every config carries a
``_target_`` that `rl_tpu.config.instantiate` resolves recursively.

Rather than hand-copying ~230 dataclasses, configs here are *derived from
the constructors they target* (`auto_config`): each public component class
gets a dataclass whose fields mirror its ``__init__`` signature, registered
as ``<ClassName>Config``.  This keeps the config library bit-for-bit in sync
with the code — the reference's configs drift from their targets and need a
test matrix to police it (test_configs.py); deriving them makes that class
of bug impossible.  Curated root configs (``Config``, trainer configs) are
explicit, like the reference's.

Usage::

    from rl_tpu.config import instantiate, load_yaml, list_configs
    cfg = load_yaml("ppo.yaml")          # {'trainer': {'_target_': 'PPOTrainerConfig'-style dict ...}}
    trainer = instantiate(cfg["trainer"])
"""
from __future__ import annotations

import dataclasses
import inspect
from typing import Any

from .registry import ConfigBase, _REGISTRY, register_config

__all__ = ["auto_config", "list_configs", "Config", "TrainerEntryConfig"]


def _fields_from_init(cls) -> tuple[list, list]:
    """Split ``cls.__init__`` params into (required, defaulted) field specs."""
    required, defaulted = [], []
    try:
        sig = inspect.signature(cls.__init__)
    except (TypeError, ValueError):
        return [], []
    for name, p in sig.parameters.items():
        if name == "self" or p.kind in (p.VAR_POSITIONAL, p.VAR_KEYWORD):
            continue
        if p.default is inspect.Parameter.empty:
            required.append((name, Any))
        else:
            default = p.default
            # mutable defaults need a factory under dataclass rules
            if isinstance(default, (list, dict, set)) or (
                isinstance(default, tuple) and default
            ):
                defaulted.append(
                    (name, Any, dataclasses.field(default_factory=lambda d=default: d))
                )
            else:
                defaulted.append((name, Any, default))
    return required, defaulted


def auto_config(cls, name: str | None = None) -> type | None:
    """Derive and register a ``<ClassName>Config`` dataclass for ``cls``.

    The dataclass fields mirror the constructor signature; the class carries
    ``_target_`` = the dotted import path so ``instantiate()`` round-trips.
    Returns None for classes whose signature can't be introspected.
    """
    cfg_name = name or f"{cls.__name__}Config"
    if cfg_name in _REGISTRY:
        return _REGISTRY[cfg_name]
    required, defaulted = _fields_from_init(cls)
    target = f"{cls.__module__}.{cls.__qualname__}"
    try:
        cfg_cls = dataclasses.make_dataclass(
            cfg_name,
            required + defaulted,
            bases=(ConfigBase,),
            namespace={"_target_": target},
        )
    except (TypeError, ValueError):
        return None
    _REGISTRY[cfg_name] = cfg_cls
    # the target class itself is addressable by bare name too (YAML brevity)
    _REGISTRY.setdefault(cls.__name__, cls)
    return cfg_cls


def _harvest(module, names: list[str] | None = None) -> int:
    """Register auto-configs for every public class exported by ``module``."""
    count = 0
    for attr in names if names is not None else getattr(
        module, "__all__", [n for n in vars(module) if not n.startswith("_")]
    ):
        obj = getattr(module, attr, None)
        if (
            inspect.isclass(obj)
            and getattr(obj, "__module__", "").startswith("rl_tpu")
            and auto_config(obj) is not None
        ):
            count += 1
    return count


def register_all() -> int:
    """Harvest configs across the whole framework (idempotent).

    Mirrors the reference's per-category config modules: envs, transforms,
    modules, data (storages/samplers/writers/buffers), collectors,
    objectives + value estimators, trainers, logging, weight sync.
    """
    import rl_tpu.collectors as _collectors
    import rl_tpu.data as _data
    import rl_tpu.data.replay as _replay
    import rl_tpu.envs as _envs
    import rl_tpu.envs.transforms as _transforms
    import rl_tpu.modules as _modules
    import rl_tpu.objectives as _objectives
    import rl_tpu.objectives.value as _value
    import rl_tpu.record as _record
    import rl_tpu.trainers as _trainers
    import rl_tpu.weight_update as _wu

    n = 0
    for mod in (_envs, _transforms, _modules, _objectives, _value, _replay,
                _data, _collectors, _trainers, _record, _wu):
        n += _harvest(mod)
    return n


@register_config("TrainerEntryConfig")
@dataclasses.dataclass
class TrainerEntryConfig(ConfigBase):
    """One trainer invocation: which trainer, its kwargs, run controls."""

    trainer: Any = None          # nested _target_ dict or config dataclass
    seed: int = 0
    total_frames: int | None = None


@register_config("Config")
@dataclasses.dataclass
class Config(ConfigBase):
    """Root config (reference configs/common.py:31 ``Config``).

    Every section is a nested ``_target_`` mapping; ``instantiate`` builds
    the full graph.  Sections mirror the reference's ConfigStore groups.
    """

    env: Any = None
    policy: Any = None
    critic: Any = None
    data: Any = None           # replay buffer graph
    collector: Any = None
    objective: Any = None
    trainer: Any = None
    logger: Any = None
    weight_sync: Any = None
    seed: int = 0


def list_configs() -> list[str]:
    register_all()
    return sorted(k for k in _REGISTRY if k.endswith("Config"))

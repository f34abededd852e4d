"""Declarative config system — YAML fully determines the component graph.

Counterpart of the reference hydra/ConfigStore registry
(``/root/reference/torchrl/trainers/algorithms/configs/`` — ~230
``@dataclass`` configs with ``_target_``-based instantiation; ``ConfigBase``
configs/common.py:18).  Hydra isn't available in this image, so this is a
small self-contained equivalent with the same load-bearing properties:

* every config dict may carry ``_target_`` (dotted path or registered name)
  and is instantiated recursively;
* YAML + dotted CLI overrides (``a.b.c=value``) reproduce the reference's
  script-facing surface;
* dataclass configs register by name for discoverability.
"""
from __future__ import annotations

import dataclasses
import importlib
from typing import Any, Callable

__all__ = ["ConfigBase", "register_config", "get_config_cls", "instantiate",
           "load_yaml", "apply_overrides", "to_dict"]

_REGISTRY: dict[str, type] = {}


@dataclasses.dataclass
class ConfigBase:
    """Base for structured configs (reference configs/common.py:18)."""

    def to_dict(self) -> dict:
        return to_dict(self)


def register_config(name: str) -> Callable[[type], type]:
    def deco(cls):
        _REGISTRY[name] = cls
        return cls

    return deco


def get_config_cls(name: str) -> type:
    return _REGISTRY[name]


def _resolve_target(target: str):
    if target in _REGISTRY:
        return _REGISTRY[target]
    module, _, attr = target.rpartition(".")
    return getattr(importlib.import_module(module), attr)


def instantiate(cfg: Any, **extra):
    """Recursively build objects from configs.

    dicts with ``_target_`` become objects; nested dicts/lists are
    instantiated first; dataclass configs convert via ``to_dict``.
    ``_partial_: true`` returns a constructor instead of an instance;
    ``_args_: [...]`` passes positionals (both hydra-compatible — needed
    for var-positional constructors like ``Seq(*modules)``).
    """
    if dataclasses.is_dataclass(cfg) and not isinstance(cfg, type):
        cfg = to_dict(cfg)
    if isinstance(cfg, dict):
        inner = {k: instantiate(v) for k, v in cfg.items() if not k.startswith("_")}
        if "_target_" in cfg:
            target = _resolve_target(cfg["_target_"])
            args = [instantiate(v) for v in cfg.get("_args_", ())]
            inner.update(extra)
            if cfg.get("_partial_"):
                import functools

                return functools.partial(target, *args, **inner)
            return target(*args, **inner)
        return inner
    if isinstance(cfg, (list, tuple)):
        return type(cfg)(instantiate(v) for v in cfg)
    return cfg


def to_dict(cfg: Any) -> Any:
    if dataclasses.is_dataclass(cfg) and not isinstance(cfg, type):
        out = {}
        t = getattr(cfg, "_target_", None)
        if t:
            out["_target_"] = t
        for f in dataclasses.fields(cfg):
            out[f.name] = to_dict(getattr(cfg, f.name))
        return out
    if isinstance(cfg, dict):
        return {k: to_dict(v) for k, v in cfg.items()}
    if isinstance(cfg, (list, tuple)):
        return [to_dict(v) for v in cfg]
    return cfg


def load_yaml(path_or_str: str) -> dict:
    import os

    import yaml

    if os.path.exists(path_or_str):
        with open(path_or_str) as f:
            return yaml.safe_load(f)
    return yaml.safe_load(path_or_str)


def apply_overrides(cfg: dict, overrides: list[str]) -> dict:
    """Apply ``a.b.c=value`` dotted overrides (hydra CLI parity)."""
    import copy

    import yaml

    out = copy.deepcopy(cfg)
    for ov in overrides:
        path, _, raw = ov.partition("=")
        value = yaml.safe_load(raw)
        if isinstance(value, str):
            # YAML 1.1 misses bare scientific notation like "1e-4"
            try:
                value = int(value)
            except ValueError:
                try:
                    value = float(value)
                except ValueError:
                    pass
        node = out
        parts = path.split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value
    return out

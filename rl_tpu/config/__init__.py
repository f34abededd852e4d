from .registry import (
    ConfigBase,
    register_config,
    get_config_cls,
    instantiate,
    load_yaml,
    apply_overrides,
    to_dict,
)

__all__ = [
    "ConfigBase",
    "register_config",
    "get_config_cls",
    "instantiate",
    "load_yaml",
    "apply_overrides",
    "to_dict",
]

from .registry import (
    ConfigBase,
    register_config,
    get_config_cls,
    instantiate,
    load_yaml,
    apply_overrides,
    to_dict,
)
from .configs import (
    Config,
    TrainerEntryConfig,
    auto_config,
    list_configs,
    register_all,
)

__all__ = [
    "ConfigBase",
    "register_config",
    "get_config_cls",
    "instantiate",
    "load_yaml",
    "apply_overrides",
    "to_dict",
    "Config",
    "TrainerEntryConfig",
    "auto_config",
    "list_configs",
    "register_all",
]

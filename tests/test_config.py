"""Config registry: YAML -> component-graph instantiation with overrides."""
import dataclasses

import jax.numpy as jnp
import pytest

from rl_tpu.config import (
    ConfigBase,
    apply_overrides,
    get_config_cls,
    instantiate,
    load_yaml,
    register_config,
    to_dict,
)


class TestInstantiate:
    def test_dotted_target(self):
        cfg = {"_target_": "rl_tpu.envs.classic.pendulum.PendulumEnv",
               "max_episode_steps": 50}
        env = instantiate(cfg)
        assert env.max_episode_steps == 50

    def test_nested_instantiation(self):
        cfg = {
            "_target_": "rl_tpu.envs.batched.BatchedEnv",
            "env": {"_target_": "rl_tpu.envs.classic.cartpole.CartPoleEnv"},
            "num_envs": 3,
        }
        env = instantiate(cfg)
        assert env.num_envs == 3
        assert type(env.env).__name__ == "CartPoleEnv"

    def test_partial(self):
        cfg = {"_target_": "rl_tpu.envs.classic.pendulum.PendulumEnv",
               "_partial_": True}
        ctor = instantiate(cfg)
        assert ctor().max_episode_steps == 200

    def test_registered_name(self):
        @register_config("my_test_env")
        class Dummy:
            def __init__(self, x=1):
                self.x = x

        obj = instantiate({"_target_": "my_test_env", "x": 7})
        assert obj.x == 7
        assert get_config_cls("my_test_env") is Dummy


class TestYamlAndOverrides:
    YAML = """
env:
  _target_: rl_tpu.envs.batched.BatchedEnv
  env:
    _target_: rl_tpu.envs.classic.pendulum.PendulumEnv
    max_episode_steps: 100
  num_envs: 4
optim:
  lr: 0.0003
"""

    def test_full_pipeline(self):
        cfg = load_yaml(self.YAML)
        cfg = apply_overrides(cfg, ["env.num_envs=8", "optim.lr=1e-4"])
        assert cfg["env"]["num_envs"] == 8
        assert cfg["optim"]["lr"] == 1e-4
        env = instantiate(cfg["env"])
        assert env.num_envs == 8
        assert env.env.max_episode_steps == 100

    def test_override_creates_missing(self):
        cfg = apply_overrides({}, ["a.b=3"])
        assert cfg == {"a": {"b": 3}}


class TestDataclassConfigs:
    def test_dataclass_roundtrip(self):
        @dataclasses.dataclass
        class EnvConfig(ConfigBase):
            _target_: str = "rl_tpu.envs.classic.pendulum.PendulumEnv"
            max_episode_steps: int = 123

        env = instantiate(EnvConfig())
        assert env.max_episode_steps == 123
        d = to_dict(EnvConfig())
        assert d["_target_"].endswith("PendulumEnv")

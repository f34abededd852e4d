from .gym import GymEnv, HostEnvPool
from .spaces import gym_space_to_spec, dm_spec_to_spec

__all__ = ["GymEnv", "HostEnvPool", "gym_space_to_spec", "dm_spec_to_spec"]

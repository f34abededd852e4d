from .cartpole import CartPoleEnv
from .pendulum import PendulumEnv
from .mountain_car import MountainCarEnv, ContinuousMountainCarEnv
from .acrobot import AcrobotEnv
from .reacher import ReacherEnv

__all__ = [
    "CartPoleEnv",
    "PendulumEnv",
    "MountainCarEnv",
    "ContinuousMountainCarEnv",
    "AcrobotEnv",
    "ReacherEnv",
]

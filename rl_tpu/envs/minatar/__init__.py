from .breakout import BreakoutEnv
from .space_invaders import SpaceInvadersEnv

__all__ = ["BreakoutEnv", "SpaceInvadersEnv"]

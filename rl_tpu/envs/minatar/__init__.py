from .breakout import BreakoutEnv

__all__ = ["BreakoutEnv"]

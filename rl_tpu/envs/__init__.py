from .base import Env, step_mdp, check_env_specs, EnvMetaData
from .batched import BatchedEnv, SerialEnv, ParallelEnv
from .classic import (
    CartPoleEnv,
    PendulumEnv,
    MountainCarEnv,
    ContinuousMountainCarEnv,
    ReacherEnv,
)
from .wrappers import FrameSkipEnv, NoopResetEnv
from .env_creator import EnvCreator, env_creator
from .async_pool import AsyncEnvPool, ThreadingAsyncEnvPool, ProcessAsyncEnvPool
from . import transforms
from .transforms import Transform, Compose, TransformedEnv
from .custom import (TicTacToeEnv, FinancialRegimeEnv, TradingEnv, LLMHashingEnv,
                     ChessEnv, ToyVLAEnv, MultiAgentNavEnv)
from .minatar import BreakoutEnv
from .model_based import ModelBasedEnv, WorldModelEnv, ImaginedEnv, DreamerEnv
from .marl import MarlGroupMapType, check_marl_grouping
from . import libs

__all__ = [
    "Env",
    "step_mdp",
    "check_env_specs",
    "EnvMetaData",
    "BatchedEnv",
    "SerialEnv",
    "ParallelEnv",
    "CartPoleEnv",
    "PendulumEnv",
    "MountainCarEnv",
    "ReacherEnv",
    "ContinuousMountainCarEnv",
    "FrameSkipEnv",
    "NoopResetEnv",
    "EnvCreator",
    "env_creator",
    "AsyncEnvPool",
    "ThreadingAsyncEnvPool",
    "ProcessAsyncEnvPool",
    "transforms",
    "Transform",
    "Compose",
    "TransformedEnv",
    "BreakoutEnv",
    "libs",
]

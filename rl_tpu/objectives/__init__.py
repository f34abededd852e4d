from .common import (
    LossModule,
    SoftUpdate,
    HardUpdate,
    make_target_params,
    stack_params,
    hold_out,
    distance_loss,
)
from .ppo import PPOLoss, ClipPPOLoss, KLPENPPOLoss
from .dqn import DQNLoss, DistributionalDQNLoss
from .sac import SACLoss, DiscreteSACLoss
from .ddpg import DDPGLoss
from .td3 import TD3Loss
from .value.advantages import (
    ValueEstimatorBase,
    TD0Estimator,
    TD1Estimator,
    TDLambdaEstimator,
    GAE,
    VTrace,
)
from .value import functional

__all__ = [
    "LossModule",
    "SoftUpdate",
    "HardUpdate",
    "make_target_params",
    "stack_params",
    "hold_out",
    "distance_loss",
    "PPOLoss",
    "ClipPPOLoss",
    "KLPENPPOLoss",
    "DQNLoss",
    "DistributionalDQNLoss",
    "SACLoss",
    "DiscreteSACLoss",
    "DDPGLoss",
    "TD3Loss",
    "ValueEstimatorBase",
    "TD0Estimator",
    "TD1Estimator",
    "TDLambdaEstimator",
    "GAE",
    "VTrace",
    "functional",
]

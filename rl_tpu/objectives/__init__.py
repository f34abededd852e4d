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
    "ValueEstimatorBase",
    "TD0Estimator",
    "TD1Estimator",
    "TDLambdaEstimator",
    "GAE",
    "VTrace",
    "functional",
]

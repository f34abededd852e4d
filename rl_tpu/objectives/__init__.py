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
from .rnd import RNDLoss
from .dqn import DQNLoss, DistributionalDQNLoss
from .sac import SACLoss, DiscreteSACLoss
from .ddpg import DDPGLoss
from .td3 import TD3Loss
from .a2c import A2CLoss, ReinforceLoss
from .iql import IQLLoss, DiscreteIQLLoss, expectile_loss
from .cql import CQLLoss, DiscreteCQLLoss
from .td3_bc import TD3BCLoss
from .redq import REDQLoss
from .crossq import CrossQLoss
from .bc import BCLoss, GAILLoss
from .act import ACTLoss
from .diffusion_bc import DiffusionBCLoss
from .pilco import ExponentialQuadraticCost, PILCOLoss
from .dreamer import DreamerModelLoss, DreamerActorLoss, DreamerValueLoss
from .world_model import WorldModelLoss
from .multiagent import QMixerLoss, MAPPOLoss, IPPOLoss
from .dreamer_v3 import (
    DreamerV3ModelLoss,
    DreamerV3ActorLoss,
    DreamerV3ValueLoss,
    symlog,
    symexp,
    two_hot_encode,
    two_hot_decode,
    categorical_kl_balanced,
)
from .value.advantages import (
    ValueEstimatorBase,
    TD0Estimator,
    TD1Estimator,
    TDLambdaEstimator,
    GAE,
    MultiAgentGAE,
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
    "A2CLoss",
    "ReinforceLoss",
    "IQLLoss",
    "DiscreteIQLLoss",
    "expectile_loss",
    "CQLLoss",
    "DiscreteCQLLoss",
    "TD3BCLoss",
    "REDQLoss",
    "CrossQLoss",
    "BCLoss",
    "GAILLoss",
    "ACTLoss",
    "DiffusionBCLoss",
    "ExponentialQuadraticCost",
    "PILCOLoss",
    "ValueEstimatorBase",
    "TD0Estimator",
    "TD1Estimator",
    "TDLambdaEstimator",
    "GAE",
    "MultiAgentGAE",
    "VTrace",
    "functional",
    "RNDLoss",
    "DreamerModelLoss",
    "WorldModelLoss",
    "QMixerLoss",
    "MAPPOLoss",
    "IPPOLoss",
    "DreamerActorLoss",
    "DreamerValueLoss",
    "DreamerV3ModelLoss",
    "DreamerV3ActorLoss",
    "DreamerV3ValueLoss",
    "symlog",
    "symexp",
    "two_hot_encode",
    "two_hot_decode",
    "categorical_kl_balanced",
]

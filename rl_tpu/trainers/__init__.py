from .trainer import (
    Trainer,
    ReplayBufferTrainer,
    BatchSubSampler,
    LogScalar,
    CountFramesLog,
    TargetNetUpdaterHook,
    ValueEstimatorHook,
    RewardNormalizer,
    UpdateWeights,
    EarlyStopping,
    SelectKeys,
)
from .algos import PPOTrainer, SACTrainer, DQNTrainer

__all__ = [
    "Trainer",
    "ReplayBufferTrainer",
    "BatchSubSampler",
    "LogScalar",
    "CountFramesLog",
    "TargetNetUpdaterHook",
    "ValueEstimatorHook",
    "RewardNormalizer",
    "UpdateWeights",
    "EarlyStopping",
    "SelectKeys",
    "PPOTrainer",
    "SACTrainer",
    "DQNTrainer",
]

from . import functional
from .advantages import (
    ValueEstimatorBase,
    TD0Estimator,
    TD1Estimator,
    TDLambdaEstimator,
    GAE,
    VTrace,
)

__all__ = [
    "functional",
    "ValueEstimatorBase",
    "TD0Estimator",
    "TD1Estimator",
    "TDLambdaEstimator",
    "GAE",
    "VTrace",
]

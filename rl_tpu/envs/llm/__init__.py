from .chat import ChatEnv, DatasetChatEnv
from .envs import LLMEnv
from .reward import GSM8KRewardScorer, IFEvalScorer, extract_gsm8k_answer
from .transforms import (
    KLRewardTransform,
    RetrieveKL,
    PolicyVersion,
    PythonInterpreterTransform,
    BrowserTransform,
)

__all__ = [
    "ChatEnv",
    "DatasetChatEnv",
    "LLMEnv",
    "GSM8KRewardScorer",
    "IFEvalScorer",
    "extract_gsm8k_answer",
    "KLRewardTransform",
    "RetrieveKL",
    "PolicyVersion",
    "PythonInterpreterTransform",
    "BrowserTransform",
]

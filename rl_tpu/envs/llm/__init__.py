from .chat import ChatEnv, DatasetChatEnv
from .envs import LLMEnv
from .reward import (
    CountdownScorer,
    GSM8KRewardScorer,
    IFEvalScorer,
    MathScorer,
    extract_gsm8k_answer,
    extract_tags,
)
from .datasets import (
    CountdownEnv,
    CountdownProblemGenerator,
    GSM8KEnv,
    IFEvalEnv,
    MATHEnv,
    load_jsonl,
)
from .transforms import (
    AddThinkingPrompt,
    BrowserTransform,
    DataLoadingPrimer,
    KLRewardTransform,
    PolicyVersion,
    PythonInterpreterTransform,
    RetrieveKL,
    TemplateTransform,
    ToolTransform,
)

__all__ = [
    "ChatEnv",
    "DatasetChatEnv",
    "LLMEnv",
    "CountdownScorer",
    "GSM8KRewardScorer",
    "IFEvalScorer",
    "MathScorer",
    "extract_gsm8k_answer",
    "extract_tags",
    "CountdownEnv",
    "CountdownProblemGenerator",
    "GSM8KEnv",
    "IFEvalEnv",
    "MATHEnv",
    "load_jsonl",
    "AddThinkingPrompt",
    "BrowserTransform",
    "DataLoadingPrimer",
    "KLRewardTransform",
    "PolicyVersion",
    "PythonInterpreterTransform",
    "RetrieveKL",
    "TemplateTransform",
    "ToolTransform",
]

from .tictactoe import TicTacToeEnv
from .trading import FinancialRegimeEnv, TradingEnv
from .llm_hashing import LLMHashingEnv
from .chess import ChessEnv
from .vla import ToyVLAEnv
from .marl import MultiAgentNavEnv

__all__ = ["TicTacToeEnv", "FinancialRegimeEnv", "TradingEnv", "LLMHashingEnv", "ChessEnv", "ToyVLAEnv", "MultiAgentNavEnv"]

"""Chess env (host-side, requires the ``chess`` package).

Counterpart of ``/root/reference/torchrl/envs/custom/chess.py``
(``ChessEnv``): full-rules chess driven by the ``python-chess`` library,
exposing FEN strings, SAN move indices over a fixed move vocabulary, legal
action masks and win/loss rewards.  Chess move generation is irreducibly
host logic — like the reference, this wraps the library rather than
reimplementing the rules; it is a host env (use the host-bridge collector
path, not ``lax.scan``).

The ``chess`` package is not installed in this image — constructing the
env raises ImportError with guidance (the reference has the same hard
dependency, chess.py top-of-file import).
"""
from __future__ import annotations

import numpy as np

__all__ = ["ChessEnv"]

try:  # pragma: no cover - exercised only when python-chess is installed
    import chess as _chess
except ImportError:  # pragma: no cover
    _chess = None


class ChessEnv:
    """Host-side chess env over ``python-chess`` (reference custom/chess.py).

    Observations: ``fen`` (string), ``turn`` (bool, True=white),
    ``legal_mask`` over the from-square×to-square×promotion move encoding;
    reward +1/-1 on checkmate from white's perspective, 0 otherwise;
    draws terminate with 0.
    """

    # 64 from-squares × 64 to-squares (promotions fold into queen=default)
    N_ACTIONS = 64 * 64

    def __init__(self, *, include_san: bool = False):
        if _chess is None:
            raise ImportError(
                "ChessEnv requires the 'chess' package (python-chess), "
                "which is not installed in this environment. Install it to "
                "use chess, or use TicTacToeEnv for a built-in board game."
            )
        self.include_san = include_san
        self.board = _chess.Board()

    # -- host env protocol (gym-like; bridge via envs/libs adapters) -------
    def reset(self):
        self.board.reset()
        return self._obs()

    def _obs(self):
        mask = np.zeros(self.N_ACTIONS, dtype=bool)
        for mv in self.board.legal_moves:
            mask[mv.from_square * 64 + mv.to_square] = True
        out = {
            "fen": self.board.fen(),
            "turn": self.board.turn,
            "legal_mask": mask,
        }
        if self.include_san:
            out["san"] = [self.board.san(m) for m in self.board.legal_moves]
        return out

    def step(self, action: int):
        frm, to = divmod(int(action), 64)
        move = _chess.Move(frm, to)
        if move not in self.board.legal_moves:
            # try queen promotion (the folded encoding)
            move = _chess.Move(frm, to, promotion=_chess.QUEEN)
        if move not in self.board.legal_moves:
            raise ValueError(f"illegal move {action}")
        self.board.push(move)
        terminated = self.board.is_game_over()
        reward = 0.0
        if self.board.is_checkmate():
            # side to move is checkmated; reward from white's perspective
            reward = -1.0 if self.board.turn else 1.0
        return self._obs(), reward, terminated, False, {}

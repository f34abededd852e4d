"""Tic-tac-toe as a pure-JAX turn-based env.

Counterpart of ``/root/reference/torchrl/envs/custom/tictactoeenv.py``
(``TicTacToeEnv`` :13): board [3,3], ``turn`` [1], action mask [9]; invalid
moves leave the board unchanged and do not flip the turn (same contract).

Deviation (documented): the reference exposes per-player nested rewards
``("player0","reward")``/``("player1","reward")``; here a single zero-sum
``reward`` from player 0's perspective plus the ``turn`` key carries the
same information under the framework's single-reward convention.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from rl_tpu.data import Binary, Categorical, Composite, TDict, Unbounded
from ..base import Env

__all__ = ["TicTacToeEnv"]

# the 8 winning lines as indices into the flattened board
_LINES = jnp.array([
    [0, 1, 2], [3, 4, 5], [6, 7, 8],     # rows
    [0, 3, 6], [1, 4, 7], [2, 5, 8],     # cols
    [0, 4, 8], [2, 4, 6],                # diagonals
])


class TicTacToeEnv(Env):
    """Two-player tic-tac-toe; ``single_player=True`` makes player 1 play
    uniformly at random over legal moves (reference tictactoeenv.py:17)."""

    def __init__(self, single_player: bool = False):
        self.single_player = single_player

    @property
    def observation_spec(self) -> Composite:
        return Composite(
            board=Categorical(3, (3, 3), jnp.int32),   # 0 empty, 1 p0, 2 p1
            turn=Categorical(2, (1,), jnp.int32),
            mask=Binary(shape=(9,)),
        )

    def _action_spec(self):
        return Categorical(9, (), jnp.int32)

    def _reset(self, key):
        board = jnp.zeros((9,), jnp.int32)
        state = TDict(board=board, turn=jnp.zeros((1,), jnp.int32))
        return state, TDict(
            board=board.reshape(3, 3),
            turn=state["turn"],
            mask=jnp.ones((9,), bool),
        )

    @staticmethod
    def _winner(board):
        """0 = none, 1 = player0, 2 = player1."""
        lines = board[_LINES]  # [8, 3]
        p0 = jnp.any(jnp.all(lines == 1, -1))
        p1 = jnp.any(jnp.all(lines == 2, -1))
        return jnp.where(p0, 1, jnp.where(p1, 2, 0)).astype(jnp.int32)

    def _step(self, state, td, key):
        board = state["board"]
        turn = state["turn"][0]
        action = jnp.asarray(td["action"], jnp.int32).reshape(())

        if self.single_player:
            # player 1 moves are random over legal cells
            mask = board == 0
            logits = jnp.where(mask, 0.0, -1e9)
            rand_a = jax.random.categorical(key, logits)
            action = jnp.where(turn == 1, rand_a, action)

        valid = board[action] == 0
        mark = turn + 1
        new_board = jnp.where(
            valid, board.at[action].set(mark), board
        )
        winner = self._winner(new_board)
        full = jnp.all(new_board != 0)
        terminated = (winner != 0) | full
        # invalid moves don't flip the turn (reference contract)
        new_turn = jnp.where(valid & ~terminated, 1 - turn, turn)
        reward = jnp.where(
            winner == 1, 1.0, jnp.where(winner == 2, -1.0, 0.0)
        ).reshape(1)
        new_state = TDict(
            board=new_board, turn=new_turn.reshape(1)
        )
        return new_state, TDict(
            board=new_board.reshape(3, 3),
            turn=new_state["turn"],
            mask=new_board == 0,
            reward=reward.astype(jnp.float32),
            terminated=terminated.reshape(1),
            truncated=jnp.zeros((1,), bool),
        )

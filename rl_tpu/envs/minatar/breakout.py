"""Breakout — native on-device pixel env (MinAtar-style 10×10 grid).

Fills the reference's Atari pixel-env role (consumed there via gym/envpool
wrappers, libs/gym.py) with a fully jittable implementation so the conv
pipeline runs end-to-end on TPU with zero host traffic.  Game rules follow
the public MinAtar Breakout description (Young & Tian 2019): 3 brick rows,
diagonal ball, paddle on the bottom row, +1 per brick, episode ends when the
ball passes the paddle; bricks respawn when cleared.

Observation: ``pixels`` [10, 10, 4] float32 channels
(paddle, ball, trail, bricks).  Actions: 0 = noop, 1 = left, 2 = right.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from rl_tpu.data import Bounded, Categorical, Composite, TDict
from ..base import Env

__all__ = ["BreakoutEnv"]

N = 10  # grid size
BRICK_ROWS = (1, 2, 3)


class BreakoutEnv(Env):
    def __init__(self, max_episode_steps: int = 1000):
        self.max_episode_steps = int(max_episode_steps)

    @property
    def observation_spec(self) -> Composite:
        return Composite(pixels=Bounded(0.0, 1.0, (N, N, 4), jnp.float32))

    def _action_spec(self):
        return Categorical(3, (), jnp.int32)

    # -- rendering ----------------------------------------------------------
    def _obs(self, s: TDict) -> jax.Array:
        grid = jnp.zeros((N, N, 4), jnp.float32)
        grid = grid.at[N - 1, s["paddle_x"], 0].set(1.0)
        grid = grid.at[s["ball_y"], s["ball_x"], 1].set(1.0)
        grid = grid.at[s["trail_y"], s["trail_x"], 2].set(1.0)
        grid = grid.at[1:4, :, 3].set(s["bricks"].astype(jnp.float32))
        return grid

    # -- dynamics -----------------------------------------------------------
    def _reset(self, key):
        k1, k2 = jax.random.split(key)
        ball_x = jax.random.randint(k1, (), 0, N)
        dx = jnp.where(jax.random.bernoulli(k2), 1, -1).astype(jnp.int32)
        s = TDict(
            paddle_x=jnp.asarray(N // 2, jnp.int32),
            ball_x=ball_x.astype(jnp.int32),
            ball_y=jnp.asarray(4, jnp.int32),
            dx=dx,
            dy=jnp.asarray(1, jnp.int32),
            trail_x=ball_x.astype(jnp.int32),
            trail_y=jnp.asarray(3, jnp.int32),
            bricks=jnp.ones((3, N), jnp.bool_),
            t=jnp.zeros((1,), jnp.int32),
        )
        return s, TDict(pixels=self._obs(s))

    def _step(self, s: TDict, td: TDict, key):
        action = jnp.asarray(td["action"], jnp.int32)
        paddle = jnp.clip(
            s["paddle_x"] + jnp.where(action == 1, -1, jnp.where(action == 2, 1, 0)),
            0, N - 1,
        )

        # tentative ball move
        nx = s["ball_x"] + s["dx"]
        ny = s["ball_y"] + s["dy"]
        dx = jnp.where((nx < 0) | (nx >= N), -s["dx"], s["dx"])
        nx = jnp.clip(nx, 0, N - 1)
        dy = jnp.where(ny < 0, -s["dy"], s["dy"])
        ny_top = jnp.clip(ny, 0, N - 1)

        # brick collision: ball entering rows 1..3 where a brick lives
        in_brick_band = (ny_top >= 1) & (ny_top <= 3)
        brick_row = jnp.clip(ny_top - 1, 0, 2)
        hit_brick = in_brick_band & s["bricks"][brick_row, nx]
        bricks = jnp.where(
            hit_brick,
            s["bricks"].at[brick_row, nx].set(False),
            s["bricks"],
        )
        dy = jnp.where(hit_brick, -dy, dy)
        ny2 = jnp.where(hit_brick, s["ball_y"], ny_top)  # bounce back

        # paddle / bottom interaction
        at_bottom = ny2 >= N - 1
        caught = at_bottom & (nx == paddle)
        dy = jnp.where(caught, -jnp.abs(dy), dy)
        missed = at_bottom & (nx != paddle)
        ny3 = jnp.clip(ny2, 0, N - 1)

        reward = hit_brick.astype(jnp.float32).reshape(1)

        # brick wave respawn when cleared
        cleared = ~jnp.any(bricks)
        bricks = jnp.where(cleared, jnp.ones_like(bricks), bricks)

        t = s["t"] + 1
        new_s = TDict(
            paddle_x=paddle,
            ball_x=nx,
            ball_y=ny3,
            dx=dx,
            dy=dy,
            trail_x=s["ball_x"],
            trail_y=s["ball_y"],
            bricks=bricks,
            t=t,
        )
        return new_s, TDict(
            pixels=self._obs(new_s),
            reward=reward,
            terminated=missed.reshape(1),
            truncated=t >= self.max_episode_steps,
        )

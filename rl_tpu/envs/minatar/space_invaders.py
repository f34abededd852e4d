"""Space Invaders — native on-device pixel env (MinAtar-style 10×10 grid).

Second game of the on-device pixel family (rules per the public MinAtar
description, Young & Tian 2019): an alien block marches left/right and
descends at the walls; the player cannon fires friendly bullets upward;
aliens fire back; +1 per alien destroyed; episode ends when an enemy bullet
hits the player or the aliens reach the bottom.

Observation: ``pixels`` [10, 10, 6] float32 channels
(cannon, friendly bullet, alien, alien_left_flag, alien_right_flag,
enemy bullet).  Actions: 0 noop, 1 left, 2 right, 3 fire.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from rl_tpu.data import Bounded, Categorical, Composite, TDict
from ..base import Env

__all__ = ["SpaceInvadersEnv"]

N = 10
SHOT_COOLDOWN = 5
ENEMY_MOVE_INTERVAL = 12
ENEMY_SHOT_INTERVAL = 10


class SpaceInvadersEnv(Env):
    def __init__(self, max_episode_steps: int = 1000):
        self.max_episode_steps = int(max_episode_steps)

    @property
    def observation_spec(self) -> Composite:
        return Composite(pixels=Bounded(0.0, 1.0, (N, N, 6), jnp.float32))

    def _action_spec(self):
        return Categorical(4, (), jnp.int32)

    def _obs(self, s: TDict) -> jax.Array:
        g = jnp.zeros((N, N, 6), jnp.float32)
        g = g.at[N - 1, s["pos"], 0].set(1.0)
        g = g.at[:, :, 1].set(s["f_bullets"].astype(jnp.float32))
        g = g.at[:, :, 2].set(s["aliens"].astype(jnp.float32))
        g = g.at[:, :, 3].set((s["aliens"] & (s["alien_dir"] < 0)).astype(jnp.float32))
        g = g.at[:, :, 4].set((s["aliens"] & (s["alien_dir"] > 0)).astype(jnp.float32))
        g = g.at[:, :, 5].set(s["e_bullets"].astype(jnp.float32))
        return g

    def _reset(self, key):
        aliens = jnp.zeros((N, N), jnp.bool_).at[0:4, 2:8].set(True)
        s = TDict(
            pos=jnp.asarray(N // 2, jnp.int32),
            f_bullets=jnp.zeros((N, N), jnp.bool_),
            e_bullets=jnp.zeros((N, N), jnp.bool_),
            aliens=aliens,
            alien_dir=jnp.asarray(-1, jnp.int32),
            shot_timer=jnp.asarray(0, jnp.int32),
            move_timer=jnp.asarray(ENEMY_MOVE_INTERVAL, jnp.int32),
            enemy_shot_timer=jnp.asarray(ENEMY_SHOT_INTERVAL, jnp.int32),
            t=jnp.zeros((1,), jnp.int32),
        )
        return s, TDict(pixels=self._obs(s))

    def _step(self, s: TDict, td: TDict, key):
        a = jnp.asarray(td["action"], jnp.int32)
        pos = jnp.clip(s["pos"] + jnp.where(a == 1, -1, jnp.where(a == 2, 1, 0)), 0, N - 1)

        # friendly bullets move up; fire if requested and cooldown ready
        fb = jnp.roll(s["f_bullets"], -1, axis=0).at[N - 1].set(False)
        can_fire = (a == 3) & (s["shot_timer"] == 0)
        fb = jnp.where(can_fire, fb.at[N - 2, pos].set(True), fb)
        shot_timer = jnp.where(can_fire, SHOT_COOLDOWN, jnp.maximum(s["shot_timer"] - 1, 0))

        # enemy bullets move down
        eb = jnp.roll(s["e_bullets"], 1, axis=0).at[0].set(False)

        # alien march on its timer
        aliens = s["aliens"]
        d = s["alien_dir"]
        move_now = s["move_timer"] == 0
        cols = jnp.any(aliens, axis=0)
        col_idx = jnp.arange(N)
        leftmost = jnp.min(jnp.where(cols, col_idx, N))
        rightmost = jnp.max(jnp.where(cols, col_idx, -1))
        at_edge = ((d < 0) & (leftmost == 0)) | ((d > 0) & (rightmost == N - 1))
        new_d = jnp.where(move_now & at_edge, -d, d)
        shifted = jnp.where(
            move_now,
            jnp.where(
                at_edge,
                jnp.roll(aliens, 1, axis=0).at[0].set(False),  # descend
                jnp.roll(aliens, new_d, axis=1),
            ),
            aliens,
        )
        aliens = shifted
        move_timer = jnp.where(move_now, ENEMY_MOVE_INTERVAL, s["move_timer"] - 1)

        # enemy fire: bottom-most alien of a random column
        shoot_now = s["enemy_shot_timer"] == 0
        alive_cols = jnp.any(aliens, axis=0)
        u = jax.random.uniform(key, (N,))
        pick_col = jnp.argmax(jnp.where(alive_cols, u, -1.0))
        rows = jnp.arange(N)
        bottom_row = jnp.max(jnp.where(aliens[:, pick_col], rows, -1))
        eb = jnp.where(
            shoot_now & jnp.any(alive_cols),
            eb.at[jnp.clip(bottom_row + 1, 0, N - 1), pick_col].set(True),
            eb,
        )
        enemy_shot_timer = jnp.where(shoot_now, ENEMY_SHOT_INTERVAL, s["enemy_shot_timer"] - 1)

        # friendly bullet × alien collisions
        hits = fb & aliens
        reward = jnp.sum(hits).astype(jnp.float32).reshape(1)
        aliens = aliens & ~hits
        fb = fb & ~hits

        # terminal: enemy bullet reaches the cannon, or aliens reach bottom row
        hit_player = eb[N - 1, pos]
        invaded = jnp.any(aliens[N - 1])
        terminated = (hit_player | invaded).reshape(1)

        # wave respawn
        cleared = ~jnp.any(aliens)
        aliens = jnp.where(cleared, jnp.zeros((N, N), bool).at[0:4, 2:8].set(True), aliens)

        t = s["t"] + 1
        new_s = TDict(
            pos=pos, f_bullets=fb, e_bullets=eb, aliens=aliens, alien_dir=new_d,
            shot_timer=shot_timer, move_timer=move_timer,
            enemy_shot_timer=enemy_shot_timer, t=t,
        )
        return new_s, TDict(
            pixels=self._obs(new_s),
            reward=reward,
            terminated=terminated,
            truncated=t >= self.max_episode_steps,
        )

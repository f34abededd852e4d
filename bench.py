"""Benchmark: PPO end-to-end throughput (collect + GAE + update) on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the north star is >=1M env-steps/s aggregate on a 16-chip slice
(BASELINE.md), i.e. 62.5k steps/s/chip — vs_baseline is measured
steps/s-per-chip over that target.
"""
from __future__ import annotations

import json
import time

import jax

PER_CHIP_TARGET = 1_000_000 / 16


def main() -> None:
    import __graft_entry__ as g

    num_envs = 4096
    steps_per_batch = 32
    env, collector, params, opt_state, train_step = g.build_ppo(
        num_envs=num_envs, frames_per_batch=num_envs * steps_per_batch
    )
    key = jax.random.PRNGKey(0)
    cstate = collector.init(key)
    step = jax.jit(train_step)

    # warmup / compile
    params, opt_state, cstate, loss, reward = step(params, opt_state, cstate, key)
    jax.block_until_ready(loss)

    iters = 10
    t0 = time.perf_counter()
    for i in range(iters):
        key, k = jax.random.split(key)
        params, opt_state, cstate, loss, reward = step(params, opt_state, cstate, k)
    jax.block_until_ready(loss)
    dt = time.perf_counter() - t0

    frames = iters * num_envs * steps_per_batch
    steps_per_s = frames / dt
    print(
        json.dumps(
            {
                "metric": "ppo_pendulum_env_steps_per_s",
                "value": round(steps_per_s, 1),
                "unit": "env-steps/s (collect+GAE+4 minibatch updates, 1 chip)",
                "vs_baseline": round(steps_per_s / PER_CHIP_TARGET, 3),
            }
        )
    )


if __name__ == "__main__":
    main()

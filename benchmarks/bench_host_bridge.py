"""Host env-bridge throughput probe (VERDICT r2 item #3).

Mirrors the reference harness
``/root/reference/benchmarks/ecosystem/gym_env_throughput.py:1-16``:
measures (a) the raw host pool step rate, (b) the same pool driven through
the jitted ``io_callback`` bridge inside a ``lax.scan`` (what the collector
actually runs), and (c) a full SAC train iteration (collect + UTD updates).

Run serially (single TPU grant)::

    timeout 600 python benchmarks/bench_host_bridge.py [steps=2000] [num_envs=8]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _sync(x):
    # value read — block_until_ready does not fence on the tunneled backend
    return float(np.asarray(x).ravel()[0])


def bench_raw_pool(env_name: str, num_envs: int, steps: int) -> float:
    from rl_tpu.envs.libs.gym import HostEnvPool
    import gymnasium

    pool = HostEnvPool([lambda: gymnasium.make(env_name) for _ in range(num_envs)])
    act_dim = pool.envs[0].action_space.shape[0]
    pool.reset(np.arange(num_envs))
    actions = np.zeros((num_envs, act_dim), np.float32)
    seeds = np.arange(num_envs)
    t0 = time.perf_counter()
    for _ in range(steps):
        pool.step_and_reset(actions, seeds)
    dt = time.perf_counter() - t0
    pool.close()
    return num_envs * steps / dt


def bench_bridge(env_name: str, num_envs: int, steps: int) -> float:
    from rl_tpu.envs.libs import GymEnv

    env = GymEnv(env_name, num_envs=num_envs)
    key = jax.random.PRNGKey(0)

    @jax.jit
    def roll(key):
        _, ys, _ = env.rollout(steps, key=key)
        return ys["next", "reward"].sum()

    _sync(roll(key))  # compile
    t0 = time.perf_counter()
    _sync(roll(jax.random.PRNGKey(1)))
    dt = time.perf_counter() - t0
    env.close()
    return num_envs * steps / dt


def bench_sac_iter(env_name: str, num_envs: int, iters: int,
                   frames_per_batch: int, utd: int) -> dict:
    from examples.sac_halfcheetah import DEFAULTS, main  # noqa: F401 (config shape)
    from rl_tpu.envs.libs import GymEnv
    from rl_tpu.modules import (MLP, NormalParamExtractor, ProbabilisticActor,
                                Seq, TanhNormal, TDModule)
    from rl_tpu.trainers import SACTrainer

    env = GymEnv(env_name, num_envs=num_envs)
    act_spec = env.action_spec
    act_dim = act_spec.shape[-1]
    net = Seq(
        TDModule(MLP(out_features=2 * act_dim, num_cells=(256, 256),
                     activation="relu"), ["observation"], ["pre"]),
        TDModule(NormalParamExtractor(), ["pre"], ["loc", "scale"]),
    )
    actor = ProbabilisticActor(
        net, TanhNormal,
        dist_kwargs={"low": float(act_spec.low.min()),
                     "high": float(act_spec.high.max())},
    )
    qvalue = TDModule(MLP(out_features=1, num_cells=(256, 256),
                          activation="relu"),
                      ["observation", "action"], ["state_action_value"])
    trainer = SACTrainer(
        env, actor, qvalue, action_dim=act_dim,
        frames_per_batch=frames_per_batch, total_frames=10 ** 9,
        buffer_capacity=100_000, batch_size=256, utd=utd,
        init_random_frames=0,
    )
    update = trainer._make_update()
    key = jax.random.PRNGKey(0)
    cstate = trainer.collector.init(key)
    cstate, batch0 = trainer.collector.collect(trainer.params, cstate)
    from rl_tpu.trainers.algos import _flatten_time

    rb_state = trainer.rb.init_from_batch(_flatten_time(batch0))
    params, opt_state = trainer.params, trainer.opt_state
    aux = trainer._init_aux()
    params, opt_state, rb_state, cstate, aux, r = update(
        params, opt_state, rb_state, cstate, aux, key)
    _sync(r)  # compile
    t0 = time.perf_counter()
    for i in range(iters):
        params, opt_state, rb_state, cstate, aux, r = update(
            params, opt_state, rb_state, cstate, aux, jax.random.PRNGKey(i))
    _sync(r)
    dt = time.perf_counter() - t0
    env.close()
    return {
        "iter_s": dt / iters,
        "env_steps_s": iters * frames_per_batch / dt,
        "updates_s": iters * utd / dt,
    }


def bench_pipelined(env_name: str, num_envs: int, steps: int) -> float:
    """Double-buffered collection: device policy compute of one env group
    overlaps host stepping of the other (collectors/pipelined.py)."""
    import gymnasium
    import jax.numpy as jnp

    from rl_tpu.collectors.pipelined import PipelinedHostCollector

    probe = gymnasium.make(env_name)
    obs_dim = probe.observation_space.shape[0]
    act_dim = probe.action_space.shape[0]
    probe.close()

    def policy(params, td, key):
        obs = jnp.asarray(td["observation"])
        return td.set("action", jnp.tanh(obs @ params["w"]))

    params = {"w": jnp.zeros((obs_dim, act_dim), jnp.float32)}
    coll = PipelinedHostCollector(lambda: gymnasium.make(env_name), num_envs,
                                  policy, frames_per_batch=num_envs * steps)
    coll.collect(params, jax.random.PRNGKey(0))  # compile + prime
    t0 = time.perf_counter()
    coll.collect(params, jax.random.PRNGKey(1))
    dt = time.perf_counter() - t0
    coll.close()
    return num_envs * steps / dt


def main_cli(argv):
    cfg = dict(steps=2000, num_envs=8, env_name="HalfCheetah-v4",
               sac_iters=20, frames_per_batch=64, utd=64)
    for a in argv:
        k, v = a.split("=")
        cfg[k] = type(cfg.get(k, v))(v) if k in cfg else v
    print(f"backend: {jax.default_backend()}, devices: {jax.devices()}")
    raw = bench_raw_pool(cfg["env_name"], cfg["num_envs"], cfg["steps"])
    print(f"raw host pool: {raw:,.0f} env-steps/s", flush=True)
    br = bench_bridge(cfg["env_name"], cfg["num_envs"], cfg["steps"])
    print(f"io_callback bridge (jit scan): {br:,.0f} env-steps/s", flush=True)
    pl = bench_pipelined(cfg["env_name"], cfg["num_envs"], cfg["steps"])
    print(f"pipelined double-buffered: {pl:,.0f} env-steps/s "
          f"({pl / max(br, 1):.2f}x over serial bridge)", flush=True)
    sac = bench_sac_iter(cfg["env_name"], cfg["num_envs"], cfg["sac_iters"],
                         cfg["frames_per_batch"], cfg["utd"])
    print(f"SAC iter (fpb={cfg['frames_per_batch']}, utd={cfg['utd']}): "
          f"{sac['iter_s'] * 1e3:.1f} ms/iter, "
          f"{sac['env_steps_s']:,.0f} env-steps/s, "
          f"{sac['updates_s']:,.0f} updates/s")


if __name__ == "__main__":
    main_cli(sys.argv[1:])

"""Offline IQL on a Pendulum dataset collected by a random policy.

Counterpart of ``/root/reference/sota-implementations/iql/iql_offline.py``
(the D4RL recipe) with the dataset generated in-process — no downloads in
this image.  Run::

    python examples/iql_pendulum_offline.py [gradient_steps=20000]
"""
import sys

import jax
import jax.numpy as jnp

from rl_tpu.collectors import Collector
from rl_tpu.config import apply_overrides
from rl_tpu.collectors.evaluator import Evaluator
from rl_tpu.envs import BatchedEnv, PendulumEnv
from rl_tpu.modules import (
    MLP,
    NormalParamExtractor,
    ProbabilisticActor,
    Seq,
    TanhNormal,
    TDModule,
    ValueOperator,
)
from rl_tpu.record import CSVLogger, generate_exp_name
from rl_tpu.trainers import IQLTrainer

DEFAULTS = dict(
    dataset_frames=50_000,
    gradient_steps=20_000,
    batch_size=256,
    lr=3e-4,
    gamma=0.99,
    expectile=0.7,
    temperature=3.0,
    seed=0,
    logger="csv",
)


def collect_dataset(env, frames, seed):
    """Random-policy dataset in flat [N] layout (the offline format)."""
    coll = Collector(
        env, lambda p, td, k: td.set("action", env.action_spec.rand(
            k, td["observation"].shape[:-1]
        )), frames_per_batch=frames,
    )
    cstate = coll.init(jax.random.PRNGKey(seed))
    _, batch = coll._collect(None, cstate)
    return jax.tree.map(lambda x: x.reshape((-1,) + x.shape[2:]), batch)


def main(cfg=None):
    cfg = {**DEFAULTS, **(cfg or {})}
    env = BatchedEnv(PendulumEnv(), 16)
    dataset = collect_dataset(env, cfg["dataset_frames"] // 16, cfg["seed"])
    net = Seq(
        TDModule(MLP(out_features=2, num_cells=(256, 256), activation="relu"),
                 ["observation"], ["pre"]),
        TDModule(NormalParamExtractor(), ["pre"], ["loc", "scale"]),
    )
    actor = ProbabilisticActor(net, TanhNormal,
                               dist_kwargs={"low": -2.0, "high": 2.0})
    qvalue = TDModule(
        MLP(out_features=1, num_cells=(256, 256), activation="relu"),
        ["observation", "action"], ["state_action_value"],
    )
    value = ValueOperator(
        MLP(out_features=1, num_cells=(256, 256), activation="relu")
    )
    logger = (
        CSVLogger(generate_exp_name("iql", "pendulum-offline"))
        if cfg["logger"] == "csv" else None
    )
    evaluator = Evaluator(
        env, lambda p, td, k: actor(p["actor"], td, k), max_steps=200,
        logger=logger,
    )
    trainer = IQLTrainer(
        dataset, actor, qvalue, value,
        gamma=cfg["gamma"], expectile=cfg["expectile"],
        temperature=cfg["temperature"],
        gradient_steps=cfg["gradient_steps"], batch_size=cfg["batch_size"],
        lr=cfg["lr"], seed=cfg["seed"], logger=logger, evaluator=evaluator,
        eval_interval=50,
    )
    params = trainer.train()
    stats = evaluator.evaluate(params, jax.random.PRNGKey(cfg["seed"] + 1))
    print("final eval:", stats)
    return params, stats


if __name__ == "__main__":
    main(apply_overrides({}, sys.argv[1:]))

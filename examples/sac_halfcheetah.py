"""SAC on HalfCheetah (MuJoCo via the gymnasium host bridge).

Counterpart of ``/root/reference/sota-implementations/sac/sac.py`` on the
HalfCheetah baseline config.  Run::

    python examples/sac_halfcheetah.py [total_frames=1000000]
"""
import sys

import jax

from rl_tpu.config import apply_overrides
from rl_tpu.envs.libs import GymEnv
from rl_tpu.modules import (
    MLP,
    NormalParamExtractor,
    ProbabilisticActor,
    Seq,
    TanhNormal,
    TDModule,
)
from rl_tpu.collectors.evaluator import Evaluator
from rl_tpu.record import CSVLogger, generate_exp_name
from rl_tpu.trainers import SACTrainer

# mirrors /root/reference/sota-implementations/sac/config.yaml: 1M frames,
# utd_ratio 1.0 (one batch-256 gradient step per env frame), lr 3e-4,
# polyak 0.995, alpha_init 1.0, 25k random warmup, eval every 25k frames
DEFAULTS = dict(
    env_name="HalfCheetah-v4",
    num_envs=8,
    frames_per_batch=256,
    total_frames=1_000_000,
    buffer_capacity=1_000_000,
    batch_size=256,
    utd=256,
    lr=3e-4,
    gamma=0.99,
    tau=0.005,
    alpha_init=1.0,
    init_random_frames=25_000,
    eval_interval=98,
    seed=0,
    logger="csv",
)


def main(cfg=None):
    cfg = {**DEFAULTS, **(cfg or {})}
    env = GymEnv(cfg["env_name"], num_envs=cfg["num_envs"])
    obs_dim = env.observation_spec["observation"].shape[-1]
    act_spec = env.action_spec
    act_dim = act_spec.shape[-1]
    net = Seq(
        TDModule(MLP(out_features=2 * act_dim, num_cells=(256, 256), activation="relu"),
                 ["observation"], ["pre"]),
        TDModule(NormalParamExtractor(), ["pre"], ["loc", "scale"]),
    )
    actor = ProbabilisticActor(
        net, TanhNormal,
        dist_kwargs={"low": float(act_spec.low.min()), "high": float(act_spec.high.max())},
    )
    qvalue = TDModule(
        MLP(out_features=1, num_cells=(256, 256), activation="relu"),
        ["observation", "action"], ["state_action_value"],
    )
    logger = (
        CSVLogger(generate_exp_name("sac", cfg["env_name"])) if cfg["logger"] == "csv" else None
    )
    evaluator = Evaluator(
        env, lambda p, td, k: actor(p["actor"], td, key=k), max_steps=1000,
        logger=logger,
    )
    trainer = SACTrainer(
        env, actor, qvalue, action_dim=act_dim,
        frames_per_batch=cfg["frames_per_batch"], total_frames=cfg["total_frames"],
        buffer_capacity=cfg["buffer_capacity"], batch_size=cfg["batch_size"],
        utd=cfg["utd"], lr=cfg["lr"], gamma=cfg["gamma"], tau=cfg["tau"],
        alpha_init=cfg["alpha_init"], init_random_frames=cfg["init_random_frames"],
        seed=cfg["seed"], logger=logger, evaluator=evaluator,
        eval_interval=cfg["eval_interval"],
    )
    params = trainer.train()
    stats = evaluator.evaluate(params, jax.random.PRNGKey(cfg["seed"] + 1))
    print("final eval:", stats)
    env.close()
    return params, stats


if __name__ == "__main__":
    main(apply_overrides({}, sys.argv[1:]))

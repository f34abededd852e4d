"""MAPPO / IPPO on the native cooperative-navigation env (counterpart of
``/root/reference/sota-implementations/multiagent/mappo_ippo.py`` — the
reference runs on VMAS, not in this image; the native
``MultiAgentNavEnv`` provides the same ``("agents", ...)`` contract).  Run::

    python sota/multiagent_mappo.py [variant=ippo] [total_frames=200000]
"""
import sys

import jax
import jax.numpy as jnp

from rl_tpu.config import apply_overrides
from rl_tpu.collectors.evaluator import Evaluator
from rl_tpu.envs import BatchedEnv, MultiAgentNavEnv
from rl_tpu.modules import Categorical, ProbabilisticActor
from rl_tpu.modules.multiagent import (CentralizedCritic,
                                       IndependentCritic,
                                       MultiAgentPolicyNet)
from rl_tpu.objectives import MAPPOLoss, IPPOLoss
from rl_tpu.record import CSVLogger, generate_exp_name
from rl_tpu.trainers import PPOTrainer

DEFAULTS = dict(
    n_agents=3, num_envs=16, frames_per_batch=2048, total_frames=200_000,
    variant="mappo",  # or "ippo"
    num_epochs=4, minibatches=8, lr_actor=3e-4, lr_critic=1e-3,
    gamma=0.95, lmbda=0.9, clip_epsilon=0.2, entropy_coeff=0.01,
    seed=0, logger="csv",
)


class MarlPPOTrainer(PPOTrainer):
    def __init__(self, *args, variant="mappo", **kwargs):
        self._variant = variant
        super().__init__(*args, **kwargs)

    def _make_loss(self, actor, critic, *, clip_epsilon, entropy_coeff,
                   **kw):
        cls = MAPPOLoss if self._variant == "mappo" else IPPOLoss
        return cls(actor, critic, clip_epsilon=clip_epsilon,
                   entropy_coeff=entropy_coeff)


def main(cfg=None):
    cfg = {**DEFAULTS, **(cfg or {})}
    n = cfg["n_agents"]
    env = BatchedEnv(MultiAgentNavEnv(n), cfg["num_envs"])
    actor = ProbabilisticActor(
        MultiAgentPolicyNet(n, out_features=5), Categorical, dist_keys=["logits"],
        out_key=("agents", "action"),
        log_prob_key=("agents", "sample_log_prob"),
    )
    critic = (CentralizedCritic(n) if cfg["variant"] == "mappo"
              else IndependentCritic(n))
    logger = (CSVLogger(generate_exp_name(cfg["variant"], "nav"))
              if cfg["logger"] == "csv" else None)
    evaluator = Evaluator(env, lambda p, td, k: actor(p["actor"], td, key=k),
                          max_steps=50, logger=logger)
    trainer = MarlPPOTrainer(
        env, actor, critic, variant=cfg["variant"],
        frames_per_batch=cfg["frames_per_batch"],
        total_frames=cfg["total_frames"], num_epochs=cfg["num_epochs"],
        minibatches=cfg["minibatches"], lr_actor=cfg["lr_actor"],
        lr_critic=cfg["lr_critic"], gamma=cfg["gamma"], lmbda=cfg["lmbda"],
        clip_epsilon=cfg["clip_epsilon"], entropy_coeff=cfg["entropy_coeff"],
        seed=cfg["seed"], logger=logger, evaluator=evaluator,
        eval_interval=20,
    )
    params = trainer.train()
    stats = evaluator.evaluate(params, jax.random.PRNGKey(cfg["seed"] + 1))
    print("final eval:", stats)
    return params, stats


if __name__ == "__main__":
    main(apply_overrides({}, sys.argv[1:]))

"""MAPPO on PettingZoo Pursuit (counterpart of
``/root/reference/sota-implementations/multiagent/mappo_ippo.py`` on a real
external multi-agent benchmark — the reference uses VMAS, absent here;
PettingZoo's sisl/pursuit_v4 is available and runs through the
``PettingZooWrapper`` host bridge).  Run::

    python sota/multiagent_pettingzoo.py [total_frames=200000] [variant=ippo]
"""
import sys
import warnings

warnings.filterwarnings("ignore")

import jax
import jax.numpy as jnp

from rl_tpu.config import apply_overrides
from rl_tpu.collectors.evaluator import Evaluator
from rl_tpu.envs.libs import PettingZooEnv
from rl_tpu.modules import MLP, Categorical, ProbabilisticActor
from rl_tpu.modules.multiagent import MultiAgentConvNet, MultiAgentMLP
from rl_tpu.record import CSVLogger, generate_exp_name
from rl_tpu.trainers import MultiAgentPPOTrainer

DEFAULTS = dict(
    num_envs=8, max_cycles=100, frames_per_batch=1600, total_frames=200_000,
    variant="mappo", num_epochs=4, minibatches=4, lr_actor=3e-4,
    lr_critic=1e-3, gamma=0.99, lmbda=0.9, clip_epsilon=0.2,
    entropy_coeff=0.01, seed=0, logger="csv",
)

N_ACTIONS = 5  # pursuit: 4 moves + stay


class ConvActorNet:
    """Per-agent conv → logits over the 5 pursuit actions."""

    in_keys = [("agents", "observation")]
    out_keys = ["logits"]

    def __init__(self, n_agents):
        self.conv = MultiAgentConvNet(n_agents, channels=(16, 32),
                                      kernel_sizes=(3, 3), strides=(1, 1))
        self.head = MultiAgentMLP(n_agents, out_features=N_ACTIONS,
                                  num_cells=(64,), activation="relu")

    def init(self, key, td):
        k1, k2 = jax.random.split(key)
        obs = jnp.asarray(td["agents", "observation"])
        pc = self.conv.init(k1, obs)
        feats = self.conv(pc, obs)
        return {"conv": pc, "head": self.head.init(k2, feats)}

    def __call__(self, params, td, key=None):
        obs = jnp.asarray(td["agents", "observation"])
        feats = self.conv(params["conv"], obs)
        return td.set("logits", self.head(params["head"], feats))


class CentralConvCritic:
    """MAPPO: one team value from all agents' conv features."""

    in_keys = [("agents", "observation")]
    out_keys = ["state_value"]

    def __init__(self, n_agents):
        self.conv = MultiAgentConvNet(n_agents, channels=(16, 32),
                                      kernel_sizes=(3, 3), strides=(1, 1))
        # single shared head over the concatenated team features
        self.head = MultiAgentMLP(1, out_features=1, share_params=True,
                                  num_cells=(128,), activation="relu")

    def init(self, key, td):
        k1, k2 = jax.random.split(key)
        obs = jnp.asarray(td["agents", "observation"])
        pc = self.conv.init(k1, obs)
        feats = self.conv(pc, obs)
        flat = feats.reshape(feats.shape[:-2] + (1, -1))
        return {"conv": pc, "head": self.head.init(k2, flat)}

    def __call__(self, params, td, key=None):
        obs = jnp.asarray(td["agents", "observation"])
        feats = self.conv(params["conv"], obs)
        flat = feats.reshape(feats.shape[:-2] + (1, -1))
        v = self.head(params["head"], flat).squeeze(-2)
        return td.set("state_value", v)


def main(cfg=None):
    cfg = {**DEFAULTS, **(cfg or {})}
    env = PettingZooEnv("sisl/pursuit_v4", num_envs=cfg["num_envs"],
                        max_cycles=cfg["max_cycles"])
    n = env.n_agents
    actor = ProbabilisticActor(
        ConvActorNet(n), Categorical, dist_keys=["logits"],
        out_key=("agents", "action"),
        log_prob_key=("agents", "sample_log_prob"),
    )
    critic = CentralConvCritic(n)
    logger = (CSVLogger(generate_exp_name(cfg["variant"], "pursuit"))
              if cfg["logger"] == "csv" else None)
    evaluator = Evaluator(env, lambda p, td, k: actor(p["actor"], td, key=k),
                          max_steps=cfg["max_cycles"], logger=logger)
    trainer = MultiAgentPPOTrainer(
        env, actor, critic, variant=cfg["variant"],
        frames_per_batch=cfg["frames_per_batch"],
        total_frames=cfg["total_frames"], num_epochs=cfg["num_epochs"],
        minibatches=cfg["minibatches"], lr_actor=cfg["lr_actor"],
        lr_critic=cfg["lr_critic"], gamma=cfg["gamma"], lmbda=cfg["lmbda"],
        clip_epsilon=cfg["clip_epsilon"],
        entropy_coeff=cfg["entropy_coeff"], seed=cfg["seed"], logger=logger,
        evaluator=evaluator, eval_interval=20,
    )
    params = trainer.train()
    stats = evaluator.evaluate(params, jax.random.PRNGKey(cfg["seed"] + 1))
    print("final eval:", stats)
    return params, stats


if __name__ == "__main__":
    main(apply_overrides({}, sys.argv[1:]))

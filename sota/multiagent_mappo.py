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
from rl_tpu.modules.multiagent import MultiAgentMLP
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


class MarlActorNet:
    """Per-agent policy logits over the 5 discrete moves."""

    in_keys = [("agents", "observation")]
    out_keys = ["logits"]

    def __init__(self, n_agents):
        self.net = MultiAgentMLP(n_agents, out_features=5,
                                 num_cells=(128, 128))

    def init(self, key, td):
        return self.net.init(key, jnp.asarray(td["agents", "observation"]))

    def __call__(self, params, td, key=None):
        return td.set("logits",
                      self.net(params, jnp.asarray(td["agents", "observation"])))


class CentralCritic:
    """MAPPO: one value from the concatenated team observation."""

    in_keys = [("agents", "observation")]
    out_keys = ["state_value"]

    def __init__(self, n_agents):
        self.net = MultiAgentMLP(1, out_features=1, share_params=True,
                                 num_cells=(256, 256))

    def _flat(self, td):
        obs = jnp.asarray(td["agents", "observation"])
        return obs.reshape(obs.shape[:-2] + (1, -1))

    def init(self, key, td):
        return self.net.init(key, self._flat(td))

    def __call__(self, params, td, key=None):
        return td.set("state_value",
                      self.net(params, self._flat(td)).squeeze(-2))


class IndependentCritic:
    """IPPO: per-agent values, mean-pooled to one baseline (shared reward)."""

    in_keys = [("agents", "observation")]
    out_keys = ["state_value"]

    def __init__(self, n_agents):
        self.net = MultiAgentMLP(n_agents, out_features=1,
                                 share_params=False, num_cells=(128, 128))

    def init(self, key, td):
        return self.net.init(key, jnp.asarray(td["agents", "observation"]))

    def __call__(self, params, td, key=None):
        v = self.net(params, jnp.asarray(td["agents", "observation"]))
        return td.set("state_value", v.mean(-2))


class MarlPPOTrainer(PPOTrainer):
    def __init__(self, *args, variant="mappo", **kwargs):
        self._variant = variant
        super().__init__(*args, **kwargs)

    def _make_loss(self, actor, critic, *, clip_epsilon, entropy_coeff):
        cls = MAPPOLoss if self._variant == "mappo" else IPPOLoss
        return cls(actor, critic, clip_epsilon=clip_epsilon,
                   entropy_coeff=entropy_coeff)


def main(cfg=None):
    cfg = {**DEFAULTS, **(cfg or {})}
    n = cfg["n_agents"]
    env = BatchedEnv(MultiAgentNavEnv(n), cfg["num_envs"])
    actor = ProbabilisticActor(
        MarlActorNet(n), Categorical, dist_keys=["logits"],
        out_key=("agents", "action"),
        log_prob_key=("agents", "sample_log_prob"),
    )
    critic = (CentralCritic(n) if cfg["variant"] == "mappo"
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

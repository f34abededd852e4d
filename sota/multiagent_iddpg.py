"""Independent DDPG on the continuous cooperative-navigation env
(counterpart of ``/root/reference/sota-implementations/multiagent/iddpg.py``).
Each agent has its own deterministic actor and critic (MultiAgentMLP with
``share_params=False``); the DDPG loss is key-agnostic, so the multi-agent
structure lives entirely in the modules.  Run::

    python sota/multiagent_iddpg.py [total_frames=100000]
"""
import sys

import jax
import jax.numpy as jnp

from rl_tpu.config import apply_overrides
from rl_tpu.collectors.evaluator import Evaluator
from rl_tpu.envs import BatchedEnv, MultiAgentNavEnv
from rl_tpu.modules.multiagent import MultiAgentMLP
from rl_tpu.objectives import DDPGLoss
from rl_tpu.record import CSVLogger, generate_exp_name
from rl_tpu.trainers import GenericOffPolicyTrainer

DEFAULTS = dict(
    n_agents=3, num_envs=16, frames_per_batch=512, total_frames=100_000,
    buffer_capacity=100_000, batch_size=256, utd=4, lr=3e-4, gamma=0.95,
    tau=0.005, explore_sigma=0.2, seed=0, logger="csv",
)


class MarlDDPGActor:
    in_keys = [("agents", "observation")]
    out_keys = [("agents", "action")]

    def __init__(self, n_agents):
        self.net = MultiAgentMLP(n_agents, out_features=2,
                                 share_params=False, num_cells=(128, 128))

    def init(self, key, td):
        return self.net.init(key, jnp.asarray(td["agents", "observation"]))

    def __call__(self, params, td, key=None):
        a = jnp.tanh(self.net(params, jnp.asarray(td["agents", "observation"])))
        return td.set(("agents", "action"), a)


class MarlQNet:
    in_keys = [("agents", "observation"), ("agents", "action")]
    out_keys = ["state_action_value"]

    def __init__(self, n_agents):
        self.net = MultiAgentMLP(n_agents, out_features=1,
                                 share_params=False, num_cells=(128, 128))

    def init(self, key, td):
        x = jnp.concatenate([jnp.asarray(td["agents", "observation"]),
                             jnp.asarray(td["agents", "action"])], -1)
        return self.net.init(key, x)

    def __call__(self, params, td, key=None):
        x = jnp.concatenate([jnp.asarray(td["agents", "observation"]),
                             jnp.asarray(td["agents", "action"])], -1)
        # mean over agents: one joint value per transition
        return td.set("state_action_value",
                      self.net(params, x).mean(-2))


def main(cfg=None):
    cfg = {**DEFAULTS, **(cfg or {})}
    n = cfg["n_agents"]
    env = BatchedEnv(MultiAgentNavEnv(n, continuous_actions=True),
                     cfg["num_envs"])
    actor = MarlDDPGActor(n)
    qvalue = MarlQNet(n)
    loss = DDPGLoss(actor, qvalue, gamma=cfg["gamma"])
    sigma = cfg["explore_sigma"]

    def policy(p, td, k):
        td = actor(p["actor"], td)
        a = jnp.asarray(td["agents", "action"])
        noise = sigma * jax.random.normal(k, a.shape)
        return td.set(("agents", "action"), jnp.clip(a + noise, -1.0, 1.0))

    logger = (CSVLogger(generate_exp_name("iddpg", "nav"))
              if cfg["logger"] == "csv" else None)
    evaluator = Evaluator(env, lambda p, td, k: actor(p["actor"], td),
                          max_steps=50, logger=logger)
    trainer = GenericOffPolicyTrainer(
        env, loss, policy,
        target_keys=[("target_actor", "actor"),
                     ("target_qvalue", "qvalue")],
        lr=cfg["lr"], tau=cfg["tau"],
        frames_per_batch=cfg["frames_per_batch"],
        total_frames=cfg["total_frames"],
        buffer_capacity=cfg["buffer_capacity"], batch_size=cfg["batch_size"],
        utd=cfg["utd"], seed=cfg["seed"], logger=logger,
        evaluator=evaluator, eval_interval=50,
    )
    params = trainer.train()
    stats = evaluator.evaluate(params, jax.random.PRNGKey(cfg["seed"] + 1))
    print("final eval:", stats)
    return params, stats


if __name__ == "__main__":
    main(apply_overrides({}, sys.argv[1:]))

"""QMIX / VDN on the native cooperative-navigation env (counterpart of
``/root/reference/sota-implementations/multiagent/qmix_vdn.py``).  Run::

    python sota/multiagent_qmix.py [mixer=vdn] [total_frames=100000]
"""
import sys

import jax
import jax.numpy as jnp

from rl_tpu.config import apply_overrides
from rl_tpu.collectors.evaluator import Evaluator
from rl_tpu.envs import BatchedEnv, MultiAgentNavEnv
from rl_tpu.modules.multiagent import MultiAgentMLP, QMixer, VDNMixer
from rl_tpu.objectives import QMixerLoss
from rl_tpu.record import CSVLogger, generate_exp_name
from rl_tpu.trainers import GenericOffPolicyTrainer

DEFAULTS = dict(
    n_agents=3, num_envs=16, frames_per_batch=512, total_frames=100_000,
    mixer="qmix",  # or "vdn"
    buffer_capacity=100_000, batch_size=256, utd=4, lr=5e-4, gamma=0.95,
    tau=0.01, eps=0.1, seed=0, logger="csv",
)


class MarlQNet:
    in_keys = [("agents", "observation")]
    out_keys = [("agents", "action_value")]

    def __init__(self, n_agents):
        self.net = MultiAgentMLP(n_agents, out_features=5,
                                 num_cells=(128, 128))

    def init(self, key, td):
        return self.net.init(key, jnp.asarray(td["agents", "observation"]))

    def __call__(self, params, td, key=None):
        q = self.net(params, jnp.asarray(td["agents", "observation"]))
        return td.set(("agents", "action_value"), q)


def main(cfg=None):
    cfg = {**DEFAULTS, **(cfg or {})}
    n = cfg["n_agents"]
    base = MultiAgentNavEnv(n)
    env = BatchedEnv(base, cfg["num_envs"])
    qnet = MarlQNet(n)
    obs_dim = base._obs_dim
    mixer = (VDNMixer() if cfg["mixer"] == "vdn"
             else QMixer(n, n * obs_dim))
    loss = QMixerLoss(qnet, mixer, gamma=cfg["gamma"])
    eps = cfg["eps"]

    def policy(p, td, k):
        td = qnet(p["qnet"], td)
        q = jnp.asarray(td["agents", "action_value"])
        greedy = q.argmax(-1)
        ke, ka = jax.random.split(k)
        rand = jax.random.randint(ka, greedy.shape, 0, 5)
        explore = jax.random.bernoulli(ke, eps, greedy.shape)
        return td.set(("agents", "action"),
                      jnp.where(explore, rand, greedy).astype(jnp.int32))

    logger = (CSVLogger(generate_exp_name(cfg["mixer"], "nav"))
              if cfg["logger"] == "csv" else None)
    evaluator = Evaluator(env, policy, max_steps=50, logger=logger)
    trainer = GenericOffPolicyTrainer(
        env, loss, policy,
        target_keys=[("target_qnet", "qnet"), ("target_mixer", "mixer")],
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

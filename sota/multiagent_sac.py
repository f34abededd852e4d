"""Centralised SAC over the joint action space of the continuous
cooperative-navigation env (counterpart of
``/root/reference/sota-implementations/multiagent/sac.py``).  The team's
joint action is one continuous vector; SAC trains a single stochastic
policy over it — the centralised-training variant of the reference script.
Run::

    python sota/multiagent_sac.py [total_frames=100000]
"""
import sys

import jax
import jax.numpy as jnp

from rl_tpu.config import apply_overrides
from rl_tpu.data import Bounded, Composite, TDict, Unbounded
from rl_tpu.collectors.evaluator import Evaluator
from rl_tpu.envs import BatchedEnv, Env, MultiAgentNavEnv
from rl_tpu.record import CSVLogger, generate_exp_name
from rl_tpu.trainers import SACTrainer

sys.path.insert(0, __file__.rsplit("/", 1)[0])
from _common import gaussian_actor, q_module

DEFAULTS = dict(
    n_agents=3, num_envs=16, frames_per_batch=512, total_frames=100_000,
    buffer_capacity=200_000, batch_size=256, utd=4, lr=3e-4, gamma=0.95,
    tau=0.005, init_random_frames=1_000, seed=0, logger="csv",
)


class JointActionNav(Env):
    """Flatten the MARL contract to single-agent: root ``observation`` is
    the concatenated team observation, root ``action`` the joint velocity
    vector ``[n_agents * 2]``."""

    def __init__(self, n_agents: int):
        self.inner = MultiAgentNavEnv(n_agents, continuous_actions=True)
        self.n_agents = n_agents

    @property
    def observation_spec(self):
        d = self.n_agents * self.inner._obs_dim
        return Composite(observation=Unbounded((d,), jnp.float32))

    def _action_spec(self):
        return Bounded(-1.0, 1.0, (self.n_agents * 2,), jnp.float32)

    def _flat(self, td):
        obs = jnp.asarray(td["agents", "observation"])
        return obs.reshape(obs.shape[:-2] + (-1,))

    def _reset(self, key):
        state, td = self.inner._reset(key)
        return state, TDict(observation=self._flat(td))

    def _step(self, state, td, key):
        joint = jnp.asarray(td["action"]).reshape(
            td["action"].shape[:-1] + (self.n_agents, 2))
        inner_td = TDict({("agents", "action"): joint})
        state, step = self.inner._step(state, inner_td, key)
        return state, TDict(observation=self._flat(step),
                            reward=step["reward"],
                            terminated=step["terminated"],
                            truncated=step["truncated"])


def main(cfg=None):
    cfg = {**DEFAULTS, **(cfg or {})}
    n = cfg["n_agents"]
    env = BatchedEnv(JointActionNav(n), cfg["num_envs"])
    actor = gaussian_actor(n * 2, low=-1.0, high=1.0)
    qvalue = q_module()
    logger = (CSVLogger(generate_exp_name("masac", "nav"))
              if cfg["logger"] == "csv" else None)
    evaluator = Evaluator(env, lambda p, td, k: actor(p["actor"], td, k),
                          max_steps=50, logger=logger)
    trainer = SACTrainer(
        env, actor, qvalue, action_dim=n * 2,
        frames_per_batch=cfg["frames_per_batch"],
        total_frames=cfg["total_frames"],
        buffer_capacity=cfg["buffer_capacity"], batch_size=cfg["batch_size"],
        utd=cfg["utd"], lr=cfg["lr"], gamma=cfg["gamma"], tau=cfg["tau"],
        init_random_frames=cfg["init_random_frames"], seed=cfg["seed"],
        logger=logger, evaluator=evaluator, eval_interval=50,
    )
    params = trainer.train()
    stats = evaluator.evaluate(params, jax.random.PRNGKey(cfg["seed"] + 1))
    print("final eval:", stats)
    return params, stats


if __name__ == "__main__":
    main(apply_overrides({}, sys.argv[1:]))

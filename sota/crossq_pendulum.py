"""CrossQ on Pendulum — batch-renorm critics, NO target networks
(counterpart of ``/root/reference/sota-implementations/crossq/crossq.py``).
Run::

    python sota/crossq_pendulum.py [total_frames=100000]
"""
import sys

import flax.linen as nn
import jax
import jax.numpy as jnp

from rl_tpu.config import apply_overrides
from rl_tpu.collectors.evaluator import Evaluator
from rl_tpu.envs import BatchedEnv, PendulumEnv
from rl_tpu.modules import BatchRenorm
from rl_tpu.objectives import CrossQLoss
from rl_tpu.record import CSVLogger, generate_exp_name
from rl_tpu.trainers import GenericOffPolicyTrainer

sys.path.insert(0, __file__.rsplit("/", 1)[0])
from _common import gaussian_actor

DEFAULTS = dict(
    num_envs=8, frames_per_batch=256, total_frames=100_000,
    buffer_capacity=200_000, batch_size=256, utd=16, lr=1e-3,
    gamma=0.99, init_random_frames=2_000, seed=0, logger="csv",
)


class RenormQNet(nn.Module):
    """Critic with BatchRenorm on the joint (s, a) input — the CrossQ
    recipe (reference crossq utils)."""

    @nn.compact
    def __call__(self, obs, act, use_running_average=False):
        x = jnp.concatenate([obs, act], -1)
        x = BatchRenorm()(x, use_running_average)
        x = nn.relu(nn.Dense(256)(x))
        x = BatchRenorm()(x, use_running_average)
        x = nn.relu(nn.Dense(256)(x))
        return nn.Dense(1)(x)


class CrossQTrainer(GenericOffPolicyTrainer):
    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        # batch stats are state, not weights: keep them out of the grad path
        self._diff = self.params.exclude("qvalue_stats")
        self.opt_state = self.tx.init(self._diff)

    def _grad_and_update(self, params, opt_state, mb, k, idx):
        import optax

        stats = params["qvalue_stats"]
        diff = params.exclude("qvalue_stats")

        def fwd(d):
            total, metrics = self.loss_module(d.set("qvalue_stats", stats),
                                              mb, k)
            return total, metrics

        (_, metrics), grads = jax.value_and_grad(fwd, has_aux=True)(diff)
        updates, opt_state = self.tx.update(grads, opt_state, diff)
        diff = optax.apply_updates(diff, updates)
        params = diff.set("qvalue_stats", stats)
        return self.loss_module.apply_stats(params, metrics), opt_state


def main(cfg=None):
    cfg = {**DEFAULTS, **(cfg or {})}
    env = BatchedEnv(PendulumEnv(), cfg["num_envs"])
    actor = gaussian_actor(1, low=-2.0, high=2.0)
    loss = CrossQLoss(actor, RenormQNet(), action_dim=1, gamma=cfg["gamma"])
    import optax

    logger = (CSVLogger(generate_exp_name("crossq", "pendulum"))
              if cfg["logger"] == "csv" else None)
    evaluator = Evaluator(env, lambda p, td, k: actor(p["actor"], td, key=k),
                          max_steps=200, logger=logger)
    trainer = CrossQTrainer(
        env, loss, lambda p, td, k: actor(p["actor"], td, key=k),
        target_keys=[],  # CrossQ: no target networks
        lr=cfg["lr"], frames_per_batch=cfg["frames_per_batch"],
        total_frames=cfg["total_frames"],
        buffer_capacity=cfg["buffer_capacity"], batch_size=cfg["batch_size"],
        utd=cfg["utd"], init_random_frames=cfg["init_random_frames"],
        seed=cfg["seed"], logger=logger, evaluator=evaluator,
        eval_interval=50,
        # reference CrossQ optimizer: Adam(b1=0.5, b2=0.999, eps=1e-8) —
        # sota-implementations/crossq/config.yaml optim.beta1
        tx=optax.adam(cfg["lr"], b1=0.5, b2=0.999, eps=1e-8),
    )
    params = trainer.train()
    final_eval = Evaluator(env, lambda p, td, k: actor(p["actor"], td, key=k),
                           max_steps=200, num_episodes=32, logger=logger,
                           log_prefix="final_eval")
    stats = final_eval.evaluate(params, jax.random.PRNGKey(cfg["seed"] + 1),
                                step=cfg["total_frames"])
    print("final eval:", stats)
    return params, stats


if __name__ == "__main__":
    main(apply_overrides({}, sys.argv[1:]))

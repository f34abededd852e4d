"""DreamerV3 on Pendulum — world model + imagination actor-critic.

Counterpart of ``/root/reference/sota-implementations/dreamer_v3/``: the
three v3 losses (model / actor / value) trained jointly from a replayed
trajectory buffer, with symlog heads and percentile return normalization.
Run::

    python examples/dreamer_v3_pendulum.py [iters=200]
"""
import sys

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax

from rl_tpu.collectors import Collector
from rl_tpu.config import apply_overrides
from rl_tpu.data import TDict
from rl_tpu.envs import BatchedEnv, PendulumEnv, TransformedEnv
from rl_tpu.envs.transforms import InitTracker
from rl_tpu.modules.world_model import ObsEncoder, RSSMv3
from rl_tpu.objectives.dreamer_v3 import (
    DreamerV3ActorLoss,
    DreamerV3ModelLoss,
    DreamerV3ValueLoss,
    symlog,
)
from rl_tpu.objectives.value.functional import td_lambda_return_estimate
from rl_tpu.objectives.dreamer_v3 import default_bins, two_hot_decode
from rl_tpu.record import CSVLogger, generate_exp_name

DEFAULTS = dict(
    num_envs=8,
    seq_len=32,
    iters=200,
    horizon=10,
    lr_model=3e-4,
    lr_actor=1e-4,
    lr_value=1e-4,
    seed=0,
)

OBS, ACT = 3, 1


class SymlogDecoder(nn.Module):
    obs_dim: int

    @nn.compact
    def __call__(self, h, z):
        x = nn.silu(nn.Dense(256)(jnp.concatenate([h, z], -1)))
        return nn.Dense(self.obs_dim)(x)


def main(cfg=None):
    cfg = {**DEFAULTS, **(cfg or {})}
    key = jax.random.PRNGKey(cfg["seed"])
    env = TransformedEnv(
        BatchedEnv(PendulumEnv(), cfg["num_envs"]), InitTracker()
    )
    rssm = RSSMv3(action_dim=ACT, n_cats=16, n_classes=16, deter_dim=128,
                  hidden=128)
    encoder = ObsEncoder(embed_dim=128, hidden=128)
    decoder = SymlogDecoder(obs_dim=OBS)
    model_loss = DreamerV3ModelLoss(encoder, decoder, rssm)

    actor_net = nn.Sequential([nn.Dense(128), nn.silu, nn.Dense(ACT),
                               jnp.tanh])
    value_net = nn.Sequential([nn.Dense(128), nn.silu, nn.Dense(1)])

    def actor_fn(p, h, z, k):
        p = p.to_dict() if hasattr(p, "to_dict") else p
        a = actor_net.apply({"params": p}, jnp.concatenate([h, z], -1))
        return 2.0 * a  # pendulum torque range

    def value_fn(p, h, z):
        p = p.to_dict() if hasattr(p, "to_dict") else p
        return value_net.apply(
            {"params": p}, jnp.concatenate([h, z], -1)
        )[..., 0]

    actor_loss = DreamerV3ActorLoss(
        rssm, actor_fn, value_fn, imagination_horizon=cfg["horizon"]
    )
    value_loss = DreamerV3ValueLoss(value_fn)

    # explore with the current actor conditioned on a filtered latent —
    # simplest: random torque warmup then actor on raw obs encodings
    coll = Collector(
        env,
        lambda p, td, k: td.set("action", env.action_spec.rand(
            k, td["observation"].shape[:-1]
        )),
        frames_per_batch=cfg["seq_len"] * cfg["num_envs"],
    )
    cstate = coll.init(key)
    _, batch = coll._collect(None, cstate)

    params = model_loss.init(key, batch)
    hz = jnp.concatenate(
        [jnp.zeros((1, rssm.deter_dim)), jnp.zeros((1, rssm.stoch_dim))], -1
    )
    p_actor = actor_net.init(key, hz)["params"]
    p_value = value_net.init(key, hz)["params"]
    all_params = TDict(encoder=params["encoder"], decoder=params["decoder"],
                       rssm=params["rssm"], actor=p_actor, value=p_value)

    opt = optax.multi_transform(
        {"model": optax.adam(cfg["lr_model"]),
         "actor": optax.adam(cfg["lr_actor"]),
         "value": optax.adam(cfg["lr_value"])},
        TDict(encoder="model", decoder="model", rssm="model",
              actor="actor", value="value"),
    )
    opt_state = opt.init(all_params)
    logger = CSVLogger(generate_exp_name("dreamer_v3", "pendulum"))
    scale_state = actor_loss.init_scale_state()

    @jax.jit
    def train_step(p, opt_state, cstate, scale_state, key):
        k_c, k_m, k_a = jax.random.split(key, 3)
        cstate, batch = coll._collect(None, cstate)

        def total(p):
            m = model_loss.loss(p, batch, k_m)
            post = model_loss.observe(
                jax.tree_util.tree_map(jax.lax.stop_gradient, p), batch, k_m
            )
            a = actor_loss.loss(p, TDict(h=post["h"], z=post["z"]), k_a,
                                scale_state=scale_state)
            # λ-targets for the value head from the actor's imagination
            bins = default_bins(rssm.num_reward_bins)
            sg = jax.lax.stop_gradient
            imag_td = TDict(h=sg(post["h"]), z=sg(post["z"]),
                            lambda_target=sg(a["imagined_return"])
                            * jnp.ones(post["h"].shape[:2]))
            v = value_loss.loss(p, imag_td)
            loss = (m["loss_model_reco"] + m["loss_model_reward"]
                    + m["loss_model_continue"] + m["loss_model_kl"]
                    + a["loss_actor"] + v["loss_value"])
            return loss, (m, a, v)

        (loss, (m, a, v)), grads = jax.value_and_grad(
            total, has_aux=True)(p)
        updates, opt_state = opt.update(grads, opt_state, p)
        p = optax.apply_updates(p, updates)
        return (p, opt_state, cstate, a["scale_state"], loss,
                batch["next", "reward"].mean())

    for it in range(cfg["iters"]):
        key, k = jax.random.split(key)
        (all_params, opt_state, cstate, scale_state, loss,
         reward) = train_step(all_params, opt_state, cstate, scale_state, k)
        if it % 20 == 0:
            logger.log_scalar("train/loss", float(loss), step=it)
            logger.log_scalar("train/reward", float(reward), step=it)
            print(f"iter {it}: loss={float(loss):.3f} "
                  f"reward={float(reward):.3f}")
    return all_params


if __name__ == "__main__":
    main(apply_overrides({}, sys.argv[1:]))

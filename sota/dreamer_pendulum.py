"""Dreamer (v1) on Pendulum — Gaussian RSSM world model + imagination
actor-critic (counterpart of
``/root/reference/sota-implementations/dreamer/dreamer.py``).  Run::

    python sota/dreamer_pendulum.py [iters=200]
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
from rl_tpu.modules.world_model import ObsDecoder, ObsEncoder, RSSM
from rl_tpu.objectives.dreamer import (
    DreamerActorLoss,
    DreamerModelLoss,
    DreamerValueLoss,
)
from rl_tpu.record import CSVLogger, generate_exp_name

DEFAULTS = dict(
    num_envs=8, seq_len=32, iters=200, horizon=15, free_nats=3.0,
    lr_model=6e-4, lr_actor=8e-5, lr_value=8e-5, gamma=0.99, lmbda=0.95,
    seed=0,
)

OBS, ACT = 3, 1


def main(cfg=None):
    cfg = {**DEFAULTS, **(cfg or {})}
    key = jax.random.PRNGKey(cfg["seed"])
    env = TransformedEnv(BatchedEnv(PendulumEnv(), cfg["num_envs"]),
                         InitTracker())
    rssm = RSSM(action_dim=ACT, stoch_dim=30, deter_dim=128, hidden=128)
    encoder = ObsEncoder(embed_dim=128, hidden=128)
    decoder = ObsDecoder(obs_dim=OBS, hidden=128)
    model_loss = DreamerModelLoss(encoder, decoder, rssm,
                                  free_nats=cfg["free_nats"])

    actor_net = nn.Sequential([nn.Dense(128), nn.elu, nn.Dense(ACT), jnp.tanh])
    value_net = nn.Sequential([nn.Dense(128), nn.elu, nn.Dense(1)])

    def actor_fn(p, h, z, k):
        p = p.to_dict() if hasattr(p, "to_dict") else p
        return 2.0 * actor_net.apply(
            {"params": p}, jnp.concatenate([h, z], -1))

    def value_fn(p, h, z):
        p = p.to_dict() if hasattr(p, "to_dict") else p
        return value_net.apply(
            {"params": p}, jnp.concatenate([h, z], -1))  # [..., 1]

    actor_loss = DreamerActorLoss(rssm, actor_fn, value_fn,
                                  imagination_horizon=cfg["horizon"],
                                  gamma=cfg["gamma"], lmbda=cfg["lmbda"])
    value_loss = DreamerValueLoss(value_fn)

    coll = Collector(
        env,
        lambda p, td, k: td.set("action", env.action_spec.rand(
            k, td["observation"].shape[:-1])),
        frames_per_batch=cfg["seq_len"] * cfg["num_envs"],
    )
    cstate = coll.init(key)
    _, batch = coll._collect(None, cstate)

    params = model_loss.init(key, batch)
    hz = jnp.concatenate(
        [jnp.zeros((1, rssm.deter_dim)), jnp.zeros((1, rssm.stoch_dim))], -1)
    all_params = TDict(
        encoder=params["encoder"], decoder=params["decoder"],
        rssm=params["rssm"],
        actor=actor_net.init(key, hz)["params"],
        value=value_net.init(key, hz)["params"],
    )
    opt = optax.multi_transform(
        {"model": optax.chain(optax.clip_by_global_norm(100.0),
                              optax.adam(cfg["lr_model"])),
         "actor": optax.adam(cfg["lr_actor"]),
         "value": optax.adam(cfg["lr_value"])},
        TDict(encoder="model", decoder="model", rssm="model",
              actor="actor", value="value"),
    )
    opt_state = opt.init(all_params)
    logger = CSVLogger(generate_exp_name("dreamer", "pendulum"))

    @jax.jit
    def train_step(p, opt_state, cstate, key):
        k_m, k_a, k_v = jax.random.split(key, 3)
        cstate, batch = coll._collect(None, cstate)

        def total(p):
            m = model_loss.loss(p, batch, k_m)
            post = model_loss.observe(
                jax.tree_util.tree_map(jax.lax.stop_gradient, p), batch, k_m)
            start = TDict(h=post["h"], z=post["z"])
            a = actor_loss.loss(p, start, k_a)
            sg = jax.lax.stop_gradient
            returns, imag, _ = actor_loss.imagined_lambda_returns(
                jax.tree_util.tree_map(sg, p),
                sg(post["h"]).reshape(-1, rssm.deter_dim),
                sg(post["z"]).reshape(-1, rssm.stoch_dim), k_v)
            v = value_loss.loss(p, TDict(h=sg(imag["h"]), z=sg(imag["z"]),
                                         lambda_target=sg(returns)))
            loss = (m["loss_model_reco"] + m["loss_model_reward"]
                    + m["loss_model_kl"] + a["loss_actor"] + v["loss_value"])
            return loss, (m, a, v)

        (loss, (m, a, v)), grads = jax.value_and_grad(total, has_aux=True)(p)
        updates, opt_state = opt.update(grads, opt_state, p)
        p = optax.apply_updates(p, updates)
        return (p, opt_state, cstate, loss, a["imagined_return"],
                batch["next", "reward"].mean())

    for it in range(cfg["iters"]):
        key, k = jax.random.split(key)
        (all_params, opt_state, cstate, loss, imag_ret,
         reward) = train_step(all_params, opt_state, cstate, k)
        if it % 20 == 0:
            logger.log_scalar("train/loss", float(loss), step=it)
            logger.log_scalar("train/imagined_return", float(imag_ret),
                              step=it)
            print(f"iter {it}: loss={float(loss):.3f} "
                  f"imagined_return={float(imag_ret):.3f} "
                  f"reward={float(reward):.3f}")
    return all_params


if __name__ == "__main__":
    main(apply_overrides({}, sys.argv[1:]))

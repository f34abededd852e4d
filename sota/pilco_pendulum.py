"""PILCO on Pendulum (counterpart of
``/root/reference/sota-implementations/pilco/pilco.py``): fit an exact GP
dynamics model on collected transitions, then optimize an RBF controller
through the model with the saturating cost, alternating model refits with
on-policy data collection.  Run::

    python sota/pilco_pendulum.py [rounds=5]
"""
import sys

import jax
import jax.numpy as jnp
import optax

from rl_tpu.config import apply_overrides
from rl_tpu.data import TDict
from rl_tpu.envs import BatchedEnv, PendulumEnv
from rl_tpu.modules import GPWorldModel, RBFController
from rl_tpu.objectives import ExponentialQuadraticCost, PILCOLoss
from rl_tpu.record import CSVLogger, generate_exp_name

sys.path.insert(0, __file__.rsplit("/", 1)[0])
from _common import collect_dataset

DEFAULTS = dict(
    rounds=5, fit_points=200, horizon=25, opt_steps=150, lr=3e-2,
    n_centers=20, seed=0,
)

OBS, ACT = 3, 1


def main(cfg=None):
    cfg = {**DEFAULTS, **(cfg or {})}
    key = jax.random.PRNGKey(cfg["seed"])
    env = BatchedEnv(PendulumEnv(), 8)
    gp = GPWorldModel(state_dim=OBS, action_dim=ACT, noise_var=1e-3)
    ctrl = RBFController(state_dim=OBS, action_dim=ACT,
                         n_centers=cfg["n_centers"], u_max=2.0)
    # cost: distance from upright at rest → target obs [cos=1, sin=0, 0]
    cost = ExponentialQuadraticCost(
        target=jnp.array([1.0, 0.0, 0.0]),
        weights=jnp.diag(jnp.array([2.0, 2.0, 0.1])),
    )
    c_params = ctrl.init(key)
    logger = CSVLogger(generate_exp_name("pilco", "pendulum"))

    data = collect_dataset(env, cfg["fit_points"], cfg["seed"])  # random
    for rnd in range(cfg["rounds"]):
        obs = jnp.asarray(data["observation"])[-cfg["fit_points"]:]
        act = jnp.asarray(data["action"])[-cfg["fit_points"]:]
        nxt = jnp.asarray(data["next", "observation"])[-cfg["fit_points"]:]
        fitted = gp.fit(jnp.concatenate([obs, act], -1), nxt - obs)
        loss_mod = PILCOLoss(gp, ctrl, cost, horizon=cfg["horizon"])
        tx = optax.adam(cfg["lr"])
        opt_state = tx.init(c_params)
        start = TDict(observation=jnp.array([-1.0, 0.0, 0.0]))  # hanging

        @jax.jit
        def opt_chunk(p, s):
            def step(carry, _):
                p, s = carry
                (total, m), grads = jax.value_and_grad(
                    lambda q: loss_mod(q, start), has_aux=True)(p)
                u, s = tx.update(grads, s, p)
                return (optax.apply_updates(p, u), s), total

            return jax.lax.scan(step, (p, s), None, length=cfg["opt_steps"])

        (c_params, opt_state), totals = opt_chunk(c_params, opt_state)
        # on-policy data with the improved controller
        new = collect_dataset(
            env, cfg["fit_points"], cfg["seed"] + rnd + 1,
            lambda p, td, k: td.set(
                "action", ctrl(c_params, jnp.asarray(td["observation"]))),
        )
        data = jax.tree.map(
            lambda a, b: jnp.concatenate([a, b], 0), data, new)
        rew = float(jnp.asarray(new["next", "reward"]).mean())
        logger.log_scalar("train/planned_cost", float(totals[-1]), step=rnd)
        logger.log_scalar("train/env_reward", rew, step=rnd)
        print(f"round {rnd}: planned_cost={float(totals[-1]):.3f} "
              f"env_reward={rew:.3f}")
    return c_params


if __name__ == "__main__":
    main(apply_overrides({}, sys.argv[1:]))

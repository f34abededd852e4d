"""Decision Transformer on offline Pendulum trajectories (counterpart of
``/root/reference/sota-implementations/decision_transformer/dt.py`` and
``online_dt.py`` — pass ``online=1`` for the stochastic entropy-regularized
variant).

Expert trajectories come from the scripted swing-up controller; training is
supervised action prediction over [B, T] windows; evaluation rolls the
policy with the rolling-context ``DecisionTransformerInferenceWrapper``
conditioned on a target return (``TargetReturn`` transform).  Run::

    python sota/dt_pendulum_offline.py [gradient_steps=2000] [online=1]
"""
import sys

import jax
import jax.numpy as jnp
import optax

from rl_tpu.config import apply_overrides
from rl_tpu.data.specs import Unbounded
from rl_tpu.envs import BatchedEnv, PendulumEnv, TransformedEnv
from rl_tpu.envs.transforms import Compose, TargetReturn, TensorDictPrimer
from rl_tpu.modules import DecisionTransformerInferenceWrapper
from rl_tpu.modules.transformer import DecisionTransformer
from rl_tpu.objectives.decision_transformer import DTLoss, OnlineDTLoss
from rl_tpu.record import CSVLogger, generate_exp_name

sys.path.insert(0, __file__.rsplit("/", 1)[0])
from _common import collect_trajectories, expert_policy

DEFAULTS = dict(
    num_envs=16, traj_steps=400, context_len=20, gradient_steps=2_000,
    batch_size=64, lr=1e-4, target_return=-100.0, online=0, seed=0,
    eval_steps=200,
)

OBS, ACT = 3, 1


def main(cfg=None):
    cfg = {**DEFAULTS, **(cfg or {})}
    key = jax.random.PRNGKey(cfg["seed"])
    env = BatchedEnv(PendulumEnv(), cfg["num_envs"])
    data = collect_trajectories(env, cfg["traj_steps"], cfg["seed"],
                                expert_policy(env))  # [B, T, ...]
    online = bool(int(cfg["online"]))
    dt = DecisionTransformer(state_dim=OBS, action_dim=ACT, n_layers=2,
                             d_model=64, max_len=cfg["context_len"],
                             stochastic=online)

    class Actor:
        """Adapter: flax DT → the (params, td) TDModule calling convention."""

        action_dim = ACT

        def init(self, k, td):
            return dt.init(k, td["observation"], td["action"],
                           td["return_to_go"])["params"]

        def __call__(self, params, td, key=None):
            p = params.to_dict() if hasattr(params, "to_dict") else params
            out = dt.apply({"params": p}, td["observation"], td["action"],
                           td["return_to_go"])
            if online:
                return td.set("loc", out[0]).set("scale", out[1])
            return td.set("pred_action", out)

    actor = Actor()
    loss_mod = (OnlineDTLoss(actor, action_dim=ACT) if online
                else DTLoss(actor))

    # -- [B, T] → random context_len windows ------------------------------
    B, T = jnp.asarray(data["observation"]).shape[:2]
    L = int(cfg["context_len"])
    sub = data.select("observation", "action", "return_to_go")

    def sample_windows(k, n):
        kb, kt = jax.random.split(k)
        bi = jax.random.randint(kb, (n,), 0, B)
        ti = jax.random.randint(kt, (n,), 0, T - L + 1)

        def win(x):
            def one(b, t):
                return jax.lax.dynamic_slice_in_dim(x[b], t, L, axis=0)
            return jax.vmap(one)(bi, ti)

        return jax.tree.map(win, sub)

    example = sample_windows(key, 2)
    params = loss_mod.init(key, example)
    tx = optax.adam(cfg["lr"])
    opt_state = tx.init(params)
    logger = CSVLogger(generate_exp_name(
        "odt" if online else "dt", "pendulum-offline"))

    @jax.jit
    def chunk(params, opt_state, k):
        def step(carry, kk):
            params, opt_state = carry
            k_w, k_l = jax.random.split(kk)
            mb = sample_windows(k_w, cfg["batch_size"])
            total, grads = jax.value_and_grad(
                lambda p: loss_mod(p, mb, k_l)[0])(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            return (optax.apply_updates(params, updates), opt_state), total

        (params, opt_state), losses = jax.lax.scan(
            step, (params, opt_state), jax.random.split(k, 100))
        return params, opt_state, losses.mean()

    for it in range(cfg["gradient_steps"] // 100):
        key, k = jax.random.split(key)
        params, opt_state, loss = chunk(params, opt_state, k)
        logger.log_scalar("train/loss", float(loss), step=(it + 1) * 100)
        print(f"step {(it + 1) * 100}: loss={float(loss):.4f}")

    # -- eval: rolling-context inference conditioned on target return -----
    wrapper = DecisionTransformerInferenceWrapper(
        dt, cfg["context_len"], rtg_key="target_return",
        deterministic=True)
    eval_env = TransformedEnv(env, Compose(
        TargetReturn(cfg["target_return"]),
        TensorDictPrimer({
            k: Unbounded(shape, dtype)
            for k, (shape, dtype) in wrapper.primer_spec((OBS,)).items()
        }),
    ))

    def policy(p, td, k):
        out = wrapper(p, td, k)
        if online:  # loc is emitted as the action by the wrapper already
            out = out.set("action", jnp.clip(out["action"], -1, 1))
        return out.set("action", 2.0 * out["action"])  # torque range

    dt_params = params["actor"]
    state, td = eval_env.reset(jax.random.PRNGKey(cfg["seed"] + 1))
    rewards = []
    k = jax.random.PRNGKey(cfg["seed"] + 2)

    @jax.jit
    def roll(p, state, td, k):
        def body(carry, kk):
            state, td = carry
            td = policy(p, td, kk)
            state, full, td_next = eval_env.step_and_maybe_reset(
                state, td, kk)
            return (state, td_next), full["next", "reward"].mean()

        return jax.lax.scan(body, (state, td),
                            jax.random.split(k, cfg["eval_steps"]))

    (_, _), rews = roll(dt_params, state, td, k)
    print(f"eval mean reward/step: {float(rews.mean()):.3f}")
    logger.log_scalar("eval/reward", float(rews.mean()), step=0)
    return params


if __name__ == "__main__":
    main(apply_overrides({}, sys.argv[1:]))

"""Algorithm trainers — fused-jit training loops with batteries included.

Counterparts of the reference algorithm trainers
(``/root/reference/torchrl/trainers/algorithms/``: ``PPOTrainer`` ppo.py:11,
``SACTrainer`` sac.py:37, ``DQNTrainer`` dqn.py:39) — but where the
reference composes hooks around a python loop, these compile the entire
iteration (collect → [estimate] → update steps → target update) into ONE
jitted function; python only orchestrates logging/eval/checkpoint cadence.
"""
from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from rl_tpu.collectors import Collector
from rl_tpu.collectors.evaluator import Evaluator
from rl_tpu.data import TDict
from rl_tpu.data.replay import ReplayBuffer
from rl_tpu.objectives import GAE, ClipPPOLoss, DQNLoss, SACLoss, SoftUpdate
from rl_tpu.utils import timeit

__all__ = ["PPOTrainer", "A2CTrainer", "ReinforceTrainer", "SACTrainer", "DQNTrainer", "DDPGTrainer",
           "TD3Trainer", "OfflineTrainer", "IQLTrainer", "CQLTrainer",
           "TD3BCTrainer", "OfflineToOnlineTrainer", "GenericOffPolicyTrainer"]


def _flatten_time(batch: TDict) -> TDict:
    return batch.apply(lambda x: x.reshape((-1,) + x.shape[2:]))


def _unalias(*trees):
    """Copy any leaf sharing a device buffer with an earlier leaf.

    Donated jit arguments must not alias (XLA: 'attempt to donate the same
    buffer twice').  Aliases legitimately arise from eager init paths —
    e.g. an env reset storing one zeros array under terminated/truncated/
    done, or the same obs array in env_state and root.  Called once on the
    initial carried state before the donated training loop; jit outputs
    thereafter are alias-free."""
    seen: set[int] = set()

    def f(x):
        if isinstance(x, jax.Array):
            try:
                ptr = x.unsafe_buffer_pointer()
            except Exception:
                ptr = id(x)
            if ptr in seen:
                return jnp.array(x, copy=True)
            seen.add(ptr)
        return x

    out = tuple(jax.tree.map(f, t) for t in trees)
    return out[0] if len(out) == 1 else out


def _split_optimizer(params: TDict, lr_map: dict[str, float], clip: float = 0.5,
                     anneal_steps: int | None = None, adam_eps: float = 1e-8):
    """Per-subtree adam with per-subtree grad clipping (a shared global clip
    lets large-scale critic grads starve the actor).  ``anneal_steps``
    enables the reference's linear lr decay to 0 over that many optimizer
    steps (config_mujoco.yaml ``anneal_lr: True``)."""
    labels = TDict({k: jax.tree.map(lambda _: k, params[k]) for k in params})

    def lr_for(lr):
        if anneal_steps:
            return optax.linear_schedule(lr, 0.0, anneal_steps)
        return lr

    txs = {
        k: optax.chain(optax.clip_by_global_norm(clip),
                       optax.adam(lr_for(lr), eps=adam_eps))
        for k, lr in lr_map.items()
    }
    return optax.multi_transform(txs, labels)


class _TrainerBase:
    def __init__(self, logger=None, evaluator: Evaluator | None = None,
                 eval_interval: int = 10, save_path: str | None = None,
                 save_interval: int = 0):
        self.logger = logger
        self.evaluator = evaluator
        self.eval_interval = eval_interval
        self.save_path = save_path
        self.save_interval = save_interval

    def _log(self, metrics: dict, step: int):
        if self.logger is not None:
            for k, v in metrics.items():
                self.logger.log_scalar(k, float(v), step=step)

    def _maybe_eval_and_save(self, it: int, params, key, frames: int,
                             env_state=None):
        if self.evaluator is not None and it % self.eval_interval == 0:
            # env_state carries transform state (VecNorm stats) into eval;
            # only pass it when the env can actually carry it — plain envs
            # would trigger the evaluator's cold-stats warning on every
            # eval for state they never had
            if env_state is not None:
                import inspect

                try:
                    if "prev_state" not in inspect.signature(
                            self.evaluator.env.reset).parameters:
                        env_state = None
                except (TypeError, ValueError):
                    env_state = None
            self.evaluator.evaluate(params, key, step=frames,
                                    env_state=env_state)
        if self.save_path and self.save_interval and it % self.save_interval == 0:
            from rl_tpu.checkpoint import save_pytree

            save_pytree(self.save_path, {"params": params})


class PPOTrainer(_TrainerBase):
    """On-policy PPO: collect → GAE → epochs × minibatch clipped updates,
    all one jit (the reference sota PPO script shape, ppo_mujoco.py:110)."""

    def __init__(
        self,
        env,
        actor,
        critic,
        *,
        frames_per_batch: int,
        total_frames: int,
        num_epochs: int = 4,
        minibatches: int = 4,
        lr_actor: float = 3e-4,
        lr_critic: float = 1e-3,
        gamma: float = 0.99,
        lmbda: float = 0.95,
        clip_epsilon: float = 0.2,
        entropy_coeff: float = 0.01,
        critic_coeff: float = 1.0,
        loss_critic_type: str = "smooth_l1",
        normalize_advantage: bool = False,
        average_gae: bool | None = None,
        anneal_lr: bool = False,
        adam_eps: float = 1e-8,
        seed: int = 0,
        **base_kwargs,
    ):
        super().__init__(**base_kwargs)
        self.env = env
        self.actor = actor
        self.critic = critic
        self.total_frames = int(total_frames)
        self.num_epochs = num_epochs
        self.minibatches = minibatches
        self.anneal_lr = anneal_lr
        self.seed = seed
        self.collector = Collector(
            env, lambda p, td, k: actor(p["actor"], td, key=k),
            frames_per_batch=frames_per_batch,
        )
        # reference ppo_mujoco.py normalizes advantages PER MINIBATCH
        # (normalize_advantage=True in the loss); batch-level average_gae
        # is the default elsewhere — pick one, not both
        if average_gae is None:
            average_gae = not normalize_advantage
        self.gae = GAE(gamma, lmbda, critic, average_gae=average_gae)
        self.loss_module = self._make_loss(
            actor, critic, clip_epsilon=clip_epsilon,
            entropy_coeff=entropy_coeff, critic_coeff=critic_coeff,
            loss_critic_type=loss_critic_type,
            normalize_advantage=normalize_advantage,
        )
        key = jax.random.PRNGKey(seed)
        k1, k2 = jax.random.split(key)
        _, td0 = env.reset(k1)
        example = jax.tree.map(lambda x: jnp.asarray(x)[:1] if env.batch_size else jnp.asarray(x)[None], td0)
        self.params = self.loss_module.init(k2, example)
        n_updates = ((total_frames // frames_per_batch)
                     * num_epochs * minibatches) if anneal_lr else None
        self.tx = _split_optimizer(
            self.params, {"actor": lr_actor, "critic": lr_critic},
            anneal_steps=n_updates, adam_eps=adam_eps)
        self.opt_state = self.tx.init(self.params)
        self._key = key
        # donate carried state: pass-through jit outputs otherwise copy
        # every buffer (params, opt state, env state) once per iteration
        self._update = jax.jit(self._update_impl, donate_argnums=(0, 1, 2))

    def _make_loss(self, actor, critic, *, clip_epsilon, entropy_coeff,
                   critic_coeff=1.0, loss_critic_type="smooth_l1",
                   normalize_advantage=False):
        return ClipPPOLoss(actor, critic, clip_epsilon=clip_epsilon,
                           entropy_coeff=entropy_coeff,
                           critic_coeff=critic_coeff,
                           loss_critic_type=loss_critic_type,
                           normalize_advantage=normalize_advantage)

    def _update_impl(self, params, opt_state, cstate, key):
        cstate, batch = self.collector._collect(params, cstate)
        batch = self.gae(params["critic"], batch)
        flat = _flatten_time(batch)
        n = flat["advantage"].shape[0]
        M = self.minibatches
        n_use = (n // M) * M

        def epoch(carry, ke):
            params, opt_state = carry
            # minibatch "shuffle" = random roll + strided interleave: each
            # minibatch takes every M-th element of the (time-major) flat
            # batch from a random offset.  A true permutation is a large
            # random gather — measured ~40 ms/step on pixel batches on
            # v5e (1.7x whole-step cost); the roll lowers to slices+concat
            # and the stride to cheap slices, with equally-mixed batches.
            shift = jax.random.randint(ke, (), 0, n)
            rolled = flat.apply(
                lambda x: jnp.roll(x, shift, axis=0)[:n_use].reshape(
                    (n_use // M, M) + x.shape[1:]))

            def step(carry, i):
                params, opt_state = carry
                mbt = rolled.apply(lambda x: x[:, i])
                (total, metrics), grads = jax.value_and_grad(
                    lambda p: self.loss_module(p, mbt), has_aux=True
                )(params)
                updates, opt_state = self.tx.update(grads, opt_state, params)
                return (optax.apply_updates(params, updates), opt_state), total

            return jax.lax.scan(step, (params, opt_state), jnp.arange(M))

        (params, opt_state), losses = jax.lax.scan(
            epoch, (params, opt_state), jax.random.split(key, self.num_epochs)
        )
        return params, opt_state, cstate, losses.mean(), batch["next", "reward"].mean()

    def train(self):
        self._key, k = jax.random.split(self._key)
        self.params, self.opt_state, cstate = _unalias(
            self.params, self.opt_state, self.collector.init(k))
        frames = 0
        it = 0
        while frames < self.total_frames:
            self._key, k = jax.random.split(self._key)
            with timeit("ppo/iter"):
                self.params, self.opt_state, cstate, loss, reward = self._update(
                    self.params, self.opt_state, cstate, k
                )
            frames += self.collector.frames_per_batch
            self._log(
                {"train/loss": loss, "train/reward": reward}, step=frames
            )
            self._key, k = jax.random.split(self._key)
            self._maybe_eval_and_save(it, self.params, k, frames,
                                      env_state=cstate["env_state"])
            it += 1
        self.final_env_state = cstate["env_state"]
        return self.params


class _OffPolicyTrainer(_TrainerBase):
    """Shared machinery: collect → extend replay → K sampled grad steps →
    polyak, one jit."""

    def __init__(self, *, frames_per_batch, total_frames, buffer_capacity,
                 batch_size, utd: int, init_random_frames: int = 0,
                 seed: int = 0, **base_kwargs):
        super().__init__(**base_kwargs)
        self.total_frames = int(total_frames)
        self.batch_size = batch_size
        self.utd = utd
        self.seed = seed
        self.rb = ReplayBuffer(capacity=buffer_capacity, batch_size=batch_size)
        self._key = jax.random.PRNGKey(seed)

    def _grad_and_update(self, params, opt_state, mb, k, idx):
        raise NotImplementedError

    def _policy_state(self, params, aux=None):
        return params

    def _post_update(self, params, idx=0):
        return params

    def _init_aux(self) -> TDict:
        """Mutable collection-side state (ε/σ anneals) threaded THROUGH the
        jitted update — closing over it would bake the initial value into
        the trace as a constant and the anneal would silently never happen
        (the round-2 DQN-CartPole plateau)."""
        return TDict()

    def _step_aux(self, aux: TDict) -> TDict:
        return aux

    def _make_update(self):
        def update(params, opt_state, rb_state, cstate, aux, key):
            cstate, batch = self.collector._collect(
                self._policy_state(params, aux), cstate)
            rb_state, _ = self.rb.extend_fn(rb_state, _flatten_time(batch))

            def upd(carry, xs):
                k, idx = xs
                params, opt_state, rb_state = carry
                k_s, k_l = jax.random.split(k)
                rb_state, mb, info = self.rb.sample_fn(
                    rb_state, k_s, batch_size=self.batch_size
                )
                params, opt_state = self._grad_and_update(
                    params, opt_state, mb, k_l, idx
                )
                params = self._post_update(params, idx)
                return (params, opt_state, rb_state), None

            (params, opt_state, rb_state), _ = jax.lax.scan(
                upd, (params, opt_state, rb_state),
                (jax.random.split(key, self.utd), jnp.arange(self.utd)),
            )
            aux = self._step_aux(aux)
            return (params, opt_state, rb_state, cstate, aux,
                    batch["next", "reward"].mean())

        # donating rb_state matters most: an undonated 1M-slot buffer is
        # fully copied through the jit boundary every iteration
        return jax.jit(update, donate_argnums=(0, 1, 2, 3, 4))

    def train(self):
        self._key, k = jax.random.split(self._key)
        cstate = self.collector.init(k)
        aux = self._init_aux()
        cstate, batch0 = self.collector.collect(
            self._policy_state(self.params, aux), cstate)
        self.params, self.opt_state, cstate, aux = _unalias(
            self.params, self.opt_state, cstate, aux)
        rb_state = self.rb.init_from_batch(_flatten_time(batch0))
        seed_batch = getattr(self, "_seed_batch", None)
        if seed_batch is not None:  # offline-to-online warm start
            # conform the offline dataset to the buffer structure: policy
            # extras (loc/scale/log-prob...) absent offline become zeros
            flat0 = _flatten_time(batch0)
            n_seed = int(jnp.asarray(jax.tree.leaves(seed_batch)[0]).shape[0])
            conformed = flat0.apply(
                lambda x: jnp.zeros((n_seed,) + x.shape[1:], x.dtype)
            )
            for k, v in seed_batch.items(include_nested=True, leaves_only=True):
                if k in conformed:
                    conformed = conformed.set(k, jnp.asarray(v))
            rb_state, _ = jax.jit(self.rb.extend_fn)(rb_state, conformed)
        update = self._make_update()
        frames = self.collector.frames_per_batch
        it = 0
        while frames < self.total_frames:
            self._key, k = jax.random.split(self._key)
            (self.params, self.opt_state, rb_state, cstate, aux,
             reward) = update(
                self.params, self.opt_state, rb_state, cstate, aux, k
            )
            frames += self.collector.frames_per_batch
            self._log({"train/reward": float(reward)}, step=frames)
            self._key, k = jax.random.split(self._key)
            self._maybe_eval_and_save(it, self.params, k, frames,
                                      env_state=cstate["env_state"])
            it += 1
        self.final_env_state = cstate["env_state"]
        self._final_aux = aux
        return self.params


class SACTrainer(_OffPolicyTrainer):
    """Reference trainers/algorithms/sac.py:37."""

    def __init__(self, env, actor, qvalue, *, action_dim, frames_per_batch=128,
                 total_frames=100000, buffer_capacity=1_000_000, batch_size=256,
                 utd=8, lr=3e-4, gamma=0.99, tau=0.005, alpha_init=0.1,
                 init_random_frames=2000, seed=0, **base_kwargs):
        super().__init__(
            frames_per_batch=frames_per_batch, total_frames=total_frames,
            buffer_capacity=buffer_capacity, batch_size=batch_size, utd=utd,
            seed=seed, **base_kwargs,
        )
        self.env = env
        self.actor = actor
        self.loss_module = SACLoss(
            actor, qvalue, gamma=gamma, action_dim=action_dim, alpha_init=alpha_init
        )
        self.updater = SoftUpdate(tau=tau)
        self.collector = Collector(
            env, lambda p, td, k: actor(p["actor"], td, key=k),
            frames_per_batch=frames_per_batch, init_random_frames=init_random_frames,
        )
        key = jax.random.PRNGKey(seed)
        _, td0 = env.reset(key)
        example = jax.tree.map(
            lambda x: jnp.asarray(x)[:1] if env.batch_size else jnp.asarray(x)[None], td0
        )
        self.params = self.loss_module.init(key, example)
        self.tx = optax.adam(lr)
        self.opt_state = self.tx.init(self.params)

    def _grad_and_update(self, params, opt_state, mb, k, idx):
        grads = jax.grad(lambda p: self.loss_module(p, mb, k)[0])(params)
        updates, opt_state = self.tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state

    def _post_update(self, params, idx=0):
        return params.set(
            "target_qvalue", self.updater(params["target_qvalue"], params["qvalue"])
        )


class DQNTrainer(_OffPolicyTrainer):
    """Reference trainers/algorithms/dqn.py:39."""

    def __init__(self, env, qvalue_actor, *, action_spec, frames_per_batch=128,
                 total_frames=100000, buffer_capacity=100_000, batch_size=128,
                 utd=4, lr=1e-3, gamma=0.99, tau=0.05, double_dqn=True,
                 eps_init=1.0, eps_end=0.05, eps_anneal_iters=200,
                 init_random_frames=0, max_grad_norm=10.0,
                 seed=0, **base_kwargs):
        super().__init__(
            frames_per_batch=frames_per_batch, total_frames=total_frames,
            buffer_capacity=buffer_capacity, batch_size=batch_size, utd=utd,
            seed=seed, **base_kwargs,
        )
        from rl_tpu.modules import EGreedyModule

        self.env = env
        self.qvalue_actor = qvalue_actor
        self.loss_module = DQNLoss(qvalue_actor, gamma=gamma, double_dqn=double_dqn)
        self.updater = SoftUpdate(tau=tau)
        self.eg = EGreedyModule(action_spec, eps_init=eps_init, eps_end=eps_end,
                                annealing_num_steps=eps_anneal_iters)

        def policy(pstate, td, k):
            td = qvalue_actor(pstate["params"]["value"], td, key=k)
            return self.eg(pstate["eg"], td, k)

        self.collector = Collector(env, policy, frames_per_batch=frames_per_batch,
                                   init_random_frames=init_random_frames)
        key = jax.random.PRNGKey(seed)
        _, td0 = env.reset(key)
        example = jax.tree.map(
            lambda x: jnp.asarray(x)[:1] if env.batch_size else jnp.asarray(x)[None], td0
        )
        self.params = self.loss_module.init(key, example)
        self.tx = optax.chain(optax.clip_by_global_norm(max_grad_norm),
                              optax.adam(lr))
        self.opt_state = self.tx.init(self.params["value"])

    def _init_aux(self) -> TDict:
        return TDict(eg=self.eg.init_state())

    def _step_aux(self, aux: TDict) -> TDict:
        return aux.set("eg", self.eg.step(aux["eg"]))

    def _policy_state(self, params, aux=None):
        eg = aux["eg"] if aux is not None else self.eg.init_state()
        return TDict(params=params, eg=eg)

    def _grad_and_update(self, params, opt_state, mb, k, idx):
        g = jax.grad(lambda pv: self.loss_module(params.set("value", pv), mb)[0])(
            params["value"]
        )
        updates, opt_state = self.tx.update(g, opt_state, params["value"])
        return params.set("value", optax.apply_updates(params["value"], updates)), opt_state

    def _post_update(self, params, idx=0):
        return params.set(
            "target_value", self.updater(params["target_value"], params["value"])
        )


class DDPGTrainer(_OffPolicyTrainer):
    """DDPG: deterministic actor + annealed Gaussian exploration
    (reference trainers/algorithms/ddpg.py)."""

    def __init__(self, env, actor, qvalue, *, frames_per_batch=128,
                 total_frames=100000, buffer_capacity=1_000_000, batch_size=256,
                 utd=8, lr_actor=1e-4, lr_critic=1e-3, gamma=0.99, tau=0.005,
                 sigma_init=0.3, sigma_end=0.1, sigma_anneal_iters=1000,
                 init_random_frames=1000, seed=0, **base_kwargs):
        super().__init__(
            frames_per_batch=frames_per_batch, total_frames=total_frames,
            buffer_capacity=buffer_capacity, batch_size=batch_size, utd=utd,
            seed=seed, **base_kwargs,
        )
        from rl_tpu.modules import AdditiveGaussianModule
        from rl_tpu.objectives import DDPGLoss

        self.env = env
        self.actor = actor
        self.loss_module = DDPGLoss(actor, qvalue, gamma=gamma)
        self.updater = SoftUpdate(tau=tau)
        self.noise = AdditiveGaussianModule(
            env.action_spec, sigma_init=sigma_init, sigma_end=sigma_end,
            annealing_num_steps=sigma_anneal_iters,
        )

        def policy(pstate, td, k):
            td = actor(pstate["params"]["actor"], td)
            return self.noise(pstate["noise"], td, k)

        self.collector = Collector(
            env, policy, frames_per_batch=frames_per_batch,
            init_random_frames=init_random_frames,
        )
        key = jax.random.PRNGKey(seed)
        _, td0 = env.reset(key)
        example = jax.tree.map(
            lambda x: jnp.asarray(x)[:1] if env.batch_size else jnp.asarray(x)[None], td0
        )
        self.params = self.loss_module.init(key, example)
        self.tx = _split_optimizer(
            self.params, {"actor": lr_actor, "qvalue": lr_critic,
                          "target_actor": 0.0, "target_qvalue": 0.0}
        )
        self.opt_state = self.tx.init(self.params)

    def _init_aux(self) -> TDict:
        return TDict(noise=self.noise.init_state())

    def _step_aux(self, aux: TDict) -> TDict:
        return aux.set("noise", self.noise.step(aux["noise"]))

    def _policy_state(self, params, aux=None):
        noise = aux["noise"] if aux is not None else self.noise.init_state()
        return TDict(params=params, noise=noise)

    def _grad_and_update(self, params, opt_state, mb, k, idx):
        grads = jax.grad(lambda p: self.loss_module(p, mb, k)[0])(params)
        updates, opt_state = self.tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state

    def _post_update(self, params, idx=0):
        params = params.set(
            "target_qvalue", self.updater(params["target_qvalue"], params["qvalue"])
        )
        return params.set(
            "target_actor", self.updater(params["target_actor"], params["actor"])
        )


class TD3Trainer(DDPGTrainer):
    """TD3: twin critics, target smoothing, delayed actor + target updates
    every ``policy_delay`` critic steps inside the fused utd scan
    (reference trainers/algorithms/td3.py:149)."""

    def __init__(self, env, actor, qvalue, *, action_low=-1.0, action_high=1.0,
                 policy_delay: int = 2, policy_noise=0.2, noise_clip=0.5,
                 gamma=0.99, tau=0.005, lr_actor=3e-4, lr_critic=3e-4, **kwargs):
        from rl_tpu.objectives import TD3Loss

        super().__init__(env, actor, qvalue, gamma=gamma, tau=tau,
                         lr_actor=lr_actor, lr_critic=lr_critic, **kwargs)
        self.policy_delay = int(policy_delay)
        self.loss_module = TD3Loss(
            actor, qvalue, action_low=action_low, action_high=action_high,
            gamma=gamma, policy_noise=policy_noise, noise_clip=noise_clip,
        )
        key = jax.random.PRNGKey(self.seed)
        _, td0 = env.reset(key)
        example = jax.tree.map(
            lambda x: jnp.asarray(x)[:1] if env.batch_size else jnp.asarray(x)[None], td0
        )
        self.params = self.loss_module.init(key, example)
        # rebuild: the twin-critic tree differs from DDPG's single critic
        self.tx = _split_optimizer(
            self.params, {"actor": lr_actor, "qvalue": lr_critic,
                          "target_actor": 0.0, "target_qvalue": 0.0}
        )
        self.opt_state = self.tx.init(self.params)

    def _grad_and_update(self, params, opt_state, mb, k, idx):
        # critic step every call; actor step masked to every policy_delay-th
        grads = jax.grad(lambda p: self.loss_module(p, mb, k)[0])(params)
        do_actor = (idx % self.policy_delay) == 0
        grads = grads.set(
            "actor",
            jax.tree.map(lambda g: jnp.where(do_actor, g, jnp.zeros_like(g)),
                         grads["actor"]),
        )
        updates, opt_state = self.tx.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        # hold actor exactly still on non-actor steps (adam moments would
        # otherwise produce a small drift from decayed momentum)
        new_params = new_params.set(
            "actor",
            jax.tree.map(lambda a, b: jnp.where(do_actor, a, b),
                         new_params["actor"], params["actor"]),
        )
        return new_params, opt_state

    def _post_update(self, params, idx=0):
        # targets track only on delayed steps (Fujimoto et al. cadence)
        do = (idx % self.policy_delay) == 0
        new_q = self.updater(params["target_qvalue"], params["qvalue"])
        new_a = self.updater(params["target_actor"], params["actor"])
        sel = lambda n, o: jax.tree.map(lambda x, y: jnp.where(do, x, y), n, o)
        return params.set("target_qvalue", sel(new_q, params["target_qvalue"])) \
                     .set("target_actor", sel(new_a, params["target_actor"]))


class OfflineTrainer(_TrainerBase):
    """Offline RL over a fixed flat [N] dataset TDict: jit-fused chunks of
    uniform-minibatch gradient steps (reference offline sota scripts / the
    IQL/CQL trainer classes, trainers/algorithms/)."""

    def __init__(self, dataset, loss_module, *, batch_size=256,
                 gradient_steps=50_000, steps_per_chunk=100, lr=3e-4,
                 needs_key: bool = True, tau: float = 0.005,
                 target_keys=(("target_qvalue", "qvalue"),), seed=0,
                 **base_kwargs):
        super().__init__(**base_kwargs)
        self.dataset = dataset
        self.loss_module = loss_module
        self.batch_size = int(batch_size)
        self.gradient_steps = int(gradient_steps)
        self.steps_per_chunk = int(steps_per_chunk)
        self.needs_key = needs_key
        self.target_keys = [(t, s) for t, s in target_keys]
        self.updater = SoftUpdate(tau=tau)
        self._key = jax.random.PRNGKey(seed)
        example = jax.tree.map(lambda x: jnp.asarray(x)[:1], dataset)
        self.params = loss_module.init(jax.random.PRNGKey(seed), example)
        self.tx = optax.adam(lr)
        self.opt_state = self.tx.init(self.params)
        self._n = int(jnp.asarray(jax.tree.leaves(dataset)[0]).shape[0])
        self._chunk = jax.jit(self._chunk_impl, donate_argnums=(0, 1))

    def _chunk_impl(self, params, opt_state, key):
        def step(carry, k):
            params, opt_state = carry
            k_idx, k_loss = jax.random.split(k)
            idx = jax.random.randint(k_idx, (self.batch_size,), 0, self._n)
            mb = jax.tree.map(lambda x: x[idx], self.dataset)
            if self.needs_key:
                fn = lambda p: self.loss_module(p, mb, k_loss)[0]
            else:
                fn = lambda p: self.loss_module(p, mb)[0]
            total, grads = jax.value_and_grad(fn)(params)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            for tgt, src in self.target_keys:
                if tgt in params:
                    params = params.set(tgt, self.updater(params[tgt], params[src]))
            return (params, opt_state), total

        (params, opt_state), losses = jax.lax.scan(
            step, (params, opt_state), jax.random.split(key, self.steps_per_chunk)
        )
        return params, opt_state, losses.mean()

    def train(self):
        done_steps = 0
        it = 0
        while done_steps < self.gradient_steps:
            self._key, k = jax.random.split(self._key)
            self.params, self.opt_state, loss = self._chunk(
                self.params, self.opt_state, k
            )
            done_steps += self.steps_per_chunk
            self._log({"train/loss": float(loss)}, step=done_steps)
            self._key, k = jax.random.split(self._key)
            self._maybe_eval_and_save(it, self.params, k, done_steps)
            it += 1
        return self.params


class IQLTrainer(OfflineTrainer):
    """Reference trainers/algorithms/iql.py — expectile IQL on a dataset."""

    def __init__(self, dataset, actor, qvalue, value, *, gamma=0.99,
                 expectile=0.7, temperature=3.0, **kwargs):
        from rl_tpu.objectives import IQLLoss

        loss = IQLLoss(actor, qvalue, value, gamma=gamma, expectile=expectile,
                       temperature=temperature)
        super().__init__(dataset, loss, **kwargs)


class CQLTrainer(OfflineTrainer):
    """Reference trainers/algorithms/cql.py — conservative Q-learning."""

    def __init__(self, dataset, actor, qvalue, *, action_dim,
                 action_low=-1.0, action_high=1.0, cql_alpha=1.0,
                 gamma=0.99, **kwargs):
        from rl_tpu.objectives import CQLLoss

        loss = CQLLoss(actor, qvalue, action_low=action_low,
                       action_high=action_high, cql_alpha=cql_alpha,
                       gamma=gamma, action_dim=action_dim)
        super().__init__(dataset, loss, **kwargs)


class TD3BCTrainer(OfflineTrainer):
    """TD3+BC offline (reference objectives/td3_bc.py:27 + sota script)."""

    def __init__(self, dataset, actor, qvalue, *, action_low=-1.0,
                 action_high=1.0, alpha_bc=2.5, gamma=0.99, **kwargs):
        from rl_tpu.objectives import TD3BCLoss

        loss = TD3BCLoss(actor, qvalue, action_low=action_low,
                         action_high=action_high, alpha_bc=alpha_bc, gamma=gamma)
        super().__init__(
            dataset, loss,
            target_keys=(("target_qvalue", "qvalue"), ("target_actor", "actor")),
            **kwargs,
        )


class OfflineToOnlineTrainer(_TrainerBase):
    """Offline pretrain then online fine-tune with mixed offline/online
    minibatches (reference trainers/algorithms/offline_to_online.py:149,
    data/replay_buffers/offline_to_online.py:14)."""

    def __init__(self, dataset, online_trainer: _OffPolicyTrainer, *,
                 pretrain_steps=10_000, mix_ratio: float = 0.5, **base_kwargs):
        super().__init__(**base_kwargs)
        self.dataset = dataset
        self.online = online_trainer
        self.pretrain_steps = int(pretrain_steps)
        self.mix_ratio = float(mix_ratio)

    def train(self):
        # 1) offline pretrain on the dataset with the online trainer's loss
        pre = OfflineTrainer(
            self.dataset, self.online.loss_module,
            batch_size=self.online.batch_size,
            gradient_steps=self.pretrain_steps, logger=self.logger,
        )
        pre.params = self.online.params
        pre.opt_state = pre.tx.init(pre.params)
        self.online.params = pre.train()
        # 2) online fine-tune; the replay buffer is seeded with offline data
        n_seed = min(self.online.rb.storage.capacity,
                     int(jnp.asarray(jax.tree.leaves(self.dataset)[0]).shape[0]))
        seed_batch = jax.tree.map(lambda x: x[:n_seed], self.dataset)
        self.online._seed_batch = seed_batch
        return self.online.train()


class A2CTrainer(PPOTrainer):
    """Advantage actor-critic (reference trainers/algorithms/ppo.py's
    ``A2CTrainer`` over ``OnPolicyTrainer``): same collect→GAE→update shape
    as PPO with the A2C objective and single-pass (no clipped epochs)
    defaults."""

    def __init__(self, env, actor, critic, *, num_epochs: int = 1,
                 minibatches: int = 1, entropy_coeff: float = 0.01, **kwargs):
        super().__init__(env, actor, critic, num_epochs=num_epochs,
                         minibatches=minibatches,
                         entropy_coeff=entropy_coeff, **kwargs)

    def _make_loss(self, actor, critic, *, clip_epsilon, entropy_coeff,
                   critic_coeff=1.0, loss_critic_type="smooth_l1", **kw):
        from rl_tpu.objectives import A2CLoss

        return A2CLoss(actor, critic, entropy_coeff=entropy_coeff,
                       critic_coeff=critic_coeff,
                       loss_critic_type=loss_critic_type)


class ReinforceTrainer(PPOTrainer):
    """REINFORCE with a learned state-value baseline (reference
    ``ReinforceTrainer``)."""

    def __init__(self, env, actor, critic, *, num_epochs: int = 1,
                 minibatches: int = 1, **kwargs):
        super().__init__(env, actor, critic, num_epochs=num_epochs,
                         minibatches=minibatches, **kwargs)

    def _make_loss(self, actor, critic, *, clip_epsilon, entropy_coeff,
                   **kw):
        from rl_tpu.objectives import ReinforceLoss

        return ReinforceLoss(actor, critic)


class GenericOffPolicyTrainer(_OffPolicyTrainer):
    """Off-policy trainer over an arbitrary LossModule.

    The escape hatch the reference gets from hand-rolled sota scripts:
    ``loss_module`` is any LossModule whose ``init`` builds the full param
    TDict; ``policy`` maps ``(params, td, key) -> td`` for collection;
    ``target_keys`` lists ``(target, source)`` param sub-trees to polyak
    after every gradient step.  Used by the CrossQ/REDQ/DiscreteSAC sota
    scripts.
    """

    def __init__(self, env, loss_module, policy, *, target_keys=(),
                 lr=3e-4, tau=0.005, frames_per_batch=128,
                 total_frames=100_000, buffer_capacity=1_000_000,
                 batch_size=256, utd=4, init_random_frames=0, seed=0,
                 tx=None, **base_kwargs):
        super().__init__(
            frames_per_batch=frames_per_batch, total_frames=total_frames,
            buffer_capacity=buffer_capacity, batch_size=batch_size, utd=utd,
            seed=seed, **base_kwargs,
        )
        self.env = env
        self.loss_module = loss_module
        self.target_keys = [(t, s) for t, s in target_keys]
        self.updater = SoftUpdate(tau=tau)
        self.collector = Collector(
            env, policy, frames_per_batch=frames_per_batch,
            init_random_frames=init_random_frames,
        )
        key = jax.random.PRNGKey(seed)
        _, td0 = env.reset(key)
        example = jax.tree.map(
            lambda x: jnp.asarray(x)[:1] if env.batch_size
            else jnp.asarray(x)[None], td0)
        self.params = loss_module.init(key, example)
        # optional optax override (e.g. CrossQ's Adam(b1=0.5) — reference
        # sota-implementations/crossq/config.yaml optim.beta1)
        self.tx = optax.adam(lr) if tx is None else tx
        self.opt_state = self.tx.init(self.params)

    def _grad_and_update(self, params, opt_state, mb, k, idx):
        grads = jax.grad(lambda p: self.loss_module(p, mb, k)[0])(params)
        updates, opt_state = self.tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state

    def _post_update(self, params, idx=0):
        for tgt, src in self.target_keys:
            if tgt in params:
                params = params.set(tgt, self.updater(params[tgt], params[src]))
        return params


class MultiAgentPPOTrainer(PPOTrainer):
    """MAPPO/IPPO over grouped ("agents", ...) batches (reference
    sota-implementations/multiagent_trainer + trainers/algorithms): the
    PPO collect→GAE→update shape with the multi-agent clipped objective.
    ``variant``: "mappo" (centralized critic loss) or "ippo"."""

    def __init__(self, env, actor, critic, *, variant: str = "mappo",
                 **kwargs):
        if variant not in ("mappo", "ippo"):
            raise ValueError(f"variant must be mappo|ippo, got {variant}")
        self._variant = variant
        super().__init__(env, actor, critic, **kwargs)

    def _make_loss(self, actor, critic, *, clip_epsilon, entropy_coeff,
                   **kw):
        from rl_tpu.objectives import IPPOLoss, MAPPOLoss

        cls = MAPPOLoss if self._variant == "mappo" else IPPOLoss
        return cls(actor, critic, clip_epsilon=clip_epsilon,
                   entropy_coeff=entropy_coeff)

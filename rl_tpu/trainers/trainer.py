"""Trainer orchestration with the reference's hook system.

Counterpart of ``/root/reference/torchrl/trainers/trainers.py``: ``Trainer``
:320 (collect → batch hooks → epochs × optim-steps with process/post-loss/
post-optim hooks → post-steps + logging), ``OptimizationStepper`` :200, and
the hook classes :1761-3046 (each cited below).

Perf note: the flagship path stays the fully-fused jitted update (see
rl_tpu.trainers.algos); this Trainer trades a little fusion for the
reference's extensibility — hooks are host python between jitted stages.
"""
from __future__ import annotations

from collections import defaultdict
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from rl_tpu.data import TDict
from rl_tpu.utils import timeit

__all__ = [
    "Trainer",
    "ReplayBufferTrainer",
    "BatchSubSampler",
    "LogScalar",
    "CountFramesLog",
    "TargetNetUpdaterHook",
    "ValueEstimatorHook",
    "RewardNormalizer",
    "UpdateWeights",
    "EarlyStopping",
    "SelectKeys",
    "OptimizationStepper",
    "OptimizerHook",
    "LogTiming",
    "UTDRHook",
    "LRSchedulerHook",
    "ClearDeviceCache",
]

HOOK_POINTS = (
    "batch_process",
    "pre_optim_steps",
    "process_optim_batch",
    "post_loss",
    "post_optim",
    "post_steps",
    "pre_steps_log",
    "post_steps_log",
    "post_optim_log",
)


class Trainer:
    def __init__(
        self,
        *,
        collector,
        loss_module,
        optimizer: optax.GradientTransformation,
        params: TDict,
        total_frames: int,
        optim_steps_per_batch: int = 1,
        num_epochs: int = 1,
        logger=None,
        log_interval: int = 1,
        save_trainer_interval: int = 0,
        save_path: str | None = None,
        seed: int = 0,
        progress_bar: bool = False,
    ):
        self.collector = collector
        self.loss_module = loss_module
        self.tx = optimizer
        self.params = params
        self.total_frames = int(total_frames)
        self.optim_steps_per_batch = int(optim_steps_per_batch)
        self.num_epochs = int(num_epochs)
        self.logger = logger
        self.log_interval = int(log_interval)
        self.save_trainer_interval = int(save_trainer_interval)
        self.save_path = save_path
        self.seed = seed
        self.progress_bar = progress_bar
        self._hooks: dict[str, list] = defaultdict(list)
        self.opt_state = self.tx.init(params)
        self.collected_frames = 0
        self._stop = False
        self._key = jax.random.PRNGKey(seed)

        self._grad_step = jax.jit(self._grad_step_impl)

    # -- hooks --------------------------------------------------------------
    def register_op(self, dest: str, op: Callable, **kwargs) -> None:
        """Register a hook (reference Trainer.register_op, names at
        trainers.py:503-550)."""
        if dest not in HOOK_POINTS:
            raise ValueError(f"unknown hook point {dest}; valid: {HOOK_POINTS}")
        self._hooks[dest].append((op, kwargs))

    def register_module(self, module: Any) -> None:
        """Let a hook object attach itself (reference TrainerHookBase)."""
        module.register(self)

    def _run_hooks(self, dest: str, *args):
        out = args[0] if args else None
        for op, kwargs in self._hooks[dest]:
            res = op(*((out,) + args[1:] if args else ()), **kwargs)
            if res is not None and args:
                out = res
        return out

    # -- optimization -------------------------------------------------------
    def _grad_step_impl(self, params, opt_state, batch, key):
        (total, metrics), grads = jax.value_and_grad(
            lambda p: self.loss_module(p, batch, key), has_aux=True
        )(params)
        updates, opt_state = self.tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        gn = optax.global_norm(grads)
        return params, opt_state, metrics.set("grad_norm", gn).set("loss_total", total)

    def next_key(self):
        self._key, k = jax.random.split(self._key)
        return k

    # -- main loop ----------------------------------------------------------
    def train(self) -> TDict:
        cstate = self.collector.init(self.next_key())
        pbar = None
        if self.progress_bar:
            import tqdm

            pbar = tqdm.tqdm(total=self.total_frames, unit="frames")
        it = 0
        while self.collected_frames < self.total_frames and not self._stop:
            with timeit("trainer/collect"):
                cstate, batch = self.collector.collect(self.params, cstate)
            self.collected_frames += self.collector.frames_per_batch
            batch = self._run_hooks("batch_process", batch)

            with timeit("trainer/optim"):
                last_metrics = None
                for _ in range(self.num_epochs):
                    self._run_hooks("pre_optim_steps")
                    for _ in range(self.optim_steps_per_batch):
                        sub = self._run_hooks("process_optim_batch", batch)
                        if sub is None:
                            sub = batch
                        self.params, self.opt_state, metrics = self._grad_step(
                            self.params, self.opt_state, sub, self.next_key()
                        )
                        self._run_hooks("post_loss", sub, metrics)
                        self.params = (
                            self._run_hooks("post_optim", self.params) or self.params
                        )
                        last_metrics = metrics

            self._run_hooks("post_steps")

            if it % self.log_interval == 0:
                self._run_hooks("pre_steps_log", batch, self)
                if self.logger is not None and last_metrics is not None:
                    for k in last_metrics.keys(include_nested=True, leaves_only=True):
                        v = np.asarray(last_metrics[k])
                        if v.ndim == 0:
                            name = k if isinstance(k, str) else "/".join(k)
                            self.logger.log_scalar(
                                f"train/{name}", float(v), step=self.collected_frames
                            )
                self._run_hooks("post_steps_log", batch, self)

            if (
                self.save_path
                and self.save_trainer_interval
                and it % self.save_trainer_interval == 0
            ):
                self.save_trainer()
            if pbar:
                pbar.update(self.collector.frames_per_batch)
            it += 1
        if pbar:
            pbar.close()
        return self.params

    def stop(self):
        self._stop = True

    # -- persistence --------------------------------------------------------
    def save_trainer(self):
        from rl_tpu.checkpoint import Checkpoint

        ckpt = Checkpoint()
        ckpt.register("params", lambda: self.params,
                      lambda v: setattr(self, "params", v))
        ckpt.register("opt_state", lambda: self.opt_state,
                      lambda v: setattr(self, "opt_state", v))
        ckpt.register_metadata("collected_frames", self.collected_frames)
        ckpt.save(self.save_path)

    def load_trainer(self, path: str | None = None):
        from rl_tpu.checkpoint import Checkpoint

        ckpt = Checkpoint()
        ckpt.register("params", lambda: self.params,
                      lambda v: setattr(self, "params", v))
        ckpt.register("opt_state", lambda: self.opt_state,
                      lambda v: setattr(self, "opt_state", v))
        ckpt.load(path or self.save_path)


# ---------------------------------------------------------------------------
# Hook classes (reference trainers.py:1761+)


class SelectKeys:
    """Keep only selected keys in the batch (reference :1761)."""

    def __init__(self, keys):
        self.keys = keys

    def __call__(self, batch: TDict) -> TDict:
        return batch.select(*self.keys, strict=False)

    def register(self, trainer: Trainer):
        trainer.register_op("batch_process", self)


class ReplayBufferTrainer:
    """extend on collect / sample for optimization / priority update
    (reference :1806)."""

    def __init__(self, replay_buffer, batch_size: int | None = None,
                 flatten: bool = True, priority_key: str = "td_error"):
        self.rb = replay_buffer
        self.batch_size = batch_size
        self.flatten = flatten
        self.priority_key = priority_key
        self._last_info = None

    def extend(self, batch: TDict) -> TDict:
        data = (
            batch.apply(lambda x: x.reshape((-1,) + x.shape[2:]))
            if self.flatten
            else batch
        )
        self.rb.extend(data)
        return batch

    def sample(self, batch: TDict) -> TDict:
        out, info = self.rb.sample(self.batch_size, return_info=True)
        self._last_info = info
        if "_weight" in info:
            out = out.set("_weight", info["_weight"])
        return out

    def update_priority(self, batch: TDict, metrics: TDict) -> None:
        if self._last_info is not None and self.priority_key in metrics:
            prio = jnp.asarray(metrics[self.priority_key]).reshape(-1)
            idx = self._last_info["index"]
            if prio.shape[0] == np.asarray(idx).shape[0]:
                self.rb.update_priority(idx, prio)

    def register(self, trainer: Trainer):
        trainer.register_op("batch_process", self.extend)
        trainer.register_op("process_optim_batch", self.sample)
        trainer.register_op("post_loss", self.update_priority)


class BatchSubSampler:
    """Random sub-batch from the (flattened) on-policy batch (reference :2354)."""

    def __init__(self, batch_size: int, seed: int = 0):
        self.batch_size = batch_size
        self._key = jax.random.PRNGKey(seed)

    def __call__(self, batch: TDict) -> TDict:
        flat = batch.apply(lambda x: x.reshape((-1,) + x.shape[2:]))
        n = np.asarray(jax.tree.leaves(flat)[0]).shape[0]
        self._key, k = jax.random.split(self._key)
        idx = jax.random.choice(k, n, (self.batch_size,), replace=False)
        return flat[idx]

    def register(self, trainer: Trainer):
        trainer.register_op("process_optim_batch", self)


class LogScalar:
    """Log a batch key's mean (reference LogScalar :2119)."""

    def __init__(self, key=("next", "reward"), logname: str = "r_training"):
        self.key = key
        self.logname = logname

    def __call__(self, batch: TDict, trainer: Trainer) -> None:
        if self.key in batch and trainer.logger:
            trainer.logger.log_scalar(
                self.logname,
                float(np.asarray(batch[self.key]).mean()),
                step=trainer.collected_frames,
            )

    def register(self, trainer: Trainer):
        trainer.register_op("pre_steps_log", self)


class CountFramesLog:
    """Log cumulative frames (reference :2766)."""

    def __call__(self, batch: TDict, trainer: Trainer) -> None:
        if trainer.logger:
            trainer.logger.log_scalar(
                "collected_frames", trainer.collected_frames, step=trainer.collected_frames
            )

    def register(self, trainer: Trainer):
        trainer.register_op("pre_steps_log", self)


class TargetNetUpdaterHook:
    """Apply a Soft/Hard updater to ``target_*`` param groups after each
    optim step (reference :2836)."""

    def __init__(self, updater, source_key: str = "qvalue",
                 target_key: str = "target_qvalue", every: int = 1):
        self.updater = updater
        self.source_key = source_key
        self.target_key = target_key
        self.every = every
        self._count = 0

    def __call__(self, params: TDict) -> TDict:
        self._count += 1
        if self._count % self.every:
            return params
        return params.set(
            self.target_key,
            self.updater(params[self.target_key], params[self.source_key]),
        )

    def register(self, trainer: Trainer):
        trainer.register_op("post_optim", self)


class ValueEstimatorHook:
    """Run a value estimator over the collected batch (reference :2865)."""

    def __init__(self, estimator, params_key: str = "critic"):
        self.estimator = estimator
        self.params_key = params_key
        self._trainer = None

    def __call__(self, batch: TDict) -> TDict:
        params = self._trainer.params[self.params_key]
        return self.estimator(params, batch)

    def register(self, trainer: Trainer):
        self._trainer = trainer
        trainer.register_op("batch_process", self)


class RewardNormalizer:
    """Running-stat reward normalization (reference :2225)."""

    def __init__(self, decay: float = 0.999, eps: float = 1e-6,
                 reward_key=("next", "reward")):
        self.decay = decay
        self.eps = eps
        self.reward_key = reward_key
        self._mean = 0.0
        self._var = 1.0
        self._initialized = False

    def __call__(self, batch: TDict) -> TDict:
        r = np.asarray(batch[self.reward_key])
        m, v = float(r.mean()), float(r.var())
        if not self._initialized:
            self._mean, self._var, self._initialized = m, max(v, self.eps), True
        else:
            self._mean = self.decay * self._mean + (1 - self.decay) * m
            self._var = self.decay * self._var + (1 - self.decay) * v
        scale = float(np.sqrt(self._var) + self.eps)
        return batch.set(self.reward_key, (batch[self.reward_key] - self._mean) / scale)

    def register(self, trainer: Trainer):
        trainer.register_op("batch_process", self)


class UpdateWeights:
    """Push fresh params to the collector (reference :2644).  With the
    functional collector this is automatic (params are an argument); kept
    for API parity with multi-process/remote collectors."""

    def __init__(self, collector, every: int = 1):
        self.collector = collector
        self.every = every
        self._count = 0

    def __call__(self) -> None:
        self._count += 1

    def register(self, trainer: Trainer):
        trainer.register_op("post_steps", self)


class EarlyStopping:
    """Stop when a logged metric plateaus/exceeds a bound (reference :3046)."""

    def __init__(self, key=("next", "reward"), target: float | None = None,
                 patience: int = 10, min_delta: float = 0.0):
        self.key = key
        self.target = target
        self.patience = patience
        self.min_delta = min_delta
        self._best = -np.inf
        self._bad = 0

    def __call__(self, batch: TDict, trainer: Trainer) -> None:
        val = float(np.asarray(batch[self.key]).mean())
        if self.target is not None and val >= self.target:
            trainer.stop()
            return
        if val > self._best + self.min_delta:
            self._best, self._bad = val, 0
        else:
            self._bad += 1
            if self._bad >= self.patience:
                trainer.stop()

    def register(self, trainer: Trainer):
        trainer.register_op("pre_steps_log", self)


class OptimizationStepper:
    """Standalone grad step: loss → grads → clip → optax update
    (reference ``OptimizationStepper`` trainers.py:200/249).

    The Trainer owns its own fused ``_grad_step``; this class is the
    composable form for custom loops and for ``OptimizerHook``.
    """

    def __init__(self, loss_module, optimizer: optax.GradientTransformation,
                 *, clip_grad_norm: float | None = None):
        self.loss_module = loss_module
        self.tx = (optax.chain(optax.clip_by_global_norm(clip_grad_norm),
                               optimizer)
                   if clip_grad_norm else optimizer)
        self._step = jax.jit(self._step_impl)

    def init(self, params):
        return self.tx.init(params)

    def _step_impl(self, params, opt_state, batch, key):
        (total, metrics), grads = jax.value_and_grad(
            lambda p: self.loss_module(p, batch, key), has_aux=True
        )(params)
        updates, opt_state = self.tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, metrics.set(
            "grad_norm", optax.global_norm(grads)).set("loss_total", total)

    def __call__(self, params, opt_state, batch, key):
        return self._step(params, opt_state, batch, key)


class OptimizerHook:
    """Run a (possibly secondary) optimizer over a subset of loss components
    (reference ``OptimizerHook`` trainers.py:1923).

    Registered at ``post_loss``; owns an :class:`OptimizationStepper` and a
    ``loss_components`` filter: only ``loss_*`` keys in the filter contribute
    to this optimizer's gradient.  Used to train different parameter groups
    with different optimizers/loss subsets (e.g. world model vs actor).
    """

    def __init__(self, optimizer: optax.GradientTransformation, *,
                 loss_components=None):
        self.tx = optimizer
        self.loss_components = (
            tuple(loss_components) if loss_components is not None else None)
        self.opt_state = None
        self._trainer = None
        self._step = jax.jit(self._step_impl)

    def _filtered_total(self, metrics: TDict):
        total = 0.0
        for k, v in metrics.items(include_nested=True, leaves_only=True):
            name = k if isinstance(k, str) else k[-1]
            if not (isinstance(name, str) and name.startswith("loss_")):
                continue
            if self.loss_components is None or name in self.loss_components:
                total = total + v
        return total

    def _step_impl(self, params, opt_state, batch, key):
        def fwd(p):
            metrics = self._trainer.loss_module.loss(p, batch, key)
            return self._filtered_total(metrics), metrics

        (_, metrics), grads = jax.value_and_grad(fwd, has_aux=True)(params)
        updates, opt_state = self.tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, metrics

    def __call__(self, batch, metrics=None):
        tr = self._trainer
        if self.opt_state is None:
            self.opt_state = self.tx.init(tr.params)
        tr.params, self.opt_state, _ = self._step(
            tr.params, self.opt_state, batch, tr.next_key())

    def register(self, trainer: "Trainer"):
        self._trainer = trainer
        trainer.register_op("post_loss", self)


class LogTiming:
    """Log the ``timeit`` registry means as ``time/...`` scalars
    (reference ``LogTiming`` trainers.py:2042)."""

    def __init__(self, prefix: str = "time"):
        self.prefix = prefix

    def __call__(self, batch, trainer: "Trainer"):
        if trainer.logger is None:
            return
        for name, stats in timeit.todict().items():
            trainer.logger.log_scalar(
                f"{self.prefix}/{name}", float(stats["mean"]),
                step=trainer.collected_frames)

    def register(self, trainer: "Trainer"):
        trainer.register_op("post_steps_log", self)


class UTDRHook:
    """Track and log the update-to-data ratio (gradient steps per collected
    frame; reference ``UTDRHook`` trainers.py:2978)."""

    def __init__(self):
        self.grad_steps = 0
        self._trainer = None

    def count(self, batch, metrics=None):
        self.grad_steps += 1

    def __call__(self, batch, trainer: "Trainer"):
        if trainer.collected_frames:
            utd = self.grad_steps / trainer.collected_frames
            if trainer.logger is not None:
                trainer.logger.log_scalar(
                    "train/utd_ratio", utd, step=trainer.collected_frames)

    def register(self, trainer: "Trainer"):
        self._trainer = trainer
        trainer.register_op("post_loss", self.count)
        trainer.register_op("post_steps_log", self)


class LRSchedulerHook:
    """Step an optax schedule's count and log the current learning rate
    (reference ``LRSchedulerHook`` trainers.py:2915).

    With optax, schedules are wired into the optimizer
    (``optax.inject_hyperparams`` / schedule-aware transforms), so the hook's
    job reduces to surfacing the current value for logging.
    """

    def __init__(self, schedule: Callable[[int], float] | None = None):
        self.schedule = schedule
        self.steps = 0

    def count(self, batch, metrics=None):
        self.steps += 1

    def __call__(self, batch, trainer: "Trainer"):
        lr = None
        if self.schedule is not None:
            lr = float(self.schedule(self.steps))
        else:  # look for injected hyperparams in the opt state
            state = trainer.opt_state
            for s in jax.tree_util.tree_leaves(
                    state, is_leaf=lambda x: hasattr(x, "hyperparams")):
                if hasattr(s, "hyperparams") and "learning_rate" in s.hyperparams:
                    lr = float(s.hyperparams["learning_rate"])
        if lr is not None and trainer.logger is not None:
            trainer.logger.log_scalar(
                "train/learning_rate", lr, step=trainer.collected_frames)

    def register(self, trainer: "Trainer"):
        trainer.register_op("post_loss", self.count)
        trainer.register_op("post_steps_log", self)


class ClearDeviceCache:
    """Periodically drop XLA's live-buffer donation caches
    (reference ``ClearCudaCache`` trainers.py:2013 — on TPU there is no
    allocator cache to clear; we trigger a host GC + block on async work so
    freed device buffers are actually reclaimed)."""

    def __init__(self, interval: int = 100):
        self.interval = int(interval)
        self.calls = 0

    def __call__(self, *args):
        self.calls += 1
        if self.calls % self.interval == 0:
            import gc
            gc.collect()
            (jax.device_put(0.0) + 0).block_until_ready()

    def register(self, trainer: "Trainer"):
        trainer.register_op("pre_optim_steps", self)

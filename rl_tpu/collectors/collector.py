"""Collector — the data hot loop as a jitted ``lax.scan``.

Counterpart of the reference single-process collector
(``/root/reference/torchrl/collectors/_single.py``: ``Collector`` :297,
``rollout`` :2014, iterator :1761).  The reference's per-step python loop
(policy → device moves → env.step_and_maybe_reset → buffer append) becomes
one fused XLA program: policy∘step under ``lax.scan`` with the carrier td as
the scan carry (reference ``_make_carrier`` :1388) — there are no device
moves because policy and env live on the same chip, and "weight update"
(reference ``update_policy_weights_`` :1667) is just passing a new params
pytree into the next jitted call.

Yields time-first ``[T, B]`` trajectory batches carrying
``("collector", "traj_ids")`` (reference collectors/utils.py).
"""
from __future__ import annotations

from typing import Any, Callable, Iterator

import jax
import jax.numpy as jnp

from rl_tpu.data import TDict
from rl_tpu.envs.base import Env
from rl_tpu.modules.td_module import ExplorationType, set_exploration_type

__all__ = ["Collector", "split_trajectories"]


class Collector:
    """Functional core + python iterator.

    Functional API (jit-friendly)::

        cstate = collector.init(key)
        cstate, batch = collector.collect(params, cstate)   # [T, B] batch

    Iterator API (reference-compatible)::

        for batch in collector.iterator(params):
            ...
        collector.update_policy_weights_(new_params)
    """

    def __init__(
        self,
        env: Env,
        policy: Callable[[Any, TDict, jax.Array], TDict] | None,
        *,
        frames_per_batch: int,
        total_frames: int = -1,
        init_random_frames: int = 0,
        exploration_type: str = ExplorationType.RANDOM,
        postproc: Callable[[TDict], TDict] | None = None,
    ):
        self.env = env
        self.policy = policy
        num_envs = 1
        for d in env.batch_size:
            num_envs *= d
        self.num_envs = num_envs
        if frames_per_batch % num_envs:
            raise ValueError(
                f"frames_per_batch ({frames_per_batch}) must divide evenly by "
                f"the env batch ({num_envs})"
            )
        self.frames_per_batch = int(frames_per_batch)
        self.steps_per_batch = frames_per_batch // num_envs
        self.total_frames = int(total_frames)
        self.init_random_frames = int(init_random_frames)
        self.exploration_type = exploration_type
        self.postproc = postproc
        self._jit_collect = jax.jit(self._collect)
        self._params = None

    # -- functional API -----------------------------------------------------
    def init(self, key) -> TDict:
        k_reset, k_loop = jax.random.split(key)
        env_state, root = self.env.reset(k_reset)
        bshape = self.env.batch_size or ()
        traj_ids = jnp.arange(self.num_envs, dtype=jnp.int32).reshape(bshape or (1,))
        if not bshape:
            traj_ids = traj_ids.reshape(())
        return TDict(
            env_state=env_state,
            root=root,
            key=k_loop,
            traj_ids=traj_ids,
            next_traj_id=jnp.asarray(self.num_envs, jnp.int32),
            frames=jnp.asarray(0, jnp.int64 if jax.config.jax_enable_x64 else jnp.int32),
        )

    def _policy_or_random(self, params, td, key, frames):
        if self.policy is None:
            return self.env.rand_action(td, key)
        with set_exploration_type(self.exploration_type):
            td_policy = self.policy(params, td, key)
        if self.init_random_frames > 0:
            td_random = self.env.rand_action(td, key)
            use_random = frames < self.init_random_frames
            action = jnp.where(
                use_random, jnp.asarray(td_random["action"]), jnp.asarray(td_policy["action"])
            )
            return td_policy.set("action", action)
        return td_policy

    def _collect(self, params, cstate: TDict):
        env = self.env

        def body(carry, k):
            env_state, td, traj_ids, next_id, frames = carry
            k_pol, k_env = jax.random.split(k)
            td = self._policy_or_random(params, td, k_pol, frames)
            env_state, full_td, root = env.step_and_maybe_reset(env_state, td, k_env)
            done = jnp.asarray(full_td["next", "done"])
            d = done.squeeze(-1) if done.ndim and done.shape[-1] == 1 else done
            out = full_td.set(("collector", "traj_ids"), traj_ids)
            # renumber finished envs
            n_done = jnp.sum(d.astype(jnp.int32))
            new_ids = next_id + jnp.cumsum(d.astype(jnp.int32).reshape(-1)).reshape(d.shape) - 1
            traj_ids = jnp.where(d, new_ids.astype(jnp.int32), traj_ids)
            next_id = next_id + n_done
            frames = frames + self.num_envs
            return (env_state, root, traj_ids, next_id, frames), out

        keys = jax.random.split(cstate["key"], self.steps_per_batch + 1)
        carry = (
            cstate["env_state"],
            cstate["root"],
            cstate["traj_ids"],
            cstate["next_traj_id"],
            cstate["frames"],
        )
        carry, batch = jax.lax.scan(body, carry, keys[1:])
        env_state, root, traj_ids, next_id, frames = carry
        new_state = TDict(
            env_state=env_state,
            root=root,
            key=keys[0],
            traj_ids=traj_ids,
            next_traj_id=next_id,
            frames=frames,
        )
        return new_state, batch

    def collect(self, params, cstate: TDict):
        """One jitted batch: returns ``(new_cstate, batch[T, B])``."""
        cstate, batch = self._jit_collect(params, cstate)
        if self.postproc is not None:
            batch = self.postproc(batch)
        return cstate, batch

    # -- background collection (reference _single.py:1854: collector.start())
    def start(self, replay_buffer, *, params=None, key=None,
              flatten: bool = True, postproc=None) -> None:
        """Collect continuously on a background thread, extending
        ``replay_buffer`` after every batch.  ``update_policy_weights_`` swaps
        the params the thread uses (UTD-style async training).  Call
        :meth:`async_shutdown` to stop."""
        import threading

        if params is not None:
            self._params = params
        if key is None:
            key = jax.random.PRNGKey(0)
        self._stop_event = threading.Event()
        self._pause_event = threading.Event()
        self._idle_event = threading.Event()
        self.frames_collected = 0

        def loop():
            import time

            cstate = self.init(key)
            while not self._stop_event.is_set():
                if self._pause_event.is_set():
                    # Acknowledge the pause only once no batch is in flight,
                    # so pause() can block until progress truly stops.
                    self._idle_event.set()
                    time.sleep(0.01)
                    continue
                self._idle_event.clear()
                cstate, batch = self.collect(self._params, cstate)
                if flatten:
                    batch = batch.apply(lambda x: x.reshape((-1,) + x.shape[2:]))
                if postproc is not None:
                    batch = postproc(batch)
                replay_buffer.extend(batch)
                self.frames_collected += self.frames_per_batch
                if 0 < self.total_frames <= self.frames_collected:
                    break

        self._thread = threading.Thread(target=loop, daemon=True)
        self._thread.start()

    def pause(self) -> None:
        """Stop collection; blocks until the in-flight batch has landed so
        ``frames_collected`` is stable on return (reference _single.py pause
        semantics: workers park at a barrier before ack)."""
        self._pause_event.set()
        if getattr(self, "_thread", None) is not None and self._thread.is_alive():
            self._idle_event.wait(timeout=30.0)

    def resume(self) -> None:
        self._idle_event.clear()
        self._pause_event.clear()

    def async_shutdown(self, timeout: float = 10.0) -> None:
        self._stop_event.set()
        self._thread.join(timeout=timeout)

    def stats(self) -> dict:
        """Cheap scalar snapshot for LoggerMonitor."""
        return {"frames_collected": int(getattr(self, "frames_collected", 0))}

    # -- iterator API (reference-compatible) --------------------------------
    def update_policy_weights_(self, params) -> None:
        self._params = params

    def iterator(self, params=None, key=None) -> Iterator[TDict]:
        if params is not None:
            self._params = params
        if key is None:
            key = jax.random.PRNGKey(0)
        cstate = self.init(key)
        collected = 0
        while self.total_frames < 0 or collected < self.total_frames:
            cstate, batch = self.collect(self._params, cstate)
            collected += self.frames_per_batch
            yield batch

    __iter__ = iterator


def split_trajectories(batch: TDict, done_key=("next", "done")) -> TDict:
    """Reshape a ``[T, B]`` batch into padded ``[N_traj, L_max]`` trajectories
    with a ``mask`` key (reference collectors/utils.py:88).

    Host-side helper (dynamic shapes): use outside jit.
    """
    import numpy as np

    traj = np.asarray(batch["collector", "traj_ids"])
    T = traj.shape[0]
    flat_ids = traj.reshape(T, -1)
    B = flat_ids.shape[1]
    uniq = np.unique(flat_ids)
    lengths = {u: int((flat_ids == u).sum()) for u in uniq}
    L = max(lengths.values())

    def gather(leaf):
        leaf = np.asarray(leaf)
        out = np.zeros((len(uniq), L) + leaf.shape[2:], leaf.dtype)
        for i, u in enumerate(uniq):
            t_idx, b_idx = np.nonzero(flat_ids == u)
            sel = leaf.reshape((T, B) + leaf.shape[2:])[t_idx, b_idx]
            out[i, : len(sel)] = sel
        return out

    out = jax.tree.map(gather, batch)
    mask = np.zeros((len(uniq), L), bool)
    for i, u in enumerate(uniq):
        mask[i, : lengths[u]] = True
    return out.set("mask", jnp.asarray(mask))

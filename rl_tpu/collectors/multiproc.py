"""Multiprocess collector fleet — host-process data parallelism.

Counterpart of ``/root/reference/torchrl/collectors/_multi_sync.py:27``
(``MultiSyncCollector``), ``_multi_async.py:25`` (``MultiAsyncCollector``),
the worker main ``_runner.py:36`` (message protocol seed/update/continue/
pause/close), preemption ``_constants.py:53`` (``_Interruptor`` +
``preemptive_threshold`` ``_multi_base.py:231,933``) and worker-health
polling ``_multi_base.py:1209`` (``_recv_and_check``).

On TPU the *primary* parallel-collection strategy is a vmapped env under one
jitted ``lax.scan`` (see :class:`~rl_tpu.collectors.Collector`) — process
fleets exist for envs that cannot be traced (gym/dm_control/hardware), where
the GIL and per-env python stepping dominate.  Each worker process owns a
CPU-jax ``Collector`` over its env shard and ships finished ``[T, B_w]``
batches back as numpy pytrees; the parent concatenates shards along the env
axis and moves one fused batch to the device.  Differences from the
reference, by design:

- workers run the *same* fused scan collector (on host CPU), not a python
  step loop — there is one protocol message per batch, not per step;
- preemption cannot interrupt a compiled scan mid-flight, so workers chop
  the batch into ``num_chunks`` scans and poll the interrupt flag between
  chunks; preempted tails are zero-padded with ``traj_ids == -1`` and a
  False ``("collector", "mask")``;
- weight sync ships a numpy pytree through the pipe (fire-and-forget), the
  host analogue of swapping the params reference on device.
"""
from __future__ import annotations

import math
import contextlib
import multiprocessing as mp
import os
import time
from typing import Any, Callable, Iterator, Sequence

import numpy as np

__all__ = ["MultiSyncCollector", "MultiAsyncCollector"]


# --------------------------------------------------------------------------
# worker side
# --------------------------------------------------------------------------

def _worker_main(pipe, idx: int, env_fn, policy, cfg: dict, interrupt) -> None:
    """Worker process entry (reference ``_main_async_collector``
    _runner.py:36).  Message protocol:

    parent -> worker: ("seed", int) / ("update", numpy pytree) /
                      ("collect", None) / ("close", None)
    worker -> parent: ("ok", None) ack for seed/close, ("batch", pytree),
                      ("error", repr) on failure.
    """
    try:
        import jax

        if cfg.get("device", "cpu") == "cpu":
            jax.config.update("jax_platforms", "cpu")
        import jax.numpy as jnp

        from rl_tpu.collectors.collector import Collector

        env = env_fn() if callable(env_fn) else env_fn
        num_chunks = cfg["num_chunks"]
        coll = Collector(
            env,
            policy,
            frames_per_batch=cfg["frames_per_worker"] // num_chunks,
            init_random_frames=cfg["init_random_frames"],
            exploration_type=cfg["exploration_type"],
        )
        params = None
        cstate = None

        def one_round():
            nonlocal cstate
            chunks = [None] * num_chunks
            n_got = 0
            for c in range(num_chunks):
                # chunk 0 always runs so a template exists for padding
                if c > 0 and interrupt is not None and interrupt.is_set():
                    break
                cstate, b = coll.collect(params, cstate)
                chunks[c] = b
                n_got = c + 1
            tmpl = chunks[n_got - 1]
            t_chunk = None
            out_chunks = []
            for c in range(num_chunks):
                b = chunks[c]
                if b is None:
                    b = jax.tree.map(lambda x: jnp.zeros_like(x), tmpl)
                    b = b.set(
                        ("collector", "traj_ids"),
                        jnp.full_like(tmpl["collector", "traj_ids"], -1),
                    )
                    valid = False
                else:
                    valid = True
                if t_chunk is None:
                    t_chunk = jax.tree.leaves(b)[0].shape[0]
                b = b.set(
                    ("collector", "mask"),
                    jnp.full(
                        np.asarray(b["collector", "traj_ids"]).shape,
                        valid,
                        dtype=bool,
                    ),
                )
                out_chunks.append(b)
            batch = jax.tree.map(
                lambda *xs: jnp.concatenate(xs, axis=0), *out_chunks
            )
            return jax.tree.map(lambda x: np.asarray(jax.device_get(x)), batch)

        while True:
            cmd, payload = pipe.recv()
            if cmd == "seed":
                cstate = coll.init(jax.random.PRNGKey(int(payload)))
                pipe.send(("ok", None))
            elif cmd == "update":
                params = jax.tree.map(jnp.asarray, payload)
            elif cmd == "collect":
                pipe.send(("batch", one_round()))
            elif cmd == "close":
                close = getattr(env, "close", None)
                if close is not None:
                    close()
                pipe.send(("ok", None))
                return
    except (EOFError, KeyboardInterrupt):
        return
    except Exception as e:  # surface the traceback to the parent
        import traceback

        try:
            pipe.send(("error", f"{e!r}\n{traceback.format_exc()}"))
        except Exception:
            pass
        raise


# --------------------------------------------------------------------------
# parent side
# --------------------------------------------------------------------------

class _MultiCollectorBase:
    def __init__(
        self,
        env_fns: Sequence[Callable[[], Any]],
        policy,
        *,
        frames_per_batch: int,
        total_frames: int = -1,
        init_random_frames: int = 0,
        exploration_type: str = "random",
        num_chunks: int = 1,
        preemptive_threshold: float | None = None,
        worker_device: str = "cpu",
        postproc: Callable | None = None,
        seed: int = 0,
    ):
        if preemptive_threshold is not None and num_chunks <= 1:
            num_chunks = 8  # preemption needs chunk boundaries to land on
        self.num_workers = len(env_fns)
        if frames_per_batch % (self.num_workers * num_chunks):
            raise ValueError(
                f"frames_per_batch ({frames_per_batch}) must divide by "
                f"num_workers*num_chunks ({self.num_workers}*{num_chunks})"
            )
        self.frames_per_batch = int(frames_per_batch)
        self.frames_per_worker = frames_per_batch // self.num_workers
        self.total_frames = int(total_frames)
        self.preemptive_threshold = preemptive_threshold
        self.postproc = postproc
        self._closed = False

        ctx = mp.get_context("spawn")
        cfg = {
            "frames_per_worker": self.frames_per_worker,
            "num_chunks": num_chunks,
            "init_random_frames": init_random_frames // self.num_workers,
            "exploration_type": exploration_type,
            "device": worker_device,
        }
        self._pipes = []
        self._procs = []
        self._interrupts = []
        from rl_tpu.utils.subproc import cpu_worker_env

        with (cpu_worker_env() if worker_device == "cpu"
              else contextlib.nullcontext()):
            for i, fn in enumerate(env_fns):
                parent, child = ctx.Pipe()
                intr = (ctx.Event() if preemptive_threshold is not None
                        else None)
                p = ctx.Process(
                    target=_worker_main,
                    args=(child, i, fn, policy, cfg, intr),
                    daemon=True,
                )
                p.start()
                child.close()
                self._pipes.append(parent)
                self._procs.append(p)
                self._interrupts.append(intr)
        for i, pipe in enumerate(self._pipes):
            pipe.send(("seed", seed * 7919 + i))
        for i in range(self.num_workers):
            self._recv_and_check(i)

    # reference _multi_base.py:1209 — poll with liveness check
    def _recv_and_check(self, i: int, timeout: float = 300.0):
        pipe, proc = self._pipes[i], self._procs[i]
        deadline = time.monotonic() + timeout
        while not pipe.poll(0.05):
            if not proc.is_alive():
                raise RuntimeError(
                    f"collector worker {i} died (exitcode={proc.exitcode})"
                )
            if time.monotonic() > deadline:
                raise TimeoutError(f"collector worker {i}: no reply in {timeout}s")
        kind, payload = pipe.recv()
        if kind == "error":
            raise RuntimeError(f"collector worker {i} failed:\n{payload}")
        return payload

    def update_policy_weights_(self, params) -> None:
        import jax

        payload = jax.tree.map(lambda x: np.asarray(jax.device_get(x)), params)
        for pipe in self._pipes:
            pipe.send(("update", payload))

    def shutdown(self, timeout: float = 10.0) -> None:
        if self._closed:
            return
        self._closed = True
        for pipe, proc in zip(self._pipes, self._procs):
            try:
                if proc.is_alive():
                    pipe.send(("close", None))
            except (BrokenPipeError, OSError):
                pass
        for i, proc in enumerate(self._procs):
            proc.join(timeout=timeout)
            if proc.is_alive():
                proc.terminate()
        for pipe in self._pipes:
            pipe.close()

    def __del__(self):
        try:
            self.shutdown(timeout=1.0)
        except Exception:
            pass

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.shutdown()

    def _maybe_postproc(self, batch):
        return self.postproc(batch) if self.postproc is not None else batch


class MultiSyncCollector(_MultiCollectorBase):
    """Synchronous fleet: every iteration asks all workers for a shard and
    concatenates ``[T, B_w]`` shards along the env axis into ``[T, B]``
    (reference ``MultiSyncCollector`` _multi_sync.py:27, ``cat_results``).

    With ``preemptive_threshold=x``, once ``ceil(x * num_workers)`` shards
    have landed the remaining workers are interrupted at their next chunk
    boundary (reference ``_Interruptor`` _constants.py:53); preempted steps
    carry ``traj_ids == -1`` and ``("collector","mask") == False``.
    """

    def iterator(self, params=None) -> Iterator:
        import jax
        import jax.numpy as jnp

        if params is not None:
            self.update_policy_weights_(params)
        collected = 0
        n = self.num_workers
        thresh = (
            math.ceil(self.preemptive_threshold * n)
            if self.preemptive_threshold is not None
            else None
        )
        while self.total_frames < 0 or collected < self.total_frames:
            for pipe in self._pipes:
                pipe.send(("collect", None))
            got: dict[int, Any] = {}
            preempted = False
            while len(got) < n:
                for i, pipe in enumerate(self._pipes):
                    if i in got:
                        continue
                    if pipe.poll(0.002):
                        got[i] = self._recv_and_check(i)
                    elif not self._procs[i].is_alive():
                        raise RuntimeError(
                            f"collector worker {i} died "
                            f"(exitcode={self._procs[i].exitcode})"
                        )
                if thresh is not None and not preempted and len(got) >= thresh:
                    for i in range(n):
                        if i not in got:
                            self._interrupts[i].set()
                    preempted = True
            if preempted:
                for intr in self._interrupts:
                    intr.clear()
            shards = [got[i] for i in range(n)]
            batch = jax.tree.map(
                lambda *xs: jnp.concatenate([jnp.asarray(x) for x in xs], axis=1),
                *shards,
            )
            collected += self.frames_per_batch
            yield self._maybe_postproc(batch)

    __iter__ = iterator


class MultiAsyncCollector(_MultiCollectorBase):
    """First-come-first-served fleet: yields one worker's ``[T, B_w]`` batch
    as soon as it lands and immediately re-issues a collect to that worker
    (reference ``MultiAsyncCollector`` _multi_async.py:25).  Each yield is
    ``frames_per_batch / num_workers`` frames from a single worker; batches
    from different workers interleave in completion order.
    """

    def iterator(self, params=None) -> Iterator:
        import jax
        import jax.numpy as jnp

        if params is not None:
            self.update_policy_weights_(params)
        for pipe in self._pipes:
            pipe.send(("collect", None))
        outstanding = set(range(self.num_workers))
        collected = 0
        try:
            while self.total_frames < 0 or collected < self.total_frames:
                yielded = False
                for i, pipe in enumerate(self._pipes):
                    if i not in outstanding:
                        continue
                    if pipe.poll(0.002):
                        shard = self._recv_and_check(i)
                        pipe.send(("collect", None))
                        batch = jax.tree.map(jnp.asarray, shard)
                        collected += self.frames_per_worker
                        yielded = True
                        yield self._maybe_postproc(batch)
                        if 0 < self.total_frames <= collected:
                            return
                    elif not self._procs[i].is_alive():
                        raise RuntimeError(
                            f"collector worker {i} died "
                            f"(exitcode={self._procs[i].exitcode})"
                        )
                if not yielded:
                    time.sleep(0.005)
        finally:
            # drain outstanding batches so shutdown's close acks line up
            for i, pipe in enumerate(self._pipes):
                try:
                    if pipe.poll(1.0):
                        pipe.recv()
                except (EOFError, OSError):
                    pass

    __iter__ = iterator

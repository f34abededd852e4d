"""Asynchronous env pools — out-of-order stepping for host-bound envs.

Counterpart of ``/root/reference/torchrl/envs/async_envs.py``:
``AsyncEnvPool`` :59 (``async_step_send``/``async_step_recv``,
``async_reset_send``/``async_reset_recv``, ``env_index`` key),
``ThreadingAsyncEnvPool`` :841, ``ProcessorAsyncEnvPool`` :519.

On-device (jitted) envs never need this — a vmapped batch steps in lockstep
for free.  The pool exists for envs whose step time is host-bound and
variable (sim backends, remote envs): each sub-env advances independently
and the consumer harvests whichever results are ready, tagged with
``env_index`` so partial batches compose out of order.

The pool owns the functional env state: sub-envs are
:class:`~rl_tpu.envs.base.Env` instances with auto-reset
(``step_and_maybe_reset``) applied per env, so a recv'd step result carries
the post-reset root under the usual ``("next", ...)`` convention.
"""
from __future__ import annotations

import contextlib
import multiprocessing as mp
import time
from concurrent.futures import FIRST_COMPLETED, ThreadPoolExecutor, wait
from typing import Any, Callable, Sequence

import numpy as np

__all__ = ["AsyncEnvPool", "ThreadingAsyncEnvPool", "ProcessAsyncEnvPool"]


class AsyncEnvPool:
    """Factory: dispatches to a backend implementation.

    >>> pool = AsyncEnvPool([make_env] * 4, backend="threading")
    >>> pool.async_reset_send(seed=0)
    >>> td = pool.async_reset_recv(min_get=4)
    >>> td = td.set("action", policy(td["observation"]))
    >>> pool.async_step_send(td)
    >>> part = pool.async_step_recv(min_get=2)   # whichever 2+ finished
    >>> part["env_index"]
    """

    def __new__(cls, env_fns=None, *, backend: str = "threading", **kwargs):
        if cls is not AsyncEnvPool:
            return super().__new__(cls)
        if backend == "threading":
            return ThreadingAsyncEnvPool(env_fns, **kwargs)
        if backend in ("process", "mp", "multiprocessing"):
            return ProcessAsyncEnvPool(env_fns, **kwargs)
        raise ValueError(f"unknown AsyncEnvPool backend {backend!r}")

    # -- sync conveniences over the async protocol ---------------------------
    def reset(self, seed: int = 0):
        self.async_reset_send(seed=seed)
        return self.async_reset_recv(min_get=self.num_envs)

    def step(self, td):
        self.async_step_send(td)
        return self.async_step_recv(min_get=self.num_envs)


def _stack_rows(rows: Sequence[Any], indices: Sequence[int]):
    import jax
    import jax.numpy as jnp

    out = jax.tree.map(lambda *xs: jnp.stack(xs), *rows)
    return out.set("env_index", jnp.asarray(indices, jnp.int32))


class ThreadingAsyncEnvPool(AsyncEnvPool):
    """Thread-per-request pool (reference ``ThreadingAsyncEnvPool`` :841).

    jax CPU execution releases the GIL, so N single-env jitted steps overlap
    well; use the process backend for GIL-holding python envs.
    """

    def __init__(self, env_fns: Sequence[Callable[[], Any]], **kwargs):
        import jax

        self.envs = [fn() for fn in env_fns]
        self.num_envs = len(self.envs)
        self._exec = ThreadPoolExecutor(max_workers=self.num_envs)
        self._state = [None] * self.num_envs
        self._root = [None] * self.num_envs
        self._key = [None] * self.num_envs
        self._pending: dict[int, Any] = {}
        self._jax = jax

    def _reset_one(self, i: int, seed: int):
        import jax

        k = jax.random.PRNGKey(seed)
        k, k_reset = jax.random.split(k)
        state, root = self.envs[i].reset(k_reset)
        self._state[i], self._root[i], self._key[i] = state, root, k
        return root

    def _step_one(self, i: int, action):
        import jax

        self._key[i], k_env = jax.random.split(self._key[i])
        td = self._root[i].set("action", action)
        state, full_td, root = self.envs[i].step_and_maybe_reset(
            self._state[i], td, k_env
        )
        self._state[i], self._root[i] = state, root
        return full_td

    def async_reset_send(self, seed: int = 0, env_index=None) -> None:
        idx = range(self.num_envs) if env_index is None else np.asarray(env_index)
        for i in idx:
            i = int(i)
            if i in self._pending:
                raise RuntimeError(f"env {i} already has a pending request")
            self._pending[i] = self._exec.submit(self._reset_one, i, seed * 7919 + i)

    def async_step_send(self, td) -> None:
        indices = np.asarray(td["env_index"]).reshape(-1)
        actions = td["action"]
        for row, i in enumerate(indices):
            i = int(i)
            if i in self._pending:
                raise RuntimeError(f"env {i} already has a pending request")
            self._pending[i] = self._exec.submit(self._step_one, i, actions[row])

    def _recv(self, min_get: int):
        if min_get > len(self._pending):
            raise RuntimeError(
                f"min_get={min_get} exceeds pending requests ({len(self._pending)})"
            )
        futs = {f: i for i, f in self._pending.items()}
        done, _ = wait(futs, return_when=FIRST_COMPLETED)
        while len(done) < min_get:
            done, _ = wait(futs, timeout=0.01)
        pairs = sorted((futs[f], f) for f in done)
        rows = [f.result() for _, f in pairs]
        indices = [i for i, _ in pairs]
        for i in indices:
            del self._pending[i]
        return _stack_rows(rows, indices)

    def async_reset_recv(self, min_get: int = 1):
        return self._recv(min_get)

    def async_step_recv(self, min_get: int = 1):
        return self._recv(min_get)

    def close(self):
        self._exec.shutdown(wait=False)
        for e in self.envs:
            close = getattr(e, "close", None)
            if close is not None:
                close()


def _pool_worker(pipe, env_fn, device: str) -> None:
    """Per-env worker process (reference ``ProcessorAsyncEnvPool`` :519)."""
    try:
        import jax

        if device == "cpu":
            jax.config.update("jax_platforms", "cpu")
        env = env_fn()
        state = root = key = None
        while True:
            cmd, payload = pipe.recv()
            if cmd == "reset":
                key = jax.random.PRNGKey(int(payload))
                key, k_reset = jax.random.split(key)
                state, root = env.reset(k_reset)
                pipe.send(("result", jax.device_get(root)))
            elif cmd == "step":
                key, k_env = jax.random.split(key)
                td = root.set("action", payload)
                state, full_td, root = env.step_and_maybe_reset(state, td, k_env)
                pipe.send(("result", jax.device_get(full_td)))
            elif cmd == "close":
                close = getattr(env, "close", None)
                if close is not None:
                    close()
                pipe.send(("result", None))
                return
    except (EOFError, KeyboardInterrupt):
        return
    except Exception as e:
        import traceback

        try:
            pipe.send(("error", f"{e!r}\n{traceback.format_exc()}"))
        except Exception:
            pass
        raise


class ProcessAsyncEnvPool(AsyncEnvPool):
    """One process per env, pipes for transport — for GIL-bound envs."""

    def __init__(
        self,
        env_fns: Sequence[Callable[[], Any]],
        worker_device: str = "cpu",
        **kwargs,
    ):
        ctx = mp.get_context("spawn")
        self.num_envs = len(env_fns)
        self._pipes = []
        self._procs = []
        self._pending: set[int] = set()
        from rl_tpu.utils.subproc import cpu_worker_env

        with (cpu_worker_env() if worker_device == "cpu"
              else contextlib.nullcontext()):
            for fn in env_fns:
                parent, child = ctx.Pipe()
                p = ctx.Process(
                    target=_pool_worker, args=(child, fn, worker_device),
                    daemon=True,
                )
                p.start()
                child.close()
                self._pipes.append(parent)
                self._procs.append(p)

    def async_reset_send(self, seed: int = 0, env_index=None) -> None:
        idx = range(self.num_envs) if env_index is None else np.asarray(env_index)
        for i in idx:
            i = int(i)
            if i in self._pending:
                raise RuntimeError(f"env {i} already has a pending request")
            self._pipes[i].send(("reset", seed * 7919 + i))
            self._pending.add(i)

    def async_step_send(self, td) -> None:
        import jax

        indices = np.asarray(td["env_index"]).reshape(-1)
        actions = jax.device_get(td["action"])
        for row, i in enumerate(indices):
            i = int(i)
            if i in self._pending:
                raise RuntimeError(f"env {i} already has a pending request")
            self._pipes[i].send(("step", np.asarray(actions[row])))
            self._pending.add(i)

    def _recv(self, min_get: int):
        if min_get > len(self._pending):
            raise RuntimeError(
                f"min_get={min_get} exceeds pending requests ({len(self._pending)})"
            )
        got: dict[int, Any] = {}
        while len(got) < min_get:
            progressed = False
            for i in sorted(self._pending):
                if self._pipes[i].poll(0.002):
                    kind, payload = self._pipes[i].recv()
                    if kind == "error":
                        raise RuntimeError(f"async env worker {i} failed:\n{payload}")
                    got[i] = payload
                    progressed = True
                elif not self._procs[i].is_alive():
                    raise RuntimeError(
                        f"async env worker {i} died "
                        f"(exitcode={self._procs[i].exitcode})"
                    )
            if not progressed:
                time.sleep(0.002)
        for i in got:
            self._pending.discard(i)
        indices = sorted(got)
        return _stack_rows([got[i] for i in indices], indices)

    def async_reset_recv(self, min_get: int = 1):
        return self._recv(min_get)

    def async_step_recv(self, min_get: int = 1):
        return self._recv(min_get)

    def close(self):
        for i, (pipe, proc) in enumerate(zip(self._pipes, self._procs)):
            try:
                if proc.is_alive():
                    pipe.send(("close", None))
            except (BrokenPipeError, OSError):
                pass
        for proc in self._procs:
            proc.join(timeout=5.0)
            if proc.is_alive():
                proc.terminate()
        for pipe in self._pipes:
            pipe.close()

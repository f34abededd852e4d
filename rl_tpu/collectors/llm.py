"""LLM collectors — conversation-level data collection for LLM RL.

Counterparts of the reference LLM collector layer:
``/root/reference/torchrl/collectors/llm/base.py:26`` (``LLMCollector``:
trajectory-yielding over an LLM env + engine policy,
``yield_completed_trajectories`` / ``yield_only_last_steps``,
replay-buffer sink, policy-version stamping) and
``/root/reference/torchrl/collectors/_async_batched.py:118``
(``AsyncBatchedCollector``: many conversations in flight at once, results
landing out of order).

TPU split: the engine (device compute — a jitted sampler over a native
``TransformerLM``, or ``TransformersWrapper``) produces whole assistant
turns; conversations advance on the host (text is NonTensor data).  The
async variant runs conversations on a thread pool — engine calls release
the GIL while the device generates, so N conversations pipeline against
one engine exactly like the reference's asyncio loops against vLLM.

A "step" dict carries::

    prompt        str   — user prompt text (or repr of the obs)
    response      str   — assistant turn
    tokens        [T]   np.int32 response token ids (padded to max_tokens)
    log_probs     [T]   np.float32 per-token sample log-probs
    attention_mask[T]   bool — True on real (un-padded) tokens
    reward        f32
    done          bool
    traj_id       int   — conversation id
    turn          int   — turn index within the conversation
    policy_version int  — stamped at generation time
"""
from __future__ import annotations

import queue
import threading
from typing import Any, Callable, Iterator, Sequence

import numpy as np

__all__ = ["LLMCollector", "AsyncBatchedCollector"]


def _pad(arr, n, fill):
    arr = np.asarray(arr).reshape(-1)[:n]
    out = np.full((n,), fill, arr.dtype if arr.size else np.int32)
    out[: len(arr)] = arr
    return out


class LLMCollector:
    """Collect conversations from a ``ChatEnv``-style env with an engine.

    Args:
        env: object with ``reset(idx=None) -> state`` and
            ``step(state, text) -> (state, reward, done, info)``
            (:class:`rl_tpu.envs.llm.ChatEnv` / ``DatasetChatEnv``; an
            ``LLMEnv`` whose observations are dicts also works).
        policy: ``engine(state) -> (text, token_ids, log_probs)``.

    Keyword Args:
        dialog_turns_per_batch: steps per yielded batch (ignored when
            ``yield_completed_trajectories=True``).
        total_dialog_turns: stop after this many steps (-1 = never).
        yield_completed_trajectories: yield one finished conversation
            (list of step dicts) at a time instead of step batches.
        yield_only_last_steps: with completed trajectories, keep only each
            conversation's final step (the reference flag).
        max_tokens: pad/truncate token arrays to this length.
        replay_buffer: optional sink with ``.extend(list_of_steps)`` — when
            set, the iterator yields nothing and writes there instead.
        postproc: optional callable applied to each yielded batch.
        policy_version: optional int-returning callable (or the collector's
            own counter bumped by :meth:`increment_version`) stamped on
            every step (reference ``track_policy_version``).
        weight_sync: optional scheme with ``pull(template=None)`` — polled
            once per batch; a fresh payload is handed to ``on_weights``.
        on_weights: callback receiving the pulled payload.
        step_transform: optional ``state -> state`` applied between turns of
            a conversation (after ``env.step``, before the next policy call)
            — the in-conversation slot for tool execution
            (:class:`rl_tpu.envs.llm.ToolTransform` /
            ``PythonInterpreterTransform``; the reference runs these as env
            transforms inside the step, envs/llm/transforms/tools.py).
    """

    def __init__(
        self,
        env,
        policy: Callable[[Any], tuple],
        *,
        dialog_turns_per_batch: int = 8,
        total_dialog_turns: int = -1,
        yield_completed_trajectories: bool = False,
        yield_only_last_steps: bool = False,
        max_tokens: int = 64,
        replay_buffer=None,
        postproc: Callable | None = None,
        policy_version: Callable[[], int] | None = None,
        weight_sync=None,
        on_weights: Callable | None = None,
        step_transform: Callable | None = None,
    ):
        if yield_only_last_steps:
            yield_completed_trajectories = True
        self.env = env
        self.policy = policy
        self.dialog_turns_per_batch = int(dialog_turns_per_batch)
        self.total_dialog_turns = int(total_dialog_turns)
        self.yield_completed_trajectories = yield_completed_trajectories
        self.yield_only_last_steps = yield_only_last_steps
        self.max_tokens = int(max_tokens)
        self.replay_buffer = replay_buffer
        self.postproc = postproc
        self._version_fn = policy_version
        self._version = 0
        self.weight_sync = weight_sync
        self.on_weights = on_weights
        self.step_transform = step_transform
        self._turns_done = 0

    # -- policy-version tracking (reference PolicyVersion transform) -------
    def increment_version(self, n: int = 1) -> None:
        self._version += n

    @property
    def policy_version(self) -> int:
        return self._version_fn() if self._version_fn is not None else self._version

    def update_policy_weights_(self, payload=None) -> None:
        """Reference API: bump the stamped version (the engine's params are
        whatever the caller passes to it — functional policies need no
        in-place mutation)."""
        if payload is not None and self.on_weights is not None:
            self.on_weights(payload)
        self.increment_version()

    def _maybe_pull_weights(self):
        if self.weight_sync is None:
            return
        payload = self.weight_sync.pull()
        if payload is not None:
            if self.on_weights is not None:
                self.on_weights(payload)
            self.increment_version()

    # -- core ---------------------------------------------------------------
    def _make_step(self, state, prompt_repr, text, tokens, log_probs,
                   reward, done, traj_id, turn):
        return {
            "history": state,
            "prompt": prompt_repr,
            "response": text,
            "tokens": _pad(np.asarray(tokens, np.int32), self.max_tokens, 0),
            "log_probs": _pad(np.asarray(log_probs, np.float32),
                              self.max_tokens, 0.0),
            "attention_mask": np.arange(self.max_tokens)
            < min(len(np.asarray(tokens).reshape(-1)), self.max_tokens),
            "reward": np.float32(reward),
            "done": bool(done),
            "traj_id": int(traj_id),
            "turn": int(turn),
            "policy_version": int(self.policy_version),
        }

    def _run_conversation(self, traj_id: int, idx=None) -> list[dict]:
        state = self.env.reset(idx) if idx is not None else self.env.reset()
        steps = []
        turn = 0
        done = False
        while not done:
            prompt_repr = repr(state)
            text, tokens, log_probs = self.policy(state)
            state, reward, done, _ = self.env.step(state, text)
            steps.append(self._make_step(
                state, prompt_repr, text, tokens, log_probs, reward, done,
                traj_id, turn))
            if self.step_transform is not None and not done:
                state = self.step_transform(state)
            turn += 1
        return steps

    def iterator(self) -> Iterator[list[dict]]:
        traj_id = 0
        pending: list[dict] = []
        while (self.total_dialog_turns < 0
               or self._turns_done < self.total_dialog_turns):
            self._maybe_pull_weights()
            steps = self._run_conversation(traj_id)
            traj_id += 1
            self._turns_done += len(steps)
            if self.yield_completed_trajectories:
                out = steps[-1:] if self.yield_only_last_steps else steps
                out = self.postproc(out) if self.postproc else out
                if self.replay_buffer is not None:
                    self.replay_buffer.extend(out)
                else:
                    yield out
                continue
            pending.extend(steps)
            while len(pending) >= self.dialog_turns_per_batch:
                batch = pending[: self.dialog_turns_per_batch]
                pending = pending[self.dialog_turns_per_batch:]
                batch = self.postproc(batch) if self.postproc else batch
                if self.replay_buffer is not None:
                    self.replay_buffer.extend(batch)
                else:
                    yield batch

    __iter__ = iterator

    def rollout_group(self, *, group_size: int, idx=None) -> list[dict]:
        """G completions of ONE prompt — the GRPO group (reference
        PromptGroupSampler layout: completions laid out back-to-back)."""
        state0 = self.env.reset(idx)
        out = []
        for g in range(group_size):
            text, tokens, log_probs = self.policy(state0)
            state, reward, done, _ = self.env.step(state0, text)
            out.append(self._make_step(
                state, repr(state0), text, tokens, log_probs, reward, done,
                traj_id=g, turn=0))
        return out


class AsyncBatchedCollector(LLMCollector):
    """Many conversations in flight at once (reference
    ``_async_batched.py:118``): a thread pool runs whole conversations
    concurrently against the engine; completed trajectories land in an
    internal queue (or the replay buffer) OUT OF ORDER as they finish.

    ::

        c = AsyncBatchedCollector(env, engine, num_workers=8,
                                  total_dialog_turns=256)
        c.start()
        for traj in c:          # out-of-order completed conversations
            ...
        c.async_shutdown()
    """

    def __init__(self, env, policy, *, num_workers: int = 4,
                 env_factory: Callable | None = None, **kwargs):
        kwargs.setdefault("yield_completed_trajectories", True)
        super().__init__(env, policy, **kwargs)
        self.num_workers = int(num_workers)
        # one env per worker when a factory is given (stateful prompt
        # iterators are not thread-safe)
        self._envs = ([env_factory() for _ in range(self.num_workers)]
                      if env_factory is not None
                      else [env] * self.num_workers)
        self._q: queue.Queue = queue.Queue()
        self._stop = threading.Event()
        self._threads: list[threading.Thread] = []
        self._traj_lock = threading.Lock()
        self._next_traj = 0
        self._turn_lock = threading.Lock()

    def _next_traj_id(self) -> int:
        with self._traj_lock:
            tid = self._next_traj
            self._next_traj += 1
            return tid

    def _worker(self, wid: int) -> None:
        env = self._envs[wid]
        while not self._stop.is_set():
            with self._turn_lock:
                if (0 <= self.total_dialog_turns <= self._turns_done):
                    break
            tid = self._next_traj_id()
            state = env.reset()
            steps = []
            turn = 0
            done = False
            while not done and not self._stop.is_set():
                text, tokens, log_probs = self.policy(state)
                state, reward, done, _ = env.step(state, text)
                steps.append(self._make_step(
                    state, repr(state), text, tokens, log_probs, reward,
                    done, tid, turn))
                turn += 1
            with self._turn_lock:
                self._turns_done += len(steps)
            out = steps[-1:] if self.yield_only_last_steps else steps
            out = self.postproc(out) if self.postproc else out
            if self.replay_buffer is not None:
                self.replay_buffer.extend(out)
            else:
                self._q.put(out)
        self._q.put(None)  # worker-exit sentinel

    def start(self) -> None:
        self._threads = [
            threading.Thread(target=self._worker, args=(w,), daemon=True)
            for w in range(self.num_workers)
        ]
        for t in self._threads:
            t.start()

    def iterator(self) -> Iterator[list[dict]]:
        if not self._threads:
            self.start()
        exited = 0
        while exited < len(self._threads):
            item = self._q.get()
            if item is None:
                exited += 1
                continue
            self._maybe_pull_weights()
            yield item

    __iter__ = iterator

    def async_shutdown(self, timeout: float = 10.0) -> None:
        self._stop.set()
        for t in self._threads:
            t.join(timeout=timeout)
        self._threads = []

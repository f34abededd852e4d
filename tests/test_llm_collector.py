"""LLM collector layer (VERDICT r2 item #5).

Reference counterparts: ``torchrl/collectors/llm/base.py:26``
(``LLMCollector``) and ``torchrl/collectors/_async_batched.py:118``
(``AsyncBatchedCollector``)."""
import numpy as np
import pytest

from rl_tpu.collectors import AsyncBatchedCollector, LLMCollector
from rl_tpu.envs.llm import ChatEnv


def make_env(max_turns=1, seed=0):
    return ChatEnv(
        ["What is 2+2?", "Name a color.", "Say hi."],
        reward_fn=lambda h, r: float(len(r)) / 10.0,
        max_turns=max_turns,
        seed=seed,
    )


def mock_engine(state):
    prompt = state.messages[-1].content
    text = f"ans:{len(prompt)}"
    tokens = np.arange(len(text)) % 7
    log_probs = -0.1 * np.ones(len(text))
    return text, tokens, log_probs


class TestLLMCollector:
    def test_step_batches(self):
        c = LLMCollector(make_env(), mock_engine, dialog_turns_per_batch=4,
                         total_dialog_turns=12, max_tokens=16)
        batches = list(c)
        assert len(batches) == 3
        for b in batches:
            assert len(b) == 4
            s = b[0]
            assert s["tokens"].shape == (16,)
            assert s["log_probs"].shape == (16,)
            assert s["attention_mask"].sum() == len(s["response"])
            assert s["done"]  # single-turn conversations
            assert s["reward"] > 0

    def test_multi_turn_trajectories(self):
        c = LLMCollector(make_env(max_turns=3), mock_engine,
                         yield_completed_trajectories=True,
                         total_dialog_turns=9)
        trajs = list(c)
        assert len(trajs) == 3
        for traj in trajs:
            assert len(traj) == 3
            assert [s["turn"] for s in traj] == [0, 1, 2]
            assert [s["done"] for s in traj] == [False, False, True]
            assert len({s["traj_id"] for s in traj}) == 1

    def test_yield_only_last_steps(self):
        c = LLMCollector(make_env(max_turns=3), mock_engine,
                         yield_only_last_steps=True, total_dialog_turns=9)
        trajs = list(c)
        assert len(trajs) == 3
        for traj in trajs:
            assert len(traj) == 1 and traj[0]["done"] and traj[0]["turn"] == 2

    def test_replay_buffer_sink(self):
        sink = []

        class Buf:
            def extend(self, items):
                sink.extend(items)

        c = LLMCollector(make_env(), mock_engine, dialog_turns_per_batch=2,
                         total_dialog_turns=6, replay_buffer=Buf())
        assert list(c) == []
        assert len(sink) == 6

    def test_policy_version_stamping(self):
        c = LLMCollector(make_env(), mock_engine, dialog_turns_per_batch=1,
                         total_dialog_turns=3)
        it = iter(c)
        b0 = next(it)
        c.update_policy_weights_()
        b1 = next(it)
        assert b0[0]["policy_version"] == 0
        assert b1[0]["policy_version"] == 1

    def test_rollout_group_same_prompt(self):
        c = LLMCollector(make_env(), mock_engine, max_tokens=16)
        group = c.rollout_group(group_size=5, idx=1)
        assert len(group) == 5
        assert len({s["prompt"] for s in group}) == 1

    def test_postproc(self):
        c = LLMCollector(make_env(), mock_engine, dialog_turns_per_batch=2,
                         total_dialog_turns=4,
                         postproc=lambda b: [{**s, "tagged": True} for s in b])
        for b in c:
            assert all(s["tagged"] for s in b)


class TestAsyncBatchedCollector:
    def test_out_of_order_completion(self):
        c = AsyncBatchedCollector(
            None, mock_engine, num_workers=3,
            env_factory=lambda: make_env(max_turns=2),
            total_dialog_turns=12)
        trajs = list(c)
        c.async_shutdown()
        # >= because each in-flight worker finishes its conversation
        assert len(trajs) * 2 >= 12
        all_ids = sorted({s["traj_id"] for t in trajs for s in t})
        assert len(all_ids) == len(trajs)  # unique conversation ids

    def test_buffer_sink_and_shutdown(self):
        sink = []

        class Buf:
            def extend(self, items):
                sink.extend(items)

        c = AsyncBatchedCollector(
            None, mock_engine, num_workers=2,
            env_factory=lambda: make_env(max_turns=1),
            total_dialog_turns=8, replay_buffer=Buf())
        c.start()
        import time

        deadline = time.monotonic() + 30
        while len(sink) < 8 and time.monotonic() < deadline:
            time.sleep(0.01)
        c.async_shutdown()
        assert len(sink) >= 8

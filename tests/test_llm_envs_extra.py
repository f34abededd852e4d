"""Tests for the round-4 LLM env surface: Countdown/MATH scorers, dataset
envs, AddThinkingPrompt, TemplateTransform, DataLoadingPrimer, ToolTransform,
History content blocks + from_text round-trip.

Reference behavior: /root/reference/torchrl/envs/llm/reward/countdown.py,
reward/math.py, transforms/reason.py, transforms/format.py,
transforms/dataloading.py, transforms/tools.py, data/llm/history.py.
"""
import numpy as np
import pytest

from rl_tpu.data.llm.history import ContentBlock, History, Message
from rl_tpu.envs.llm import (
    AddThinkingPrompt,
    CountdownEnv,
    CountdownProblemGenerator,
    CountdownScorer,
    DataLoadingPrimer,
    GSM8KEnv,
    IFEvalEnv,
    MATHEnv,
    MathScorer,
    TemplateTransform,
    ToolTransform,
    extract_tags,
)


# ---------------------------------------------------------------------------
# scorers
# ---------------------------------------------------------------------------

def test_extract_tags():
    cot, ans = extract_tags("<think>a\nb</think> junk <answer> 42 </answer>")
    assert cot == "a\nb" and ans == "42"
    assert extract_tags("no tags") == ("", "")


class TestCountdownScorer:
    scorer = CountdownScorer()
    gt = {"target": 112, "numbers": [25, 3, 4, 7]}

    def test_correct(self):
        d = self.scorer.detail(
            "<think>(25+3)*4 = 112</think><answer>(25 + 3) * 4</answer>", self.gt)
        assert d["success"] and d["reward"] == 1.0 and d["reward_think"] == 1.0

    def test_wrong_value_gets_format_reward(self):
        assert self.scorer("<answer>25 + 3</answer>", self.gt) == pytest.approx(0.1)

    def test_number_reuse_rejected(self):
        # 4*4*7 = 112 but 4 appears once in the source set
        assert not CountdownScorer.validate_expression("4*4*7", 112, [25, 3, 4, 7])

    def test_unavailable_number_rejected(self):
        assert not CountdownScorer.validate_expression("56*2", 112, [25, 3, 4, 7])

    def test_division_and_tolerance(self):
        assert CountdownScorer.validate_expression("25/5", 5, [25, 5])

    def test_malicious_expression_is_not_executed(self):
        assert CountdownScorer._safe_eval("__import__('os')") is None
        assert CountdownScorer._safe_eval("(1).__class__") is None
        assert not CountdownScorer.validate_expression(
            "print(1)", 112, [25, 3, 4, 7])

    def test_string_ground_truth(self):
        assert self.scorer(
            "<answer>25+3</answer>", "target=28, numbers=25,3") == 1.0

    def test_no_answer_tag(self):
        d = self.scorer.detail("I give up", self.gt)
        assert d["reward"] == 0.0 and d["reward_answer"] == 0.0


class TestMathScorer:
    scorer = MathScorer()

    @pytest.mark.parametrize("got,target", [
        ("<answer>\\frac{1}{2}</answer>", "\\boxed{0.5}"),
        ("<answer>1/2</answer>", "\\boxed{\\frac{1}{2}}"),
        ("<answer>3,720</answer>", "\\boxed{3720}"),
        ("<answer>\\left( 4 \\right)</answer>", "\\boxed{4}"),
        ("the result is \\boxed{7}", "\\boxed{7}"),   # boxed fallback
        ("<answer>x+1</answer>", "\\boxed{x + 1}"),   # symbolic string match
    ])
    def test_equivalent(self, got, target):
        assert self.scorer(got, target) == 1.0

    def test_wrong_answer_format_reward(self):
        assert self.scorer("<answer>3</answer>", "\\boxed{4}") == pytest.approx(0.1)

    def test_no_answer(self):
        assert self.scorer("dunno", "\\boxed{4}") == 0.0

    def test_nested_boxed_extraction(self):
        from rl_tpu.envs.llm.reward import _extract_boxed
        assert _extract_boxed("\\boxed{\\frac{a}{b}}") == "\\frac{a}{b}"


# ---------------------------------------------------------------------------
# dataset envs
# ---------------------------------------------------------------------------

def test_countdown_generator_targets_reachable():
    gen = CountdownProblemGenerator(num_count=3, max_number=9, seed=0)
    for _ in range(20):
        p = next(gen)
        ans = p["answer"]
        assert 0 < ans["target"] <= 1000
        assert len(ans["numbers"]) == 3
        assert str(ans["target"]) in p["query"]


def test_countdown_generator_solutions_validate():
    """The retained gold fold (round 5) must pass the scorer exactly —
    including the mirrored fold used when the construction lands negative."""
    for num_count, max_number in [(3, 9), (4, 100)]:
        gen = CountdownProblemGenerator(num_count=num_count,
                                        max_number=max_number, seed=0)
        saw_mirror = False
        for _ in range(300):
            p = next(gen)
            ans = p["answer"]
            assert CountdownScorer.validate_expression(
                p["solution"], ans["target"], ans["numbers"]), (
                p["solution"], ans)
            saw_mirror |= p["solution"].startswith("-")
        assert saw_mirror  # negative folds occur and are mirrored


def test_countdown_env_step_and_detail():
    env = CountdownEnv(seed=1, num_count=3, max_number=9)
    h = env.reset()
    ans = env.current_answer
    # the sum expression is always scoreable; reward is 1.0 iff sum==target
    expr = "+".join(str(n) for n in ans["numbers"])
    resp = f"<think>try the sum</think><answer>{expr}</answer>"
    _, reward, done, _ = env.step(h, resp)
    expected = 1.0 if sum(ans["numbers"]) == ans["target"] else 0.1
    assert reward == pytest.approx(expected)
    assert done
    assert env.score_detail(resp)["reward_think"] == 1.0


def test_gsm8k_env_rows_and_jsonl(tmp_path):
    rows = [{"question": "2+2?", "answer": "four #### 4"}]
    env = GSM8KEnv(rows)
    h = env.reset(0)
    assert env.step(h, "it is #### 4")[1] == 1.0
    assert env.step(h, "#### 5")[1] == pytest.approx(0.1)
    p = tmp_path / "d.jsonl"
    import json
    p.write_text("\n".join(json.dumps(r) for r in rows))
    env2 = GSM8KEnv(p)
    assert env2.step(env2.reset(0), "#### 4")[1] == 1.0


def test_math_env():
    env = MATHEnv([{"problem": "half of one?", "solution": "\\boxed{\\frac{1}{2}}"}])
    h = env.reset(0)
    assert env.step(h, "<answer>0.5</answer>")[1] == 1.0


def test_ifeval_env_fractional_reward():
    env = IFEvalEnv([{
        "prompt": "Give 2 bullets, at least 3 words",
        "constraints": [("num_bullets", {"n": 2}), ("min_words", {"n": 3})],
    }])
    h = env.reset(0)
    assert env.step(h, "- alpha beta\n- gamma")[1] == 1.0
    assert env.step(h, "- a b c d")[1] == pytest.approx(0.5)


# ---------------------------------------------------------------------------
# transforms
# ---------------------------------------------------------------------------

class TestAddThinkingPrompt:
    def _batch(self, reward, content="<think>x</think><answer>3</answer>"):
        h = History().append("user", "q").append("assistant", content)
        return {"history": h, "reward": np.float32(reward), "done": np.True_}

    def test_low_reward_edits_last_turn(self):
        t = AddThinkingPrompt(cond=lambda b: b["reward"] < 0.5)
        out = t(self._batch(0.0))
        last = out["history"].messages[-1]
        assert last.role == "assistant"
        assert "<answer>" not in last.text          # answer replaced
        assert t.prompt in last.text                # by the thinking prompt
        assert out["reward"] == 0.0 and not out["done"]
        assert len(out["history"]) == 2             # edited, not appended

    def test_high_reward_untouched(self):
        t = AddThinkingPrompt(cond=lambda b: b["reward"] < 0.5)
        batch = self._batch(1.0)
        out = t(batch)
        assert out["history"] is batch["history"] and out["done"]

    def test_user_role_appends(self):
        t = AddThinkingPrompt(cond=lambda b: True, role="user",
                              edit_last_turn=False, zero_reward=False)
        out = t(self._batch(0.0))
        assert out["history"].messages[-1].role == "user"
        assert len(out["history"]) == 3

    def test_random_prompt_cycles(self):
        t = AddThinkingPrompt(cond=lambda b: True, random_prompt=True, seed=0)
        seen = {t.prompt for _ in range(50)}
        assert len(seen) > 1
        assert seen <= set(AddThinkingPrompt.PROMPTS_SELF)

    def test_edit_requires_assistant_role(self):
        with pytest.raises(ValueError):
            AddThinkingPrompt(cond=lambda b: True, role="user",
                              edit_last_turn=True)


class TestTemplateTransform:
    def test_render_chatml_and_parse(self):
        t = TemplateTransform()
        h = History().append("user", "hi")
        text = t.render(h)
        assert text.endswith("<|im_start|>assistant\n")
        raw = "<|im_start|>assistant\nhello there<|im_end|>junk"
        assert t.parse(raw) == "hello there"

    def test_parse_strips_eos_variants(self):
        t = TemplateTransform()
        assert t.parse("answer</s>more") == "answer"

    def test_hf_template_used_when_available(self):
        class Tok:
            def apply_chat_template(self, chats, tokenize=False,
                                    add_generation_prompt=True):
                assert not tokenize
                return "TPL:" + ";".join(m["role"] for m in chats)
        t = TemplateTransform(Tok())
        assert t.render(History().append("user", "x")) == "TPL:user"


class TestDataLoadingPrimer:
    def test_cycles_endlessly(self):
        primer = DataLoadingPrimer([{"query": "a"}, {"query": "b"}])
        got = [primer.draw()["query"] for _ in range(5)]
        assert got == ["a", "b", "a", "b", "a"]
        assert primer._epoch == 2

    def test_repeats_groups(self):
        primer = DataLoadingPrimer([{"query": "a"}, {"query": "b"}], repeats=3)
        got = [primer.draw()["query"] for _ in range(7)]
        assert got == ["a"] * 3 + ["b"] * 3 + ["a"]

    def test_factory_source_and_reset(self):
        calls = []
        def factory():
            calls.append(1)
            return iter([{"query": "x"}])
        primer = DataLoadingPrimer(factory)
        primer.draw(); primer.draw()
        assert len(calls) == 2
        primer.reset_dataloader()
        assert primer.draw()["query"] == "x"

    def test_prompt_fn_feeds_chatenv(self):
        from rl_tpu.envs.llm import ChatEnv
        primer = DataLoadingPrimer(
            [{"query": "q1", "answer": "a1"}], repeats=2)
        env = ChatEnv(primer.prompt_fn())
        h = env.reset()
        assert h.last.text == "q1"
        assert primer.last_sample["answer"] == "a1"


class TestToolTransform:
    def _hist(self, content):
        return History().append("user", "q").append("assistant", content)

    def test_executes_named_tool(self):
        t = ToolTransform({"add": lambda a, b: a + b})
        h = t(self._hist('```tool\n{"name": "add", "arguments": {"a": 2, "b": 3}}\n```'))
        assert h.messages[-1].role == "tool" and h.messages[-1].text == "5"

    def test_unknown_tool_and_bad_json_in_band(self):
        t = ToolTransform({"add": lambda a, b: a + b})
        h = t(self._hist('```tool\n{"name": "mul"}\n```'))
        assert "unknown tool" in h.messages[-1].text
        h = t(self._hist("```tool\nnot json\n```"))
        assert "malformed" in h.messages[-1].text

    def test_tool_error_in_band(self):
        def boom():
            raise RuntimeError("nope")
        t = ToolTransform({"boom": boom})
        h = t(self._hist('```tool\n{"name": "boom"}\n```'))
        assert "RuntimeError: nope" in h.messages[-1].text

    def test_no_blocks_noop(self):
        t = ToolTransform({})
        h = self._hist("plain text")
        assert t(h) is h

    def test_multimodal_tuple_content(self):
        # History.from_chats widens content to tuple[ContentBlock, ...]; the
        # fenced-block transforms must read the flattened .text view, not
        # re.findall over a tuple (ADVICE r4 medium)
        from rl_tpu.data.llm import ContentBlock

        t = ToolTransform({"add": lambda a, b: a + b})
        content = (
            ContentBlock("image", url="data:image/png;base64,xyz"),
            ContentBlock(
                "text",
                text='```tool\n{"name": "add", "arguments": {"a": 2, "b": 3}}\n```',
            ),
        )
        h = t(self._hist(content))
        assert h.messages[-1].role == "tool" and h.messages[-1].text == "5"

    def test_multimodal_thinking_prompt_edit(self):
        from rl_tpu.data.llm import ContentBlock

        t = AddThinkingPrompt(cond=lambda b: True)
        content = (
            ContentBlock("image", url="data:image/png;base64,xyz"),
            ContentBlock("text", text="<think>x</think><answer>3</answer>"),
        )
        h = History().append("user", "q").append("assistant", content)
        out = t({"history": h, "reward": np.float32(0.0), "done": np.True_})
        last = out["history"].messages[-1]
        assert "<answer>" not in last.text and t.prompt in last.text


# ---------------------------------------------------------------------------
# History blocks + round-trip
# ---------------------------------------------------------------------------

def test_history_from_text_round_trip():
    h = History().append("system", "s").append("user", "u").append(
        "assistant", "line1\nline2")
    h2 = History.from_text(h.render(add_generation_prompt=True))
    assert [m.role for m in h2.messages] == ["system", "user", "assistant"]
    assert h2.messages[-1].text == "line1\nline2"


def test_history_from_text_partial_generation():
    h = History().append("user", "u")
    raw = h.render(add_generation_prompt=True) + "partial"
    h2 = History.from_text(raw)
    assert h2.messages[-1].role == "assistant"
    assert h2.messages[-1].text == "partial"


def test_content_blocks():
    blocks = (ContentBlock("text", text="see"),
              ContentBlock("image", url="data:img"),
              ContentBlock("tool_call", name="f", arguments={"x": 1}))
    m = Message("user", blocks)
    assert m.text == "see"
    h = History([m])
    chats = h.to_chats()
    assert chats[0]["content"][1] == {"type": "image_url",
                                      "image_url": {"url": "data:img"}}
    h2 = History.from_chats(chats)
    assert h2.messages[0].blocks[2].name == "f"
    # str content still yields a single text block
    assert Message("user", "plain").blocks[0].text == "plain"


# ---------------------------------------------------------------------------
# composable KL pipeline (RetrieveLogProb -> KLComputation)
# ---------------------------------------------------------------------------

def test_retrieve_log_prob_masks_prompt_tokens():
    from rl_tpu.envs.llm import RetrieveLogProb
    b = {"tokens": np.arange(6).reshape(1, 6),
         "response_mask": np.array([[0, 0, 0, 1, 1, 1]])}
    out = RetrieveLogProb(lambda t: -0.2 * np.ones(t.shape))(b)
    assert out["ref_log_prob"][0, 0] == 0.0
    assert out["ref_log_prob"][0, 3] == np.float32(-0.2)


def test_kl_computation_pipeline_matches_retrieve_kl():
    from rl_tpu.envs.llm import KLComputation, RetrieveKL, RetrieveLogProb
    base = {"tokens": np.arange(4).reshape(1, 4),
            "log_probs": -0.1 * np.ones((1, 4), np.float32),
            "reward": np.float32(1.0)}
    ref_model = lambda t: -0.3 * np.ones(t.shape)
    staged = KLComputation(coef=0.1)(RetrieveLogProb(ref_model)(dict(base)))
    fused = RetrieveKL(ref_model)(dict(base))
    np.testing.assert_allclose(staged["kl_penalty"], fused["kl_penalty"])
    # reward got the summed penalty
    assert staged["reward"] == pytest.approx(
        1.0 - 0.1 * staged["kl_penalty"].sum())


def test_kl_computation_coef_annealable():
    from rl_tpu.envs.llm import KLComputation
    k = KLComputation(coef=1.0)
    b = {"log_probs": np.zeros((1, 2)), "ref_log_prob": -0.5 * np.ones((1, 2)),
         "reward": np.float32(0.0)}
    r1 = k(dict(b))["reward"]
    k.coef = 0.0
    r2 = k(dict(b))["reward"]
    assert r1 < 0.0 and r2 == 0.0


# ---------------------------------------------------------------------------
# multi-turn agentic loop: env + tools + thinking prompt, end to end
# ---------------------------------------------------------------------------

def test_multi_turn_tool_use_e2e():
    """Two-turn conversation: turn 1 emits a python tool call whose result
    feeds turn 2's final answer (the reference tools.py loop:
    assistant -> tool -> assistant)."""
    from rl_tpu.envs.llm import ChatEnv, PythonInterpreterTransform

    def reward_fn(history, response):
        return float("112" in response and "<answer>" in response)

    env = ChatEnv(["compute (25+3)*4"], reward_fn=reward_fn, max_turns=2)
    tools = PythonInterpreterTransform()

    h = env.reset(0)
    # turn 1: the policy writes code instead of answering
    h, r1, d1, _ = env.step(h, "```python\nprint((25+3)*4)\n```")
    assert not d1 and r1 == 0.0
    h = tools(h)  # tool output appended
    assert h.messages[-1].role == "tool" and h.messages[-1].text.strip() == "112"
    # turn 2: answer using the tool result
    result = h.messages[-1].text.strip()
    h, r2, d2, _ = env.step(h, f"<answer>{result}</answer>")
    assert d2 and r2 == 1.0
    roles = [m.role for m in h.messages]
    assert roles == ["user", "assistant", "tool", "assistant"]


def test_thinking_prompt_retry_loop():
    """AddThinkingPrompt drives a retry: wrong answer -> prompt injected,
    done undone -> second attempt scored."""
    from rl_tpu.envs.llm import AddThinkingPrompt, DatasetChatEnv

    env = DatasetChatEnv([("2+2?", "4")], match="exact", max_turns=3)
    think = AddThinkingPrompt(cond=lambda b: b["reward"] < 1.0)

    h = env.reset(0)
    h, r, d, _ = env.step(h, "<answer>5</answer>")
    batch = think({"history": h, "reward": np.float32(r), "done": np.bool_(d)})
    assert not batch["done"] and batch["reward"] == 0.0
    h2 = batch["history"]
    # the model "continues" from the edited turn with the right answer
    _, r2, _, _ = env.step(h2[:-1], "4")
    assert r2 == 1.0


def test_collector_step_transform_tool_loop():
    """LLMCollector with step_transform: turn 1 emits code, the tool runs
    between turns, turn 2 reads the tool result — collected as one
    2-step trajectory."""
    from rl_tpu.collectors import LLMCollector
    from rl_tpu.envs.llm import ChatEnv, PythonInterpreterTransform

    def reward_fn(history, response):
        return float("112" in response)

    env = ChatEnv(["compute (25+3)*4"], reward_fn=reward_fn, max_turns=2)

    def policy(state):
        if state.messages[-1].role == "tool":
            text = f"the answer is {state.messages[-1].text.strip()}"
        else:
            text = "```python\nprint((25+3)*4)\n```"
        return text, np.arange(3), -0.1 * np.ones(3)

    coll = LLMCollector(env, policy, yield_completed_trajectories=True,
                        total_dialog_turns=2,
                        step_transform=PythonInterpreterTransform())
    traj = next(iter(coll))
    assert [s["turn"] for s in traj] == [0, 1]
    assert traj[0]["reward"] == 0.0 and traj[1]["reward"] == 1.0
    roles = [m.role for m in traj[-1]["history"].messages]
    assert roles == ["user", "assistant", "tool", "assistant"]


def test_incremental_tokenizer():
    from rl_tpu.envs.llm import IncrementalTokenizer

    calls = []
    def char_tok(t):
        calls.append(t)
        return [ord(c) for c in t]

    inc = IncrementalTokenizer(char_tok)
    a = inc("hello")
    b = inc("hello world")
    assert calls == ["hello", " world"]       # only the suffix retokenized
    np.testing.assert_array_equal(b, [ord(c) for c in "hello world"])
    # non-extension resets the cache
    c = inc("bye")
    assert calls[-1] == "bye" and len(c) == 3


def test_incremental_tokenizer_validate_repairs():
    from rl_tpu.envs.llm import IncrementalTokenizer

    # adversarial tokenizer: merges "ab" into one id when seen together
    def merging_tok(t):
        out, i = [], 0
        while i < len(t):
            if t[i:i+2] == "ab":
                out.append(999); i += 2
            else:
                out.append(ord(t[i])); i += 1
        return out

    inc = IncrementalTokenizer(merging_tok, validate_every=1)
    inc("xa")
    ids = inc("xab")          # suffix "b" would miss the merge; validation repairs
    np.testing.assert_array_equal(ids, [ord("x"), 999])


def test_gsm8k_env_accepts_hf_dataset():
    """A huggingface datasets.Dataset (the reference's GSM8KEnv source) is a
    sequence of row dicts — consumed directly, no adapter."""
    datasets = pytest.importorskip("datasets")
    ds = datasets.Dataset.from_dict({
        "question": ["2+2?", "3*3?"],
        "answer": ["... #### 4", "... #### 9"],
    })
    env = GSM8KEnv(ds)
    h = env.reset(1)
    assert env.step(h, "#### 9")[1] == 1.0


class TestIFEvalExtendedRegistry:
    """Extended constraint families (reference envs/llm/reward/ifeval/)."""

    def _score(self, constraints, text):
        from rl_tpu.envs.llm import IFEvalScorer
        return IFEvalScorer(constraints)(text)

    def test_paragraphs_sentences(self):
        assert self._score([("num_paragraphs", {"n": 2})], "a\n\nb") == 1.0
        assert self._score(
            [("num_sentences", {"min": 2, "max": 3})], "One. Two!") == 1.0
        assert self._score(
            [("num_sentences", {"max": 1})], "One. Two. Three.") == 0.0

    def test_first_word_and_keywords(self):
        assert self._score([("first_word", {"word": "indeed"})],
                           "Indeed, it works.") == 1.0
        assert self._score(
            [("keyword_frequency",
              {"keyword": "tpu", "n": 2, "relation": "at_least"})],
            "TPU and tpu again") == 1.0

    def test_case_constraints(self):
        assert self._score([("all_lowercase", {})], "quiet text") == 1.0
        assert self._score([("all_uppercase", {})], "LOUD TEXT") == 1.0
        assert self._score(
            [("num_capital_words", {"min": 2})], "USE THE mxu") == 1.0

    def test_format_constraints(self):
        assert self._score([("title", {})], "<<My Title>>\nbody") == 1.0
        assert self._score([("postscript", {})], "bye\nP.S. hello") == 1.0
        assert self._score([("num_placeholders", {"n": 2})],
                           "Dear [name] of [city]") == 1.0
        assert self._score([("num_sections", {"n": 2})],
                           "Section 1 x Section 2 y") == 1.0
        assert self._score([("quoted_response", {})], '"all quoted"') == 1.0
        assert self._score([("no_commas", {})], "no commas here") == 1.0

    def test_json_keys(self):
        assert self._score([("json_keys", {"keys": ["a", "b"]})],
                           '{"a": 1, "b": 2, "c": 3}') == 1.0
        assert self._score([("json_keys", {"keys": ["a", "z"]})],
                           '{"a": 1}') == 0.0

    def test_unknown_constraint_rejected(self):
        from rl_tpu.envs.llm import IFEvalScorer
        with pytest.raises(ValueError):
            IFEvalScorer([("nope", {})])


def test_policy_version_change_history():
    from rl_tpu.envs.llm import PolicyVersion, VersionChange
    pv = PolicyVersion()
    pv.increment_version()
    pv.increment_version()
    assert [type(e) for e in pv.history] == [VersionChange, VersionChange]
    assert pv.history[0].old_version == 0
    assert pv.history[1].new_version == pv.version == 2
    assert pv.history[0].timestamp <= pv.history[1].timestamp

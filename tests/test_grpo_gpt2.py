"""End-to-end GRPO through a real HF GPT2 (VERDICT r4 missing #2).

Drives the full loop of ``sota/grpo_gpt2.py`` at miniature scale: ChatEnv
→ LLMCollector → TransformersWrapper.generate (HF sampled decoding) →
differentiable rescoring → token-level GRPO torch update →
LLMEngineWeightSync push back into the engine model.  Reference shape:
/root/reference/sota-implementations/grpo/grpo-sync.py:330 (loop),
grpo/grpo_utils.py:149 (HF training-model construction).
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
pytest.importorskip("transformers")

from sota.grpo_gpt2 import (  # noqa: E402
    DEFAULTS, CharTokenizer, build_models, main, make_env,
)


class TestCharTokenizer:
    def test_roundtrip(self):
        tok = CharTokenizer()
        ids = tok("12+34=")["input_ids"]
        assert tok.decode(ids) == "12+34="

    def test_chat_template_user_only(self):
        tok = CharTokenizer()
        chats = [{"role": "system", "content": "sys"},
                 {"role": "user", "content": "12+34="},
                 {"role": "assistant", "content": "99$"}]
        # the template encodes ONLY user text: prompt ids are identical
        # whether or not the assistant turn is present (rescoring relies
        # on this to recover generation-time prompt ids from the full
        # history)
        assert tok.apply_chat_template(chats) == tok.apply_chat_template(
            chats[:2])
        assert tok.decode(tok.apply_chat_template(chats)) == "12+34="


class TestGPT2GRPOLoop:
    @pytest.mark.slow
    def test_reward_rises_and_weights_push(self):
        # single-digit sums (max_digits=5 -> sum <= 8, still 2-char gold
        # "0s$"... keep the standard task but tiny model + easy range)
        cfg = dict(
            DEFAULTS, iters=25, num_prompts=4, group_size=8, lr=2e-3,
            n_layer=1, n_head=2, n_embd=64, max_digits=5, logger="none",
        )
        model_train, final_reward = main(cfg)
        assert final_reward > 0.25, (
            f"GRPO through the HF path failed to learn: {final_reward}")

    def test_engine_push_changes_generation_policy(self):
        # the engine is a SEPARATE model instance: before a push its
        # weights equal the init; after, they equal the trained model's
        cfg = dict(DEFAULTS, n_layer=1, n_head=2, n_embd=32)
        model_train, model_infer, _ = build_models(cfg)
        from rl_tpu.modules.llm_wrappers import TransformersWrapper
        from rl_tpu.weight_update.llm import LLMEngineWeightSync

        wrapper = TransformersWrapper(model_infer, CharTokenizer(),
                                      max_new_tokens=3)
        sync = LLMEngineWeightSync.create("gpt2_test")
        sync.register_engine(wrapper)
        with torch.no_grad():
            for p in model_train.parameters():
                p.add_(1.0)
        t0 = next(iter(model_infer.parameters())).clone()
        sync.push_weights(model_train.state_dict())
        t1 = next(iter(model_infer.parameters()))
        assert not torch.equal(t0, t1)
        assert torch.equal(t1, next(iter(model_train.parameters())))
        assert sync.version == 1

    def test_behaviour_and_rescore_log_probs_agree(self):
        # greedy generation then rescoring must produce the SAME per-token
        # log-probs (mask/position conventions shared) — the invariant
        # that keeps GRPO ratios honest on ragged rows
        cfg = dict(DEFAULTS, n_layer=1, n_head=2, n_embd=32)
        _, model_infer, _ = build_models(cfg)
        from rl_tpu.modules.llm_wrappers import TransformersWrapper

        tok = CharTokenizer()
        wrapper = TransformersWrapper(model_infer, tok, max_new_tokens=3,
                                      do_sample=False)
        env = make_env(0, 50)
        h = env.reset()
        text, ids, lps = wrapper.generate(h)
        prompt_ids = tok.apply_chat_template(h.to_chats())
        scored = wrapper.log_probs_batch([prompt_ids], [list(ids)])
        got = np.asarray(scored["log_probs"])[0][
            np.asarray(scored["response_mask"])[0]]
        np.testing.assert_allclose(got, np.asarray(lps), rtol=1e-4,
                                   atol=1e-5)

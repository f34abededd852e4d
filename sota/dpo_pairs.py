"""SFT -> DPO on synthetic preference pairs (the standard RLHF recipe).

Direct-preference-optimization counterpart of the reference's RLHF data
path (``/root/reference/torchrl/data/llm/reward.py:29`` ``PairwiseDataset``
— prompt + chosen/rejected comparisons): pairs prefer the CORRECT
2-digit-sum completion over a corrupted one.  Phase 1 SFTs a char
``TransformerLM`` on the chosen completions; phase 2 runs
:func:`rl_tpu.objectives.llm.dpo_loss` against the frozen SFT copy.
Greedy exact-match on held-out sums is the headline metric; pair ranking
accuracy tracks the DPO objective itself.

(DPO straight from random init maximizes the margin while both sequence
probabilities fall — pair accuracy hits 1.0 with exact-match ~0.  The
SFT warm start is load-bearing, exactly as in the reference pipeline.)

Run::

    python sota/dpo_pairs.py [iters=400] [sft_iters=300] [beta=0.5]
"""
import sys

import jax
import jax.numpy as jnp
import numpy as np
import optax

from rl_tpu.config import apply_overrides
from rl_tpu.data.llm import PairwiseDataset
from rl_tpu.modules.transformer import TransformerLM
from rl_tpu.objectives.llm import dpo_loss
from rl_tpu.record import CSVLogger, generate_exp_name

DEFAULTS = dict(iters=400, sft_iters=300, batch=64, lr=3e-4, beta=0.5,
                label_smoothing=0.0, pairs=2048, seed=0,
                # when set: tokenize the pair corpus ONCE into [N, L]
                # memmaps under this dir (TokenizedDatasetLoader —
                # reference data/llm/dataset.py:26) and train from the
                # memmapped copy; later runs reload without re-tokenizing
                memmap_dir="")

CHARS = "0123456789+=$_"
EOS, PAD = CHARS.index("$"), CHARS.index("_")
VOCAB = len(CHARS)
P_LEN, R_LEN = 6, 3  # "dd+dd=" -> "dd$"


def encode(text: str) -> np.ndarray:
    return np.asarray([CHARS.index(c) for c in text], np.int32)


def make_pairs(n: int, rng: np.random.RandomState) -> PairwiseDataset:
    rows = []
    for _ in range(n):
        a, b = int(rng.randint(50)), int(rng.randint(50))
        s = a + b
        wrong = (s + int(rng.randint(1, 99))) % 100
        rows.append(dict(
            prompt=f"{a // 10}{a % 10}+{b // 10}{b % 10}=",
            chosen=f"{s // 10}{s % 10}$",
            rejected=f"{wrong // 10}{wrong % 10}$",
        ))
    return PairwiseDataset(rows)


def main(cfg=None):
    cfg = {**DEFAULTS, **(cfg or {})}
    rng = np.random.RandomState(cfg["seed"])
    key = jax.random.PRNGKey(cfg["seed"])
    lm = TransformerLM(vocab_size=VOCAB, n_layers=2, d_model=64)
    params = lm.init(key, jnp.zeros((1, P_LEN + R_LEN), jnp.int32))["params"]
    logger = CSVLogger(generate_exp_name("dpo_pairs", "char"))
    ds = make_pairs(cfg["pairs"], rng)

    def seq_log_prob(p, tokens):
        """Sum of response-token log-probs under the LM."""
        logits = lm.apply({"params": p}, tokens)
        lp = jax.nn.log_softmax(logits, -1)
        pos = jnp.arange(R_LEN) + P_LEN - 1
        tgt = jax.lax.dynamic_slice_in_dim(tokens, P_LEN, R_LEN, 1)
        tok_lp = jnp.take_along_axis(lp[:, pos, :], tgt[..., None], -1)[..., 0]
        return tok_lp.sum(-1)

    def token_log_probs(p, tokens):
        logits = lm.apply({"params": p}, tokens)
        lp = jax.nn.log_softmax(logits, -1)
        pos = jnp.arange(R_LEN) + P_LEN - 1
        tgt = jax.lax.dynamic_slice_in_dim(tokens, P_LEN, R_LEN, 1)
        return jnp.take_along_axis(lp[:, pos, :], tgt[..., None], -1)[..., 0]

    tx_sft = optax.adam(cfg["lr"])

    @jax.jit
    def sft_update(p, opt_state, c_tok):
        from rl_tpu.objectives.llm import sft_loss

        def total(q):
            return sft_loss(token_log_probs(q, c_tok),
                            jnp.ones((c_tok.shape[0], R_LEN), bool))

        l, grads = jax.value_and_grad(total)(p)
        updates, opt_state = tx_sft.update(grads, opt_state, p)
        return optax.apply_updates(p, updates), opt_state, l

    tx = optax.adam(cfg["lr"])

    @jax.jit
    def update(p, opt_state, ref_p, c_tok, r_tok):
        ref_c = seq_log_prob(ref_p, c_tok)
        ref_r = seq_log_prob(ref_p, r_tok)

        def total(q):
            return dpo_loss(seq_log_prob(q, c_tok), seq_log_prob(q, r_tok),
                            ref_c, ref_r, beta=cfg["beta"],
                            label_smoothing=cfg["label_smoothing"])

        (l, m), grads = jax.value_and_grad(total, has_aux=True)(p)
        updates, opt_state = tx.update(grads, opt_state, p)
        return optax.apply_updates(p, updates), opt_state, l, m

    @jax.jit
    def greedy(p, prompt_tokens):
        B = prompt_tokens.shape[0]
        tokens = jnp.concatenate(
            [prompt_tokens, jnp.full((B, R_LEN), PAD, jnp.int32)], 1)
        for t in range(R_LEN):
            logits = lm.apply({"params": p}, tokens)[:, P_LEN + t - 1]
            tokens = tokens.at[:, P_LEN + t].set(jnp.argmax(logits, -1))
        return tokens[:, P_LEN:]

    def eval_exact(p, n=128):
        r = np.random.RandomState(12345)
        prompts, golds = [], []
        for _ in range(n):
            a, b = int(r.randint(50)), int(r.randint(50))
            prompts.append(encode(f"{a // 10}{a % 10}+{b // 10}{b % 10}="))
            golds.append(encode(f"{(a + b) // 10}{(a + b) % 10}$"))
        out = np.asarray(greedy(p, jnp.asarray(np.stack(prompts))))
        return float(np.mean([np.array_equal(o, g)
                              for o, g in zip(out, golds)]))

    if cfg["memmap_dir"]:
        # tokenize-once path: both sides cached as [N, P_LEN+R_LEN]
        # memmaps, row-aligned with ds.rows; a second run with the same
        # memmap_dir reloads without re-tokenizing
        from rl_tpu.data.llm import TokenizedDatasetLoader

        mm = {side: TokenizedDatasetLoader(
            [r["prompt"] + r[side] for r in ds.rows],
            lambda t: encode(t).tolist(), P_LEN + R_LEN,
            root_dir=cfg["memmap_dir"], split=side, pad_id=PAD,
        ).load()["input_ids"] for side in ("chosen", "rejected")}

        def batch_tokens(idx, side):
            return jnp.asarray(np.asarray(mm[side][np.asarray(idx)]))
    else:
        def batch_tokens(idx, side):
            return jnp.asarray(np.stack(
                [encode(ds.rows[j]["prompt"] + ds.rows[j][side])
                 for j in idx]))

    # -- phase 1: SFT on the chosen completions ----------------------------
    opt_state = tx_sft.init(params)
    it = 0
    while it < cfg["sft_iters"]:
        for batch_rows in ds.index_batches(cfg["batch"], seed=1000 + it):
            params, opt_state, loss = sft_update(
                params, opt_state, batch_tokens(batch_rows, "chosen"))
            if it % 100 == 0 or it == cfg["sft_iters"] - 1:
                exact = eval_exact(params)
                logger.log_scalar("sft/loss", float(loss), step=it)
                logger.log_scalar("sft/exact_match", exact, step=it)
                print(f"sft {it}: loss={float(loss):.4f} "
                      f"greedy_exact={exact:.3f}", flush=True)
            it += 1
            if it >= cfg["sft_iters"]:
                break

    # -- phase 2: DPO against the frozen SFT reference ---------------------
    ref_params = jax.tree.map(lambda x: x, params)
    opt_state = tx.init(params)
    it = 0
    while it < cfg["iters"]:
        for batch_rows in ds.index_batches(cfg["batch"], seed=it):
            params, opt_state, loss, m = update(
                params, opt_state, ref_params,
                batch_tokens(batch_rows, "chosen"),
                batch_tokens(batch_rows, "rejected"))
            if it % 50 == 0 or it == cfg["iters"] - 1:
                exact = eval_exact(params)
                logger.log_scalar("train/loss", float(loss), step=it)
                logger.log_scalar("train/accuracy",
                                  float(m["accuracy"]), step=it)
                logger.log_scalar("eval/exact_match", exact, step=it)
                print(f"dpo {it}: loss={float(loss):.4f} "
                      f"pair_acc={float(m['accuracy']):.3f} "
                      f"greedy_exact={exact:.3f}", flush=True)
            it += 1
            if it >= cfg["iters"]:
                break
    return params


if __name__ == "__main__":
    main(apply_overrides({}, sys.argv[1:]))

"""Tensor-parallel sharding rules for the native TransformerLM engine.

The TPU-native counterpart of the reference's LLM tensor parallelism, which
is delegated to vLLM engine args (``tensor_parallel_size`` —
``/root/reference/torchrl/modules/llm/backends/vllm/vllm_async.py:176,
504-507``): here the engine is the native ``TransformerLM``
(`rl_tpu/modules/transformer.py`) and TP is expressed as GSPMD sharding
rules over its flax param tree — Megatron-style column/row parallel
placement on a ``tp`` mesh axis.  Place the params once with
:func:`shard_lm_params`; any jitted apply/generate over them then runs
tensor-parallel with XLA inserting the all-reduces (no model code changes,
the standard JAX TP recipe).

Layout (per block):
- attention q/k/v kernels ``[D, H, dh]`` — column-parallel over heads;
- attention out kernel ``[H, dh, D]`` — row-parallel over heads (psum);
- MLP up ``[D, 4D]`` — column-parallel; MLP down ``[4D, D]`` — row-parallel;
- embeddings / LM head — vocab-sharded; LayerNorm/pos — replicated.
"""
from __future__ import annotations

import jax
import jax.tree_util as jtu
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["lm_tp_spec", "shard_lm_params", "shard_lm_cache",
           "shard_serve_cache"]


def lm_tp_spec(path: str, leaf, tp_size: int, axis: str = "tp") -> P:
    """PartitionSpec for one TransformerLM param leaf, keyed on its flax
    path.  Falls back to replication when the sharded dim does not divide
    by ``tp_size``."""

    def fits(dim: int) -> bool:
        return leaf.shape[dim] % tp_size == 0

    if "MultiHeadDotProductAttention" in path:
        if "out" in path:
            if "kernel" in path and leaf.ndim == 3 and fits(0):
                return P(axis, None, None)      # row-parallel: heads in
            return P()                           # out bias replicated
        # query/key/value
        if "kernel" in path and leaf.ndim == 3 and fits(1):
            return P(None, axis, None)           # column-parallel: heads out
        if "bias" in path and leaf.ndim == 2 and fits(0):
            return P(axis, None)
        return P()
    if "_Block_" in path:
        if "Dense_0" in path:                    # MLP up: column-parallel
            if "kernel" in path and fits(1):
                return P(None, axis)
            if "bias" in path and fits(0):
                return P(axis)
            return P()
        if "Dense_1" in path and "kernel" in path and fits(0):
            return P(axis, None)                 # MLP down: row-parallel
        return P()                               # LayerNorm etc.
    if "Embed" in path and leaf.ndim == 2 and fits(0):
        return P(axis, None)                     # vocab-sharded embedding
    if "Dense_0" in path and "CausalTransformer" not in path:
        # top-level LM head: vocab-sharded logits
        if "kernel" in path and leaf.ndim == 2 and fits(1):
            return P(None, axis)
        if "bias" in path and fits(0):
            return P(axis)
    return P()


def shard_lm_params(params, mesh: Mesh, axis: str = "tp"):
    """device_put every leaf of a TransformerLM param tree with its
    Megatron-style NamedSharding.  Inputs/outputs of a jitted apply stay
    replicated (or dp-sharded) — GSPMD adds the TP collectives."""
    tp_size = mesh.shape[axis]

    def place(path, leaf):
        spec = lm_tp_spec(jtu.keystr(path), leaf, tp_size, axis)
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jtu.tree_map_with_path(place, params)


def shard_lm_cache(cache, mesh: Mesh, axis: str = "tp"):
    """Place a decode-mode KV cache tensor-parallel: ``cached_key`` /
    ``cached_value`` ``[B, L, H, dh]`` shard over the heads dim (matching
    the column-parallel qkv projections), ``cache_index`` replicated.
    Together with :func:`shard_lm_params` this is the full TP serving
    state — each shard holds only its heads' KV history."""
    tp_size = mesh.shape[axis]

    def place(path, leaf):
        ps = jtu.keystr(path)
        spec = P()
        if ("cached_key" in ps or "cached_value" in ps) and leaf.ndim == 4 \
                and leaf.shape[2] % tp_size == 0:
            spec = P(None, None, axis, None)
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jtu.tree_map_with_path(place, cache)


def shard_serve_cache(cache, mesh: Mesh, axis: str = "tp"):
    """Place the serving engine's explicit KV cache
    (:func:`rl_tpu.serve.init_slot_cache` — per-layer ``(k, v)`` arrays
    ``[S, L, H, dh]``) tensor-parallel over the heads dim, matching the
    column-parallel qkv rules.  With :func:`shard_lm_params` this runs the
    continuous-batching engine TP-sharded with no code changes."""
    tp_size = mesh.shape[axis]

    def place(leaf):
        spec = P()
        if leaf.ndim == 4 and leaf.shape[2] % tp_size == 0:
            spec = P(None, None, axis, None)
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree.map(place, cache)

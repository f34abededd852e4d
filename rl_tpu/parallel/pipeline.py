"""Pipeline parallelism over a mesh axis — GPipe-style microbatching with
``shard_map`` + ``ppermute``.

The reference has NO native pipeline parallelism; it delegates PP to vLLM
engine args for LLM inference only
(``/root/reference/torchrl/modules/llm/backends/vllm/vllm_async.py:1975``
``pipeline_parallel_size``).  On TPU, PP is a first-class scaling axis:
stage s of the network lives on mesh slice ``pp=s``, activations travel
stage→stage over ICI via ``lax.ppermute``, and M microbatches keep every
stage busy (bubble fraction = (S-1)/(M+S-1)).

Design (pure-functional, composes with dp/tp on the same mesh):

* the model is a list of S stage functions ``stage_fn(stage_params, x)``
  with identical activation shapes at the cuts;
* ``stack_stage_params`` stacks per-stage param pytrees along a leading
  axis that is sharded over ``pp`` — inside ``shard_map`` each device
  holds ONLY its stage's slice;
* :func:`pipeline_apply` runs the classic skewed loop: at tick t, the
  device computes its stage on the microbatch it received at t-1 and
  permutes the result to the next stage.  All devices execute the same
  program (SPMD); stage identity comes from ``lax.axis_index``.

Forward-only here covers inference/serving; for training, wrap
``pipeline_apply`` in ``jax.grad`` — XLA differentiates through
``ppermute`` (reverse permutation) so the backward pipeline comes for
free, as verified in tests/test_pipeline_parallel.py.
"""
from __future__ import annotations

from functools import partial
from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
try:
    from jax.experimental.shard_map import shard_map
    _SHARD_KW = {"check_rep": False}
except ImportError:  # newer jax moved (and simplified) the API
    from jax import shard_map

    _SHARD_KW = {}
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["stack_stage_params", "pipeline_apply", "pipeline_fn"]


def stack_stage_params(stage_params: Sequence[Any]) -> Any:
    """Stack S same-structure per-stage param pytrees along axis 0 (the
    axis sharded over ``pp``)."""
    return jax.tree.map(lambda *xs: jnp.stack(xs, 0), *stage_params)


def pipeline_apply(stage_fn: Callable, stacked_params: Any, x: jax.Array,
                   *, mesh: Mesh, axis: str = "pp",
                   microbatches: int | None = None) -> jax.Array:
    """Apply an S-stage pipeline to ``x`` [B, ...] over mesh axis ``axis``.

    ``stage_fn(params_s, x_mb)`` must map activations to activations of
    the SAME shape/dtype (equal-width cuts — pad the edge stages if the
    true widths differ).  ``microbatches`` defaults to the stage count.
    Returns the full-batch output (replicated over ``axis``).
    """
    S = mesh.shape[axis]
    M = int(microbatches or S)
    B = x.shape[0]
    if B % M:
        raise ValueError(f"batch {B} must divide into {M} microbatches")

    # within shard_map each device sees its own stage slice of the params
    in_specs = (
        jax.tree.map(lambda _: P(axis), stacked_params),
        P(),   # x replicated in; every stage needs mb 0 at tick 0 anyway
    )
    out_spec = P()

    def per_device(params_self, x_full):
        # params_self leaves have leading dim 1 (this device's stage)
        params_self = jax.tree.map(lambda a: a[0], params_self)
        s = jax.lax.axis_index(axis)
        mbs = x_full.reshape((M, B // M) + x_full.shape[1:])
        n_ticks = M + S - 1
        fwd_perm = [(i, (i + 1) % S) for i in range(S)]

        def tick(carry, t):
            buf, outs = carry
            # feed: stage 0 picks up microbatch t (while t < M)
            feed = mbs[jnp.minimum(t, M - 1)]
            buf = jnp.where(s == 0, feed, buf)
            y = stage_fn(params_self, buf)
            # the last stage's result for microbatch (t - (S-1)) is ready
            done_idx = t - (S - 1)
            outs = jax.lax.cond(
                done_idx >= 0,
                lambda o: o.at[jnp.maximum(done_idx, 0)].set(y),
                lambda o: o,
                outs,
            )
            # rotate activations one stage forward
            buf = jax.lax.ppermute(y, axis, fwd_perm)
            return (buf, outs), None

        buf0 = jnp.zeros_like(mbs[0])
        outs0 = jnp.zeros((M,) + mbs.shape[1:], x_full.dtype)
        (_, outs), _ = jax.lax.scan(tick, (buf0, outs0),
                                    jnp.arange(n_ticks))
        # outs is only correct on the LAST stage; broadcast it to all
        # devices so the result is replicated over the pp axis
        last = jnp.where(s == S - 1, outs, jnp.zeros_like(outs))
        last = jax.lax.psum(last, axis)
        return last.reshape((B,) + x_full.shape[1:])

    fn = shard_map(per_device, mesh=mesh, in_specs=in_specs,
                   out_specs=out_spec, **_SHARD_KW)
    return fn(stacked_params, x)


def pipeline_fn(stage_fn: Callable, *, mesh: Mesh, axis: str = "pp",
                microbatches: int | None = None) -> Callable:
    """Partial wrapper: ``f(stacked_params, x) -> y`` (jit-friendly)."""
    return partial(pipeline_apply, stage_fn, mesh=mesh, axis=axis,
                   microbatches=microbatches)

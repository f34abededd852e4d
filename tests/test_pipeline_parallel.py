"""Pipeline parallelism (GPipe microbatching over shard_map + ppermute).

The reference delegates PP to vLLM engine args (vllm_async.py:1975); here
it is native.  Correctness oracle: running the S stage functions
sequentially on one device."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rl_tpu.parallel import make_mesh
from rl_tpu.parallel.pipeline import (pipeline_apply, pipeline_fn,
                                      stack_stage_params)

S = 4  # stages (over 4 of the 8 virtual devices)
D = 16


def stage_fn(p, x):
    return jnp.tanh(x @ p["w"] + p["b"])


def make_stages(key):
    ks = jax.random.split(key, S)
    return [
        {"w": jax.random.normal(k, (D, D)) * 0.3, "b": jnp.zeros(D)}
        for k in ks
    ]


def sequential(stages, x):
    for p in stages:
        x = stage_fn(p, x)
    return x


@pytest.fixture
def mesh():
    devs = jax.devices()[:S]
    return make_mesh({"pp": S}, devices=devs)


class TestPipelineForward:
    def test_matches_sequential(self, key, mesh):
        stages = make_stages(key)
        stacked = stack_stage_params(stages)
        x = jax.random.normal(jax.random.PRNGKey(1), (8, D))
        y = pipeline_apply(stage_fn, stacked, x, mesh=mesh)
        np.testing.assert_allclose(np.asarray(y),
                                   np.asarray(sequential(stages, x)),
                                   rtol=1e-5, atol=1e-6)

    @pytest.mark.parametrize("microbatches", [2, 4, 8])
    def test_microbatch_counts(self, key, mesh, microbatches):
        stages = make_stages(key)
        stacked = stack_stage_params(stages)
        x = jax.random.normal(jax.random.PRNGKey(2), (8, D))
        y = pipeline_apply(stage_fn, stacked, x, mesh=mesh,
                           microbatches=microbatches)
        np.testing.assert_allclose(np.asarray(y),
                                   np.asarray(sequential(stages, x)),
                                   rtol=1e-5, atol=1e-6)

    def test_jit_compiles(self, key, mesh):
        stages = make_stages(key)
        stacked = stack_stage_params(stages)
        f = jax.jit(pipeline_fn(stage_fn, mesh=mesh))
        x = jax.random.normal(jax.random.PRNGKey(3), (4, D))
        y = f(stacked, x)
        np.testing.assert_allclose(np.asarray(y),
                                   np.asarray(sequential(stages, x)),
                                   rtol=1e-5, atol=1e-6)

    def test_bad_batch_rejected(self, key, mesh):
        stages = make_stages(key)
        stacked = stack_stage_params(stages)
        with pytest.raises(ValueError, match="microbatches"):
            pipeline_apply(stage_fn, stacked,
                           jnp.zeros((6, D)), mesh=mesh)  # 6 % 4 != 0


class TestPipelineBackward:
    def test_grad_matches_sequential(self, key, mesh):
        """XLA differentiates through ppermute — the backward pipeline
        comes for free."""
        stages = make_stages(key)
        stacked = stack_stage_params(stages)
        x = jax.random.normal(jax.random.PRNGKey(4), (8, D))

        def loss_pp(sp):
            return (pipeline_apply(stage_fn, sp, x, mesh=mesh) ** 2).mean()

        def loss_seq(stages_list):
            return (sequential(stages_list, x) ** 2).mean()

        g_pp = jax.grad(loss_pp)(stacked)
        g_seq = jax.grad(loss_seq)(stages)
        g_seq_stacked = stack_stage_params(g_seq)
        for a, b in zip(jax.tree.leaves(g_pp),
                        jax.tree.leaves(g_seq_stacked)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-6)

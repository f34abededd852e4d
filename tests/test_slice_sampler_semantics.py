"""SliceSampler reference-semantics tests (VERDICT r2 item #4).

Reference: torchrl samplers.py:1696 (``SliceSampler``), :2789 (without
replacement), :3091 (prioritized) — episode discovery from
``("collector","traj_ids")``, strict_length, ring-cursor wrap masking.

Invariants checked under ring wraparound for all three variants:
* no sampled window mixes two episodes;
* no window straddles the write cursor (mixes newest + oldest data);
* strict_length=True yields only full-length fully-valid windows.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rl_tpu.data import TDict
from rl_tpu.data.replay import (
    PrioritizedSliceSampler,
    ReplayBuffer,
    SliceSampler,
    SliceSamplerWithoutReplacement,
    TensorStorage,
)

CAP = 32
L = 4
N_SLICES = 4


def make_stream(n, ep_len, start_id=0, start_step=0):
    """Trajectory-contiguous stream: step ids + traj ids + done flags."""
    steps = np.arange(start_step, start_step + n)
    traj = start_id + (steps // ep_len)
    done = (steps % ep_len) == (ep_len - 1)
    return TDict(
        obs=jnp.asarray(steps, jnp.float32)[:, None],
        collector={"traj_ids": jnp.asarray(traj, jnp.int32)},
        next={"done": jnp.asarray(done)[:, None]},
    )


def sample_windows(rb, key, **kw):
    state = rb._state
    state, batch, info = jax.jit(
        rb.sample_fn, static_argnames=("batch_size",)
    )(state, key, batch_size=N_SLICES * L)
    rb._state = state
    idx = np.asarray(info["index"]).reshape(N_SLICES, L)
    mask = np.asarray(info["mask"]).reshape(N_SLICES, L)
    obs = np.asarray(batch["obs"]).reshape(N_SLICES, L)
    traj = np.asarray(batch["collector", "traj_ids"]).reshape(N_SLICES, L)
    return idx, mask, obs, traj


def assert_invariants(idx, mask, obs, traj):
    for s in range(idx.shape[0]):
        vi_obs = obs[s][mask[s]]
        vi_traj = traj[s][mask[s]]
        if len(vi_obs) == 0:
            continue
        # one episode only
        assert len(set(vi_traj.tolist())) == 1, (vi_traj, obs[s], mask[s])
        # time-contiguous step ids (no cursor straddle: stale data would
        # break the +1 chain because overwrites replace whole ranges)
        assert (np.diff(vi_obs) == 1).all(), (vi_obs, mask[s])


@pytest.fixture(params=[SliceSampler, SliceSamplerWithoutReplacement,
                        PrioritizedSliceSampler])
def sampler_cls(request):
    return request.param


class TestSliceInvariantsUnderWrap:
    def test_no_cross_episode_or_cursor_windows(self, sampler_cls, key):
        sampler = sampler_cls(CAP, num_slices=N_SLICES, slice_len=L)
        rb = ReplayBuffer(storage=TensorStorage(CAP), sampler=sampler,
                          batch_size=N_SLICES * L)
        # fill the ring, then wrap it 2.5 times in uneven chunks
        rb.extend(make_stream(CAP, ep_len=8))
        total = CAP
        for chunk in (10, 24, 7, 32, 9):
            rb.extend(make_stream(chunk, ep_len=8, start_id=1000 + total,
                                  start_step=total))
            total += chunk
            for trial in range(4):
                idx, mask, obs, traj = sample_windows(
                    rb, jax.random.PRNGKey(total * 10 + trial))
                assert_invariants(idx, mask, obs, traj)

    def test_some_windows_are_full_length(self, key):
        sampler = SliceSampler(CAP, num_slices=N_SLICES, slice_len=L)
        rb = ReplayBuffer(storage=TensorStorage(CAP), sampler=sampler,
                          batch_size=N_SLICES * L)
        rb.extend(make_stream(CAP, ep_len=8))
        full = 0
        for t in range(8):
            _, mask, _, _ = sample_windows(rb, jax.random.PRNGKey(t))
            full += int((mask.sum(1) == L).sum())
        assert full > 0


class TestStrictLength:
    def test_strict_always_full_windows(self, key):
        sampler = SliceSampler(CAP, num_slices=N_SLICES, slice_len=L,
                               strict_length=True)
        rb = ReplayBuffer(storage=TensorStorage(CAP), sampler=sampler,
                          batch_size=N_SLICES * L)
        rb.extend(make_stream(CAP, ep_len=8))
        # wrap partially so some episode heads are overwritten
        rb.extend(make_stream(12, ep_len=8, start_id=500, start_step=100))
        for t in range(8):
            idx, mask, obs, traj = sample_windows(rb, jax.random.PRNGKey(t))
            assert (mask.sum(1) == L).all(), mask
            assert_invariants(idx, mask, obs, traj)

    def test_strict_short_episodes_all_masked(self, key):
        # every episode shorter than the slice: nothing is sampleable
        sampler = SliceSampler(CAP, num_slices=N_SLICES, slice_len=8,
                               strict_length=True)
        rb = ReplayBuffer(storage=TensorStorage(CAP),
                          sampler=sampler, batch_size=N_SLICES * 8)
        rb.extend(make_stream(CAP, ep_len=4))
        state, batch, info = jax.jit(
            rb.sample_fn, static_argnames=("batch_size",)
        )(rb._state, jax.random.PRNGKey(0), batch_size=N_SLICES * 8)
        assert not np.asarray(info["mask"]).any()


class TestEpisodeTableWithoutTrajIds:
    def test_done_derived_pseudo_ids(self, key):
        # no ("collector","traj_ids") — boundaries derived from dones alone
        sampler = SliceSampler(CAP, num_slices=N_SLICES, slice_len=L)
        rb = ReplayBuffer(storage=TensorStorage(CAP), sampler=sampler,
                          batch_size=N_SLICES * L)
        steps = np.arange(CAP)
        done = (steps % 6) == 5
        rb.extend(TDict(obs=jnp.asarray(steps, jnp.float32)[:, None],
                        next={"done": jnp.asarray(done)[:, None]}))
        for t in range(6):
            state, batch, info = jax.jit(
                rb.sample_fn, static_argnames=("batch_size",)
            )(rb._state, jax.random.PRNGKey(t), batch_size=N_SLICES * L)
            mask = np.asarray(info["mask"]).reshape(N_SLICES, L)
            obs = np.asarray(batch["obs"]).reshape(N_SLICES, L)
            for s in range(N_SLICES):
                vi = obs[s][mask[s]]
                if len(vi) > 1:
                    assert (np.diff(vi) == 1).all()
                    # never crosses a done boundary (multiples of 6)
                    assert not ((vi[:-1] % 6) == 5).any()

    def test_truncated_marks_last_valid(self, key):
        sampler = SliceSampler(CAP, num_slices=N_SLICES, slice_len=L)
        rb = ReplayBuffer(storage=TensorStorage(CAP), sampler=sampler,
                          batch_size=N_SLICES * L)
        rb.extend(make_stream(CAP, ep_len=8))
        state, batch, info = jax.jit(
            rb.sample_fn, static_argnames=("batch_size",)
        )(rb._state, jax.random.PRNGKey(1), batch_size=N_SLICES * L)
        mask = np.asarray(info["mask"]).reshape(N_SLICES, L)
        trunc = np.asarray(info["truncated"]).reshape(N_SLICES, L)
        for s in range(N_SLICES):
            if mask[s].any():
                last = np.max(np.nonzero(mask[s])[0])
                assert trunc[s, last]
                assert trunc[s].sum() == 1

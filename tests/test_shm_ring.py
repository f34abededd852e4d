"""Native shared-memory ring transport (csrc/shm_ring.cpp + ctypes).

Reference counterpart: shared-memory TensorDict transport between env /
collector workers (SURVEY §3.3, §5.8)."""
import multiprocessing as mp
import time

import numpy as np
import pytest

from rl_tpu.comm.shm_ring import SeqlockBox, ShmRing


class TestInProcess:
    def test_bytes_roundtrip_fifo(self):
        ring = ShmRing.create("t_bytes", slot_size=1024, n_slots=4)
        try:
            ring.push_bytes(b"alpha")
            ring.push_bytes(b"beta")
            assert len(ring) == 2
            assert ring.pop_bytes() == b"alpha"
            assert ring.pop_bytes() == b"beta"
            assert len(ring) == 0
        finally:
            ring.close()

    def test_array_roundtrip_preserves_dtype_shape(self):
        ring = ShmRing.create("t_arr", slot_size=1 << 20, n_slots=4)
        try:
            for arr in (np.arange(24, dtype=np.float32).reshape(2, 3, 4),
                        np.ones((5,), np.uint8),
                        np.zeros((3, 2), np.int64)):
                ring.push_array(arr)
                out = ring.pop_array()
                assert out.dtype == arr.dtype and out.shape == arr.shape
                np.testing.assert_array_equal(out, arr)
        finally:
            ring.close()

    def test_full_ring_times_out(self):
        ring = ShmRing.create("t_full", slot_size=64, n_slots=2)
        try:
            ring.push_bytes(b"a")
            ring.push_bytes(b"b")
            with pytest.raises(TimeoutError):
                ring.push_bytes(b"c", timeout=0.1)
        finally:
            ring.close()

    def test_oversize_payload_rejected(self):
        ring = ShmRing.create("t_big", slot_size=16, n_slots=2)
        try:
            with pytest.raises(ValueError):
                ring.push_bytes(b"x" * 64)
        finally:
            ring.close()

    def test_empty_pop_times_out(self):
        ring = ShmRing.create("t_empty", slot_size=64, n_slots=2)
        try:
            with pytest.raises(TimeoutError):
                ring.pop_bytes(timeout=0.1)
        finally:
            ring.close()


class TestSeqlockBox:
    def test_overwrite_latest_wins_and_versions(self):
        box = SeqlockBox.create("t_box", 1024)
        try:
            assert box.read_bytes() == (None, 0)
            box.write_bytes(b"v1")
            box.write_bytes(b"v2")
            payload, ver = box.read_bytes()
            assert payload == b"v2" and ver == 2
            # reads are idempotent (latest-value, not a queue)
            assert box.read_bytes() == (b"v2", 2)
        finally:
            box.close()

    def test_writer_never_blocks(self):
        box = SeqlockBox.create("t_box_nb", 64)
        try:
            for i in range(1000):  # no reader at all — must not stall
                box.write_bytes(bytes([i % 256]) * 8)
            payload, ver = box.read_bytes()
            assert ver == 1000
        finally:
            box.close()

    def test_array_roundtrip(self):
        box = SeqlockBox.create("t_box_arr", 1 << 16)
        try:
            arr = np.arange(60, dtype=np.float32).reshape(3, 4, 5)
            box.write_array(arr)
            out, ver = box.read_array()
            assert ver == 1
            np.testing.assert_array_equal(out, arr)
        finally:
            box.close()

    def test_attach_sees_size(self):
        box = SeqlockBox.create("t_box_sz", 4096)
        other = SeqlockBox.attach("t_box_sz")
        try:
            assert other.size == 4096
            box.write_bytes(b"hello")
            assert other.read_bytes() == (b"hello", 1)
        finally:
            other.close()
            box.close()

    def test_oversize_rejected(self):
        box = SeqlockBox.create("t_box_big", 16)
        try:
            with pytest.raises(ValueError):
                box.write_bytes(b"x" * 64)
        finally:
            box.close()


def _producer(name, n):
    ring = ShmRing.attach(name)
    for i in range(n):
        ring.push_array(np.full((32, 32), i, np.float32), timeout=10.0)
    ring.close()


class TestCrossProcess:
    def test_child_producer_parent_consumer(self):
        ring = ShmRing.create("t_xproc", slot_size=1 << 20, n_slots=4)
        try:
            ctx = mp.get_context("spawn")
            p = ctx.Process(target=_producer, args=("t_xproc", 10))
            p.start()
            got = [float(ring.pop_array(timeout=30.0)[0, 0])
                   for _ in range(10)]
            p.join(timeout=10.0)
            assert got == [float(i) for i in range(10)]
            assert p.exitcode == 0
        finally:
            ring.close()


def _weight_worker(name, shape_meta, out_q):
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from rl_tpu.data import TDict
    from rl_tpu.weight_update import SharedMemWeightSyncScheme

    template = TDict(w=jnp.zeros(shape_meta["w"]), b=jnp.zeros(shape_meta["b"]))
    scheme = SharedMemWeightSyncScheme.attach(name)
    got = scheme.pull(template=template, timeout=20.0)
    out_q.put(None if got is None else float(jnp.asarray(got["w"]).sum()))


class TestSharedMemWeightSync:
    def test_push_pull_roundtrip_in_process(self):
        import jax.numpy as jnp

        from rl_tpu.data import TDict
        from rl_tpu.weight_update import SharedMemWeightSyncScheme

        params = TDict(w=jnp.arange(12.0).reshape(3, 4), b=jnp.ones((4,)))
        scheme = SharedMemWeightSyncScheme.create("t_wsync", 16)
        try:
            scheme.push(params)
            scheme.push(params.set("w", 2.0 * jnp.asarray(params["w"])))
            out = scheme.pull(template=params, timeout=1.0)
            # newest push wins
            np.testing.assert_allclose(np.asarray(out["w"]),
                                       2.0 * np.arange(12).reshape(3, 4))
            assert scheme.pull(template=params) is None  # drained
        finally:
            scheme.close()

    def test_cross_process_pull(self):
        import jax.numpy as jnp

        from rl_tpu.data import TDict
        from rl_tpu.weight_update import SharedMemWeightSyncScheme

        params = TDict(w=3.0 * jnp.ones((4, 4)), b=jnp.zeros((2,)))
        scheme = SharedMemWeightSyncScheme.create("t_wsync2", 18)
        try:
            ctx = mp.get_context("spawn")
            q = ctx.Queue()
            p = ctx.Process(target=_weight_worker,
                            args=("t_wsync2", {"w": (4, 4), "b": (2,)}, q))
            p.start()
            time.sleep(0.5)
            scheme.push(params)
            got = q.get(timeout=30.0)
            p.join(timeout=10.0)
            assert got == pytest.approx(48.0)
        finally:
            scheme.close()

"""Mailbox / rendezvous / distributed replay service tests.

Mirrors the reference's comm tests (spawn-based localhost services,
test_distributed.py pattern — no cluster needed)."""
import multiprocessing as mp
import threading
import time

import jax.numpy as jnp
import numpy as np
import pytest

from rl_tpu.comm import (
    DistributedReplayClient,
    Mailbox,
    MailboxPeerClosedError,
    MappingRendezvous,
    ReplayService,
    TCPStoreRendezvous,
    TCPStoreServer,
    watch_process_liveness,
)
from rl_tpu.data import TDict
from rl_tpu.data.replay import ReplayBuffer, TensorStorage


class TestMailbox:
    def test_request_reply_roundtrip(self):
        mb = Mailbox()
        client = mb.client()
        server = threading.Thread(
            target=lambda: mb.serve_once(lambda x: x * 2, timeout=5.0),
            daemon=True)
        server.start()
        assert client(21, timeout=10.0) == 42
        server.join(timeout=5.0)

    def test_futures_out_of_order(self):
        mb = Mailbox()
        client = mb.client()
        f1 = client.submit(1)
        f2 = client.submit(2)

        def serve():
            # resolve in reverse order; ACCUMULATE across drains — the mp
            # feeder thread can flush the two puts separately, so a single
            # drain() may see only one item (dropping a partial drain loses
            # that request forever — the round-4 flake)
            got = []
            while True:
                got.extend(mb.drain())
                if len(got) == 2:
                    for cb, payload in reversed(got):
                        mb.resolve(cb, payload + 100)
                    return
                time.sleep(0.01)

        t = threading.Thread(target=serve, daemon=True)
        t.start()
        # generous timeouts: a 3-way-oversubscribed CI box can stall the
        # server thread past 10s
        assert f2.result(timeout=60.0) == 102
        assert f1.result(timeout=60.0) == 101

    def test_handler_error_propagates(self):
        mb = Mailbox()
        client = mb.client()

        def boom(x):
            raise ValueError("nope")

        t = threading.Thread(target=lambda: mb.serve_once(boom, timeout=5.0),
                             daemon=True)
        t.start()
        with pytest.raises(ValueError):
            client(1, timeout=10.0)

    def test_peer_closed_raises(self):
        mb = Mailbox()
        client = mb.client()
        mb.close()  # peer gone
        with pytest.raises(MailboxPeerClosedError):
            client.submit(1)

    def test_liveness_watcher(self):
        ctx = mp.get_context("spawn")
        proc = ctx.Process(target=time.sleep, args=(0.2,))
        proc.start()
        alive = ctx.Event()
        alive.set()
        t = threading.Thread(target=watch_process_liveness,
                             args=(proc.sentinel, alive), daemon=True)
        t.start()
        proc.join()
        t.join(timeout=5.0)
        assert not alive.is_set()


class TestRendezvous:
    def test_mapping(self):
        r = MappingRendezvous()
        r.publish("addr", ("h", 1))
        assert r.read("addr") == ("h", 1)
        with pytest.raises(KeyError):
            r.read("missing")

    def test_mapping_wait_timeout(self):
        r = MappingRendezvous()
        with pytest.raises(TimeoutError):
            r.wait("missing", timeout=0.1)

    def test_tcp_store(self):
        server = TCPStoreServer()
        host, port = server.address
        try:
            a = TCPStoreRendezvous(host, port)
            b = TCPStoreRendezvous(host, port)
            a.publish("rank0", {"addr": "x"})
            assert b.wait("rank0", timeout=5.0) == {"addr": "x"}
            b.delete("rank0")
            with pytest.raises(KeyError):
                a.read("rank0")
            a.close()
            b.close()
        finally:
            server.close()

    def test_tcp_wait_blocks_until_publish(self):
        server = TCPStoreServer()
        host, port = server.address
        try:
            c = TCPStoreRendezvous(host, port)
            w = TCPStoreRendezvous(host, port)

            def later():
                time.sleep(0.2)
                c.publish("k", 7)

            threading.Thread(target=later, daemon=True).start()
            assert w.wait("k", timeout=10.0) == 7
        finally:
            server.close()


class TestReplayService:
    def _rb(self):
        return ReplayBuffer(storage=TensorStorage(32), batch_size=4)

    def test_threading_roundtrip(self, key):
        svc = ReplayService(self._rb(), transport="threading")
        try:
            client = svc.local_client()
            data = TDict(obs=jnp.arange(16, dtype=jnp.float32).reshape(8, 2),
                         reward=jnp.ones((8, 1)))
            client.extend(data)
            assert len(client) >= 8
            batch = client.sample(4)
            assert np.asarray(batch["obs"]).shape == (4, 2)
            stats = client.stats()
            assert stats["write_count"] == 8
        finally:
            svc.close()

    def test_tcp_roundtrip(self):
        svc = ReplayService(self._rb(), transport="tcp")
        try:
            client = svc.local_client()
            data = TDict(obs=np.ones((8, 2), np.float32))
            client.extend(data)
            batch, info = client.sample(4, return_info=True)
            assert batch["obs"].shape == (4, 2)
            client.close()
        finally:
            svc.close()

    def test_multiple_clients(self):
        svc = ReplayService(self._rb(), transport="tcp")
        try:
            c1 = svc.local_client()
            c2 = svc.local_client()
            c1.extend(TDict(obs=np.ones((4, 2), np.float32)))
            c2.extend(TDict(obs=np.zeros((4, 2), np.float32)))
            assert c1.stats()["write_count"] == 8
            b = c2.sample(4)
            assert b["obs"].shape == (4, 2)
            c1.close()
            c2.close()
        finally:
            svc.close()

"""Comm transports, service registry, inference server."""
import threading
import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rl_tpu.comm import (
    ServiceRegistry,
    TCPServer,
    TCPTransport,
    ThreadingTransport,
)
from rl_tpu.modules.inference_server import InferenceServer, PolicyClient


class TestThreadingTransport:
    def test_request_reply(self):
        t = ThreadingTransport(lambda x: x * 2)
        try:
            assert t.request(21) == 42
        finally:
            t.close()

    def test_handler_errors_propagate(self):
        def boom(x):
            raise ValueError("nope")

        t = ThreadingTransport(boom)
        try:
            with pytest.raises(ValueError):
                t.request(1)
        finally:
            t.close()

    def test_concurrent_clients(self):
        t = ThreadingTransport(lambda x: x + 1)
        results = []

        def client(i):
            results.append(t.request(i))

        threads = [threading.Thread(target=client, args=(i,)) for i in range(20)]
        for th in threads:
            th.start()
        for th in threads:
            th.join()
        t.close()
        assert sorted(results) == list(range(1, 21))


class TestTCPTransport:
    def test_roundtrip(self):
        server = TCPServer(lambda x: {"echo": x})
        try:
            client = TCPTransport(*server.address)
            out = client.request([1, 2, 3])
            assert out == {"echo": [1, 2, 3]}
            # arrays travel too
            out = client.request(np.arange(5))
            np.testing.assert_array_equal(out["echo"], np.arange(5))
            client.close()
        finally:
            server.close()

    def test_remote_error(self):
        def boom(x):
            raise RuntimeError("remote fail")

        server = TCPServer(boom)
        try:
            client = TCPTransport(*server.address)
            with pytest.raises(RuntimeError, match="remote"):
                client.request(1)
            client.close()
        finally:
            server.close()


class TestServices:
    def test_register_get(self):
        reg = ServiceRegistry()
        reg.register("tok", service={"vocab": 10})
        assert reg.get("tok")["vocab"] == 10
        assert "tok" in reg

    def test_lazy_factory_singleton(self):
        reg = ServiceRegistry()
        calls = []
        reg.register("lazy", factory=lambda: calls.append(1) or object())
        a = reg.get("lazy")
        b = reg.get("lazy")
        assert a is b and len(calls) == 1

    def test_missing(self):
        reg = ServiceRegistry()
        with pytest.raises(KeyError):
            reg.get("nope")


class TestInferenceServer:
    def test_batched_inference(self, key):
        from rl_tpu.modules import MLP

        net = MLP(out_features=2, num_cells=(8,))
        params = net.init(key, jnp.zeros((1, 3)))["params"]

        @jax.jit
        def policy(params, obs, k):
            return net.apply({"params": params}, jnp.asarray(obs))

        server = InferenceServer(policy, params, max_batch_size=8,
                                 timeout_ms=50)
        client = PolicyClient(server)
        try:
            results = []
            # barrier: all requests arrive together, so coalescing is
            # deterministic even on a heavily loaded CI box (without it,
            # trickling requests can each land in their own batch)
            gate = threading.Barrier(16)

            def actor(i):
                obs = np.full((3,), float(i), np.float32)
                gate.wait(timeout=30)
                results.append((i, client(obs)))

            threads = [threading.Thread(target=actor, args=(i,)) for i in range(16)]
            for t in threads:
                t.start()
            for t in threads:
                t.join()
            assert len(results) == 16
            assert server.requests_served == 16
            # batching actually happened (fewer forwards than requests)
            assert server.batches_run < 16
            # results are per-request correct: same obs -> same output
            direct = {
                i: np.asarray(policy(params, np.full((1, 3), float(i), np.float32), key))[0]
                for i, _ in results
            }
            for i, out in results:
                np.testing.assert_allclose(np.asarray(out), direct[i], rtol=1e-5)
        finally:
            server.close()

    def test_weight_update(self, key):
        def policy(params, obs, k):
            return np.asarray(obs) * params

        server = InferenceServer(policy, 1.0, max_batch_size=4, timeout_ms=1)
        client = PolicyClient(server)
        try:
            assert float(client(np.asarray([2.0]))[0]) == 2.0
            server.update_weights(10.0)
            assert float(client(np.asarray([2.0]))[0]) == 20.0
        finally:
            server.close()

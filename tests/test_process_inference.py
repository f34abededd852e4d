"""ProcessInferenceServer: worker processes share one device policy
(VERDICT r2 item on inference-server process/shared-mem transports).

Reference: ``torchrl/modules/inference_server/_server.py:961``
(``ProcessInferenceServer``), ``_shared_memory.py:144`` (shm transport)."""
import multiprocessing as mp

import jax
import numpy as np

from rl_tpu.modules.inference_server import (
    ProcessInferenceServer,
    ProcessPolicyClient,
)
from rl_tpu.utils import cpu_worker_env


def _worker(name, client_id, n_queries, out_q):
    client = ProcessPolicyClient.attach(name, client_id)
    errs = 0
    for j in range(n_queries):
        obs = np.full((3,), float(client_id * 100 + j), np.float32)
        out = client(obs)
        if not np.allclose(out, obs * 2.0 + 1.0):
            errs += 1
    client.close()
    out_q.put((client_id, errs))


class TestProcessInferenceServer:
    def test_multiprocess_clients_share_one_policy(self):
        @jax.jit
        def policy(params, obs, k):
            return obs * params["scale"] + params["shift"]

        params = {"scale": 2.0, "shift": 1.0}
        server = ProcessInferenceServer(
            policy, params, name="t_procinf", n_clients=3,
            max_batch_size=8, timeout_ms=5,
        )
        try:
            ctx = mp.get_context("spawn")
            q = ctx.Queue()
            with cpu_worker_env():
                procs = [
                    ctx.Process(target=_worker,
                                args=("t_procinf", i, 10, q))
                    for i in range(3)
                ]
                for p in procs:
                    p.start()
            results = [q.get(timeout=120) for _ in range(3)]
            for p in procs:
                p.join(timeout=30)
            assert sorted(r[0] for r in results) == [0, 1, 2]
            assert all(r[1] == 0 for r in results), results
            assert server.requests_served == 30
        finally:
            server.close()

    def test_server_error_raises_in_client(self):
        # a server-side exception must surface as an error to the client,
        # not silently become a NaN "action" (ADVICE r3 #5)
        def policy(params, obs, k):
            raise ValueError("policy exploded")

        server = ProcessInferenceServer(
            policy, None, name="t_procinf3", n_clients=1,
            max_batch_size=4, timeout_ms=1,
        )
        try:
            client = ProcessPolicyClient.attach("t_procinf3", 0)
            import pytest

            with pytest.raises(RuntimeError, match="policy exploded"):
                client(np.asarray([1.0]))
            client.close()
        finally:
            server.close()

    def test_weight_update_visible_to_process_clients(self):
        def policy(params, obs, k):
            return np.asarray(obs) * params

        server = ProcessInferenceServer(
            policy, 3.0, name="t_procinf2", n_clients=1,
            max_batch_size=4, timeout_ms=1,
        )
        try:
            client = ProcessPolicyClient.attach("t_procinf2", 0)
            assert float(client(np.asarray([2.0]))[0]) == 6.0
            server.update_weights(5.0)
            assert float(client(np.asarray([2.0]))[0]) == 10.0
            client.close()
        finally:
            server.close()

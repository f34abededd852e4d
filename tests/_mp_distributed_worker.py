"""Worker process for test_multiprocess_distributed.py.

Each worker owns 4 virtual CPU devices; two workers form one 8-device
global mesh via ``jax.distributed``.  The worker runs sharded collection
(jit partitions the env batch over the global ``dp`` axis), all-gathers the
batch, and reports a digest through the TCP rendezvous.  Rank 0 then pushes
fresh "weights" through the shared-memory seqlock box and rank 1 reports
what it pulled — a full weight-sync round trip across real process
boundaries (the rl_tpu analogue of reference test_distributed.py:292-345).

Run: python _mp_distributed_worker.py <rank> <store_host> <store_port>
"""
import os
import sys

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=4")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rl_tpu.comm import TCPStoreRendezvous  # noqa: E402
from rl_tpu.parallel import global_batch, initialize_multiprocess  # noqa: E402


def main(rank: int, host: str, port: int) -> None:
    store = TCPStoreRendezvous(host, port, timeout=60.0)
    initialize_multiprocess(store, process_id=rank, num_processes=2)
    assert jax.process_index() == rank
    assert len(jax.devices()) == 8, jax.devices()

    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from rl_tpu.collectors import Collector
    from rl_tpu.envs import BatchedEnv, CartPoleEnv

    mesh = Mesh(np.asarray(jax.devices()), ("dp",))
    env = BatchedEnv(CartPoleEnv(), 8)
    coll = Collector(env, None, frames_per_batch=64)  # random policy

    def run(key):
        cstate = coll.init(key)
        _, batch = coll._collect(None, cstate)
        return batch

    shardings = jax.tree.map(
        lambda _: NamedSharding(mesh, P(None, "dp")),
        jax.eval_shape(run, jax.random.PRNGKey(7)),
    )
    batch = jax.jit(run, out_shardings=shardings)(jax.random.PRNGKey(7))
    gathered = global_batch(batch)  # host numpy everywhere

    digest = {
        "obs_sum": float(np.asarray(gathered["observation"], np.float64).sum()),
        "reward_sum": float(np.asarray(
            gathered["next", "reward"], np.float64).sum()),
        "dones": int(np.asarray(gathered["next", "done"]).sum()),
        "n_local_devices": len(jax.local_devices()),
    }
    store.publish(f"digest_{rank}", digest)

    # -- weight-sync round trip over shared memory -------------------------
    from rl_tpu.data import TDict
    from rl_tpu.weight_update import SharedMemWeightSyncScheme

    template = TDict(w=jnp.zeros((4, 4)), b=jnp.zeros((2,)))
    if rank == 0:
        scheme = SharedMemWeightSyncScheme.create("mp_dist_test", 18)
        store.publish("wsync_ready", True)
        new_params = TDict(w=2.5 * jnp.ones((4, 4)), b=jnp.ones((2,)))
        scheme.push(new_params)
        store.wait("pulled_1", timeout=60.0)
        scheme.close()
    else:
        store.wait("wsync_ready", timeout=60.0)
        scheme = SharedMemWeightSyncScheme.attach("mp_dist_test")
        got = scheme.pull(template=template, timeout=30.0)
        store.publish("pulled_1", {
            "w_sum": float(np.asarray(got["w"]).sum()),
            "b_sum": float(np.asarray(got["b"]).sum()),
        })
        scheme.close()

    store.publish(f"done_{rank}", True)


if __name__ == "__main__":
    main(int(sys.argv[1]), sys.argv[2], int(sys.argv[3]))

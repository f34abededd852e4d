"""Worker process for the cross-process TRAINING test.

Two of these form one 8-device global mesh and jointly run the miniature
IMPALA in ``_mp_training_common.run_training`` — gradients psum across the
process boundary every learner step.  Each rank publishes its resulting
params digest through the TCP rendezvous.

Run: python _mp_training_worker.py <rank> <store_host> <store_port>
"""
import os
import sys

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=4")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from rl_tpu.comm import TCPStoreRendezvous  # noqa: E402
from rl_tpu.parallel import initialize_multiprocess  # noqa: E402


def main(rank: int, host: str, port: int) -> None:
    store = TCPStoreRendezvous(host, port, timeout=60.0)
    initialize_multiprocess(store, process_id=rank, num_processes=2)
    assert jax.process_index() == rank
    assert len(jax.devices()) == 8, jax.devices()
    assert len(jax.local_devices()) == 4

    from _mp_training_common import params_digest, run_training

    params, losses = run_training(n_iters=6, seed=3)
    digest = params_digest(params)
    digest["losses"] = losses
    store.publish(f"train_digest_{rank}", digest)
    store.publish(f"train_done_{rank}", True)


if __name__ == "__main__":
    main(int(sys.argv[1]), sys.argv[2], int(sys.argv[3]))

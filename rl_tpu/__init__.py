"""rl_tpu — a TPU-native reinforcement-learning framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of pytorch/rl
(TorchRL): pytree-structured batches (``TDict``) instead of TensorDict,
pure-functional envs/modules/losses under ``jit``, collectors as ``lax.scan``
rollouts, sharded replay storage, and GSPMD (``jax.sharding``) scale-out in
place of process/NCCL parallelism.
"""
from rl_tpu._version import __version__
from rl_tpu.utils import timeit, set_profiling_enabled
from rl_tpu.data import TDict, Composite

__all__ = ["__version__", "timeit", "set_profiling_enabled", "TDict", "Composite"]

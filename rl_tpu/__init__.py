"""rl_tpu — a TPU-native reinforcement-learning framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of pytorch/rl
(TorchRL): pytree-structured batches (``TDict``) instead of TensorDict,
pure-functional envs/modules/losses under ``jit``, collectors as ``lax.scan``
rollouts, sharded replay storage, and GSPMD (``jax.sharding``) scale-out in
place of process/NCCL parallelism.
"""
import os as _os

if _os.environ.get("RLTPU_DEVICE"):
    # Opt-in platform pin (e.g. RLTPU_DEVICE=cpu for smoke runs): this
    # container's site hook force-registers a TPU PJRT plugin that
    # overrides JAX_PLATFORMS, so expose a config-level escape hatch.
    import jax as _jax

    _jax.config.update("jax_platforms", _os.environ["RLTPU_DEVICE"])

from rl_tpu._version import __version__
from rl_tpu.utils import timeit, set_profiling_enabled
from rl_tpu.data import TDict, Composite

__all__ = ["__version__", "timeit", "set_profiling_enabled", "TDict", "Composite"]

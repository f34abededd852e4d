"""Test configuration: force an 8-virtual-device CPU platform.

Tests never require real TPU hardware; multi-chip sharding paths are
validated on a virtual 8-device CPU mesh (the driver separately dry-runs
``__graft_entry__.dryrun_multichip``).  Env vars must be set before the first
jax import.
"""
import os

# Force CPU. The environment's sitecustomize force-registers a TPU platform
# plugin and overrides JAX_PLATFORMS, so the env var alone is not enough; the
# config update below wins as long as no backend has been initialized yet.
os.environ["JAX_PLATFORMS"] = "cpu"
# Children spawned by multiprocess tests re-run site hooks; disable this
# container's TPU PJRT auto-registration for them (each registration
# attempt blocks on the single-session tunnel grant for ~80 s).
os.environ["PALLAS_AXON_POOL_IPS"] = ""
os.environ["RLTPU_DEVICE"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture
def key():
    return jax.random.PRNGKey(0)


@pytest.fixture
def keys():
    def _make(n):
        return jax.random.split(jax.random.PRNGKey(0), n)

    return _make

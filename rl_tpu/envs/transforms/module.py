"""ModuleTransform and compatibility aliases closing out the zoo.

Counterparts: ``/root/reference/torchrl/envs/transforms/module.py:123``
(``ModuleTransform``; the Ray-service variants are gated — no ray in this
image), ``transforms.py`` (``FrameSkipTransform``, ``NoopResetEnv``,
``ObservationTransform``, ``AutoResetTransform``), ``llm/transforms``
(``DecodeVideoTransform``).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from rl_tpu.data import Composite, TDict
from .base import Transform

__all__ = ["ModuleTransform", "ObservationTransform", "AutoResetTransform",
           "FrameSkipTransform", "NoopResetTransform",
           "DecodeVideoTransform", "RayTransform", "RayModuleTransform"]


class ModuleTransform(Transform):
    """Run a TDModule over env outputs (or inputs with ``inverse=True``) —
    reference module.py:123.

    The module is functional: pass ``params`` here (or later via
    ``bind_params``).  ``no_grad`` stops gradients through the module
    output (the reference's torch.no_grad context).
    """

    def __init__(self, module, params=None, *, no_grad: bool = False,
                 inverse: bool = False, observation_spec_transform=None):
        super().__init__(list(getattr(module, "in_keys", [])),
                         list(getattr(module, "out_keys", [])))
        self.module = module
        self.params = params
        self.no_grad = no_grad
        self.inverse = inverse
        self._spec_tf = observation_spec_transform

    def bind_params(self, params):
        self.params = params
        return self

    def _run(self, td: TDict) -> TDict:
        out = self.module(self.params, td)
        if self.no_grad:
            out = jax.tree.map(
                lambda x: jax.lax.stop_gradient(x)
                if hasattr(x, "dtype") else x, out)
        return out

    def reset(self, key, tstate, td):
        if self.params is None and hasattr(self.module, "init"):
            self.params = self.module.init(key, td)
        return TDict(), (td if self.inverse else self._run(td))

    def step(self, tstate, next_td):
        return tstate, (next_td if self.inverse else self._run(next_td))

    def inv(self, tstate, td):
        return self._run(td) if self.inverse else td

    def transform_observation_spec(self, spec: Composite) -> Composite:
        if self._spec_tf is not None:
            return self._spec_tf(spec)
        return spec


class ObservationTransform(Transform):
    """Base-class alias for observation-side transforms (reference
    transforms.py ``ObservationTransform``) — keyed identity by default."""


class AutoResetTransform(Transform):
    """No-op marker for API parity: this framework's ``Env`` core already
    auto-resets inside ``step_and_maybe_reset`` under jit (reference
    ``AutoResetTransform`` retrofits that behavior onto envs that reset
    themselves; see envs/base.py)."""


def FrameSkipTransform(frame_skip: int = 4):
    """Transform-shaped constructor for frame skipping (reference
    transforms.py ``FrameSkipTransform``).  Skipping changes step arity, so
    it is implemented as the :class:`rl_tpu.envs.FrameSkipEnv` wrapper;
    this factory exists for zoo parity and raises with guidance when used
    as an in-pipeline transform."""
    raise NotImplementedError(
        "frame skipping replays the env inside one step — wrap the env: "
        "rl_tpu.envs.FrameSkipEnv(env, frame_skip=%d)" % frame_skip
    )


def NoopResetTransform(noops: int = 30):
    """See :class:`rl_tpu.envs.NoopResetEnv` (reference ``NoopResetEnv``);
    reset-time noops re-enter the env and are an env wrapper here."""
    raise NotImplementedError(
        "noop resets re-enter the env at reset — wrap the env: "
        "rl_tpu.envs.NoopResetEnv(env, noops=%d)" % noops
    )


class DecodeVideoTransform(Transform):
    """Gated: decodes video-dataset observations (reference
    llm/transforms ``DecodeVideoTransform`` uses torchcodec, absent from
    this image)."""

    def __init__(self, *a, **k):
        raise ImportError("DecodeVideoTransform needs a video decoder "
                          "(torchcodec/ffmpeg), not present in this image")


class RayTransform(Transform):
    """Gated: Ray-service-backed transforms (reference module.py) — ray is
    not available in this image; use ModuleTransform in-process."""

    def __init__(self, *a, **k):
        raise ImportError("ray is not available in this image")


class RayModuleTransform(RayTransform):
    pass

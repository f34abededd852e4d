"""KL-coefficient controllers for RLHF-style training.

Counterparts of ``/root/reference/torchrl/data/llm/utils.py``:
``KLControllerBase`` :22, ``ConstantKLController`` :35,
``AdaptiveKLController`` :70 (the Ziegler et al. 2019 proportional
controller, "Fine-Tuning Language Models from Human Preferences" §2.2).

The controlled object is anything with a mutable ``coef`` attribute —
:class:`rl_tpu.envs.llm.KLComputation` and the GRPO loss config both
qualify; ``update()`` returns the new coefficient so jitted losses can take
it as a traced argument instead (never bake an annealed coefficient into a
trace — see CLAUDE.md).
"""
from __future__ import annotations

import numpy as np

__all__ = ["ConstantKLController", "AdaptiveKLController"]


class _KLController:
    def __init__(self, *, coef: float, transform=None):
        self.coef = float(coef)
        self.transform = transform
        if transform is not None:
            transform.coef = self.coef

    def _push(self) -> float:
        if self.transform is not None:
            self.transform.coef = self.coef
        return self.coef

    def update(self, kl_values) -> float:
        raise NotImplementedError


class ConstantKLController(_KLController):
    """Fixed KL coefficient; ``update`` is a no-op that re-asserts the value
    on the attached transform (reference ``ConstantKLController``)."""

    def update(self, kl_values=None) -> float:
        return self._push()


class AdaptiveKLController(_KLController):
    """Proportional KL controller: drift the coefficient so the observed KL
    tracks ``target`` (reference ``AdaptiveKLController``; Ziegler et al.
    eq. for beta_{t+1}).

    ``update(kl_values)`` with the per-step KL observations since the last
    call: the proportional error ``clip(kl/target - 1, ±0.2)`` is scaled by
    ``n_steps / horizon`` and applied multiplicatively.  Observed KL above
    target → coefficient grows (pull back to the reference model); below →
    decays (let the policy move).
    """

    def __init__(self, *, init_coef: float, target: float, horizon: int,
                 transform=None):
        super().__init__(coef=init_coef, transform=transform)
        if target <= 0 or horizon <= 0:
            raise ValueError("target and horizon must be positive")
        self.target = float(target)
        self.horizon = int(horizon)

    def update(self, kl_values) -> float:
        """*kl_values* are RAW per-sample KL observations (non-negative in
        expectation).  Deviation from the reference (ADVICE r4): the
        reference's update expects KL-PENALTY rewards and renormalizes via
        ``-mean/coef``; feeding those negative penalty values here would
        adapt the coefficient in the wrong direction — hence the warning.
        """
        kl_values = np.asarray(kl_values, np.float64).reshape(-1)
        if kl_values.size == 0:
            raise ValueError("kl_values must be non-empty")
        kl = float(kl_values.mean())
        if kl < 0:
            import warnings

            warnings.warn(
                "AdaptiveKLController.update received a negative mean KL "
                f"({kl:.4g}). This controller expects RAW KL observations, "
                "not KL-penalty rewards (the reference's contract); passing "
                "penalties adapts the coefficient in the wrong direction.",
                stacklevel=2)
        error = float(np.clip(kl / self.target - 1.0, -0.2, 0.2))
        self.coef *= 1.0 + error * kl_values.size / self.horizon
        return self._push()

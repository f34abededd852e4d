"""Policy-rollout rendering (the ``rlrender`` CLI).

Counterpart of ``/root/reference/torchrl/render/`` (4,184 LoC ``rlrender``
CLI: load checkpoint → rollout policy → write video/arrays).  Usage::

    python -m rl_tpu.render --checkpoint CKPT --env rl_tpu.envs.BreakoutEnv \
        --steps 500 --out rollout.npz
"""
from .cli import main, render_checkpoint

__all__ = ["main", "render_checkpoint"]

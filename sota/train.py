"""Declarative trainer entrypoint — the ``*_trainer`` sota variants.

Counterpart of the reference's hydra-driven trainer scripts
(``/root/reference/sota-implementations/ppo_trainer/train.py`` etc. and the
~230-dataclass config library, torchrl/trainers/algorithms/configs/): a
YAML file fully specifies the env + module + trainer graph via nested
``_target_`` mappings; dotted CLI overrides mirror hydra's.  Run::

    python sota/train.py sota/configs/ppo_trainer.yaml [trainer.total_frames=100000]
"""
import os
import sys

from rl_tpu.config import apply_overrides, instantiate, load_yaml

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main(path: str, overrides=()):
    cfg = apply_overrides(load_yaml(path), list(overrides))
    trainer = instantiate(cfg["trainer"])
    params = trainer.train()
    print(f"training complete: {path}")
    return params


if __name__ == "__main__":
    if len(sys.argv) < 2:
        sys.exit("usage: python sota/train.py <config.yaml> [a.b=c ...]")
    main(sys.argv[1], sys.argv[2:])

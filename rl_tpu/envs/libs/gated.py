"""Gated env-library wrappers for packages absent from this image.

API-parity markers for the reference's lib zoo
(``/root/reference/torchrl/envs/libs/``): constructing one raises
ImportError naming the missing package and the closest local alternative.
Available for real: ``GymEnv`` (gymnasium incl. MuJoCo), ``DMControlEnv``,
``PettingZooWrapper``; native envs cover classic control, MinAtar pixels,
multi-agent navigation, and board games.
"""
from __future__ import annotations

__all__ = ["BraxWrapper", "JumanjiWrapper", "VmasWrapper", "SMACv2Wrapper",
           "MeltingpotWrapper", "OpenSpielWrapper", "IsaacGymWrapper",
           "IsaacLabWrapper", "UnityMLAgentsWrapper", "HabitatWrapper",
           "RoboHiveWrapper", "EnvPoolWrapper", "ProcgenWrapper",
           "SafetyGymnasiumWrapper", "LiberoWrapper", "GenesisWrapper", "MLGymWrapper"]


class _GatedLib:
    _dep = ""
    _alt = "a native env or GymEnv"

    def __init__(self, *a, **k):
        raise ImportError(
            f"{type(self).__name__} needs {self._dep!r}, which is not in "
            f"this image; closest local alternative: {self._alt}")


def _gated(name: str, dep: str, alt: str, ref: str) -> type:
    return type(name, (_GatedLib,), {
        "_dep": dep, "_alt": alt,
        "__doc__": f"Gated: reference libs/{ref}.",
    })


BraxWrapper = _gated("BraxWrapper", "brax",
                     "native envs (pure-JAX already)", "brax.py")
JumanjiWrapper = _gated("JumanjiWrapper", "jumanji",
                        "native envs (pure-JAX already)", "jumanji.py")
VmasWrapper = _gated("VmasWrapper", "vmas",
                     "MultiAgentNavEnv (native MARL)", "vmas.py")
SMACv2Wrapper = _gated("SMACv2Wrapper", "smacv2",
                       "MultiAgentNavEnv", "smacv2.py")
MeltingpotWrapper = _gated("MeltingpotWrapper", "meltingpot",
                           "PettingZooWrapper", "meltingpot.py")
OpenSpielWrapper = _gated("OpenSpielWrapper", "open_spiel",
                          "TicTacToeEnv/ChessEnv (native)", "openspiel.py")
IsaacGymWrapper = _gated("IsaacGymWrapper", "isaacgym",
                         "GymEnv over MuJoCo", "isaacgym.py")
IsaacLabWrapper = _gated("IsaacLabWrapper", "isaaclab",
                         "GymEnv over MuJoCo", "isaac_lab.py")
UnityMLAgentsWrapper = _gated("UnityMLAgentsWrapper", "mlagents_envs",
                              "GymEnv", "unity_mlagents.py")
HabitatWrapper = _gated("HabitatWrapper", "habitat", "GymEnv", "habitat.py")
RoboHiveWrapper = _gated("RoboHiveWrapper", "robohive",
                         "GymEnv over MuJoCo", "robohive.py")
EnvPoolWrapper = _gated("EnvPoolWrapper", "envpool",
                        "BatchedEnv over native envs", "envpool.py")
ProcgenWrapper = _gated("ProcgenWrapper", "procgen",
                        "MinAtar-style native pixel envs", "procgen.py")
SafetyGymnasiumWrapper = _gated("SafetyGymnasiumWrapper",
                                "safety_gymnasium", "GymEnv",
                                "safety_gymnasium.py")
LiberoWrapper = _gated("LiberoWrapper", "libero", "ToyVLAEnv", "libero.py")
GenesisWrapper = _gated("GenesisWrapper", "genesis", "GymEnv", "genesis.py")
MLGymWrapper = _gated("MLGymWrapper", "mlgym",
                      "ChatEnv + ToolTransform/PythonInterpreterTransform",
                      "../llm/libs/mlgym.py")

"""Multi-agent grouping utilities.

Counterpart of the reference ``MarlGroupMapType`` / ``check_marl_grouping``
(``/root/reference/torchrl/envs/utils.py:1026``): a *group map* maps a group
name to the list of agent names it contains.  Grouped agents have their
tensors stacked along an agent axis under the group key (e.g.
``("agents", "observation")`` with shape ``[..., n_agents, D]``) so one
network vmaps across them; heterogeneous agents go into separate groups.
"""
from __future__ import annotations

from enum import Enum
from typing import Dict, List, Sequence

__all__ = ["MarlGroupMapType", "check_marl_grouping"]


class MarlGroupMapType(Enum):
    """Premade grouping strategies (reference envs/utils.py:1026).

    - ``ALL_IN_ONE_GROUP``: every agent stacked in one ``"agents"`` group.
    - ``ONE_GROUP_PER_AGENT``: each agent is its own group, named after it.
    """

    ALL_IN_ONE_GROUP = 1
    ONE_GROUP_PER_AGENT = 2

    def get_group_map(self, agent_names: Sequence[str]) -> Dict[str, List[str]]:
        if self is MarlGroupMapType.ALL_IN_ONE_GROUP:
            return {"agents": list(agent_names)}
        return {name: [name] for name in agent_names}


def check_marl_grouping(group_map: Dict[str, List[str]],
                        agent_names: Sequence[str]) -> None:
    """Validate a group map against the agent list (reference utils.py:1100+):
    every agent appears in exactly one non-empty group, no unknown agents,
    no group named like an agent it doesn't contain alone."""
    if not group_map:
        raise ValueError("No groups in group map")
    seen: Dict[str, str] = {}
    for group, agents in group_map.items():
        if not agents:
            raise ValueError(f"Group {group!r} is empty")
        for agent in agents:
            if agent not in agent_names:
                raise ValueError(f"Agent {agent!r} not in agent list")
            if agent in seen:
                raise ValueError(
                    f"Agent {agent!r} in both {seen[agent]!r} and {group!r}")
            seen[agent] = group
    missing = [a for a in agent_names if a not in seen]
    if missing:
        raise ValueError(f"Agents {missing} not found in any group")

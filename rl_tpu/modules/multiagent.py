"""Multi-agent network blocks.

Counterparts of ``/root/reference/torchrl/modules/models/multiagent.py``:
``MultiAgentNetBase`` :21 (vmap-over-agents with optional parameter
sharing), ``MultiAgentMLP`` :292, ``MultiAgentConvNet`` :486, ``VDNMixer``
:879, ``QMixer`` :952.

Key layout follows the reference's MARL convention: per-agent tensors live
under ``("agents", ...)`` with an agent axis directly before the feature
dims, e.g. ``("agents", "observation")`` [..., n_agents, D].
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from rl_tpu.data import TDict
from .models import MLP, ConvNet

__all__ = ["MultiAgentMLP", "MultiAgentConvNet", "VDNMixer", "QMixer",
           "MultiAgentPolicyNet", "CentralizedCritic", "IndependentCritic",
           "CrossCriticGroupSpec", "CrossGroupCritic"]


class _MultiAgentNetBase:
    """vmap-over-agents wrapper (reference multiagent.py:21).

    ``share_params=True``: one parameter set applied to every agent.
    ``share_params=False``: stacked per-agent params, vmapped jointly.
    ``centralized=True``: each agent's input is the concatenation of all
    agents' inputs.
    """

    def __init__(self, n_agents: int, *, share_params: bool = True,
                 centralized: bool = False):
        self.n_agents = int(n_agents)
        self.share_params = share_params
        self.centralized = centralized

    def _build_net(self) -> nn.Module:
        raise NotImplementedError

    def _prep_input(self, x: jax.Array) -> jax.Array:
        """x: [..., n_agents, D] -> per-agent input."""
        if self.centralized:
            flat = x.reshape(x.shape[:-2] + (1, x.shape[-2] * x.shape[-1]))
            return jnp.broadcast_to(
                flat, x.shape[:-2] + (self.n_agents, flat.shape[-1])
            )
        return x

    def init(self, key, x: jax.Array):
        net = self._build_net()
        xin = self._prep_input(jnp.asarray(x))
        per_agent = xin[..., 0, :]
        if self.share_params:
            return net.init(key, per_agent)["params"]
        ks = jax.random.split(key, self.n_agents)
        params = [net.init(k, per_agent)["params"] for k in ks]
        return jax.tree.map(lambda *xs: jnp.stack(xs), *params)

    def apply(self, params, x: jax.Array) -> jax.Array:
        net = self._build_net()
        xin = self._prep_input(jnp.asarray(x))
        xa = jnp.moveaxis(xin, -2, 0)  # [n_agents, ..., D]
        if isinstance(params, TDict):
            params = params.to_dict()
        if self.share_params:
            out = jax.vmap(lambda xi: net.apply({"params": params}, xi))(xa)
        else:
            out = jax.vmap(lambda p, xi: net.apply({"params": p}, xi))(params, xa)
        return jnp.moveaxis(out, 0, -2)

    __call__ = apply


class MultiAgentMLP(_MultiAgentNetBase):
    """Reference multiagent.py:292."""

    def __init__(self, n_agents: int, out_features: int,
                 num_cells: Sequence[int] = (64, 64), activation="tanh",
                 **base_kwargs):
        super().__init__(n_agents, **base_kwargs)
        self.out_features = out_features
        self.num_cells = tuple(num_cells)
        self.activation = activation

    def _build_net(self) -> nn.Module:
        return MLP(out_features=self.out_features, num_cells=self.num_cells,
                   activation=self.activation)


class MultiAgentConvNet(_MultiAgentNetBase):
    """Reference multiagent.py:486; inputs [..., n_agents, H, W, C]."""

    def __init__(self, n_agents: int, channels=(16, 32), kernel_sizes=(3, 3),
                 strides=(1, 1), **base_kwargs):
        super().__init__(n_agents, **base_kwargs)
        self.channels = channels
        self.kernel_sizes = kernel_sizes
        self.strides = strides

    def _build_net(self) -> nn.Module:
        return ConvNet(channels=self.channels, kernel_sizes=self.kernel_sizes,
                       strides=self.strides)

    def _prep_input(self, x):
        if self.centralized:
            # stack all agents' images along channels
            moved = jnp.moveaxis(x, -4, -1)  # agents -> trailing
            flat = moved.reshape(moved.shape[:-2] + (-1,))
            return jnp.broadcast_to(
                flat[..., None, :, :, :][..., 0, :, :, :][..., None, :, :, :],
                x.shape[:-4] + (self.n_agents,) + flat.shape[-3:],
            )
        return x

    def apply(self, params, x):
        net = self._build_net()
        xa = jnp.moveaxis(jnp.asarray(x), -4, 0)
        if isinstance(params, TDict):
            params = params.to_dict()
        if self.share_params:
            out = jax.vmap(lambda xi: net.apply({"params": params}, xi))(xa)
        else:
            out = jax.vmap(lambda p, xi: net.apply({"params": p}, xi))(params, xa)
        return jnp.moveaxis(out, 0, -2)

    __call__ = apply


class VDNMixer:
    """Value decomposition: global Q = Σ_agents Q_i (reference :879)."""

    n_params = 0

    def init(self, key, chosen_q, state=None):
        return TDict()

    def __call__(self, params, chosen_q: jax.Array, state=None) -> jax.Array:
        """chosen_q: [..., n_agents, 1] -> [..., 1]."""
        return jnp.sum(jnp.asarray(chosen_q).squeeze(-1), axis=-1, keepdims=True)


class _QMixerNet(nn.Module):
    """Monotonic mixing net with state-conditioned hypernetworks
    (Rashid et al. 2018)."""

    n_agents: int
    embed_dim: int = 32
    hypernet_cells: int = 64

    @nn.compact
    def __call__(self, chosen_q, state):
        # chosen_q: [..., n_agents]; state: [..., S]
        w1 = jnp.abs(
            nn.Dense(self.n_agents * self.embed_dim)(state)
        ).reshape(state.shape[:-1] + (self.n_agents, self.embed_dim))
        b1 = nn.Dense(self.embed_dim)(state)
        hidden = nn.elu(
            jnp.einsum("...a,...ae->...e", chosen_q, w1) + b1
        )
        w2 = jnp.abs(
            nn.Sequential([nn.Dense(self.hypernet_cells), nn.relu,
                           nn.Dense(self.embed_dim)])(state)
        )
        b2 = nn.Sequential([nn.Dense(self.hypernet_cells), nn.relu,
                            nn.Dense(1)])(state)
        return jnp.sum(hidden * w2, axis=-1, keepdims=True) + b2


class QMixer:
    """Monotonic mixer (reference :952)."""

    def __init__(self, n_agents: int, state_dim: int, embed_dim: int = 32):
        self.n_agents = n_agents
        self.state_dim = state_dim
        self.net = _QMixerNet(n_agents=n_agents, embed_dim=embed_dim)

    def init(self, key, chosen_q, state):
        q = jnp.asarray(chosen_q).squeeze(-1)
        return self.net.init(key, q, jnp.asarray(state))["params"]

    def __call__(self, params, chosen_q: jax.Array, state: jax.Array) -> jax.Array:
        if isinstance(params, TDict):
            params = params.to_dict()
        q = jnp.asarray(chosen_q).squeeze(-1)
        return self.net.apply({"params": params}, q, jnp.asarray(state))


# ---------------------------------------------------------------------------
# Cross-group centralised critic
# (reference /root/reference/torchrl/modules/models/cross_group_critic.py:
#  CrossCriticGroupSpec :26, _CrossGroupNet :44, CrossGroupCritic :134)
# ---------------------------------------------------------------------------

import dataclasses

from rl_tpu.modules.td_module import TDModule


@dataclasses.dataclass
class CrossCriticGroupSpec:
    """One agent group for :class:`CrossGroupCritic`: observation dim, agent
    count and the TDict keys to read/write (reference :26)."""

    obs_dim: int
    n_agents: int
    obs_key: Any = None
    value_key: Any = None

    def __post_init__(self):
        if self.obs_key is None or self.value_key is None:
            raise ValueError("obs_key and value_key are required")


class _CrossGroupNet(nn.Module):
    """Per-group encoders -> shared trunk over the joint team state ->
    per-group (or shared) value heads (reference :44)."""

    group_names: tuple
    group_n_agents: tuple
    d_model: int = 64
    trunk_depth: int = 2
    trunk_cells: int = 256
    share_params: bool = False
    detach_groups: tuple = ()

    @nn.compact
    def __call__(self, *group_obs):
        encoded = []
        for obs, name in zip(group_obs, self.group_names):
            enc = nn.Dense(self.d_model, name=f"enc_{name}")(
                jnp.asarray(obs, jnp.float32))
            enc = nn.tanh(enc)
            if name in self.detach_groups:
                enc = jax.lax.stop_gradient(enc)
            encoded.append(enc)  # [*B, n_agents_g, d_model]
        joint = jnp.concatenate(encoded, axis=-2)  # [*B, n_total, d_model]
        n_total = sum(self.group_n_agents)
        x = joint.reshape(joint.shape[:-2] + (n_total * self.d_model,))
        for i in range(self.trunk_depth):
            x = nn.tanh(nn.Dense(self.trunk_cells, name=f"trunk_{i}")(x))
        x = nn.Dense(n_total * self.d_model, name="trunk_out")(x)
        x = x.reshape(x.shape[:-1] + (n_total, self.d_model))
        outs, start = [], 0
        shared = nn.Dense(1, name="head") if self.share_params else None
        for name, n in zip(self.group_names, self.group_n_agents):
            g = x[..., start:start + n, :]
            head = shared if shared is not None else nn.Dense(
                1, name=f"head_{name}")
            outs.append(head(g))
            start += n
        return tuple(outs)


class CrossGroupCritic(TDModule):
    """Centralised critic over multiple (possibly heterogeneous) agent
    groups (reference cross_group_critic.py:134).

    Reads each group's observations, encodes them to a shared embedding,
    runs a joint trunk over the full team state, and writes a per-group
    value estimate.  ``detach_groups`` lets fixed-policy groups inform the
    baseline without receiving gradients.  Plugs into MAPPO/IPPO losses
    unchanged (it is a plain TDModule).
    """

    def __init__(self, group_map, *, d_model: int = 64, trunk_depth: int = 2,
                 trunk_cells: int = 256, share_params: bool = False,
                 detach_groups=None):
        if not group_map:
            raise ValueError("group_map must not be empty")
        self.group_specs = dict(group_map)
        names = tuple(self.group_specs)
        net = _CrossGroupNet(
            group_names=names,
            group_n_agents=tuple(s.n_agents for s in self.group_specs.values()),
            d_model=d_model, trunk_depth=trunk_depth, trunk_cells=trunk_cells,
            share_params=share_params,
            detach_groups=tuple(detach_groups or ()),
        )
        super().__init__(
            net,
            in_keys=[s.obs_key for s in self.group_specs.values()],
            out_keys=[s.value_key for s in self.group_specs.values()],
        )


class MultiAgentPolicyNet:
    """Per-agent policy-head adapter: ``("agents","observation") → logits``
    (the sota multiagent scripts' actor net, promoted so declarative YAML
    configs can reference it; reference multiagent sota utils)."""

    in_keys = [("agents", "observation")]
    out_keys = ["logits"]

    def __init__(self, n_agents: int, out_features: int,
                 num_cells=(128, 128), share_params: bool = True):
        self.net = MultiAgentMLP(n_agents, out_features=out_features,
                                 num_cells=tuple(num_cells),
                                 share_params=share_params)

    def init(self, key, td):
        return self.net.init(key, jnp.asarray(td["agents", "observation"]))

    def __call__(self, params, td, key=None):
        return td.set(
            "logits", self.net(params, jnp.asarray(td["agents", "observation"])))


class CentralizedCritic:
    """MAPPO critic: one value from the concatenated team observation."""

    in_keys = [("agents", "observation")]
    out_keys = ["state_value"]

    def __init__(self, n_agents: int, num_cells=(256, 256)):
        self.net = MultiAgentMLP(1, out_features=1, share_params=True,
                                 num_cells=tuple(num_cells))

    def _flat(self, td):
        obs = jnp.asarray(td["agents", "observation"])
        return obs.reshape(obs.shape[:-2] + (1, -1))

    def init(self, key, td):
        return self.net.init(key, self._flat(td))

    def __call__(self, params, td, key=None):
        return td.set("state_value",
                      self.net(params, self._flat(td)).squeeze(-2))


class IndependentCritic:
    """IPPO critic: per-agent values, mean-pooled to one baseline (shared
    team reward)."""

    in_keys = [("agents", "observation")]
    out_keys = ["state_value"]

    def __init__(self, n_agents: int, num_cells=(128, 128)):
        self.net = MultiAgentMLP(n_agents, out_features=1,
                                 share_params=False,
                                 num_cells=tuple(num_cells))

    def init(self, key, td):
        return self.net.init(key, jnp.asarray(td["agents", "observation"]))

    def __call__(self, params, td, key=None):
        v = self.net(params, jnp.asarray(td["agents", "observation"]))
        return td.set("state_value", v.mean(-2))

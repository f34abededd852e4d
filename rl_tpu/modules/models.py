"""Generic network blocks (flax.linen).

Counterparts of the reference model zoo
(``/root/reference/torchrl/modules/models/models.py``): ``MLP`` :29,
``ConvNet`` :305, ``DuelingMlpDQNet`` :819, ``DuelingCnnDQNet`` :936,
``NoisyLinear`` exploration.py:29, ``BatchRenorm1d`` batchrenorm.py:11.
TPU notes: convs are NHWC (XLA-native layout); compute defaults to float32
with an optional bfloat16 compute dtype for MXU-friendly matmuls.
"""
from __future__ import annotations

from typing import Any, Callable, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

__all__ = [
    "MLP",
    "ConvNet",
    "DuelingMlpDQNet",
    "DuelingCnnDQNet",
    "NoisyLinear",
    "BatchRenorm",
    "fan_in_uniform",
    "AddStateIndependentNormalScale",
    "ConvActorCritic",
]

ActivationFn = Callable[[jax.Array], jax.Array]


def fan_in_uniform(key, shape, dtype=jnp.float32):
    """Torch-default layer init: ``U(-1/sqrt(fan_in), 1/sqrt(fan_in))``
    (kaiming_uniform(a=sqrt(5)) — what every reference net trains under,
    torch.nn.Linear/Conv2d reset_parameters).

    This is NOT cosmetic: it has ~1.7x smaller std than flax's default
    lecun_normal, and value-based learners are sensitive to the initial
    Q-scale — DQN CartPole plateaus at ~250 under lecun_normal and solves
    (500) under this init, everything else equal (round-3 bisect).
    Works for Dense ([in, out]) and Conv ([kh, kw, in, out]) kernels.
    """
    import numpy as _np

    fan_in = max(int(_np.prod(shape[:-1])), 1)
    bound = 1.0 / _np.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def _fan_in_bias(fan_in: int):
    import numpy as _np

    bound = 1.0 / _np.sqrt(max(int(fan_in), 1))

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def _resolve_activation(act) -> ActivationFn:
    if callable(act):
        return act
    return {
        "relu": nn.relu,
        "tanh": jnp.tanh,
        "elu": nn.elu,
        "gelu": nn.gelu,
        "silu": nn.silu,
        "leaky_relu": nn.leaky_relu,
    }[act]


class MLP(nn.Module):
    """Fully-connected stack (reference models.py:29).

    ``num_cells`` lists hidden widths; ``out_features`` is the final width.
    ``activate_last_layer`` mirrors the reference flag.
    """

    out_features: int
    num_cells: Sequence[int] = (32, 32)
    activation: Any = "tanh"
    activate_last_layer: bool = False
    layer_norm: bool = False
    dtype: Any = jnp.float32
    kernel_init: Any = None   # None -> torch-default fan_in_uniform;
    # pass e.g. nn.initializers.orthogonal(1.0) for the reference's PPO
    # recipe (utils_mujoco.py orthogonal init, zero bias)

    @nn.compact
    def __call__(self, *inputs) -> jax.Array:
        x = jnp.concatenate([jnp.asarray(i, self.dtype) for i in inputs], axis=-1) \
            if len(inputs) > 1 else jnp.asarray(inputs[0], self.dtype)
        act = _resolve_activation(self.activation)
        kinit = self.kernel_init
        for width in self.num_cells:
            x = nn.Dense(width, dtype=self.dtype,
                         kernel_init=kinit or fan_in_uniform,
                         bias_init=(nn.initializers.zeros if kinit is not None
                                    else _fan_in_bias(x.shape[-1])))(x)
            if self.layer_norm:
                x = nn.LayerNorm(dtype=self.dtype)(x)
            x = act(x)
        x = nn.Dense(self.out_features, dtype=self.dtype,
                     kernel_init=kinit or fan_in_uniform,
                     bias_init=(nn.initializers.zeros if kinit is not None
                                else _fan_in_bias(x.shape[-1])))(x)
        if self.activate_last_layer:
            x = act(x)
        return x


class ConvNet(nn.Module):
    """Conv stack + flatten (reference models.py:305). NHWC.

    Defaults mirror the reference's Atari-style config
    (channels 32/64/64, kernels 8/4/3, strides 4/2/1).
    """

    channels: Sequence[int] = (32, 64, 64)
    kernel_sizes: Sequence[int] = (8, 4, 3)
    strides: Sequence[int] = (4, 2, 1)
    activation: Any = "relu"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        act = _resolve_activation(self.activation)
        x = jnp.asarray(x, self.dtype)
        lead = x.shape[:-3]
        x = x.reshape((-1,) + x.shape[-3:])  # [N, H, W, C]
        for ch, k, s in zip(self.channels, self.kernel_sizes, self.strides):
            x = nn.Conv(ch, (k, k), strides=(s, s), padding="VALID",
                        dtype=self.dtype, kernel_init=fan_in_uniform,
                        bias_init=_fan_in_bias(k * k * x.shape[-1]))(x)
            x = act(x)
        x = x.reshape(lead + (-1,))
        return x


class ConvActorCritic(nn.Module):
    """Shared conv trunk + (logits, value) heads — the reference's Atari
    PPO architecture (sota ppo/utils_atari.py ``common_module`` feeding
    both heads).  Sharing the trunk halves the conv FLOPs of the update
    phase; on v5e the 84x84 PPO pipeline runs 1.33x faster than split
    actor/critic stacks (bench.py pixel84).  Returns
    ``(logits [*, n_actions], value [*, 1])`` in float32.
    """

    n_actions: int
    channels: Sequence[int] = (32, 64, 64)
    kernel_sizes: Sequence[int] = (8, 4, 3)
    strides: Sequence[int] = (4, 2, 1)
    head_cells: int = 512
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, px: jax.Array):
        h = ConvNet(channels=self.channels, kernel_sizes=self.kernel_sizes,
                    strides=self.strides, dtype=self.dtype)(px)
        h = nn.relu(nn.Dense(self.head_cells, dtype=self.dtype,
                             kernel_init=fan_in_uniform,
                             bias_init=_fan_in_bias(h.shape[-1]))(h))
        logits = nn.Dense(self.n_actions, dtype=self.dtype,
                          kernel_init=fan_in_uniform,
                          bias_init=_fan_in_bias(h.shape[-1]))(h)
        value = nn.Dense(1, dtype=self.dtype, kernel_init=fan_in_uniform,
                         bias_init=_fan_in_bias(h.shape[-1]))(h)
        return logits.astype(jnp.float32), value.astype(jnp.float32)


class AddStateIndependentNormalScale(nn.Module):
    """State-independent learned Gaussian scale (the Schulman-17 PPO
    parameterization; reference tensordict ``AddStateIndependentNormalScale``
    as used by sota ppo/utils_mujoco.py:316): the network predicts only
    ``loc``; ``scale`` is one learned parameter vector, mapped positive.
    ``__call__(loc) -> (loc, scale)`` — pair with
    ``TDModule(..., out_keys=["loc", "scale"])``.
    """

    scale_shape: int
    scale_mapping: str = "biased_softplus_1.0"
    scale_lb: float = 1e-4

    @nn.compact
    def __call__(self, loc: jax.Array):
        raw = self.param("state_independent_scale", nn.initializers.zeros,
                         (self.scale_shape,))
        if self.scale_mapping.startswith("biased_softplus_"):
            bias = float(self.scale_mapping.split("_")[-1])
            inv = jnp.log(jnp.expm1(bias))
            scale = jax.nn.softplus(raw + inv)
        elif self.scale_mapping == "exp":
            scale = jnp.exp(raw)
        else:
            raise ValueError(f"unknown scale_mapping {self.scale_mapping}")
        scale = jnp.maximum(scale, self.scale_lb)
        return loc, jnp.broadcast_to(scale, loc.shape)


class DuelingMlpDQNet(nn.Module):
    """Dueling value/advantage MLP head (reference models.py:819)."""

    out_features: int
    num_cells: Sequence[int] = (512,)
    features: Sequence[int] = (128, 128)
    activation: Any = "relu"

    @nn.compact
    def __call__(self, x) -> jax.Array:
        feat = MLP(
            out_features=self.features[-1],
            num_cells=self.features[:-1],
            activation=self.activation,
            activate_last_layer=True,
        )(x)
        adv = MLP(self.out_features, self.num_cells, self.activation)(feat)
        val = MLP(1, self.num_cells, self.activation)(feat)
        return val + adv - adv.mean(axis=-1, keepdims=True)


class DuelingCnnDQNet(nn.Module):
    """Dueling DQN conv trunk + dueling heads (reference models.py:936)."""

    out_features: int
    num_cells: Sequence[int] = (512,)
    channels: Sequence[int] = (32, 64, 64)
    kernel_sizes: Sequence[int] = (8, 4, 3)
    strides: Sequence[int] = (4, 2, 1)

    @nn.compact
    def __call__(self, x) -> jax.Array:
        feat = ConvNet(self.channels, self.kernel_sizes, self.strides)(x)
        adv = MLP(self.out_features, self.num_cells, "relu")(feat)
        val = MLP(1, self.num_cells, "relu")(feat)
        return val + adv - adv.mean(axis=-1, keepdims=True)


class NoisyLinear(nn.Module):
    """Factorized-noise linear layer (Fortunato et al. 2018; reference
    exploration.py:29).  Noise is resampled from an explicit rng each call
    in ``noisy=True`` mode (pass ``rngs={'noise': key}`` to apply)."""

    features: int
    sigma_init: float = 0.1

    @nn.compact
    def __call__(self, x, noisy: bool = True) -> jax.Array:
        in_f = x.shape[-1]
        bound = 1.0 / jnp.sqrt(in_f)
        w_mu = self.param("w_mu", nn.initializers.uniform(2 * bound), (in_f, self.features))
        b_mu = self.param("b_mu", nn.initializers.uniform(2 * bound), (self.features,))
        w_sig = self.param(
            "w_sigma",
            lambda k, s: jnp.full(s, self.sigma_init / jnp.sqrt(in_f)),
            (in_f, self.features),
        )
        b_sig = self.param(
            "b_sigma",
            lambda k, s: jnp.full(s, self.sigma_init / jnp.sqrt(in_f)),
            (self.features,),
        )
        if noisy and self.has_rng("noise"):
            key = self.make_rng("noise")
            k1, k2 = jax.random.split(key)

            def f(e):
                return jnp.sign(e) * jnp.sqrt(jnp.abs(e))

            eps_in = f(jax.random.normal(k1, (in_f,)))
            eps_out = f(jax.random.normal(k2, (self.features,)))
            w = w_mu + w_sig * jnp.outer(eps_in, eps_out)
            b = b_mu + b_sig * eps_out
        else:
            w, b = w_mu, b_mu
        return x @ w + b


class BatchRenorm(nn.Module):
    """Batch renormalization (Ioffe 2017; reference batchrenorm.py:11) —
    used by CrossQ.  ``use_running_average=True`` for eval."""

    momentum: float = 0.99
    eps: float = 1e-5
    r_max: float = 3.0
    d_max: float = 5.0
    warmup_steps: int = 10000

    @nn.compact
    def __call__(self, x, use_running_average: bool = False) -> jax.Array:
        feat = x.shape[-1]
        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros(feat))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones(feat))
        steps = self.variable("batch_stats", "steps", lambda: jnp.zeros((), jnp.int32))
        gamma = self.param("scale", nn.initializers.ones, (feat,))
        beta = self.param("bias", nn.initializers.zeros, (feat,))

        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
            out = (x - mean) / jnp.sqrt(var + self.eps)
        else:
            axes = tuple(range(x.ndim - 1))
            b_mean = jnp.mean(x, axis=axes)
            b_var = jnp.var(x, axis=axes)
            warmed = (steps.value > self.warmup_steps).astype(jnp.float32)
            r = jnp.clip(
                jnp.sqrt((b_var + self.eps) / (ra_var.value + self.eps)),
                1 / self.r_max,
                self.r_max,
            )
            d = jnp.clip(
                (b_mean - ra_mean.value) / jnp.sqrt(ra_var.value + self.eps),
                -self.d_max,
                self.d_max,
            )
            r = warmed * jax.lax.stop_gradient(r) + (1 - warmed) * 1.0
            d = warmed * jax.lax.stop_gradient(d) + (1 - warmed) * 0.0
            out = ((x - b_mean) / jnp.sqrt(b_var + self.eps)) * r + d
            ra_mean.value = self.momentum * ra_mean.value + (1 - self.momentum) * b_mean
            ra_var.value = self.momentum * ra_var.value + (1 - self.momentum) * b_var
            steps.value = steps.value + 1
        return out * gamma + beta


class Conv3dNet(nn.Module):
    """3-D conv stack + flatten (reference models.py:572). NDHWC layout —
    the TPU-native channel-last counterpart of the reference's NCDHW."""

    channels: Sequence[int] = (32, 64, 64)
    kernel_sizes: Sequence[int] = (3, 3, 3)
    strides: Sequence[int] = (2, 2, 1)
    activation: Any = "relu"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        act = _resolve_activation(self.activation)
        x = jnp.asarray(x, self.dtype)
        lead = x.shape[:-4]
        x = x.reshape((-1,) + x.shape[-4:])  # [N, D, H, W, C]
        for ch, k, s in zip(self.channels, self.kernel_sizes, self.strides):
            x = nn.Conv(ch, (k, k, k), strides=(s, s, s), padding="VALID",
                        dtype=self.dtype)(x)
            x = act(x)
        return x.reshape(lead + (-1,))


# ---------------------------------------------------------------------------
# DDPG nets (reference models.py:1081-1401). The DDPG paper's specific
# architecture: actions join the Q-net at the first hidden layer, conv
# features are shared verbatim between pixel actor and critic.
# ---------------------------------------------------------------------------


class DdpgMlpActor(nn.Module):
    """DDPG actor MLP (reference ``DdpgMlpActor`` models.py:1081)."""

    action_dim: int
    num_cells: Sequence[int] = (400, 300)
    activation: Any = "relu"

    @nn.compact
    def __call__(self, obs) -> jax.Array:
        act = _resolve_activation(self.activation)
        x = jnp.asarray(obs, jnp.float32)
        for w in self.num_cells:
            x = act(nn.Dense(w)(x))
        return nn.Dense(self.action_dim)(x)


class DdpgMlpQNet(nn.Module):
    """DDPG critic MLP (reference ``DdpgMlpQNet``): obs through the first
    layer alone, action concatenated afterwards (the original architecture).
    """

    num_cells: Sequence[int] = (400, 300)
    activation: Any = "relu"

    @nn.compact
    def __call__(self, obs, action) -> jax.Array:
        act = _resolve_activation(self.activation)
        x = act(nn.Dense(self.num_cells[0])(jnp.asarray(obs, jnp.float32)))
        x = jnp.concatenate([x, jnp.asarray(action, jnp.float32)], -1)
        for w in self.num_cells[1:]:
            x = act(nn.Dense(w)(x))
        return nn.Dense(1)(x)


class DdpgCnnActor(nn.Module):
    """DDPG pixel actor (reference ``DdpgCnnActor`` models.py:1204):
    ConvNet trunk + MLP head. NHWC."""

    action_dim: int
    num_cells: Sequence[int] = (200, 200)
    activation: Any = "relu"

    @nn.compact
    def __call__(self, pixels) -> jax.Array:
        feat = ConvNet(activation=self.activation)(pixels)
        return DdpgMlpActor(
            action_dim=self.action_dim, num_cells=self.num_cells,
            activation=self.activation,
        )(feat)


class DdpgCnnQNet(nn.Module):
    """DDPG pixel critic (reference ``DdpgCnnQNet`` models.py:1301)."""

    num_cells: Sequence[int] = (200, 200)
    activation: Any = "relu"

    @nn.compact
    def __call__(self, pixels, action) -> jax.Array:
        feat = ConvNet(activation=self.activation)(pixels)
        return DdpgMlpQNet(
            num_cells=self.num_cells, activation=self.activation
        )(feat, action)

"""Exploration-reward and pretrained-embedding transforms.

Reference originals: ``torchrl/envs/transforms/rnd.py`` (``RNDTransform``
:80) with its loss (``torchrl/objectives/rnd.py`` ``RNDLoss`` :20), and the
pretrained image embeddings ``r3m.py`` (``R3MTransform`` :187), ``vip.py``
(``VIPTransform`` :162), ``vc1.py`` (``VC1Transform`` :32).

TPU design: the RND target/predictor are flax modules whose params live in
the transform state (part of the env-state pytree), so the intrinsic reward
is computed inside the collection scan — zero extra host round trips.  The
predictor is trained off the collected batch via
:class:`rl_tpu.objectives.rnd.RNDLoss`; push refreshed predictor params back
into the env state with :func:`RNDTransform.replace_predictor`.

The embedding transforms reproduce the reference's interface (frozen conv
backbone → feature vector replacing pixels).  This container has no network
egress, so weights must be supplied locally via ``params=``; without them
the backbone runs randomly initialized (documented — still useful as a fixed
random projection a la RND).
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from rl_tpu.data import Composite, TDict, Unbounded
from rl_tpu.modules.models import MLP, ConvNet
from .base import Transform

__all__ = ["RNDTransform", "R3MTransform", "VIPTransform", "VC1Transform"]


class RNDTransform(Transform):
    """Random Network Distillation intrinsic reward (Burda et al. 2019;
    reference rnd.py:80).

    ``step`` writes ``intrinsic_reward = ||f_target(obs) - f_pred(obs)||²``
    and (optionally) adds ``intrinsic_weight ×`` it to the extrinsic reward.
    Observations are normalized by running mean/std carried in the state
    (the reference's obs-normalization inside RND).
    """

    def __init__(self, obs_key="observation", out_dim: int = 64,
                 hidden: Sequence[int] = (64, 64), intrinsic_weight: float = 0.0,
                 reward_key: str = "intrinsic_reward", eps: float = 1e-4):
        super().__init__()
        self.obs_key = obs_key
        self.reward_key = reward_key
        self.intrinsic_weight = float(intrinsic_weight)
        self.eps = float(eps)
        self.target_net = MLP(out_dim, hidden, activation="relu")
        self.predictor_net = MLP(out_dim, hidden, activation="relu")

    def init_params(self, key, example_obs) -> TDict:
        kt, kp = jax.random.split(key)
        obs = jnp.asarray(example_obs, jnp.float32)
        return TDict(
            target=TDict(self.target_net.init(kt, obs)),
            predictor=TDict(self.predictor_net.init(kp, obs)),
        )

    def reset(self, key, tstate, td):
        if tstate is not None and "params" in tstate:
            return tstate, td.set(
                self.reward_key,
                jnp.zeros(jnp.asarray(td["done"]).shape, jnp.float32),
            )
        obs = jnp.asarray(td[self.obs_key], jnp.float32)
        params = self.init_params(key, obs)
        stats = TDict(
            mean=jnp.zeros(obs.shape[-1:], jnp.float32),
            var=jnp.ones(obs.shape[-1:], jnp.float32),
            count=jnp.asarray(self.eps, jnp.float32),
        )
        return TDict(params=params, stats=stats), td.set(
            self.reward_key, jnp.zeros(jnp.asarray(td["done"]).shape, jnp.float32)
        )

    def _update_stats(self, stats: TDict, obs):
        flat = obs.reshape(-1, obs.shape[-1])
        bmean = flat.mean(0)
        bvar = flat.var(0)
        bcount = jnp.asarray(flat.shape[0], jnp.float32)
        delta = bmean - stats["mean"]
        tot = stats["count"] + bcount
        mean = stats["mean"] + delta * bcount / tot
        m2 = stats["var"] * stats["count"] + bvar * bcount + \
            delta**2 * stats["count"] * bcount / tot
        return TDict(mean=mean, var=m2 / tot, count=tot)

    def step(self, tstate, next_td):
        obs = jnp.asarray(next_td[self.obs_key], jnp.float32)
        stats = self._update_stats(tstate["stats"], obs)
        norm = (obs - stats["mean"]) / jnp.sqrt(stats["var"] + 1e-8)
        norm = jnp.clip(norm, -5.0, 5.0)
        tgt = jax.lax.stop_gradient(
            self.target_net.apply(tstate["params", "target"].to_dict(), norm)
        )
        pred = self.predictor_net.apply(tstate["params", "predictor"].to_dict(), norm)
        err = jnp.mean((tgt - pred) ** 2, axis=-1, keepdims=True)
        next_td = next_td.set(self.reward_key, err)
        if self.intrinsic_weight:
            next_td = next_td.set(
                "reward",
                jnp.asarray(next_td["reward"]) + self.intrinsic_weight * err,
            )
        return tstate.set("stats", stats), next_td

    def on_done(self, tstate_reset, tstate_stepped, done):
        # params and running stats persist across episode boundaries
        return tstate_stepped

    def replace_predictor(self, env_state: TDict, predictor_params,
                          index: int | str = 0) -> TDict:
        """Swap freshly-trained predictor params into a TransformedEnv state
        (call between collection batches)."""
        return env_state.set(
            ("t", str(index), "params", "predictor"), predictor_params
        )

    def transform_observation_spec(self, spec: Composite) -> Composite:
        spec[self.reward_key] = Unbounded((1,), jnp.float32)
        return spec


class _PretrainedImageEmbedding(Transform):
    """Frozen conv backbone mapping pixels → a feature vector that replaces
    the pixel key (shared skeleton of R3M/VIP/VC1).  Weights: pass ``params``
    (no egress in this container — the reference downloads torchvision /
    released checkpoints; load converted ones from disk instead)."""

    variant_dims = {"small": 512, "base": 768, "large": 1024}

    def __init__(self, in_key="pixels", out_key="embedding",
                 variant: str = "base", params=None, del_pixels: bool = True,
                 image_size: int = 64):
        super().__init__([in_key], [out_key])
        self.in_key = in_key
        self.out_key = out_key
        self.image_size = int(image_size)
        self.embed_dim = self.variant_dims.get(variant, 768)
        self.backbone = ConvNet(
            channels=(64, 128, 256), kernel_sizes=(7, 5, 3), strides=(2, 2, 2),
            activation="relu",
        )
        self.head = MLP(self.embed_dim, (self.embed_dim,), activation="relu")
        self.params = params
        self.del_pixels = del_pixels

    def _prep(self, pixels):
        x = jnp.asarray(pixels, jnp.float32)
        if x.max() > 1.5:
            x = x / 255.0
        if x.shape[-2] < self.image_size or x.shape[-3] < self.image_size:
            # upsample small boards so the strided backbone keeps spatial
            # extent (the reference resizes to 224 before R3M/VIP/VC1)
            x = jax.image.resize(
                x, x.shape[:-3] + (self.image_size, self.image_size,
                                   x.shape[-1]), "nearest")
        return x

    def _ensure_params(self, key, pixels):
        if self.params is None:
            x = self._prep(pixels)
            kb, kh = jax.random.split(key)
            bp = self.backbone.init(kb, x)
            feats = self.backbone.apply(bp, x)
            self.params = TDict(backbone=TDict(bp),
                                head=TDict(self.head.init(kh, feats)))
        return self.params

    def _embed(self, pixels):
        x = self._prep(pixels)
        feats = self.backbone.apply(TDict(self.params["backbone"]).to_dict(), x)
        return jax.lax.stop_gradient(self.head.apply(TDict(self.params["head"]).to_dict(), feats))

    def reset(self, key, tstate, td):
        self._ensure_params(key, jnp.asarray(td[self.in_key], jnp.float32))
        td = td.set(self.out_key, self._embed(td[self.in_key]))
        if self.del_pixels:
            td = td.exclude(self.in_key)
        return TDict(), td

    def step(self, tstate, next_td):
        next_td = next_td.set(self.out_key, self._embed(next_td[self.in_key]))
        if self.del_pixels:
            next_td = next_td.exclude(self.in_key)
        return tstate, next_td

    def transform_observation_spec(self, spec: Composite) -> Composite:
        spec[self.out_key] = Unbounded((self.embed_dim,), jnp.float32)
        if self.del_pixels and self.in_key in spec:
            del spec[self.in_key]
        return spec


class R3MTransform(_PretrainedImageEmbedding):
    """R3M robot-manipulation embedding interface (reference r3m.py:187)."""

    variant_dims = {"resnet18": 512, "resnet34": 512, "resnet50": 2048}

    def __init__(self, model_name: str = "resnet18", **kw):
        kw.setdefault("out_key", "r3m_vec")
        super().__init__(variant=model_name, **kw)


class VIPTransform(_PretrainedImageEmbedding):
    """VIP value-implicit-pretraining embedding interface (reference
    vip.py:162)."""

    variant_dims = {"resnet50": 1024}

    def __init__(self, model_name: str = "resnet50", **kw):
        kw.setdefault("out_key", "vip_vec")
        super().__init__(variant=model_name, **kw)


class VC1Transform(_PretrainedImageEmbedding):
    """VC-1 visual-cortex embedding interface (reference vc1.py:32)."""

    variant_dims = {"vc1_vitb": 768, "vc1_vitl": 1024}

    def __init__(self, model_name: str = "vc1_vitb", **kw):
        kw.setdefault("out_key", "vc1_vec")
        super().__init__(variant=model_name, **kw)


class VIPRewardTransform(VIPTransform):
    """Embedding-distance reward shaping (reference vip.py:345).

    At reset, ``goal_image`` is embedded once into ``goal_embedding``; each
    step's reward becomes the potential-shaped decrease in embedding
    distance to the goal:
    ``r = −‖φ(s') − φ(g)‖ + ‖φ(s) − φ(g)‖``.
    """

    def __init__(self, goal_key: str = "goal_image", **kw):
        kw.setdefault("del_pixels", False)
        super().__init__(**kw)
        self.goal_key = goal_key

    def reset(self, key, tstate, td):
        _, td = super().reset(key, tstate, td)
        if self.goal_key not in td:
            raise KeyError(
                f"VIPRewardTransform.reset() requires a {self.goal_key!r} "
                f"key in the reset td")
        goal_emb = self._embed(td[self.goal_key])
        # drop the goal image so reset/step td structures match (the
        # auto-reset where-select needs identical pytrees)
        td = td.exclude(self.goal_key).set("goal_embedding", goal_emb)
        return TDict(goal=goal_emb, last=jnp.asarray(td[self.out_key])), td

    def step(self, tstate, next_td):
        _, next_td = super().step(None, next_td)
        cur = jnp.asarray(next_td[self.out_key])
        goal = tstate["goal"]
        last = tstate["last"]
        reward = (
            -jnp.linalg.norm(cur - goal, axis=-1)
            + jnp.linalg.norm(last - goal, axis=-1)
        )[..., None]
        next_td = next_td.set("reward", reward)
        next_td = next_td.set("goal_embedding", goal)
        return TDict(goal=goal, last=cur), next_td

    def on_done(self, tstate_reset, tstate_stepped, done):
        # a fresh episode re-embeds its goal; keep the reset branch
        return super().on_done(tstate_reset, tstate_stepped, done)

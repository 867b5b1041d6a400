"""Task models: pointwise scorer (Actor/Classifier), sequence scorer
(Critic/Reward), and the 2-data feature-unification model.

Reference architectures: finetune/ppo.py:196-350 (multimodal Actor /
Critic / Reward), finetune/ppo_trad.py:145-281 (tabular variants),
finetune/pointwise_2data_trad.py:130-176 (2-data projection model).

TPU-native design notes (deviations that keep the math identical):
  * image embeddings are NOT tiled per tag on the host (reference
    ppo.py:831-832 materializes (B, T, 16, 768)); we keep (B, I, 768)
    and let the cross-attention broadcast over the tag axis, and
    compute img_proj once per item instead of once per (item, tag);
  * all tag gathers (Critic/Reward index rearrangement,
    ppo.py:265-271) are jnp.take_along_axis inside jit;
  * shapes are static: (B, T) fixed per stage; variable eval tag counts
    are padded to buckets with masks.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from lr2ppo_tpu.config import ModelConfig
from lr2ppo_tpu.models.layers import Mlp, TorchDense, XiT, cast

Array = jax.Array


class FusionTrunk(nn.Module):
    """Shared trunk: projections -> XiT cross-attention -> concat ->
    wide out_layer MLP -> per-tag 768-d feature.

    multimodal: text (B, T, S, 768) x img (B, I, 768) (ppo.py:214-227)
    tabular:    text (B, T, 768) doc vectors self-attended (ppo_trad.py:157-167)
    Pass pre-projected tokens with `tokens=` for the 2-data model.
    """

    cfg: ModelConfig
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, text_emb: Array, img_emb: Optional[Array] = None,
                 deterministic: bool = True,
                 tokens: Optional[Array] = None) -> Array:
        cfg = self.cfg
        d = cfg.feat_size
        hidden = cfg.mlp_ratio * d
        mlp = lambda name: Mlp(hidden, d, 0.0, cfg.init_style, self.dtype,
                               int8=cfg.int8, name=name)

        if cfg.family == "multimodal":
            b, t = text_emb.shape[:2]
            tfeat = mlp("text_proj")(cast(text_emb, self.dtype),
                                     deterministic)
            ifeat = mlp("img_proj")(cast(img_emb, self.dtype),
                                    deterministic)
            ifeat = ifeat[:, None]                      # (B, 1, I, D)
            x = XiT(feat_size=d, num_heads=cfg.num_heads,
                    faithful=cfg.faithful_attention, drop_p=cfg.drop_p,
                    forward_drop_p=cfg.forward_drop_p,
                    init_style=cfg.init_style,
                    pallas_dropout=cfg.pallas_dropout,
                    fast_dropout=cfg.fast_dropout,
                    hash_dropout=cfg.hash_dropout, dtype=self.dtype,
                    int8=cfg.int8, name="xit")(tfeat, ifeat, deterministic)
            ib = jnp.broadcast_to(ifeat, (b, t) + ifeat.shape[2:])
            x = jnp.concatenate([x, ib], axis=2)        # (B, T, S+I, D)
        else:
            if tokens is None:
                tokens = cast(text_emb, self.dtype)[:, :, None, :]  # (B,T,1,D)
            b, t = tokens.shape[:2]
            x = XiT(feat_size=d, num_heads=cfg.num_heads,
                    faithful=cfg.faithful_attention, drop_p=cfg.drop_p,
                    forward_drop_p=cfg.forward_drop_p,
                    init_style=cfg.init_style,
                    pallas_dropout=cfg.pallas_dropout,
                    fast_dropout=cfg.fast_dropout,
                    hash_dropout=cfg.hash_dropout, dtype=self.dtype,
                    int8=cfg.int8, name="xit")(tokens, tokens, deterministic)
            x = jnp.concatenate([x, tokens], axis=2)    # (B, T, 2, D)

        x = x.reshape(b, t, -1)                         # (B, T, fusion_tokens*D)
        x = mlp("out_layer")(x, deterministic)          # (B, T, D)
        return x


def _trunk_cls(cfg: ModelConfig):
    """FusionTrunk, optionally activation-rematerialized (cfg.remat):
    the (B,T,196,3072) MLP/FFN activations are recomputed in the backward
    instead of stored, trading ~1/3 extra trunk FLOPs for the memory that
    caps the per-chip batch."""
    if cfg.remat:
        # static_argnums counts self as 0: (text, img, deterministic) = 3
        return nn.remat(FusionTrunk, static_argnums=(3,))
    return FusionTrunk


class ScoreModel(nn.Module):
    """Pointwise scorer == reference Classifier/Actor.

    Returns per-tag scores: (B, T) in 'reg' mode, (B, T, labels_num)
    logits in 'cls' mode (ppo.py:196-244).
    """

    cfg: ModelConfig
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, text_emb: Array, img_emb: Optional[Array] = None,
                 deterministic: bool = True) -> Array:
        cfg = self.cfg
        x = _trunk_cls(cfg)(cfg, self.dtype, name="trunk")(
            text_emb, img_emb, deterministic)
        out = 1 if cfg.mode == "reg" else cfg.labels_num
        logits = TorchDense(out, cfg.init_style, dtype=self.dtype,
                            int8=cfg.int8, name="head")(x)
        if cfg.mode == "reg":
            return logits[..., 0]
        return logits


class SeqScoreModel(nn.Module):
    """Sequence scorer == reference Critic/Reward.

    Gathers tags by `index`, runs the trunk, adds learned position
    embeddings, applies the causal XiT over the tag sequence, and returns
    the last position's scalar (ppo.py:247-350). In faithful-attention
    mode the causal mask is the reference's no-op.
    """

    cfg: ModelConfig
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, text_emb: Array, img_emb: Optional[Array],
                 index: Array, deterministic: bool = True) -> Array:
        cfg = self.cfg
        # TPU optimization: the trunk is per-tag independent, so run it on
        # the T distinct tags and gather the (B, T, D) FEATURES by index,
        # instead of the reference's gather-then-trunk (ppo.py:265-271)
        # which recomputes duplicated tags (the 4-index sequences draw
        # from 2 distinct tags — half the trunk FLOPs are repeats). Same
        # math: in eval (rollout/reward) there is no dropout, and in
        # training the duplicated positions share dropout masks.
        x = _trunk_cls(cfg)(cfg, self.dtype, name="trunk")(
            text_emb, img_emb, deterministic)          # (B, T, D)
        x = jnp.take_along_axis(
            x, index[..., None].astype(jnp.int32), axis=1)  # (B, K, D)
        b, k = x.shape[:2]
        pos_table = self.param(
            "pos_emb", jax.nn.initializers.normal(1.0), (cfg.num_pos, cfg.feat_size),
            jnp.float32)  # torch nn.Embedding default init: N(0,1)
        x = x + pos_table[:k].astype(x.dtype)[None]
        x = XiT(feat_size=cfg.feat_size, num_heads=cfg.num_heads,
                causal=True, faithful=cfg.faithful_attention,
                drop_p=cfg.drop_p, forward_drop_p=cfg.forward_drop_p,
                init_style=cfg.init_style,
                pallas_dropout=cfg.pallas_dropout,
                fast_dropout=cfg.fast_dropout,
                    hash_dropout=cfg.hash_dropout, dtype=self.dtype,
                int8=cfg.int8, name="xitt")(x, x, deterministic)
        logits = TorchDense(1, cfg.init_style, dtype=self.dtype,
                            int8=cfg.int8, name="head")(x)  # (B, K, 1)
        return logits[:, -1, 0]                        # (B,)


class TwoDataScoreModel(nn.Module):
    """Feature-unification scorer (pointwise_2data_trad.py:130-176).

    Holds one projection MLP per raw feature dim (46 -> MQ2008,
    136 -> Web10K); the input's last dim selects the projection. The
    projected 768-d token then runs the tabular trunk. `project()`
    exposes the projection alone for the tsv exporter
    (pointwise_2data_infer_trad.py:428-446).
    """

    cfg: ModelConfig
    dtype: Optional[jnp.dtype] = None

    def _proj_name(self, dim: int) -> str:
        # reference names: text_proj (46), text_proj3 (136)
        i = self.cfg.trad_dims.index(dim)
        return "text_proj" if i == 0 else f"text_proj{i + 2}"

    def setup(self):
        cfg = self.cfg
        d = cfg.feat_size
        self.projs = {
            dim: Mlp(cfg.mlp_ratio * d, d, 0.0, cfg.init_style, self.dtype,
                     int8=cfg.int8, name=self._proj_name(dim))
            for dim in cfg.trad_dims
        }
        self.trunk = FusionTrunk(cfg, self.dtype)
        out = 1 if cfg.mode == "reg" else cfg.labels_num
        self.head = TorchDense(out, cfg.init_style, dtype=self.dtype,
                               int8=cfg.int8)

    def __call__(self, text_emb: Array, img_emb: Optional[Array] = None,
                 deterministic: bool = True) -> Array:
        cfg = self.cfg
        dim = text_emb.shape[-1]
        tokens = self.projs[dim](
            cast(text_emb, self.dtype)[:, :, None, :], deterministic)
        x = self.trunk(None, None, deterministic, tokens=tokens)
        logits = self.head(x)
        if cfg.mode == "reg":
            return logits[..., 0]
        return logits

    def project(self, text_emb: Array) -> Array:
        """raw (N, dim) -> unified (N, 768) features."""
        dim = text_emb.shape[-1]
        return self.projs[dim](cast(text_emb, self.dtype), True)


class ActorCritic:
    """Paired actor (ScoreModel) and critic (SeqScoreModel) — a plain
    container, not a module: JAX keeps the two param trees separate the
    way the reference keeps two optimizers (ppo.py:378-419)."""

    def __init__(self, cfg: ModelConfig, dtype=None):
        self.actor = ScoreModel(cfg, dtype)
        self.critic = SeqScoreModel(cfg, dtype)

    def init(self, key: Array, text_emb: Array, img_emb: Optional[Array],
             index: Array):
        ka, kc = jax.random.split(key)
        actor_params = self.actor.init(ka, text_emb, img_emb)
        critic_params = self.critic.init(kc, text_emb, img_emb, index)
        return actor_params, critic_params

"""CLIP-style frame transformer and projection head.

Reference: finetune/video_transformer.py:8-93 (VideoTransformer —
imported by the stage-1/2 drivers but never instantiated at runtime,
SURVEY §2.2) and finetune/project_embedding.py:5-26 (ProjectionLayer).
Provided for API completeness; TPU-native (batch-major, no NLD/LND
permutes — XLA lays out as it pleases) with CLIP's QuickGELU
(x * sigmoid(1.702 x)) and fp32 LayerNorm."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from lr2ppo_tpu.models.layers import TorchDense

Array = jax.Array


def quick_gelu(x: Array) -> Array:
    return x * jax.nn.sigmoid(1.702 * x)


class ResidualAttentionBlock(nn.Module):
    """CLIP resblock: pre-LN MHA + pre-LN QuickGELU MLP."""

    d_model: int
    n_head: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        h = nn.LayerNorm(epsilon=1e-5, name="ln_1")(x)
        h = nn.MultiHeadDotProductAttention(
            num_heads=self.n_head, dtype=self.dtype, name="attn")(h, h)
        x = x + h
        h = nn.LayerNorm(epsilon=1e-5, name="ln_2")(x)
        h = TorchDense(self.d_model * 4, dtype=self.dtype, name="c_fc")(h)
        h = quick_gelu(h)
        h = TorchDense(self.d_model, dtype=self.dtype, name="c_proj")(h)
        return x + h


class VideoTransformer(nn.Module):
    """cls token + learned positions + resblocks + post-LN + projection
    (video_transformer.py:8-42)."""

    frame_size: int
    emb_size: int
    layers: int
    heads: int
    output_dim: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        scale = self.emb_size ** -0.5
        cls = self.param("class_embedding",
                         jax.nn.initializers.normal(scale),
                         (self.emb_size,), jnp.float32)
        pos = self.param("positional_embedding",
                         jax.nn.initializers.normal(scale),
                         (self.frame_size + 1, self.emb_size), jnp.float32)
        proj = self.param("proj", jax.nn.initializers.normal(scale),
                          (self.emb_size, self.output_dim), jnp.float32)
        b = x.shape[0]
        cls_tok = jnp.broadcast_to(cls.astype(x.dtype),
                                   (b, 1, self.emb_size))
        x = jnp.concatenate([cls_tok, x], axis=1)
        x = x + pos.astype(x.dtype)
        x = nn.LayerNorm(epsilon=1e-5, name="ln_pre")(x)
        for i in range(self.layers):
            x = ResidualAttentionBlock(self.emb_size, self.heads,
                                       self.dtype,
                                       name=f"resblock_{i}")(x)
        x = nn.LayerNorm(epsilon=1e-5, name="ln_post")(x)
        return x @ proj.astype(x.dtype)


class ProjectionLayer(nn.Module):
    """Linear -> GELU -> Linear -> dropout -> +residual -> LN
    (project_embedding.py:5-26)."""

    projection_dim: int
    dropout: float = 0.2
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        projected = TorchDense(self.projection_dim, dtype=self.dtype,
                               name="projection")(x)
        h = nn.gelu(projected, approximate=False)
        h = TorchDense(self.projection_dim, dtype=self.dtype, name="fc")(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = h + projected
        return nn.LayerNorm(epsilon=1e-5, name="layer_norm")(h)

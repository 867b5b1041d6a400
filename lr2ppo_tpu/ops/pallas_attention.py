"""Pallas TPU fused attention for the tower encoders.

The XLM-R / ViT towers run full self-attention at seq<=512 with head dim
64. At these sizes the whole (S, dh) K/V and the (S, S) score matrix for
one (batch, head) fit comfortably in VMEM, so the kernel computes
  softmax(Q K^T * scale + bias) V
for one (b, h) per grid step entirely on-chip — the scores and
probabilities never round-trip through HBM (XLA materializes both for
the unfused lowering at these shapes). Inference-path kernel: used by
the feature-precompute extractors and deterministic encoder passes; the
training path keeps XLA's differentiable attention.

Supports the additive seg-mask bias of the reference encoders
(transformer_encoder.py:62-90). No T5 position bias / residual-attention
chaining — callers with those features fall back to the jnp path.

Measured on ViT-B/16 geometry (12L, 197 tokens, dh 64, bs 64, bf16, one
v5e chip): XLA 25.1 ms/encode vs this kernel 28.8 ms. The per-(batch,
head) grid issues (197x64)@(64x197) matmuls that underfill the 128x128
MXU, and XLA's batched attention already keeps these small scores
fused. TowerConfig.pallas_attention therefore defaults to False; the
kernel becomes profitable at longer sequences / larger head dims where
the unfused (S, S) scores spill to HBM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _attn_kernel(q_ref, k_ref, v_ref, bias_ref, out_ref, *, scale: float):
    q = q_ref[0, 0]                      # (S, dh)
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    bias = bias_ref[0]                   # (1, S) additive 0 / -10000,
    # broadcasts over the query axis of (S, S) scores
    scores = jnp.dot(q, k.T, preferred_element_type=jnp.float32)
    scores = scores * scale + bias
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.dot(probs.astype(v.dtype), v,
                  preferred_element_type=jnp.float32)
    out_ref[0, 0] = out.astype(out_ref.dtype)


def fused_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                    key_bias: jax.Array, scale: float,
                    interpret=False) -> jax.Array:
    """q/k/v: (B, H, S, dh); key_bias: (B, S) additive mask over keys.
    Returns (B, H, S, dh)."""
    b, h, s, dh = q.shape
    spec_qkv = pl.BlockSpec((1, 1, s, dh), lambda i: (i // h, i % h, 0, 0),
                            memory_space=pltpu.VMEM)
    # (B, 1, S) so the block's trailing dims equal the array dims (the
    # Mosaic tiling rule rejects a (1, S) block over a (B, S) array)
    spec_bias = pl.BlockSpec((1, 1, s), lambda i: (i // h, 0, 0),
                             memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        grid=(b * h,),
        in_specs=[spec_qkv, spec_qkv, spec_qkv, spec_bias],
        out_specs=spec_qkv,
        interpret=interpret,
    )(q, k, v, key_bias[:, None, :])


def reference_attention(q, k, v, key_bias, scale):
    """jnp reference of the same math (for tests and the fallback)."""
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32)
    scores = scores * scale + key_bias[:, None, None, :]
    probs = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", probs.astype(v.dtype), v,
                      preferred_element_type=jnp.float32).astype(q.dtype)

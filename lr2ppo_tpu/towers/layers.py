"""Foundation transformer layers for the tower model zoo.

TPU-native re-designs of the reference layer zoo
(tencentpretrain/layers/: layer_norm.py, multi_headed_attn.py,
transformer.py, position_ffn.py, relative_position_embedding.py), kept
weight- and math-compatible so pretrained reference checkpoints import
bit-faithfully:

  * LayerNorm divides by (std + eps) with eps OUTSIDE and std using the
    Bessel correction (torch x.std default) — layer_norm.py:16-21;
  * attention masks are ADDITIVE -10000 biases, not boolean masks
    (transformer_encoder.py:62-90);
  * residual-attention chains the raw scores (multi_headed_attn.py:66-71).

Everything is expressed as batched matmuls / einsums with static shapes
so XLA tiles them onto the MXU.
"""

from __future__ import annotations

import math
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from lr2ppo_tpu.models.layers import TorchDense

Array = jax.Array

ACTS: dict = {
    "gelu": lambda x: nn.gelu(x, approximate=False),
    "gelu_fast": lambda x: nn.gelu(x, approximate=True),
    "relu": nn.relu,
    "silu": nn.silu,
    "linear": lambda x: x,
    "tanh": jnp.tanh,
}


class RefLayerNorm(nn.Module):
    """gamma * (x - mean) / (std + eps) + beta with Bessel-corrected std
    (reference layer_norm.py:5-21; weights named gamma/beta)."""

    eps: float = 1e-6
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        d = x.shape[-1]
        gamma = self.param("gamma", jax.nn.initializers.ones, (d,), jnp.float32)
        beta = self.param("beta", jax.nn.initializers.zeros, (d,), jnp.float32)
        xf = x.astype(jnp.float32)
        mean = xf.mean(-1, keepdims=True)
        var = xf.var(-1, keepdims=True) * (d / max(d - 1, 1))  # unbiased
        # sqrt clamped away from 0: d(sqrt)/dvar at var=0 is inf, and a
        # constant row (zero-padded audio frames, padding tokens) then
        # NaNs the whole backward as 0*inf. Forward is bit-identical for
        # var >= 1e-20.
        std = jnp.sqrt(jnp.maximum(var, 1e-20))
        out = gamma * (xf - mean) / (std + self.eps) + beta
        return out.astype(self.dtype or x.dtype)


class T5LayerNorm(nn.Module):
    """RMS norm, fp32 accumulation (reference layer_norm.py:24-39)."""

    eps: float = 1e-6
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        d = x.shape[-1]
        weight = self.param("weight", jax.nn.initializers.ones, (d,),
                            jnp.float32)
        var = jnp.square(x.astype(jnp.float32)).mean(-1, keepdims=True)
        out = x * jax.lax.rsqrt(var + self.eps).astype(x.dtype)
        return (weight.astype(self.dtype or x.dtype) * out)


def make_layer_norm(kind: str, dtype=None, name: Optional[str] = None):
    if kind == "t5":
        return T5LayerNorm(dtype=dtype, name=name)
    return RefLayerNorm(dtype=dtype, name=name)


def additive_mask_from_seg(seg: Array, mask_kind: str) -> Array:
    """seg (B, S) -> additive attention bias (B, 1, S, S) with 0 visible /
    -10000 hidden (reference transformer_encoder.py:62-90)."""
    b, s = seg.shape
    if mask_kind == "fully_visible":
        vis = (seg > 0)[:, None, None, :]                      # (B,1,1,S)
        vis = jnp.broadcast_to(vis, (b, 1, s, s))
    elif mask_kind == "causal":
        vis = jnp.tril(jnp.ones((s, s), bool))[None, None]
        vis = jnp.broadcast_to(vis, (b, 1, s, s))
    elif mask_kind == "causal_with_prefix":
        mask_a = (seg == 1)[:, None, None, :].astype(jnp.float32)
        mask_b = (seg > 0)[:, None, None, :].astype(jnp.float32)
        tril = jnp.tril(jnp.ones((s, s), jnp.float32))[None, None]
        vis = (mask_a + mask_b + tril) >= 2
        vis = jnp.broadcast_to(vis, (b, 1, s, s))
    else:
        raise ValueError(f"unknown mask: {mask_kind}")
    return jnp.where(vis, 0.0, -10000.0).astype(jnp.float32)


class MultiHeadedAttention(nn.Module):
    """Reference MHA (multi_headed_attn.py:6-76): separate q/k/v linears
    stored as linear_layers.{0,1,2}, additive mask, optional T5 position
    bias and residual-attention score chaining."""

    hidden_size: int
    heads_num: int
    attention_head_size: int
    dropout: float = 0.1
    has_bias: bool = True
    with_scale: bool = True
    hash_dropout: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, key: Array, value: Array, query: Array, mask: Array,
                 position_bias: Optional[Array] = None,
                 prev_attn: Optional[Array] = None,
                 deterministic: bool = True,
                 key_bias: Optional[Array] = None):
        h, dh = self.heads_num, self.attention_head_size
        inner = h * dh
        dense = lambda name: TorchDense(inner, "torch_default",
                                        use_bias=self.has_bias,
                                        dtype=self.dtype, name=name)
        q = dense("linear_layers_0")(query)
        k = dense("linear_layers_1")(key)
        v = dense("linear_layers_2")(value)
        b, sq = q.shape[:2]
        sk = k.shape[1]
        q = q.reshape(b, sq, h, dh)
        k = k.reshape(b, sk, h, dh)
        v = v.reshape(b, sk, h, dh)

        # fused pallas path (inference, key-only mask, no T5 bias / score
        # chaining): scores + probs stay in VMEM (ops/pallas_attention.py)
        if (key_bias is not None and position_bias is None
                and prev_attn is None and deterministic and self.with_scale):
            from lr2ppo_tpu.ops.pallas_attention import fused_attention

            interpret = jax.devices()[0].platform != "tpu"
            out = fused_attention(
                jnp.transpose(q, (0, 2, 1, 3)),
                jnp.transpose(k, (0, 2, 1, 3)),
                jnp.transpose(v, (0, 2, 1, 3)),
                key_bias.astype(jnp.float32),
                1.0 / math.sqrt(float(dh)), interpret=interpret)
            out = jnp.transpose(out, (0, 2, 1, 3)).reshape(b, sq, inner)
            out = TorchDense(self.hidden_size, "torch_default",
                             use_bias=self.has_bias, dtype=self.dtype,
                             name="final_linear")(out)
            return out, None

        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32)
        if position_bias is not None:
            scores = scores + position_bias
        if self.with_scale:
            scores = scores / math.sqrt(float(dh))
        scores = scores + mask
        if prev_attn is not None:
            scores = scores + prev_attn
        prev_attn_out = scores
        probs = jax.nn.softmax(scores, axis=-1).astype(self.dtype or q.dtype)
        from lr2ppo_tpu.ops.hash_dropout import module_dropout

        probs = module_dropout(self, probs, self.dropout, deterministic,
                               self.hash_dropout)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v,
                         preferred_element_type=self.dtype or jnp.float32)
        out = out.reshape(b, sq, inner)
        out = TorchDense(self.hidden_size, "torch_default",
                         use_bias=self.has_bias, dtype=self.dtype,
                         name="final_linear")(out)
        return out, prev_attn_out


class PositionwiseFeedForward(nn.Module):
    """linear_1 -> act -> linear_2 (position_ffn.py:4-15)."""

    hidden_size: int
    feedforward_size: int
    hidden_act: str = "gelu"
    has_bias: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        act = ACTS[self.hidden_act]
        x = TorchDense(self.feedforward_size, "torch_default",
                       use_bias=self.has_bias, dtype=self.dtype,
                       name="linear_1")(x)
        x = act(x)
        return TorchDense(self.hidden_size, "torch_default",
                          use_bias=self.has_bias, dtype=self.dtype,
                          name="linear_2")(x)


class GatedFeedForward(nn.Module):
    """act(W_g x) * (W_1 x) -> W_2 (position_ffn.py:18-35)."""

    hidden_size: int
    feedforward_size: int
    hidden_act: str = "gelu"
    has_bias: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        act = ACTS[self.hidden_act]
        gate = act(TorchDense(self.feedforward_size, "torch_default",
                              use_bias=self.has_bias, dtype=self.dtype,
                              name="linear_gate")(x))
        inter = TorchDense(self.feedforward_size, "torch_default",
                           use_bias=self.has_bias, dtype=self.dtype,
                           name="linear_1")(x)
        return TorchDense(self.hidden_size, "torch_default",
                          use_bias=self.has_bias, dtype=self.dtype,
                          name="linear_2")(gate * inter)


def t5_relative_buckets(relative_position: Array, bidirectional: bool,
                        num_buckets: int, max_distance: int) -> Array:
    """T5 bucketing (relative_position_embedding.py:45-92)."""
    rel = relative_position
    buckets = jnp.zeros_like(rel)
    if bidirectional:
        num_buckets //= 2
        buckets = buckets + (rel > 0).astype(jnp.int32) * num_buckets
        rel = jnp.abs(rel)
    else:
        rel = -jnp.minimum(rel, jnp.zeros_like(rel))
    max_exact = num_buckets // 2
    is_small = rel < max_exact
    rel_large = max_exact + (
        jnp.log(rel.astype(jnp.float32) / max_exact + 1e-20)
        / math.log(max_distance / max_exact) * (num_buckets - max_exact)
    ).astype(jnp.int32)
    rel_large = jnp.minimum(rel_large, num_buckets - 1)
    return buckets + jnp.where(is_small, rel, rel_large)


class RelativePositionEmbedding(nn.Module):
    """T5-style binned relative position bias -> (1, H, Sq, Sk)."""

    heads_num: int
    bidirectional: bool = True
    num_buckets: int = 32
    max_distance: int = 128

    @nn.compact
    def __call__(self, query_length: int, key_length: int) -> Array:
        table = self.param(
            "relative_attention_bias", jax.nn.initializers.normal(1.0),
            (self.num_buckets, self.heads_num), jnp.float32)
        ctx = jnp.arange(query_length)[:, None]
        mem = jnp.arange(key_length)[None, :]
        bucket = t5_relative_buckets(mem - ctx, self.bidirectional,
                                     self.num_buckets, self.max_distance)
        values = table[bucket]                      # (Sq, Sk, H)
        return jnp.transpose(values, (2, 0, 1))[None]


class TransformerLayer(nn.Module):
    """Pre/post-LN encoder block (transformer.py:8-74)."""

    hidden_size: int
    heads_num: int
    feedforward_size: int
    dropout: float = 0.1
    hidden_act: str = "gelu"
    layernorm_positioning: str = "post"
    layernorm: str = "normal"
    feed_forward: str = "dense"
    attention_head_size: Optional[int] = None
    has_bias: bool = True
    with_scale: bool = True
    hash_dropout: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, hidden: Array, mask: Array,
                 position_bias: Optional[Array] = None,
                 prev_attn: Optional[Array] = None,
                 deterministic: bool = True,
                 key_bias: Optional[Array] = None):
        dh = self.attention_head_size or self.hidden_size // self.heads_num
        attn = MultiHeadedAttention(
            self.hidden_size, self.heads_num, dh, self.dropout,
            self.has_bias, self.with_scale, self.hash_dropout,
            self.dtype, name="self_attn")
        ffn_cls = (GatedFeedForward if self.feed_forward == "gated"
                   else PositionwiseFeedForward)
        ffn = ffn_cls(self.hidden_size, self.feedforward_size,
                      self.hidden_act, self.has_bias, self.dtype,
                      name="feed_forward")
        ln1 = make_layer_norm(self.layernorm, self.dtype, "layer_norm_1")
        ln2 = make_layer_norm(self.layernorm, self.dtype, "layer_norm_2")
        from lr2ppo_tpu.ops.hash_dropout import module_dropout

        drop = lambda x: module_dropout(self, x, self.dropout,
                                        deterministic, self.hash_dropout)

        if self.layernorm_positioning == "post":
            inter, prev_attn_out = attn(hidden, hidden, hidden, mask,
                                        position_bias, prev_attn,
                                        deterministic, key_bias)
            inter = ln1(drop(inter) + hidden)
            out = ln2(drop(ffn(inter)) + inter)
        else:
            normed = ln1(hidden)
            inter, prev_attn_out = attn(normed, normed, normed, mask,
                                        position_bias, prev_attn,
                                        deterministic, key_bias)
            hidden = hidden + drop(inter)
            out = drop(ffn(ln2(hidden))) + hidden
        return out, prev_attn_out


def pooling(memory_bank: Array, seg: Array, pooling_type: str) -> Array:
    """first/mean/max/last pooling honoring the seg mask
    (utils/misc.py:23-35)."""
    segf = seg[..., None].astype(memory_bank.dtype)
    masked = memory_bank * segf
    if pooling_type == "mean":
        return masked.sum(1) / segf.sum(1)
    if pooling_type == "last":
        last = seg.astype(jnp.int32).sum(1) - 1
        return masked[jnp.arange(masked.shape[0]), last]
    if pooling_type == "max":
        neg = (segf - 1.0) * jnp.finfo(jnp.float32).max
        return (masked + neg).max(1)
    return memory_bank[:, 0]

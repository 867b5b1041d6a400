"""Tower model composition: Embedding -> Encoder [-> Decoder] -> Target,
with the reference JSON config schema (model_builder.py:1-49,
models/model.py:1-41, and the configs under models/*.json).

`TowerConfig.from_json` reads the exact reference config files
(e.g. models/vit/base-16-224_config.json, models/xlm-roberta/
base_config.json), so a reference user's configs carry over unchanged.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from lr2ppo_tpu.towers.embeddings import CompositeEmbedding
from lr2ppo_tpu.towers.encoders import build_encoder
from lr2ppo_tpu.towers.layers import (
    MultiHeadedAttention,
    PositionwiseFeedForward,
    GatedFeedForward,
    additive_mask_from_seg,
    make_layer_norm,
)
from lr2ppo_tpu.towers.targets import CompositeTarget

Array = jax.Array


@dataclass
class TowerConfig:
    """Reference args namespace, defaulted per tencentpretrain/opts.py."""

    emb_size: int = 768
    hidden_size: int = 768
    feedforward_size: int = 3072
    heads_num: int = 12
    layers_num: int = 12
    # decoder depth (reference transformer_decoder.py:16 reads
    # args.decoder_layers_num — seq2seq configs can set enc/dec depths
    # independently); None -> same depth as the encoder
    decoder_layers_num: Optional[int] = None
    max_seq_length: int = 512
    # speech configs size their position tables by
    # max(max_seq_length, max_audio_frames) (reference
    # pos_embedding.py:12-14, sinusoidalpos_embedding.py:21-22)
    max_audio_frames: int = 6000
    dropout: float = 0.1
    # zero-residual hash dropout (ops/hash_dropout.py) instead of
    # threefry nn.Dropout at every tower dropout site
    hash_dropout: bool = False
    hidden_act: str = "gelu"
    vocab_size: int = 250002          # XLM-R default
    embedding: List[str] = field(default_factory=lambda: ["word", "pos", "seg"])
    encoder: str = "transformer"
    decoder: Optional[str] = None
    # decoder-side embedding kinds (reference model_builder.py builds the
    # tgt embedding from args.tgt_embedding); None -> same as `embedding`.
    # s2t needs this: speech encoder embedding, word decoder embedding.
    tgt_embedding: Optional[List[str]] = None
    # the reference constructs tgt-side embedding modules with the SAME
    # global args (model_builder.py:30-33), so their internal gates
    # ("speech" in args.embedding -> table size/layout, "sinusoidalpos"
    # in args.embedding -> sqrt scale) read the ENCODER-side list even
    # for the decoder. TowerModel threads that global list here when it
    # forks cfg for the tgt embedding; None -> gate on `embedding`.
    gate_embedding: Optional[List[str]] = None
    target: List[str] = field(default_factory=lambda: ["mlm"])
    mask: str = "fully_visible"
    layernorm_positioning: str = "post"
    layernorm: str = "normal"
    feed_forward: str = "dense"
    pooling: str = "first"
    labels_num: int = 2
    attention_head_size: Optional[int] = None
    remove_transformer_bias: bool = False
    remove_attention_scale: bool = False
    remove_embedding_layernorm: bool = False
    factorized_embedding_parameterization: bool = False
    parameter_sharing: bool = False
    relative_position_embedding: bool = False
    relative_attention_buckets_num: int = 32
    has_residual_attention: bool = False
    has_lmtarget_bias: bool = False
    label_smoothing: Optional[float] = None
    bidirectional: bool = False
    kernel_size: int = 3
    block_size: int = 2
    # vision
    image_height: int = 224
    image_width: int = 224
    patch_size: int = 16
    channels_num: int = 3
    # dual/clr
    stream_0: Dict[str, Any] = field(default_factory=dict)
    stream_1: Dict[str, Any] = field(default_factory=dict)
    tie_weights: bool = False
    projection: bool = False
    feature_size: int = 512
    # tpu
    remat: bool = False
    # fused pallas attention on deterministic fully-visible passes
    # (ops/pallas_attention.py) — the feature-precompute hot path
    pallas_attention: bool = False
    # sequence-parallel activation sharding (--sp, Megatron-SP at layer
    # granularity): the residual stream between encoder layers is
    # constrained to P('dp', 'tp') — stored seq-sharded across the tp
    # ranks, so the LayerNorm/dropout/residual regions hold and compute
    # 1/tp of the tokens per chip; XLA inserts the seq all-gather at the
    # attention boundary and the reduce-scatter after the row-parallel
    # projections. Requires tp > 1 and an active mesh; numerics are
    # unchanged (tests/test_sp.py pins tp=2+sp == tp=2).
    seq_parallel: bool = False

    @classmethod
    def from_json(cls, path: str, **overrides) -> "TowerConfig":
        with open(path) as f:
            raw = json.load(f)
        return cls.from_dict({**raw, **overrides})

    @classmethod
    def from_dict(cls, raw: Dict[str, Any]) -> "TowerConfig":
        names = {f.name for f in dataclasses.fields(cls)}
        kw = {k: v for k, v in raw.items() if k in names}
        if isinstance(kw.get("embedding"), str):
            kw["embedding"] = [kw["embedding"]]
        if isinstance(kw.get("tgt_embedding"), str):
            kw["tgt_embedding"] = [kw["tgt_embedding"]]
        if isinstance(kw.get("target"), str):
            kw["target"] = [kw["target"]]
        cfg = cls(**kw)
        if cfg.encoder.startswith("bi"):
            cfg = dataclasses.replace(cfg, bidirectional=True)
        return cfg


class TransformerDecoder(nn.Module):
    """Autoregressive decoder stack (decoders/transformer_decoder.py):
    per layer — causal self-attn, cross-attn over encoder memory, FFN."""

    cfg: TowerConfig
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, memory_bank: Array, emb: Array, src_seg: Array,
                 tgt_seg: Array, deterministic: bool = True) -> Array:
        cfg = self.cfg
        b, s_tgt = tgt_seg.shape
        s_src = src_seg.shape[1]
        mask_dec = additive_mask_from_seg(tgt_seg, "causal")
        vis = (src_seg > 0)[:, None, None, :]
        mask_enc = jnp.where(
            jnp.broadcast_to(vis, (b, 1, s_tgt, s_src)), 0.0, -10000.0)
        dh = cfg.attention_head_size or cfg.hidden_size // cfg.heads_num
        has_bias = not cfg.remove_transformer_bias
        with_scale = not cfg.remove_attention_scale
        ffn_cls = (GatedFeedForward if cfg.feed_forward == "gated"
                   else PositionwiseFeedForward)
        from lr2ppo_tpu.ops.hash_dropout import module_dropout

        drop = lambda x: module_dropout(self, x, cfg.dropout,
                                        deterministic, cfg.hash_dropout)

        # decoder self-attention relative position bias (reference
        # transformer_decoder.py:37-38,66-69: bidirectional=False)
        self_position_bias = None
        if cfg.relative_position_embedding:
            from lr2ppo_tpu.towers.layers import RelativePositionEmbedding

            self_position_bias = RelativePositionEmbedding(
                heads_num=cfg.heads_num, bidirectional=False,
                num_buckets=cfg.relative_attention_buckets_num,
                name="self_pos_emb")(s_tgt, s_tgt)

        hidden = emb
        for i in range(cfg.decoder_layers_num or cfg.layers_num):
            pre = cfg.layernorm_positioning == "pre"
            name = f"transformer_decoder_{i}"
            self_attn = MultiHeadedAttention(
                cfg.hidden_size, cfg.heads_num, dh, cfg.dropout, has_bias,
                with_scale, cfg.hash_dropout, self.dtype,
                name=f"{name}_self_attn")
            ctx_attn = MultiHeadedAttention(
                cfg.hidden_size, cfg.heads_num, dh, cfg.dropout, has_bias,
                with_scale, cfg.hash_dropout, self.dtype,
                name=f"{name}_context_attn")
            ffn = ffn_cls(cfg.hidden_size, cfg.feedforward_size,
                          cfg.hidden_act, has_bias, self.dtype,
                          name=f"{name}_feed_forward")
            ln1 = make_layer_norm(cfg.layernorm, self.dtype,
                                  f"{name}_layer_norm_1")
            ln2 = make_layer_norm(cfg.layernorm, self.dtype,
                                  f"{name}_layer_norm_2")
            ln3 = make_layer_norm(cfg.layernorm, self.dtype,
                                  f"{name}_layer_norm_3")
            if pre:
                q, _ = self_attn(ln1(hidden), ln1(hidden), ln1(hidden),
                                 mask_dec, self_position_bias,
                                 deterministic=deterministic)
                query = drop(q) + hidden
                qn = ln2(query)
                mid, _ = ctx_attn(memory_bank, memory_bank, qn, mask_enc,
                                  deterministic=deterministic)
                mid = drop(mid) + query
                hidden = drop(ffn(ln3(mid))) + mid
            else:
                q, _ = self_attn(hidden, hidden, hidden, mask_dec,
                                 self_position_bias,
                                 deterministic=deterministic)
                qn = ln1(drop(q) + hidden)
                mid, _ = ctx_attn(memory_bank, memory_bank, qn, mask_enc,
                                  deterministic=deterministic)
                mn = ln2(drop(mid) + qn)
                hidden = ln3(drop(ffn(mn)) + mn)
        if cfg.layernorm_positioning == "pre":
            # reference transformer_decoder.py:90-91: final norm for
            # pre-LN stacks before the LM head
            return make_layer_norm(cfg.layernorm, self.dtype,
                                   "layer_norm")(hidden)
        return hidden


class TowerModel(nn.Module):
    """Embedding -> Encoder [-> Decoder] -> Target (models/model.py).

    `encode()` exposes the encoder output for feature extraction (the
    clean_feat.h5 precompute path); `__call__` returns the target's
    loss tuple for pretraining.
    """

    cfg: TowerConfig
    dtype: Optional[jnp.dtype] = None

    def setup(self):
        if self.cfg.encoder == "dual":
            mk = lambda stream: CompositeEmbedding(dataclasses.replace(
                self.cfg, **{k: v for k, v in stream.items() if k in {
                    f.name for f in dataclasses.fields(self.cfg)}}))
            self.embedding_0 = mk(self.cfg.stream_0)
            self.embedding_1 = mk(self.cfg.stream_1)
        else:
            self.embedding = CompositeEmbedding(self.cfg)
        self.encoder = build_encoder(self.cfg, self.dtype)
        if self.cfg.decoder:
            tgt_cfg = (dataclasses.replace(
                self.cfg, embedding=self.cfg.tgt_embedding,
                gate_embedding=self.cfg.embedding)
                if self.cfg.tgt_embedding else self.cfg)
            self.tgt_embedding = CompositeEmbedding(tgt_cfg)
            self.decoder_mod = TransformerDecoder(self.cfg, self.dtype)
        self.target = CompositeTarget(self.cfg, self.dtype)

    def encode(self, src, seg, deterministic: bool = True) -> Array:
        if self.cfg.encoder == "dual":
            emb = (self.embedding_0(src[0], seg[0], deterministic),
                   self.embedding_1(src[1], seg[1], deterministic))
        else:
            emb = self.embedding(src, seg, deterministic)
        return self.encoder(emb, seg, deterministic)

    def embed_only(self, src, seg, deterministic: bool = True) -> Array:
        """Embedding output WITHOUT the encoder — the pipeline-parallel
        path (parallel/pipeline.py) runs the encoder stack itself as a
        GPipe schedule; applying this method touches no encoder params,
        so it binds against a tree whose layer stack was packed out."""
        return self.embedding(src, seg, deterministic)

    def target_only(self, memory, tgt, seg):
        """Target head over a precomputed encoder output (the
        pipeline-parallel companion of embed_only)."""
        return self.target(memory, tgt, seg)

    def __call__(self, src, tgt, seg, tgt_in=None, tgt_seg=None,
                 deterministic: bool = True):
        memory = self.encode(src, seg, deterministic)
        if self.cfg.decoder:
            emb = self.tgt_embedding(tgt_in, tgt_seg, deterministic)
            memory = self.decoder_mod(memory, emb, seg, tgt_seg,
                                      deterministic)
            seg = tgt_seg
        return self.target(memory, tgt, seg)


def build_model(cfg: TowerConfig, dtype=None) -> TowerModel:
    return TowerModel(cfg, dtype)

"""Encoder zoo (reference tencentpretrain/encoders/): the transformer
encoder with all three mask modes + pre/post-LN + parameter sharing +
relative position bias, the RNN/LSTM/GRU family, the gated CNN, and the
dual (CLIP-style) encoder.

TPU-native choices:
  * activation rematerialisation via `jax.checkpoint` replaces the
    reference's deepspeed activation checkpointing
    (transformer_encoder.py:101-123);
  * RNN cells run under `jax.lax.scan` (compiled once, no Python loop);
  * the gated CNN's causal conv is a reshape + matmul over unfolded
    windows (MXU-friendly; stride-1 same-height conv == banded matmul).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from lr2ppo_tpu.models.layers import TorchDense
from lr2ppo_tpu.ops.hash_dropout import module_dropout
from lr2ppo_tpu.towers.layers import (
    RelativePositionEmbedding,
    TransformerLayer,
    additive_mask_from_seg,
    make_layer_norm,
)

Array = jax.Array


class TransformerEncoder(nn.Module):
    """transformer_encoder.py:7-138 (BERT/ViT-style stack)."""

    cfg: "TowerConfig"  # noqa: F821
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, emb: Array, seg: Array,
                 deterministic: bool = True) -> Array:
        cfg = self.cfg
        if cfg.factorized_embedding_parameterization:
            emb = TorchDense(cfg.hidden_size, dtype=self.dtype,
                             name="linear")(emb)
        mask = additive_mask_from_seg(seg, cfg.mask)

        position_bias = None
        if cfg.relative_position_embedding:
            s = emb.shape[1]
            position_bias = RelativePositionEmbedding(
                heads_num=cfg.heads_num, bidirectional=True,
                num_buckets=cfg.relative_attention_buckets_num,
                name="relative_pos_emb")(s, s)

        # cfg.remat: flax's LIFTED transform (nn.remat), not raw
        # jax.checkpoint around a bound-module closure — the raw form
        # leaks scope-cached param tracers and crashes every apply().
        # static_argnums counts self as 0; deterministic (a bool that
        # gates python control flow in the layer) is call-arg 5.
        layer_cls = (nn.remat(
            TransformerLayer, static_argnums=(5,),
            policy=jax.checkpoint_policies.nothing_saveable)
            if cfg.remat else TransformerLayer)

        def layer(name: str) -> TransformerLayer:
            return layer_cls(
                hidden_size=cfg.hidden_size, heads_num=cfg.heads_num,
                feedforward_size=cfg.feedforward_size, dropout=cfg.dropout,
                hidden_act=cfg.hidden_act,
                layernorm_positioning=cfg.layernorm_positioning,
                layernorm=cfg.layernorm, feed_forward=cfg.feed_forward,
                attention_head_size=cfg.attention_head_size,
                has_bias=not cfg.remove_transformer_bias,
                with_scale=not cfg.remove_attention_scale,
                hash_dropout=cfg.hash_dropout,
                dtype=self.dtype, name=name)

        # key-only additive bias unlocks the fused pallas attention path
        # (layers.MultiHeadedAttention): deterministic fully_visible
        # passes with no T5 bias / residual-attention chaining
        key_bias = None
        if (getattr(cfg, "pallas_attention", False)
                and cfg.mask == "fully_visible" and deterministic
                and not cfg.has_residual_attention
                and not cfg.relative_position_embedding):
            key_bias = jnp.where(seg > 0, 0.0, -10000.0).astype(jnp.float32)

        # sequence-parallel residual stream (TowerConfig.seq_parallel):
        # constrain the inter-layer activations to P('dp','tp') so they
        # are STORED seq-sharded across tp and the LN/dropout/residual
        # regions compute 1/tp of the tokens per chip; GSPMD inserts the
        # seq all-gather at the attention boundary. Identity when sp is
        # off or when no dp×tp mesh is in context (e.g. init/eval
        # outside the training mesh, or the GPipe ('dp','pp') mesh,
        # where the axes don't exist). Bare-PartitionSpec constraints
        # resolve under BOTH `jax.set_mesh` (the production sp path,
        # train/pretrain.py:_mesh_ctx) and the legacy bare `with mesh:`
        # context — only the getters differ: get_abstract_mesh() is
        # empty under the legacy context, so check the thread-local
        # physical mesh too or an sp tower traced there would silently
        # lose its placement (r4 advisor).
        def sp(h):
            if not getattr(cfg, "seq_parallel", False):
                return h
            from jax.sharding import PartitionSpec as P

            cm = jax.sharding.get_abstract_mesh()
            if cm.empty:
                from jax._src.mesh import thread_resources

                cm = thread_resources.env.physical_mesh
            if cm.empty or not {"dp", "tp"} <= set(cm.axis_names):
                return h
            return jax.lax.with_sharding_constraint(h, P("dp", "tp"))

        hidden, prev_attn = sp(emb), None
        shared = layer("transformer") if cfg.parameter_sharing else None
        for i in range(cfg.layers_num):
            blk = shared if shared is not None else layer(f"transformer_{i}")

            hidden, prev_attn = blk(hidden, mask, position_bias,
                                    prev_attn, deterministic, key_bias)
            hidden = sp(hidden)
            if not cfg.has_residual_attention:
                prev_attn = None

        if cfg.layernorm_positioning == "pre":
            hidden = make_layer_norm(cfg.layernorm, self.dtype,
                                     "layer_norm")(hidden)
        return hidden


# ---------------------------------------------------------------------------
# RNN family — torch nn.RNN/LSTM/GRU-compatible cells under lax.scan
# ---------------------------------------------------------------------------


class _RecurrentEncoder(nn.Module):
    """Shared scaffolding (rnn_encoder.py:6-93): stacked (bi)directional
    layers, inter-layer dropout, output dropout. Weights are stored per
    layer/direction with torch's naming (weight_ih_l{k}[_reverse], ...)."""

    cell: str  # 'rnn' | 'lstm' | 'gru'
    cfg: "TowerConfig"  # noqa: F821
    dtype: Optional[jnp.dtype] = None

    def _gates(self) -> int:
        return {"rnn": 1, "lstm": 4, "gru": 3}[self.cell]

    def _step(self, wi, wh, bi, bh, x, carry):
        h, c = carry
        if self.cell == "rnn":
            nh = jnp.tanh(x @ wi.T + bi + h @ wh.T + bh)
            return nh, c
        if self.cell == "lstm":
            z = x @ wi.T + bi + h @ wh.T + bh
            i, f, g, o = jnp.split(z, 4, axis=-1)
            # torch order: input, forget, cell, output
            nc = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
            nh = jax.nn.sigmoid(o) * jnp.tanh(nc)
            return nh, nc
        # gru needs the input and hidden halves separately (the new gate
        # resets only the hidden half), so no summed z here
        # (torch gate order: reset, update, new; new-gate bias split)
        zr = x @ wi.T + bi
        zh = h @ wh.T + bh
        ir, iz, in_ = jnp.split(zr, 3, axis=-1)
        hr, hz, hn = jnp.split(zh, 3, axis=-1)
        r = jax.nn.sigmoid(ir + hr)
        u = jax.nn.sigmoid(iz + hz)
        n = jnp.tanh(in_ + r * hn)
        nh = (1 - u) * n + u * h
        return nh, nh

    @nn.compact
    def __call__(self, emb: Array, seg: Array,
                 deterministic: bool = True) -> Array:
        cfg = self.cfg
        bidir = cfg.bidirectional
        hs = cfg.hidden_size // 2 if bidir else cfg.hidden_size
        g = self._gates()
        b, s, _ = emb.shape
        x = emb
        for k in range(cfg.layers_num):
            outs = []
            for direction in (range(2) if bidir else range(1)):
                sfx = f"l{k}" + ("_reverse" if direction else "")
                in_dim = x.shape[-1]
                # torch nn.RNN/LSTM/GRU init all weights AND biases
                # U(-k, k), k = 1/sqrt(hidden); jax.nn.initializers.uniform
                # is [0, k) only, which biases from-scratch towers
                k_init = 1.0 / hs ** 0.5

                def sym_uniform(key, shape, dtype, k=k_init):
                    return jax.random.uniform(key, shape, dtype, -k, k)

                wi = self.param(f"weight_ih_{sfx}", sym_uniform,
                                (g * hs, in_dim), jnp.float32)
                wh = self.param(f"weight_hh_{sfx}", sym_uniform,
                                (g * hs, hs), jnp.float32)
                bi = self.param(f"bias_ih_{sfx}", sym_uniform,
                                (g * hs,), jnp.float32)
                bh = self.param(f"bias_hh_{sfx}", sym_uniform,
                                (g * hs,), jnp.float32)
                seq = x[:, ::-1] if direction else x

                def scan_fn(carry, xt, wi=wi, wh=wh, bi=bi, bh=bh):
                    nh, nc = self._step(wi, wh, bi, bh, xt, carry)
                    return (nh, nc), nh

                init = (jnp.zeros((b, hs), x.dtype),
                        jnp.zeros((b, hs), x.dtype))
                _, ys = jax.lax.scan(scan_fn, init,
                                     jnp.swapaxes(seq, 0, 1))
                ys = jnp.swapaxes(ys, 0, 1)
                outs.append(ys[:, ::-1] if direction else ys)
            x = jnp.concatenate(outs, axis=-1) if bidir else outs[0]
            if k < cfg.layers_num - 1:
                x = module_dropout(self, x, cfg.dropout, deterministic,
                                   cfg.hash_dropout)
        return module_dropout(self, x, cfg.dropout, deterministic,
                              cfg.hash_dropout)


def RnnEncoder(cfg, dtype=None, name=None):
    return _RecurrentEncoder("rnn", cfg, dtype, name=name)


def LstmEncoder(cfg, dtype=None, name=None):
    return _RecurrentEncoder("lstm", cfg, dtype, name=name)


def GruEncoder(cfg, dtype=None, name=None):
    return _RecurrentEncoder("gru", cfg, dtype, name=name)


class _BiStackEncoder(nn.Module):
    """The reference Bi{rnn,lstm,gru}Encoder (rnn_encoder.py:82-160) is
    NOT torch bidirectional=True: it runs two independent full
    multi-layer unidirectional stacks — `rnn_forward` on the sequence,
    `rnn_backward` on the flipped sequence — and concatenates only at
    the END (torch-bidirectional concatenates per layer, so layer k+1
    sees both directions of layer k; these differ for layers_num > 1).
    Submodule names match the reference attributes so checkpoints
    import directly."""

    cell: str
    cfg: "TowerConfig"  # noqa: F821
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, emb: Array, seg: Array,
                 deterministic: bool = True) -> Array:
        import dataclasses

        assert self.cfg.hidden_size % 2 == 0, (
            "bi-stack encoders need an even hidden_size")
        sub = dataclasses.replace(self.cfg, bidirectional=False,
                                  hidden_size=self.cfg.hidden_size // 2)
        of = _RecurrentEncoder(self.cell, sub, self.dtype,
                               name="rnn_forward")(emb, seg, deterministic)
        ob = _RecurrentEncoder(self.cell, sub, self.dtype,
                               name="rnn_backward")(emb[:, ::-1], seg,
                                                    deterministic)[:, ::-1]
        return jnp.concatenate([of, ob], axis=-1)


class GatedcnnEncoder(nn.Module):
    """Gated CNN (cnn_encoder.py:4-94): causal width-k convolutions with
    GLU gating and block-residuals, as unfold + matmul."""

    cfg: "TowerConfig"  # noqa: F821
    dtype: Optional[jnp.dtype] = None

    def _causal_windows(self, x: Array, k: int) -> Array:
        """(B, S, D) -> (B, S, k*D): window ending at each position."""
        b, s, d = x.shape
        pad = jnp.zeros((b, k - 1, d), x.dtype)
        xp = jnp.concatenate([pad, x], axis=1)
        cols = [xp[:, i: i + s] for i in range(k)]
        return jnp.concatenate(cols, axis=-1)

    @nn.compact
    def __call__(self, emb: Array, seg: Array,
                 deterministic: bool = True) -> Array:
        cfg = self.cfg
        k, hs = cfg.kernel_size, cfg.hidden_size

        def conv(name, x, in_dim):
            w = self.param(f"{name}_w", jax.nn.initializers.normal(0.02),
                           (k * in_dim, hs), jnp.float32)
            b = self.param(f"{name}_b", jax.nn.initializers.normal(1.0),
                           (hs,), jnp.float32)
            return jnp.dot(self._causal_windows(x, k), w.astype(x.dtype),
                           preferred_element_type=x.dtype) + b

        hidden = conv("conv_stem", emb, cfg.emb_size)
        gate = conv("gate_stem", emb, cfg.emb_size)
        hidden = hidden * jax.nn.sigmoid(gate)
        res_input = hidden
        for i in range(cfg.layers_num - 1):
            # distinct names from the stem: with emb_size == hidden_size a
            # collision would silently SHARE weights between layers
            h = conv(f"conv_layer_{i}", hidden, hs)
            gt = conv(f"gate_layer_{i}", hidden, hs)
            hidden = h * jax.nn.sigmoid(gt)
            if (i + 1) % cfg.block_size == 0:
                hidden = hidden + res_input
                res_input = hidden
        return hidden


class DualEncoder(nn.Module):
    """Two-stream (CLIP/SBERT-style) encoder (dual_encoder.py:6-47)."""

    cfg0: "TowerConfig"  # noqa: F821
    cfg1: "TowerConfig"  # noqa: F821
    tie_weights: bool = False
    dtype: Optional[jnp.dtype] = None

    def setup(self):
        self.encoder_0 = build_encoder(self.cfg0, self.dtype)
        if self.tie_weights:
            self.encoder_1 = self.encoder_0
        else:
            self.encoder_1 = build_encoder(self.cfg1, self.dtype)

    def __call__(self, emb: Tuple[Array, Array], seg: Tuple[Array, Array],
                 deterministic: bool = True):
        return (self.encoder_0(emb[0], seg[0], deterministic),
                self.encoder_1(emb[1], seg[1], deterministic))


def build_encoder(cfg, dtype=None, name=None):
    if cfg.encoder == "dual":
        import dataclasses

        sub = lambda stream: dataclasses.replace(
            cfg, **{k: v for k, v in stream.items()
                    if k in {f.name for f in dataclasses.fields(cfg)}})
        return DualEncoder(sub(cfg.stream_0), sub(cfg.stream_1),
                           cfg.tie_weights, dtype, name=name)
    kinds = {
        "transformer": lambda: TransformerEncoder(cfg, dtype, name=name),
        "rnn": lambda: RnnEncoder(cfg, dtype, name=name),
        "lstm": lambda: LstmEncoder(cfg, dtype, name=name),
        "gru": lambda: GruEncoder(cfg, dtype, name=name),
        "birnn": lambda: _BiStackEncoder("rnn", cfg, dtype, name=name),
        "bilstm": lambda: _BiStackEncoder("lstm", cfg, dtype, name=name),
        "bigru": lambda: _BiStackEncoder("gru", cfg, dtype, name=name),
        "gatedcnn": lambda: GatedcnnEncoder(cfg, dtype, name=name),
    }
    return kinds[cfg.encoder]()

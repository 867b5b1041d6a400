"""Embedding zoo (reference tencentpretrain/embeddings/): word, pos, seg,
sinusoidal, patch (ViT), word_patch, dual — composed additively with an
optional LayerNorm + dropout (embedding.py:19-34).

TPU note: the ViT patchify is a reshape + one big matmul instead of the
reference's Conv2d (patch_embedding.py:19) — with stride == kernel they
are the same linear map, and the matmul form tiles directly onto the MXU.
The conv weight (E, C, P, P) imports as a (C*P*P, E) kernel.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from lr2ppo_tpu.towers.layers import RefLayerNorm

Array = jax.Array


class WordEmbedding(nn.Module):
    """Token lookup; x sqrt(emb) under sinusoidal pos (word_embedding.py)."""

    vocab_size: int
    emb_size: int
    sinusoidalpos: bool = False

    @nn.compact
    def __call__(self, src: Array, seg: Array) -> Array:
        table = self.param("embedding", jax.nn.initializers.normal(1.0),
                           (self.vocab_size, self.emb_size), jnp.float32)
        emb = table[src]
        if self.sinusoidalpos:
            emb = emb * math.sqrt(self.emb_size)
        return emb


class PosEmbedding(nn.Module):
    """Learned absolute positions (pos_embedding.py)."""

    max_seq_length: int
    emb_size: int

    @nn.compact
    def __call__(self, src: Array, seg: Array) -> Array:
        table = self.param("embedding", jax.nn.initializers.normal(1.0),
                           (self.max_seq_length, self.emb_size), jnp.float32)
        s = seg.shape[1]
        return jnp.broadcast_to(table[:s][None],
                                (seg.shape[0], s, self.emb_size))


class SegEmbedding(nn.Module):
    """3-way segment lookup (seg_embedding.py)."""

    emb_size: int

    @nn.compact
    def __call__(self, src: Array, seg: Array) -> Array:
        table = self.param("embedding", jax.nn.initializers.normal(1.0),
                           (3, self.emb_size), jnp.float32)
        return table[seg]


class SinusoidalposEmbedding(nn.Module):
    """Fixed sin/cos table, shifted by 2 and masked to the unpadded
    prefix (sinusoidalpos_embedding.py:26-68). Two layouts, matching
    the reference's arrange_sincos_cross switch (:21-41): interleaved
    sin/cos ("Attention Is All You Need") for text, concatenated
    [sin || cos] (huggingface/tensor2tensor style) whenever 'speech' is
    in the embedding list — a speech checkpoint's channels are permuted
    relative to the interleaved layout."""

    max_seq_length: int
    emb_size: int
    interleaved: bool = True   # reference arrange_sincos_cross

    def _table(self) -> jnp.ndarray:
        # +2 rows: __call__ reads rows [2, s+2) — the reference builds
        # only max_seq_length rows and CRASHES on sequences within 2 of
        # the limit (sinusoidalpos_embedding.py:30-36,67); sizing the
        # table for the shift is the only deviation
        rows = self.max_seq_length + 2
        half = self.emb_size // 2
        value = math.log(10000.0) / (half - 1)
        half_exp = jnp.exp(jnp.arange(half, dtype=jnp.float32) * -value)
        half_mat = (jnp.arange(rows, dtype=jnp.float32)[:, None]
                    * half_exp[None, :])
        if self.interleaved:
            emb = jnp.zeros((rows, 2 * half), jnp.float32)
            emb = emb.at[:, 0::2].set(jnp.sin(half_mat))
            emb = emb.at[:, 1::2].set(jnp.cos(half_mat))
        else:
            emb = jnp.concatenate(
                [jnp.sin(half_mat), jnp.cos(half_mat)], axis=1)
        if self.emb_size % 2 == 1:
            # odd emb_size zero-pads the last column
            # (sinusoidalpos_embedding.py:42-44)
            emb = jnp.concatenate(
                [emb, jnp.zeros((rows, 1), jnp.float32)], axis=1)
        return emb

    @nn.compact
    def __call__(self, src: Array, seg: Array) -> Array:
        b, s = seg.shape
        table = self._table()
        # seg.sum, not (seg>0).sum: faithful to the reference's
        # no_pad_num (sinusoidalpos_embedding.py:59), which double-counts
        # segment-2 tokens by design
        no_pad = seg.sum(axis=-1)                     # (B,)
        pos = jnp.arange(s)[None, :]                  # (1, S)
        emb = table[2: s + 2][None]                   # row i -> table[i+2]
        return jnp.where((pos < no_pad[:, None])[..., None], emb, 0.0)


class PatchEmbedding(nn.Module):
    """ViT patchify: (B, C, H, W) -> cls ++ patch tokens
    (patch_embedding.py:5-31). Implemented as reshape + matmul."""

    emb_size: int
    image_height: int = 224
    image_width: int = 224
    patch_size: int = 16
    channels_num: int = 3

    @nn.compact
    def __call__(self, src: Array, seg: Array) -> Array:
        p, c, e = self.patch_size, self.channels_num, self.emb_size
        b, _, h, w = src.shape
        assert h == self.image_height and w == self.image_width, (
            f"input {h}x{w} != model {self.image_height}x{self.image_width}")
        gh, gw = h // p, w // p
        # kernel layout matches torch Conv2d(C,E,P,P) flattened to
        # (C*P*P, E) with (c, ph, pw) ordering, so imports are transposes
        kernel = self.param("projection", jax.nn.initializers.normal(0.02),
                            (c * p * p, e), jnp.float32)
        # normal, not zeros: the reference trainer re-inits every
        # non-gamma/beta param with normal(0, 0.02) before pretraining,
        # and an exactly-zero row NaNs the RefLayerNorm std backward
        cls_emb = self.param("cls_emb", jax.nn.initializers.normal(0.02),
                             (1, 1, e), jnp.float32)
        x = src.reshape(b, c, gh, p, gw, p)
        x = jnp.transpose(x, (0, 2, 4, 1, 3, 5)).reshape(b, gh * gw,
                                                         c * p * p)
        tokens = jnp.dot(x, kernel.astype(x.dtype),
                         preferred_element_type=x.dtype)
        cls_tok = jnp.broadcast_to(cls_emb.astype(x.dtype), (b, 1, e))
        return jnp.concatenate([cls_tok, tokens], axis=1)


class WordPatchEmbedding(nn.Module):
    """Text tokens ++ image patches (word_patch_embedding.py): src is a
    (tokens, pixels) tuple."""

    vocab_size: int
    emb_size: int
    image_height: int = 224
    image_width: int = 224
    patch_size: int = 16
    channels_num: int = 3

    @nn.compact
    def __call__(self, src, seg: Array) -> Array:
        tokens, pixels = src
        word = WordEmbedding(self.vocab_size, self.emb_size,
                             name="word")(tokens, seg)
        patch = PatchEmbedding(self.emb_size, self.image_height,
                               self.image_width, self.patch_size,
                               self.channels_num, name="patch")(pixels, seg)
        return jnp.concatenate([word, patch], axis=1)


class MaskedPatchEmbedding(nn.Module):
    """BEiT masked patchify (masked_patch_embedding.py:7-38): cls ++
    patches, masked positions overwritten with a learned mask token.
    `src` is (pixels, mask) with mask (B, M) int patch indices into the
    cls-prefixed sequence; fixed M keeps shapes static under jit."""

    emb_size: int
    image_height: int = 224
    image_width: int = 224
    patch_size: int = 16
    channels_num: int = 3

    @nn.compact
    def __call__(self, src, seg: Array) -> Array:
        pixels, mask = src
        emb = PatchEmbedding(self.emb_size, self.image_height,
                             self.image_width, self.patch_size,
                             self.channels_num, name="patch")(pixels, seg)
        mask_emb = self.param("mask_emb", jax.nn.initializers.normal(0.02),
                              (1, self.emb_size), jnp.float32)
        b, s, e = emb.shape
        onehot = jax.nn.one_hot(mask, s, dtype=emb.dtype)   # (B, M, S)
        # clip to 0/1: the reference scatter_ overwrite is idempotent,
        # so a duplicated mask index (e.g. padding a short mask list by
        # repeating an entry) must still yield exactly mask_emb — a raw
        # occurrence count would negate-and-double those positions
        hit = jnp.minimum(onehot.sum(1), 1.0)[..., None]    # (B, S, 1)
        return emb * (1 - hit) + hit * mask_emb.astype(emb.dtype)


class SpeechEmbedding(nn.Module):
    """Conv1d temporal subsampler (speech_embedding.py:6-27 head): a
    stack of stride-2 width-k 1-D convolutions with GLU gating, expressed
    as unfold + matmul. Optional sqrt(emb) scaling under sinusoidal."""

    emb_size: int
    conv_layers: int = 2
    kernel_size: int = 5
    in_dim: int = 80          # filterbank features
    sinusoidalpos: bool = False

    @nn.compact
    def __call__(self, src: Array, seg: Array) -> Array:
        x = src  # (B, frames, n_mels)
        dim = x.shape[-1]  # feature width from the data, not a config pin
        for i in range(self.conv_layers):
            k, stride, out = self.kernel_size, 2, 2 * self.emb_size
            b, s, _ = x.shape
            pad = (k - 1) // 2
            xp = jnp.pad(x, ((0, 0), (pad, k - 1 - pad), (0, 0)))
            starts = range(0, s, stride)
            windows = jnp.stack([xp[:, st: st + k] for st in starts],
                                axis=1)
            w = self.param(f"conv_{i}", jax.nn.initializers.normal(0.02),
                           (k * dim, out), jnp.float32)
            bconv = self.param(f"conv_{i}_bias", jax.nn.initializers.zeros,
                               (out,), jnp.float32)
            y = windows.reshape(b, len(starts), k * dim) @ w + bconv
            a, g = jnp.split(y, 2, axis=-1)
            x = a * jax.nn.sigmoid(g)                     # GLU
            dim = self.emb_size
        if self.sinusoidalpos:
            x = x * math.sqrt(self.emb_size)
        return x


def _gates(cfg) -> Sequence[str]:
    """The embedding list the reference's constructor gates read: the
    GLOBAL args.embedding (model_builder.py:30-33 constructs tgt-side
    modules with the same args), threaded through cfg.gate_embedding
    when TowerModel forks cfg for the decoder side. Falls back to the
    per-side list (encoder side and dual streams, where the reference's
    per-stream args make the two coincide)."""
    return getattr(cfg, "gate_embedding", None) or cfg.embedding


def _pos_rows(cfg) -> int:
    """Speech configs size position tables by the (sub-sampled) audio
    frame budget, not just text length (reference pos_embedding.py:12-14,
    sinusoidalpos_embedding.py:21-22)."""
    if "speech" in _gates(cfg):
        return max(cfg.max_seq_length, getattr(cfg, "max_audio_frames", 0))
    return cfg.max_seq_length


_EMB_KINDS = {
    "word": lambda cfg, name: WordEmbedding(
        cfg.vocab_size, cfg.emb_size, "sinusoidalpos" in _gates(cfg),
        name=name),
    "pos": lambda cfg, name: PosEmbedding(_pos_rows(cfg), cfg.emb_size,
                                          name=name),
    "seg": lambda cfg, name: SegEmbedding(cfg.emb_size, name=name),
    "sinusoidalpos": lambda cfg, name: SinusoidalposEmbedding(
        _pos_rows(cfg), cfg.emb_size,
        interleaved="speech" not in _gates(cfg), name=name),
    "patch": lambda cfg, name: PatchEmbedding(
        cfg.emb_size, cfg.image_height, cfg.image_width, cfg.patch_size,
        cfg.channels_num, name=name),
    "word_patch": lambda cfg, name: WordPatchEmbedding(
        cfg.vocab_size, cfg.emb_size, cfg.image_height, cfg.image_width,
        cfg.patch_size, cfg.channels_num, name=name),
    "masked_patch": lambda cfg, name: MaskedPatchEmbedding(
        cfg.emb_size, cfg.image_height, cfg.image_width, cfg.patch_size,
        cfg.channels_num, name=name),
    "speech": lambda cfg, name: SpeechEmbedding(
        cfg.emb_size, sinusoidalpos="sinusoidalpos" in _gates(cfg),
        name=name),
}


class CompositeEmbedding(nn.Module):
    """Additive composition + optional LN + dropout (embedding.py:19-34).
    Sub-embeddings are named by kind so checkpoint keys line up."""

    cfg: "TowerConfig"  # noqa: F821 — forward ref, defined in model.py

    @nn.compact
    def __call__(self, src, seg: Array,
                 deterministic: bool = True) -> Array:
        cfg = self.cfg
        emb = None
        for kind in cfg.embedding:
            cur = _EMB_KINDS[kind](cfg, kind)(src, seg)
            emb = cur if emb is None else emb + cur
        if not cfg.remove_embedding_layernorm:
            emb = RefLayerNorm(name="layer_norm")(emb)
        from lr2ppo_tpu.ops.hash_dropout import module_dropout

        return module_dropout(self, emb, cfg.dropout, deterministic,
                              cfg.hash_dropout)

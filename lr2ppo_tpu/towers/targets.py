"""Pretraining target zoo (reference tencentpretrain/targets/): mlm, lm,
bilm, cls, sp, clr (CLIP-style contrastive), and the composite Target.

TPU-native: the reference gathers the masked positions with a dynamic
boolean index (mlm_target.py:43-45) — under jit we instead weight every
position by its mask and normalize by the mask count, which computes the
same mean NLL with static shapes. The clr target's cross-rank all_gather
(clr_target.py:53-69) becomes `jax.lax.all_gather` over the dp axis when
run inside shard_map/pjit; single-process calls skip it.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from lr2ppo_tpu.models.layers import TorchDense
from lr2ppo_tpu.towers.layers import ACTS, RefLayerNorm, pooling

Array = jax.Array


def _masked_nll(log_probs: Array, tgt: Array, mask: Array):
    """mean NLL + correct count over positions where mask is True."""
    nll = -jnp.take_along_axis(log_probs, tgt[..., None], axis=-1)[..., 0]
    m = mask.astype(jnp.float32)
    denom = m.sum() + 1e-6
    loss = (nll * m).sum() / denom
    correct = ((log_probs.argmax(-1) == tgt) & mask).sum()
    return loss, correct.astype(jnp.float32), denom


class MlmTarget(nn.Module):
    """Masked LM head: linear -> act -> LN -> vocab (mlm_target.py:6-55)."""

    cfg: "TowerConfig"  # noqa: F821
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, memory_bank: Array, tgt: Array, seg: Array):
        cfg = self.cfg
        act = ACTS[cfg.hidden_act]
        width = (cfg.emb_size if cfg.factorized_embedding_parameterization
                 else cfg.hidden_size)
        x = act(TorchDense(width, dtype=self.dtype,
                           name="linear_1")(memory_bank))
        x = RefLayerNorm(name="layer_norm")(x)
        logits = TorchDense(cfg.vocab_size, dtype=self.dtype,
                            name="linear_2")(x)
        log_probs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        return _masked_nll(log_probs, tgt, tgt > 0)


class LmTarget(nn.Module):
    """Causal LM head with optional label smoothing (lm_target.py:7-70)."""

    cfg: "TowerConfig"  # noqa: F821
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, memory_bank: Array, tgt: Array, seg: Array):
        cfg = self.cfg
        logits = TorchDense(cfg.vocab_size, use_bias=cfg.has_lmtarget_bias,
                            dtype=self.dtype, name="output_layer")(memory_bank)
        log_probs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        mask = tgt > 0
        if not cfg.label_smoothing:
            return _masked_nll(log_probs, tgt, mask)
        eps = cfg.label_smoothing
        eps_i = eps / (cfg.vocab_size - 1)
        nll = -jnp.take_along_axis(log_probs, tgt[..., None], -1)[..., 0]
        smooth = -log_probs.sum(-1)
        m = mask.astype(jnp.float32)
        denom = m.sum() + 1e-6
        nll_mean = (nll * m).sum() / denom
        smooth_mean = (smooth * m).sum() / denom
        loss = (1.0 - eps - eps_i) * nll_mean + eps_i * smooth_mean
        correct = ((log_probs.argmax(-1) == tgt) & mask).sum()
        return loss, correct.astype(jnp.float32), denom


class BilmTarget(nn.Module):
    """Bidirectional LM: separate forward/backward vocab heads over the
    split hidden state (bilm_target.py)."""

    cfg: "TowerConfig"  # noqa: F821
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, memory_bank: Array, tgt: Tuple[Array, Array],
                 seg: Array):
        cfg = self.cfg
        tgt_fwd, tgt_bwd = tgt
        half = memory_bank.shape[-1] // 2
        lp_f = jax.nn.log_softmax(TorchDense(
            cfg.vocab_size, dtype=self.dtype, name="output_layer_forward")(
            memory_bank[..., :half]).astype(jnp.float32), axis=-1)
        lp_b = jax.nn.log_softmax(TorchDense(
            cfg.vocab_size, dtype=self.dtype, name="output_layer_backward")(
            memory_bank[..., half:]).astype(jnp.float32), axis=-1)
        lf, cf, df = _masked_nll(lp_f, tgt_fwd, tgt_fwd > 0)
        lb, cb, db = _masked_nll(lp_b, tgt_bwd, tgt_bwd > 0)
        return lf + lb, cf + cb, df + db


class ClsTarget(nn.Module):
    """Sequence classification: pool -> tanh(linear) -> labels
    (cls_target.py:6-39)."""

    cfg: "TowerConfig"  # noqa: F821
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, memory_bank: Array, tgt: Array, seg: Array):
        cfg = self.cfg
        x = pooling(memory_bank, seg, cfg.pooling)
        x = jnp.tanh(TorchDense(cfg.hidden_size, dtype=self.dtype,
                                name="linear_1")(x))
        logits = TorchDense(cfg.labels_num, dtype=self.dtype,
                            name="linear_2")(x)
        log_probs = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
        loss = -jnp.take_along_axis(log_probs, tgt[:, None], -1).mean()
        correct = (log_probs.argmax(-1) == tgt).sum().astype(jnp.float32)
        return loss, correct


class SpTarget(nn.Module):
    """Sentence(-order) prediction on the [CLS] position (sp_target.py)."""

    cfg: "TowerConfig"  # noqa: F821
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, memory_bank: Array, tgt: Array, seg: Array):
        x = jnp.tanh(TorchDense(self.cfg.hidden_size, dtype=self.dtype,
                                name="linear_1")(memory_bank[:, 0]))
        logits = TorchDense(2, dtype=self.dtype, name="linear_2")(x)
        log_probs = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
        loss = -jnp.take_along_axis(log_probs, tgt[:, None], -1).mean()
        correct = (log_probs.argmax(-1) == tgt).sum().astype(jnp.float32)
        return loss, correct


class ClrTarget(nn.Module):
    """CLIP-style symmetric contrastive target (clr_target.py:8-84).

    `axis_name` set -> features all_gather over that mesh axis before the
    similarity matrix (the reference's cross-rank allgather with local
    gradients; here XLA differentiates through all_gather directly, which
    is strictly more correct than the reference's stop-gradient splice).
    """

    # field order (cfg, dtype, ...) matches every other target class —
    # CompositeTarget constructs targets positionally as (cfg, dtype);
    # axis_name is only for shard_map/pmap contexts (under pjit the
    # batch-sharded similarity matrix is already globally contrastive
    # via GSPMD's own collectives)
    cfg: "TowerConfig"  # noqa: F821
    dtype: Optional[jnp.dtype] = None
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, memory_bank: Tuple[Array, Array],
                 tgt: Array, seg: Tuple[Array, Array]):
        cfg = self.cfg
        emb0, emb1 = memory_bank
        # overlay each stream dict on the base config (the same rule
        # build_encoder/TowerModel.setup apply) — a partial stream dict
        # that omits 'pooling'/'hidden_size' inherits the base value
        # instead of raising KeyError here while working elsewhere
        s0 = lambda k: cfg.stream_0.get(k, getattr(cfg, k))
        s1 = lambda k: cfg.stream_1.get(k, getattr(cfg, k))
        f0 = pooling(emb0, seg[0], s0("pooling"))
        f1 = pooling(emb1, seg[1], s1("pooling"))
        if cfg.projection:
            p0 = self.param("encoder_0_projection",
                            jax.nn.initializers.normal(1.0),
                            (s0("hidden_size"), cfg.feature_size),
                            jnp.float32)
            p1 = self.param("encoder_1_projection",
                            jax.nn.initializers.normal(1.0),
                            (s1("hidden_size"), cfg.feature_size),
                            jnp.float32)
            f0, f1 = f0 @ p0, f1 @ p1
        f0 = f0 / jnp.linalg.norm(f0, axis=-1, keepdims=True)
        f1 = f1 / jnp.linalg.norm(f1, axis=-1, keepdims=True)
        if self.axis_name is not None:
            f0 = jax.lax.all_gather(f0, self.axis_name, tiled=True)
            f1 = jax.lax.all_gather(f1, self.axis_name, tiled=True)
        scale = jnp.exp(self.param(
            "logit_scale",
            lambda k, s: jnp.asarray(jnp.log(1 / 0.07), jnp.float32), ()))
        logits0 = scale * f0 @ f1.T
        logits1 = scale * f1 @ f0.T
        n = f0.shape[0]
        labels = jnp.arange(n)
        lp0 = jax.nn.log_softmax(logits0, -1)
        lp1 = jax.nn.log_softmax(logits1, -1)
        loss = -(jnp.take_along_axis(lp0, labels[:, None], -1).mean()
                 + jnp.take_along_axis(lp1, labels[:, None], -1).mean()) / 2
        # symmetric retrieval accuracy with ITS OWN denominator: after a
        # gather n is the GLOBAL batch, and the trainer's local row
        # count would inflate acc by the dp factor
        correct = ((lp0.argmax(-1) == labels).sum()
                   + (lp1.argmax(-1) == labels).sum()).astype(jnp.float32) / 2
        return loss, correct, jnp.asarray(float(n))


_TARGET_KINDS = {
    "mlm": MlmTarget, "lm": LmTarget, "bilm": BilmTarget,
    "cls": ClsTarget, "sp": SpTarget, "clr": ClrTarget,
}


class CompositeTarget(nn.Module):
    """Multiple named targets -> {name: loss_info} (target.py:4-23)."""

    cfg: "TowerConfig"  # noqa: F821
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, memory_bank, tgt, seg):
        cfg = self.cfg
        if len(cfg.target) == 1:
            kind = cfg.target[0]
            return _TARGET_KINDS[kind](cfg, self.dtype, name=kind)(
                memory_bank, tgt, seg)
        return {
            kind: _TARGET_KINDS[kind](cfg, self.dtype, name=kind)(
                memory_bank, tgt[kind], seg)
            for kind in cfg.target
        }

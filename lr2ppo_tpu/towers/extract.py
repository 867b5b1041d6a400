"""Feature extraction with the towers: the offline pipeline that
produces clean_feat.h5 (per-item text_emb (tags, 196, 768) from XLM-R and
img_emb (1, n_imgs, 768) from ViT-B/16).

Reference: preprocess.py:50-86 embeds keyframes with CLIP ViT-B/16; the
shipped h5 is 768-d from the TencentPretrain towers (SURVEY §2.2 row
'Image feature extractor'). Here both towers are the flax TowerModel,
jitted once per (bucket) shape, batched on device.
"""

from __future__ import annotations

from functools import partial
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from lr2ppo_tpu.towers.model import TowerConfig, TowerModel


class TextFeatureExtractor:
    """Tokenize tags and return last-hidden (tags, seq_length, hidden)."""

    def __init__(self, cfg: TowerConfig, params, tokenizer,
                 seq_length: int = 196, cls_id: int = 0, sep_id: int = 2,
                 pad_id: int = 1, dtype=None):
        self.cfg = cfg
        self.model = TowerModel(cfg, dtype)
        self.params = params
        self.tokenizer = tokenizer
        self.seq_length = seq_length
        self.cls_id, self.sep_id, self.pad_id = cls_id, sep_id, pad_id

        @jax.jit
        def encode(params, src, seg):
            return self.model.apply(params, src, seg,
                                    method=self.model.encode)

        self._encode = encode

    def prepare(self, texts: List[str]) -> tuple:
        n, s = len(texts), self.seq_length
        src = np.full((n, s), self.pad_id, np.int32)
        seg = np.zeros((n, s), np.int32)
        for i, t in enumerate(texts):
            ids = [self.cls_id] + self.tokenizer.encode(t)[: s - 2] + [
                self.sep_id]
            src[i, : len(ids)] = ids
            seg[i, : len(ids)] = 1
        return src, seg

    def __call__(self, texts: List[str], batch: int = 32) -> np.ndarray:
        if not texts:   # items with empty tag lists exist in the wild
            return np.zeros((0, self.seq_length, self.cfg.hidden_size),
                            np.float32)
        src, seg = self.prepare(texts)
        outs = []
        for s0 in range(0, len(texts), batch):
            chunk_src = src[s0: s0 + batch]
            chunk_seg = seg[s0: s0 + batch]
            pad = batch - chunk_src.shape[0]
            if pad > 0:  # static shapes for one compiled program
                chunk_src = np.pad(chunk_src, ((0, pad), (0, 0)),
                                   constant_values=self.pad_id)
                chunk_seg = np.pad(chunk_seg, ((0, pad), (0, 0)))
            out = np.asarray(self._encode(self.params,
                                          jnp.asarray(chunk_src),
                                          jnp.asarray(chunk_seg)))
            outs.append(out[: batch - pad] if pad > 0 else out)
        return np.concatenate(outs, axis=0)


class ImageFeatureExtractor:
    """ViT tower -> per-frame feature = [CLS] last hidden (hidden,)."""

    def __init__(self, cfg: TowerConfig, params, dtype=None):
        self.cfg = cfg
        self.model = TowerModel(cfg, dtype)
        self.params = params
        seq = (cfg.image_height // cfg.patch_size) * (
            cfg.image_width // cfg.patch_size) + 1
        self.seq = seq

        @jax.jit
        def encode(params, pixels):
            seg = jnp.ones((pixels.shape[0], seq), jnp.int32)
            hidden = self.model.apply(params, pixels, seg,
                                      method=self.model.encode)
            return hidden[:, 0]

        self._encode = encode

    def __call__(self, pixels: np.ndarray, batch: int = 32) -> np.ndarray:
        """pixels: (N, C, H, W) float in [0, 1] (ZeroOneNormalize)."""
        outs = []
        n = pixels.shape[0]
        for s0 in range(0, n, batch):
            chunk = pixels[s0: s0 + batch]
            pad = batch - chunk.shape[0]
            if pad > 0:
                chunk = np.pad(chunk, ((0, pad),) + ((0, 0),) * 3)
            out = np.asarray(self._encode(self.params, jnp.asarray(chunk)))
            outs.append(out[: batch - pad] if pad > 0 else out)
        return np.concatenate(outs, axis=0)


def write_clean_feat(h5_path: str, item_id: str, text_emb: np.ndarray,
                     img_emb: np.ndarray, h5_file=None) -> None:
    """Append one item in the reference layout (ppo.py:120-127):
    <id>/text_emb (tags, S, D) and <id>/img_emb (1, n_imgs, D)."""
    import h5py

    own = h5_file is None
    hf = h5_file or h5py.File(h5_path, "a")
    try:
        g = hf.create_group(str(item_id))
        g.create_dataset("text_emb", data=text_emb.astype(np.float32))
        g.create_dataset("img_emb",
                         data=img_emb[None].astype(np.float32))
    finally:
        if own:
            hf.close()

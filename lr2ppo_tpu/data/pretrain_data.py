"""Pretraining data pipeline: corpus -> packed token instances -> MLM
masking (reference tencentpretrain/utils/dataset.py + mask.py +
dataloader.py, redesigned host-side).

The reference pickles instances with a multiprocessing pool and streams
them with rank-sharded buffered readers (dataloader.py:32-39). Here a
single pass packs the corpus into a (N, S) int32 matrix up front (the
LRMovieNet-scale corpora fit in RAM), and masking happens per epoch with
a seeded numpy RNG — static shapes, zero Python in the hot path.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np


def mask_tokens(ids: np.ndarray, seg: np.ndarray, vocab_size: int,
                mask_id: int, rng: np.random.Generator,
                mlm_prob: float = 0.15, keep_prob: float = 0.1,
                random_prob: float = 0.1,
                special_limit: int = 5) -> tuple:
    """BERT-style dynamic masking (reference utils/mask.py): select
    ~mlm_prob of real tokens; 80% -> [MASK], 10% -> random id,
    10% -> unchanged. Returns (src, tgt) with tgt=0 on unselected."""
    src = ids.copy()
    tgt = np.zeros_like(ids)
    real = (seg > 0) & (ids >= special_limit)
    sel = real & (rng.random(ids.shape) < mlm_prob)
    tgt[sel] = ids[sel]
    r = rng.random(ids.shape)
    to_mask = sel & (r < 1.0 - keep_prob - random_prob)
    to_rand = sel & (r >= 1.0 - random_prob)
    src[to_mask] = mask_id
    src[to_rand] = rng.integers(special_limit, vocab_size,
                                size=int(to_rand.sum()))
    return src, tgt


class MlmCorpusDataset:
    """Pack a line-per-document corpus into fixed (S,) instances; fresh
    masks every epoch (set_epoch reseeds, like DistributedSampler)."""

    def __init__(self, corpus_path: str, tokenizer, seq_length: int,
                 vocab_size: int, mask_id: int, cls_id: int = 0,
                 sep_id: int = 2, pad_id: int = 1, seed: int = 7,
                 mlm_prob: float = 0.15, special_limit: int = 5):
        self.seq_length = seq_length
        self.vocab_size = vocab_size
        self.mask_id = mask_id
        self.pad_id = pad_id
        self.seed = seed
        self.epoch = 0
        self.mlm_prob = mlm_prob
        self.special_limit = special_limit

        rows = []
        with open(corpus_path, encoding="utf-8") as f:
            buf = [cls_id]
            for line in f:
                ids = tokenizer.encode(line.strip())
                if not ids:
                    continue
                buf.extend(ids + [sep_id])
                while len(buf) >= seq_length:
                    rows.append(buf[:seq_length])
                    buf = [cls_id] + buf[seq_length:]
            if len(buf) > 1:
                rows.append(buf + [pad_id] * (seq_length - len(buf)))
        self.ids = np.asarray(rows, np.int32)
        self.seg = (self.ids != pad_id).astype(np.int32)

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def __len__(self) -> int:
        return self.ids.shape[0]

    def get(self, i: int) -> Dict[str, np.ndarray]:
        rng = np.random.default_rng(
            (self.seed * 1_000_003 + self.epoch) * 1_000_003 + i)
        src, tgt = mask_tokens(self.ids[i], self.seg[i], self.vocab_size,
                               self.mask_id, rng, self.mlm_prob,
                               special_limit=self.special_limit)
        return {"src": src, "tgt": tgt, "seg": self.seg[i]}

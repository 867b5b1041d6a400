"""NDCG@k with exact reference semantics (reference: ndcg.py:9-65).

Gain is 2^rel - 1, discount is 1/log2(pos+2), and an all-irrelevant ideal
(true DCG <= 1e-6) scores NDCG = 1. Two implementations:

  * `ndcg_from_scores` — batched, masked, pure-jnp; runs inside jit on
    device (used by the evaluators; pads never displace positive items
    because gain(0) == 0 and padded scores sort last).
  * `AverageNDCGMeter` — host-side accumulator mirroring the reference
    class API (value() returns the dict of means).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

NDCG_AT_K_DEFAULT: List[int] = [1, 3, 5, 10, 20, 100000000]


def dcg_at_k(relevances: np.ndarray, k: int) -> float:
    """Host-side DCG@k — reference ndcg.py:28-32."""
    rel = np.asarray(relevances, dtype=np.float64)
    n = min(len(rel), k)
    if n == 0:
        return 0.0
    idx = np.arange(n)
    return float(np.sum((2.0 ** rel[:n] - 1.0) / np.log2(idx + 2.0)))


def ndcg_at_k(predicted_relevance: np.ndarray, true_relevances: np.ndarray,
              k: int) -> float:
    """Host-side NDCG@k with the ideal<=1e-6 -> 1 rule (ndcg.py:40-41)."""
    true = dcg_at_k(true_relevances, k)
    if true <= 1e-6:
        return 1.0
    return dcg_at_k(predicted_relevance, k) / true


def ndcg_from_scores(scores: Array, gold: Array,
                     ks: Sequence[int] = tuple(NDCG_AT_K_DEFAULT),
                     mask: Optional[Array] = None) -> Array:
    """Vector of NDCG@k for one ranked list; jit/vmap friendly.

    scores: (T,) model scores; gold: (T,) integer relevances; mask: (T,)
    bool validity for padded eval buckets. Matches the reference flow
    (ppo.py:651-659): sort gold by predicted score desc -> predicted
    relevance order; sort gold desc -> ideal order.
    """
    scores = scores.astype(jnp.float32)
    gold = gold.astype(jnp.float32)
    if mask is not None:
        scores = jnp.where(mask, scores, jnp.finfo(jnp.float32).min)
        gold = jnp.where(mask, gold, 0.0)
    t = gold.shape[0]
    order = jnp.argsort(-scores)                       # predicted ranking
    pred_rel = jnp.take(gold, order)
    ideal_rel = -jnp.sort(-gold)
    pos = jnp.arange(t, dtype=jnp.float32)
    discount = 1.0 / jnp.log2(pos + 2.0)
    gains_pred = (jnp.exp2(pred_rel) - 1.0) * discount
    gains_ideal = (jnp.exp2(ideal_rel) - 1.0) * discount
    out = []
    for k in ks:
        within = (pos < k).astype(jnp.float32)
        dcg = (gains_pred * within).sum()
        idcg = (gains_ideal * within).sum()
        out.append(jnp.where(idcg <= 1e-6, 1.0, dcg / idcg))
    return jnp.stack(out)


class AverageNDCGMeter:
    """Host accumulator mirroring the reference API (ndcg.py:9-65)."""

    def __init__(self, ndcg_at_k: Sequence[int] = tuple(NDCG_AT_K_DEFAULT)):
        self.ndcg_at_k = list(ndcg_at_k)
        self.ndcg: Dict[int, list] = {}
        self.reset()

    def reset(self) -> None:
        for k in self.ndcg_at_k:
            self.ndcg[k] = []

    def value(self) -> Dict[int, float]:
        # NOTE: mutates state like the reference (ndcg.py:21-25)
        for k in self.ndcg:
            vals = self.ndcg[k]
            self.ndcg[k] = float(np.mean(np.asarray(vals))) if len(vals) else float("nan")
        return self.ndcg

    def compute_ndcg_at_k(self, predicted_relevance, true_relevances) -> None:
        for k in self.ndcg_at_k:
            self.ndcg[k].append(
                ndcg_at_k(np.asarray(predicted_relevance),
                          np.asarray(true_relevances), k)
            )

    def return_ndcg_at_k(self, predicted_relevance, true_relevances) -> np.ndarray:
        return np.asarray([
            ndcg_at_k(np.asarray(predicted_relevance),
                      np.asarray(true_relevances), k)
            for k in self.ndcg_at_k
        ], dtype=np.float32)

    def extend(self, ndcg_rows: np.ndarray) -> None:
        """Append a (N, len(ks)) matrix of per-list NDCG vectors (the
        device-side batched path feeding the host meter)."""
        rows = np.asarray(ndcg_rows).reshape(-1, len(self.ndcg_at_k))
        for row in rows:
            for i, k in enumerate(self.ndcg_at_k):
                self.ndcg[k].append(float(row[i]))

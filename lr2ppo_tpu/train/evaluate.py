"""Shared NDCG evaluation and the ppo_eval case dump.

Reference flows: pointwise.py:316-412 / ppo.py:620-681 (per-item bs=1
NDCG with all_gather) and ppo_eval.py:401-471 (case JSON dump). TPU
re-design: items are bucketed/padded/masked and scored in batches; one
compiled program per bucket shape; the NDCG vector is computed on device
and drained to the host meter. Under a dp mesh the batch axis shards
across chips — the all_gather of the reference becomes the implicit
collective of the jitted program.
"""

from __future__ import annotations

import json
import os
from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from lr2ppo_tpu.ops.ndcg import NDCG_AT_K_DEFAULT, AverageNDCGMeter, ndcg_from_scores
from lr2ppo_tpu.ops.losses import cls_expected_scores
from lr2ppo_tpu.parallel.mesh import fetch_global


@partial(jax.jit, static_argnums=(0,))
def _scores_and_ndcg(model_apply, params, text, img, tgts, mask):
    scores = model_apply(params, text, img)         # (B, T) reg scores
    if scores.ndim == 3:                            # cls mode -> expected rel
        scores = cls_expected_scores(scores)
    rows = jax.vmap(
        lambda s, g, m: ndcg_from_scores(s, g, tuple(NDCG_AT_K_DEFAULT), m)
    )(scores, tgts, mask)
    return scores, rows


def evaluate_ndcg(model, params, eval_loader, put=None,
                  meter: Optional[AverageNDCGMeter] = None) -> Dict[int, float]:
    """Returns {k: ndcg@k}; key 100000000 is NDCG@full (the reference's
    model-selection metric, ppo.py:679)."""
    meter = meter or AverageNDCGMeter()
    apply = model.apply
    for batch in eval_loader:
        if put is not None:
            batch = put(batch)
        img = batch.get("img")
        _, rows = _scores_and_ndcg(
            apply, params, jnp.asarray(batch["text"]),
            None if img is None else jnp.asarray(img),
            jnp.asarray(batch["tgts"]), jnp.asarray(batch["mask"]))
        rows = fetch_global(rows)   # pod-safe: allgathers dp shards
        keep = fetch_global(batch["mask"]).any(axis=1)
        if keep.any():
            meter.extend(rows[keep])
    return meter.value()


def evaluate_cases(model, params, dataset, eval_loader, out_path: str,
                   put=None) -> Dict[int, float]:
    """ppo_eval-style evaluation: NDCG plus a per-clip JSON case dump
    (ppo_eval.py:457-459): tags, gold targets, predicted order with
    scores, per-k ndcg."""
    meter = AverageNDCGMeter()
    cases = []
    for batch in eval_loader:
        if "_idx" not in batch:
            raise ValueError(
                "evaluate_cases needs per-row dataset indices; use an "
                "EvalLoader (it emits '_idx') — a plain Loader would "
                "silently produce an empty case dump")
        idx = np.asarray(batch.pop("_idx"))
        if put is not None:
            dbatch = put(batch)
        else:
            dbatch = batch
        img = dbatch.get("img")
        scores, rows = _scores_and_ndcg(
            model.apply, params, jnp.asarray(dbatch["text"]),
            None if img is None else jnp.asarray(img),
            jnp.asarray(dbatch["tgts"]), jnp.asarray(dbatch["mask"]))
        scores, rows = fetch_global(scores), fetch_global(rows)
        mask = np.asarray(batch["mask"])
        for b in range(mask.shape[0]):
            if not mask[b].any() or idx[b] < 0:
                continue
            t = int(mask[b].sum())
            s = scores[b, :t]
            gold = np.asarray(batch["tgts"][b, :t])
            order = np.argsort(-s)
            meter.extend(rows[b: b + 1])
            case = {
                "pred_order": order.tolist(),
                "pred_scores": s[order].astype(float).tolist(),
                "gold": gold.astype(int).tolist(),
                "gold_rearranged": gold[order].astype(int).tolist(),
                "ndcg": rows[b].astype(float).tolist(),
            }
            # per-clip identity + tag strings (ppo_eval.py dumps tags)
            if dataset is not None and hasattr(dataset, "examples"):
                iid = dataset.examples[int(idx[b])][0]
                case["id"] = str(iid)
                names = getattr(dataset, "tag_names", {}).get(iid)
                if names:
                    case["tags"] = [names[j] for j in
                                    dataset.examples[int(idx[b])][1]]
                    case["tags_rearranged"] = [case["tags"][j]
                                               for j in order.tolist()]
            cases.append(case)
    # every rank computes identical cases (eval loaders are
    # rank-duplicated), so only rank 0 touches the file — unsynchronized
    # ranks racing one path on shared pod storage interleave/corrupt it,
    # the same contract as save_checkpoint (reference misc.py:77-91)
    if out_path and jax.process_index() == 0:
        os.makedirs(os.path.dirname(os.path.abspath(out_path)) or ".",
                    exist_ok=True)
        with open(out_path, "w") as f:
            json.dump(cases, f)
    return meter.value()


def format_ndcg(vals: Dict[int, float]) -> str:
    return "".join(
        "\nNDCG@{}={:.4f}".format(k, vals[k]) for k in sorted(vals))

"""Ranking service entry point (beyond-parity; the reference's closest
surface is the bs=1 evaluator launch, ppo_eval.sh:55).

Loads a trained actor checkpoint and serves relevance rankings over the
FULL tag list of every item in `--test_path` (MovieNet json + h5 layout,
the exact store `cli/preprocess.py` writes), writing one JSON line per
item to `--ranking_path`:

    {"id", "tags", "pred_order", "pred_scores", "tags_rearranged"[, "ndcg"]}

The compute path is the measured serving configuration from the r4
serving benchmark (`bench.py --serve`, PARITY.md serving table):
the jitted `train/evaluate.py:_scores_and_ndcg` program, bucketed
batching through `EvalLoader` (one compiled program per bucket shape),
and size-gated int8 weights by default (`ops/int8.py`; inference-only,
measured +13.5% items/s at bs=128). `--int8 false` serves bf16/f32.
Batches shard over the dp mesh axis via `DeviceCtx.put_eval`, same as
the standalone evaluators.
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from lr2ppo_tpu.config import parse_config
from lr2ppo_tpu.cli._common import maybe_init_distributed, movienet_eval_loader
from lr2ppo_tpu.models import ScoreModel
from lr2ppo_tpu.train import checkpoints
from lr2ppo_tpu.train.common import DeviceCtx
from lr2ppo_tpu.train.evaluate import _scores_and_ndcg
from lr2ppo_tpu.parallel.mesh import fetch_global
from lr2ppo_tpu.utils import init_logger


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    cfg = parse_config(argv, "lr2ppo-tpu ranking service")
    maybe_init_distributed(cfg)
    logger = init_logger(cfg.log_path)

    # serving default is int8-on (inference-only, no training numerics
    # at stake); parse_config cannot distinguish "flag absent" from the
    # dataclass default, so honor an explicit --int8 and default to on
    int8 = cfg.model.int8 if any(a.startswith("--int8") for a in argv) \
        else True

    tree = checkpoints.load_any(cfg.pretrained_model_path,
                                kind="actor_critic")
    actor_params = tree["actor"] if "actor" in tree else tree

    ctx = DeviceCtx(cfg.mesh.dp, cfg.mesh.tp,
                    cast_dtype=cfg.mesh.compute_dtype)
    dtype = jnp.dtype(cfg.mesh.compute_dtype)
    mcfg = dataclasses.replace(cfg.model, int8=int8)
    model = ScoreModel(mcfg, dtype)
    if int8:
        from lr2ppo_tpu.ops.int8 import quantize_tree

        # once, at model load — the quantized tree then serves every
        # request (the bench's once-per-sweep amortization, at its
        # serving limit: params never change)
        actor_params = quantize_tree(actor_params, dtype)
    actor_params = ctx.place_params(actor_params)

    path = cfg.data.test_path or cfg.data.dev_path
    ev = movienet_eval_loader(cfg, path=path)
    ds = ev.ds

    out_path = cfg.data.ranking_path
    if os.path.dirname(out_path):
        os.makedirs(os.path.dirname(out_path), exist_ok=True)
    n_items = 0
    t0 = time.perf_counter()
    # rank 0 writes; other pod ranks run the same compute (eval loaders
    # are rank-duplicated) and skip the file, same contract as the
    # evaluators' case dump
    sink = (open(out_path, "w")
            if jax.process_index() == 0 else None)
    try:
        for batch in ev:
            if "_idx" not in batch:
                raise ValueError("serve needs an EvalLoader batch "
                                 "(with '_idx' row indices)")
            idx = np.asarray(batch.pop("_idx"))
            dbatch = ctx.put_eval(batch)
            img = dbatch.get("img")
            scores, rows = _scores_and_ndcg(
                model.apply, actor_params, jnp.asarray(dbatch["text"]),
                None if img is None else jnp.asarray(img),
                jnp.asarray(dbatch["tgts"]), jnp.asarray(dbatch["mask"]))
            scores, rows = fetch_global(scores), fetch_global(rows)
            mask = np.asarray(batch["mask"])
            tgts = np.asarray(batch["tgts"])
            for b in range(mask.shape[0]):
                if not mask[b].any() or idx[b] < 0:
                    continue
                t = int(mask[b].sum())
                s = np.asarray(scores[b, :t], np.float64)
                order = np.argsort(-s)
                iid = ds.examples[int(idx[b])][0]
                names = getattr(ds, "tag_names", {}).get(iid)
                line = {
                    "id": str(iid),
                    "pred_order": order.tolist(),
                    "pred_scores": s[order].tolist(),
                }
                if names is not None:
                    tag_ids = ds.examples[int(idx[b])][1]
                    line["tags"] = [names[j] for j in tag_ids]
                    line["tags_rearranged"] = [line["tags"][j]
                                               for j in order.tolist()]
                if tgts[b, :t].any():
                    # gold labels present (labeled store): report ndcg
                    line["ndcg"] = np.asarray(rows[b],
                                              np.float64).tolist()
                n_items += 1
                if sink is not None:
                    sink.write(json.dumps(line) + "\n")
    finally:
        if sink is not None:
            sink.close()
    dt = time.perf_counter() - t0
    logger.info("served %d items in %.2fs (%.1f items/s, int8=%s) -> %s",
                n_items, dt, n_items / max(dt, 1e-9), int8, out_path)
    return {"items": n_items, "items_per_s": n_items / max(dt, 1e-9),
            "int8": int8, "ranking_path": out_path}


if __name__ == "__main__":
    main()

"""Shared CLI plumbing: dataset/loader builders for both families.

The CLI surface mirrors the reference's 10 launch scripts (repo root
*.sh -> torchrun -> finetune/*.py argparse); flags carry over verbatim
where they exist (SURVEY §1 L6). One JAX process replaces torchrun —
parallelism is the dp/tp mesh inside the jitted steps.
"""

from __future__ import annotations

import os

from lr2ppo_tpu.config import Config
from lr2ppo_tpu.data import (
    EvalLoader,
    LetorQueries,
    Loader,
    LTRPPODataset,
    LTRPointwiseDataset,
    LTRRewardDataset,
    MovieNetDataset,
)
from lr2ppo_tpu.data.pipeline import ProcessLoader


def maybe_init_distributed(cfg: Config) -> None:
    """Runtime bring-up BEFORE first backend use. --jax_platform forces
    a backend (env vars are too late on images whose sitecustomize pins
    one at interpreter start); --distributed is the torchrun
    replacement — run the same CLI once per host (on Cloud TPU pods the
    coordinator/count/rank resolve from pod metadata; elsewhere pass
    --coordinator/--num_processes/--process_id). Decided from cfg
    alone: touching jax.process_count() here would initialize the
    backend and make jax.distributed.initialize impossible."""
    m = cfg.mesh
    from lr2ppo_tpu.parallel.mesh import init_runtime

    init_runtime(
        jax_platform=getattr(m, "jax_platform", ""),
        distributed=getattr(m, "distributed", False),
        coordinator=m.coordinator or None,
        num_processes=m.num_processes or None,
        process_id=m.process_id if m.process_id >= 0 else None)


def pod_shard():
    """Process-local input sharding on a multi-host pod: each controller
    loads and uploads only its slice of every global batch
    (Loader(shard=...) + make_array_from_process_local_data in
    parallel/mesh.py:put_batch — the TPU analogue of the reference's
    per-rank reader stride, tencentpretrain/utils/dataloader.py:32-39).
    None in the ordinary single-process case."""
    import jax

    if jax.process_count() > 1:
        return (jax.process_index(), jax.process_count())
    return None


def force_family(cfg: Config, family: str) -> Config:
    import dataclasses

    return cfg.replace(model=dataclasses.replace(cfg.model, family=family))


def h5_path_for(json_path: str, cfg: Config) -> str:
    """clean_feat.h5 lives next to the split JSONs (ppo.py:65-66)."""
    root = os.path.dirname(json_path) or cfg.data.embed_root
    cand = os.path.join(root, "clean_feat.h5")
    if os.path.exists(cand):
        return cand
    return os.path.join(cfg.data.embed_root, "clean_feat.h5")


def _item_dtype(cfg: Config):
    if cfg.data.item_dtype in ("bfloat16", "bf16"):
        import ml_dtypes

        return ml_dtypes.bfloat16
    import numpy as np

    return np.dtype(cfg.data.item_dtype)


def _want_preload(cfg: Config, h5_path: str) -> bool:
    """'auto': cache in RAM when the converted embeddings fit in half the
    available memory — on a single-core host the per-item h5 read/convert
    IS the input bottleneck (PARITY.md perf notes)."""
    if cfg.data.preload == "always":
        return True
    if cfg.data.preload == "never" or not os.path.exists(h5_path):
        return False
    import numpy as np

    ratio = np.dtype(_item_dtype(cfg)).itemsize / 4.0
    need = os.path.getsize(h5_path) * ratio
    try:
        import re

        with open("/proc/meminfo") as f:
            avail = int(re.search(r"MemAvailable:\s+(\d+) kB",
                                  f.read()).group(1)) * 1024
    except Exception:
        avail = 8 << 30
    return need < 0.5 * avail


def _use_process_loader(cfg: Config) -> bool:
    if cfg.data.loader == "auto":
        return (os.cpu_count() or 1) >= 4
    return cfg.data.loader == "process"


def movienet_train_loader(cfg: Config, mode: str, seed: int = 0) -> Loader:
    h5p = h5_path_for(cfg.data.train_path, cfg)
    ds = MovieNetDataset(
        cfg.data.train_path, h5p, mode,
        max_tags=cfg.data.max_tags, max_imgs=cfg.data.max_imgs,
        seed=cfg.seed + seed,   # --seed must vary the data sampling too
        item_dtype=_item_dtype(cfg), preload=_want_preload(cfg, h5p))
    if _use_process_loader(cfg):
        # shared-memory worker processes: sidestep the GIL and h5py's
        # global API lock (PPO copies batches out of the shared slots
        # before retaining them — train/ppo.py)
        return ProcessLoader(ds, cfg.batch_size, shuffle=True,
                             seed=cfg.seed + seed,
                             num_workers=cfg.data.num_workers,
                             prefetch_depth=cfg.data.prefetch_depth,
                             shard=pod_shard())
    # reuse_buffers for every stage: fresh multi-MB batch allocations
    # page-fault ~4x slower than buffer reuse on this host class
    # (measured 750 -> 3040 samples/s at PPO shapes). The PPO trainer
    # detects loader.reuse_buffers and copies anything it retains across
    # the sweep (train/ppo.py must_copy).
    return Loader(ds, cfg.batch_size, shuffle=True, seed=cfg.seed + seed,
                  num_workers=cfg.data.num_workers,
                  prefetch_depth=cfg.data.prefetch_depth,
                  reuse_buffers=True, shard=pod_shard())


def movienet_eval_loader(cfg: Config, mode: str = "eval",
                         path: str = "") -> object:
    path = path or cfg.data.dev_path
    h5p = h5_path_for(path, cfg)
    ds = MovieNetDataset(path, h5p, mode,
                         max_tags=cfg.data.max_tags,
                         max_imgs=cfg.data.max_imgs, seed=cfg.seed,
                         item_dtype=_item_dtype(cfg),
                         preload=_want_preload(cfg, h5p))
    if mode == "eval":
        return EvalLoader(ds, cfg.data.eval_tag_buckets, cfg.batch_size)
    return Loader(ds, cfg.batch_size, shuffle=False,
                  num_workers=cfg.data.num_workers)


def letor_queries(path: str, split: str = "train") -> LetorQueries:
    """`path` is either a grouped .h5 file or a directory holding
    {train,test}.h5 (reference ppo_trad.py:64-68); `split` picks the file
    for directory paths — eval callers MUST pass 'test' or validation
    silently runs on training queries."""
    if os.path.isdir(path):
        return LetorQueries.from_dir(path, split)
    return LetorQueries.from_h5(path)



def letor_eval_loader(cfg: Config, ds_cls, path: str = "") -> EvalLoader:
    """Test-split EvalLoader with one bucket sized to the largest query
    (the shared recipe of every tabular evaluator)."""
    evq = letor_queries(path or cfg.data.dev_path or cfg.data.test_path,
                        "test")
    docs = max(g.shape[0] for g in evq.groups.values())
    ds = (ds_cls(evq, False) if ds_cls is LTRPPODataset else ds_cls(evq))
    return EvalLoader(ds, buckets=[docs], batch_size=cfg.batch_size)


def letor_pointwise_loaders(cfg: Config):
    train = Loader(LTRPointwiseDataset(letor_queries(cfg.data.train_path)),
                   cfg.batch_size, shuffle=True, seed=cfg.seed,
                   num_workers=cfg.data.num_workers, reuse_buffers=True,
                   shard=pod_shard())
    ev = letor_eval_loader(cfg, LTRPointwiseDataset)
    return train, ev


def letor_reward_loaders(cfg: Config, relevance_classes: int = 5):
    train_ds = LTRRewardDataset(letor_queries(cfg.data.train_path),
                                max_tags=cfg.data.max_tags,
                                relevance_classes=relevance_classes,
                                seed=cfg.seed)
    # eval width is the reference's FIXED 20 pairs/query (its dataset
    # ctor default — reward_trad.py:88 never threads args.max_tags), so
    # reported accuracies are comparable at the same variance; the old
    # max_tags//4 shortcut quartered the eval set and its noise floor
    # dominated cross-framework comparisons (r5 full-run A/B)
    ev_ds = LTRRewardDataset(
        letor_queries(cfg.data.dev_path or cfg.data.test_path, "test"),
        max_tags=20,
        relevance_classes=relevance_classes, seed=cfg.seed + 999)
    return (Loader(train_ds, cfg.batch_size, shuffle=True, seed=cfg.seed,
                   num_workers=cfg.data.num_workers, reuse_buffers=True,
                   shard=pod_shard()),
            Loader(ev_ds, cfg.batch_size, shuffle=False,
                   num_workers=cfg.data.num_workers, reuse_buffers=True))


def letor_ppo_loaders(cfg: Config):
    q = letor_queries(cfg.data.train_path)

    def make_train_loader(epoch: int) -> Loader:
        ds = LTRPPODataset(q, True, max_tags=cfg.data.max_tags,
                           seed=cfg.seed + epoch)
        return Loader(ds, cfg.batch_size, shuffle=True,
                      seed=cfg.seed + epoch,
                      num_workers=cfg.data.num_workers,
                      shard=pod_shard())

    ev = letor_eval_loader(cfg, LTRPPODataset)
    return make_train_loader, ev

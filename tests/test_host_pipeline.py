"""Round-2 host-pipeline work: ProcessLoader (shared-memory worker
processes), MovieNet RAM preload + bf16 items + deterministic per-(epoch,
item) sampling, and the PPO device-resident memory path."""

import numpy as np
import pytest

from fixtures import make_movienet
from lr2ppo_tpu.data.movienet import MovieNetDataset
from lr2ppo_tpu.data.pipeline import Loader, ProcessLoader


class _TinyDs:
    def __init__(self, n=37):
        self.n = n
        self.epoch = 0

    def set_epoch(self, epoch):
        self.epoch = epoch

    def __len__(self):
        return self.n

    def get(self, i):
        return {"x": np.full(3, i + 1000 * self.epoch, np.float32),
                "y": np.int32(i)}


def test_process_loader_matches_thread_loader():
    ds = _TinyDs()
    ref = [{k: v.copy() for k, v in b.items()}
           for b in Loader(ds, 8, shuffle=True, seed=3)]
    pl = ProcessLoader(_TinyDs(), 8, shuffle=True, seed=3, num_workers=3)
    got = [{k: np.array(v) for k, v in b.items()} for b in pl]
    assert len(ref) == len(got)
    for a, b in zip(ref, got):
        assert set(a) == set(b)
        for k in a:
            np.testing.assert_array_equal(a[k], b[k], err_msg=k)
    pl.close()


def test_process_loader_epochs_reach_forked_workers():
    # set_epoch must change worker-side dataset state even though the
    # workers forked before the call
    pl = ProcessLoader(_TinyDs(16), 4, shuffle=False, num_workers=2)
    e0 = [np.array(b["x"]) for b in pl]
    pl.set_epoch(5)
    e5 = [np.array(b["x"]) for b in pl]
    np.testing.assert_array_equal(e5[0], e0[0] + 5000)
    pl.close()


def test_process_loader_propagates_worker_errors():
    class Bad(_TinyDs):
        def get(self, i):
            if i == 7:
                raise ValueError("corrupt item 7")
            return super().get(i)

    pl = ProcessLoader(Bad(16), 4, shuffle=False, num_workers=2)
    with pytest.raises(RuntimeError, match="corrupt item 7"):
        list(pl)
    pl.close()


def test_loader_releases_consumed_batches():
    """Round-4 review: the producer's grow-only `pending` list retained
    every completed Future (and its collated batch) for the whole epoch
    — with reuse_buffers=False a long eval epoch held tens of GB. Only
    the in-flight window may stay alive."""
    import gc
    import weakref

    class Big:
        def __init__(self, n=40):
            self.n = n

        def set_epoch(self, epoch):
            pass

        def __len__(self):
            return self.n

        def get(self, i):
            return {"x": np.full((64, 64), i, np.float32)}

    ld = Loader(Big(), 2, shuffle=False, num_workers=2,
                reuse_buffers=False)
    refs = []
    for k, b in enumerate(ld):
        refs.append(weakref.ref(b["x"]))
        del b
        if k == 15:
            gc.collect()
            dead = sum(r() is None for r in refs[:8])
            assert dead == 8, (
                f"only {dead}/8 early batches were released")
            break


def test_process_loader_detects_dead_worker(monkeypatch):
    """Round-4 review: a hard-dead worker (OOM-kill/segfault) never
    posts its done entry; the consumer must raise, not hang forever."""
    import time

    class Slow(_TinyDs):
        def get(self, i):
            time.sleep(0.05)
            return super().get(i)

    monkeypatch.setattr(ProcessLoader, "DONE_POLL_S", 0.3)
    pl = ProcessLoader(Slow(64), 4, shuffle=False, num_workers=2)
    it = iter(pl)
    next(it)
    for p in pl._pool[0]:
        p.kill()
    with pytest.raises(RuntimeError, match="died without reporting"):
        for _ in it:
            pass
    pl.close()


def test_movienet_ppo_skips_single_tag_items(tmp_path):
    """Round-4 review: a 1-tag item can't form a PPO pair — silently
    broadcasting it into the 2-row batch slot trained on tag-vs-itself
    (or crashed the collate when it led a batch)."""
    import json

    jp, hp = make_movienet(tmp_path / "d", n_items=3)
    with open(jp) as f:
        data = json.load(f)
    data.append({"id": "lonely", "tags": [{"tag": "x", "target": 1}]})
    ds = MovieNetDataset(jp, hp, "ppo", max_tags=2, data=data)
    assert all(iid != "lonely" for iid, *_ in ds.examples)
    assert len(ds.examples) == 3 * 2
    with pytest.raises(ValueError, match="no tags"):
        MovieNetDataset(jp, hp, "eval", data=[{"id": "z", "tags": []}])


def test_pad_images_rejects_zero_keyframes():
    from lr2ppo_tpu.data.movienet import _pad_images

    with pytest.raises(ValueError, match="keyframes"):
        _pad_images(np.zeros((0, 8), np.float32), 4,
                    np.random.default_rng(0))


def test_process_loader_marks_wrap_padding():
    pl = ProcessLoader(_TinyDs(10), 4, shuffle=False, num_workers=2)
    batches = [{k: np.array(v) for k, v in b.items()} for b in pl]
    assert len(batches) == 3
    assert "_valid" not in batches[0]
    assert batches[-1]["_valid"].tolist() == [True, True, False, False]
    pl.close()


def test_movienet_preload_matches_h5_reads(tmp_path):
    jp, hp = make_movienet(tmp_path / "d", n_items=6)
    kw = dict(mode="ppo", max_tags=4, max_imgs=2, seed=5)
    plain = MovieNetDataset(jp, hp, **kw)
    pre = MovieNetDataset(jp, hp, **kw, preload=True)
    for i in range(len(plain)):
        a, b = plain.get(i), pre.get(i)
        for k in a:
            np.testing.assert_array_equal(a[k], b[k], err_msg=f"{i}/{k}")


def test_movienet_bf16_items(tmp_path):
    import ml_dtypes

    jp, hp = make_movienet(tmp_path / "d", n_items=4)
    ds = MovieNetDataset(jp, hp, "ppo", max_tags=4, max_imgs=2,
                         item_dtype=ml_dtypes.bfloat16, preload=True)
    it = ds.get(0)
    assert it["text"].dtype == ml_dtypes.bfloat16
    assert it["img"].dtype == ml_dtypes.bfloat16
    f32 = MovieNetDataset(jp, hp, "ppo", max_tags=4, max_imgs=2).get(0)
    np.testing.assert_allclose(np.asarray(it["text"], np.float32),
                               f32["text"], rtol=0.01, atol=0.02)


def test_movienet_get_deterministic_per_epoch(tmp_path):
    jp, hp = make_movienet(tmp_path / "d", n_items=4,
                           n_imgs_range=(4, 5))
    ds = MovieNetDataset(jp, hp, "ppo", max_tags=4, max_imgs=4, seed=1)
    for i in range(len(ds)):
        a, b = ds.get(i), ds.get(i)
        np.testing.assert_array_equal(a["img"], b["img"])  # exact re-fetch
    before = [ds.get(i)["img"].copy() for i in range(len(ds))]
    ds.set_epoch(3)
    after = [ds.get(i)["img"] for i in range(len(ds))]
    assert any((x != y).any() for x, y in zip(before, after)), (
        "image shuffle must reseed with the epoch")


@pytest.mark.parametrize("device_gb,reuse", [(100.0, False), (0.0, False),
                                             (100.0, True), (0.0, True)])
@pytest.mark.heavy
def test_ppo_memory_residency_paths(tmp_path, device_gb, reuse):
    # device_gb=100 -> device-resident memories; 0 -> host memories.
    # reuse=True: the loader recycles batch buffers, so the trainer must
    # copy whatever it retains (must_copy). All must train finitely.
    from lr2ppo_tpu.config import Config, ModelConfig
    from lr2ppo_tpu.train.ppo import PPOTrainer

    jp, hp = make_movienet(tmp_path / "d", n_items=8)
    cfg = Config()
    cfg = cfg.replace(
        model=ModelConfig(feat_size=16, seq_length=4, max_imgs=2,
                          visual_feat_dim=16, num_heads=4,
                          family="multimodal", mode="reg"),
        epochs_num=1, batch_size=4, report_steps=1000,
        output_model_path=str(tmp_path / "best.ckpt"), seed=3)
    cfg.mesh.dp = 2
    cfg.ppo.update_timesteps = 2
    cfg.ppo.device_memory_gb = device_gb

    def make_train_loader(epoch):
        ds = MovieNetDataset(jp, hp, "ppo", max_tags=2, max_imgs=2,
                             seed=epoch)
        return Loader(ds, 4, shuffle=True, seed=epoch,
                      reuse_buffers=reuse)

    from lr2ppo_tpu.data.pipeline import EvalLoader

    ev_ds = MovieNetDataset(jp, hp, "eval", max_imgs=2)
    ev = EvalLoader(ev_ds, buckets=[8], batch_size=4)
    tr = PPOTrainer(cfg)
    astate, cstate, best = tr.fit(make_train_loader, ev)
    assert np.isfinite(best) and 0.0 < best <= 1.0


def test_eval_loader_grows_bucket_beyond_top(tmp_path):
    # reference evaluates FULL tag lists (ppo.py:620-681); a 150-tag item
    # above the top bucket must get a grown bucket, not a silent clip
    from lr2ppo_tpu.data.pipeline import EvalLoader

    jp, hp = make_movienet(tmp_path / "d", n_items=3,
                           max_tag_range=(150, 151))
    ds = MovieNetDataset(jp, hp, "eval", max_imgs=2)
    ev = EvalLoader(ds, buckets=[8, 128], batch_size=2)
    batches = list(ev)
    assert batches, "eval loader yielded nothing"
    widths = {b["text"].shape[1] for b in batches}
    assert widths == {160}, widths        # 150 -> ceil to quantum 32
    per_row_tags = np.concatenate([b["mask"].sum(1)[
        np.asarray(b["_idx"]) >= 0] for b in batches])
    assert (per_row_tags == 150).all()    # every tag evaluated


def test_loader_shard_slices_global_batches():
    # every rank's shard slices concatenate back to exactly the
    # unsharded loader's global batches, in dp-device order
    ds = _TinyDs(n=24)
    world, bs = 3, 6
    full = [list(b["y"]) for b in Loader(ds, bs, shuffle=True, seed=9,
                                         num_workers=1)]
    shards = []
    for rank in range(world):
        shards.append([list(b["y"]) for b in Loader(
            ds, bs, shuffle=True, seed=9, num_workers=1,
            shard=(rank, world))])
    assert all(len(s) == len(full) for s in shards)
    for j, gb in enumerate(full):
        merged = sum((shards[r][j] for r in range(world)), [])
        assert merged == gb


def test_loader_shard_chunks_matches_accum_fold():
    # shard_chunks=accum: each rank's rows reshape to (accum, micro/world)
    # and the per-chunk slices tile the global (accum, micro) fold
    ds = _TinyDs(n=48)
    world, accum, bs = 2, 3, 12
    micro = bs // accum
    full = next(iter(Loader(ds, bs, shuffle=True, seed=4, num_workers=1)))
    gfold = np.asarray(full["y"]).reshape(accum, micro)
    locals_ = []
    for rank in range(world):
        b = next(iter(Loader(ds, bs, shuffle=True, seed=4, num_workers=1,
                             shard=(rank, world), shard_chunks=accum)))
        locals_.append(np.asarray(b["y"]).reshape(accum, micro // world))
    np.testing.assert_array_equal(np.concatenate(locals_, axis=1), gfold)


def test_process_loader_shard_yields_local_rows():
    ds = _TinyDs(n=20)
    world, bs = 2, 4
    full = [list(b["y"]) for b in Loader(ds, bs, shuffle=True, seed=2,
                                         num_workers=1)]
    for rank in range(world):
        pl = ProcessLoader(ds, bs, shuffle=True, seed=2, num_workers=1,
                           shard=(rank, world))
        try:
            got = [list(b["y"]) for b in pl]
        finally:
            pl.close()
        assert got == [
            fb[rank * bs // world:(rank + 1) * bs // world] for fb in full]

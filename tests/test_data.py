"""Data layer tests: sampling modes, static shapes, LETOR pipeline,
loaders/prefetch, eval bucketing."""

import numpy as np

from fixtures import make_letor_groups, make_movienet, make_svmlight
from lr2ppo_tpu.data import (
    EvalLoader,
    LetorQueries,
    Loader,
    LTRPPODataset,
    LTRPointwiseDataset,
    LTRRewardDataset,
    MovieNetDataset,
    group_queries,
    make_qids_disjoint,
    parse_svmlight_file,
)


def test_movienet_pointwise_static_shapes(tmp_path):
    jp, hp = make_movienet(tmp_path, n_items=4)
    ds = MovieNetDataset(jp, hp, "pointwise", max_tags=5, max_imgs=3)
    assert len(ds) == 4
    for i in range(len(ds)):
        it = ds.get(i)
        assert it["text"].shape == (5, 4, 16)
        assert it["img"].shape == (3, 16)
        assert it["tgts"].shape == (5,)


def test_movienet_pointwise_augment_prefers_nonzero(tmp_path):
    jp, hp = make_movienet(tmp_path, n_items=3, max_tag_range=(3, 4))
    ds = MovieNetDataset(jp, hp, "pointwise", max_tags=8, max_imgs=2)
    it = ds.get(0)
    # augmented slots (beyond original tags) must repeat non-zero targets
    orig = 3
    extra = it["tgts"][orig:]
    assert np.all(extra != 0)


def test_movienet_ppo_pairs(tmp_path):
    jp, hp = make_movienet(tmp_path, n_items=3)
    ds = MovieNetDataset(jp, hp, "ppo", max_tags=4, max_imgs=2)
    assert len(ds) == 12  # 3 items x 4 pairs
    it = ds.get(0)
    assert it["text"].shape[0] == 2 and it["tgts"].shape == (2,)


def test_movienet_reward_pairs_from_index(tmp_path):
    jp, hp = make_movienet(tmp_path, n_items=3, with_index=True)
    ds = MovieNetDataset(jp, hp, "reward", max_imgs=2)
    assert len(ds) == 9  # 3 items x 3 prebuilt pairs
    it = ds.get(0)
    assert it["chosen_index"].shape == (4,)
    ch, rj = it["chosen_index"], it["reject_index"]
    assert set(map(tuple, [ch.tolist(), rj.tolist()])) <= {
        (0, 1, 0, 1), (0, 1, 1, 0), (1, 0, 0, 1), (1, 0, 1, 0)}
    assert ch.tolist()[:2] == rj.tolist()[:2]


def test_movienet_reward_eval_ordering(tmp_path):
    jp, hp = make_movienet(tmp_path, n_items=4)
    ds = MovieNetDataset(jp, hp, "reward_eval", max_tags=6, max_imgs=2)
    for i in range(len(ds)):
        it = ds.get(i)
        tg = it["tgts"]
        ch = it["chosen_index"]
        # chosen's last-two ordering must be target-descending (>= rule)
        assert tg[ch[2]] >= tg[ch[3]]


def test_letor_pipeline_roundtrip(tmp_path):
    p = make_svmlight(str(tmp_path / "f.txt"), n_rows=40, n_feat=8)
    arr = parse_svmlight_file(p, 8)
    assert arr.shape == (40, 10)
    assert np.all(np.diff(arr[:, 1]) >= 0)  # qid sorted
    arr2 = make_qids_disjoint(arr)
    assert np.all(arr2[:, 1] >= 100000)
    groups = group_queries(arr, docs_per_query=20)
    for g in groups.values():
        assert g.shape == (20, 10)


def test_ltr_datasets():
    q = LetorQueries(make_letor_groups())
    pw = LTRPointwiseDataset(q)
    assert pw.get(0)["text"].shape == (20, 16)
    rw = LTRRewardDataset(q, max_tags=5, relevance_classes=3)
    assert len(rw) > 0
    it = rw.get(0)
    labels = it["tgts"]
    ch = it["chosen_index"]
    assert labels[ch[2]] > labels[ch[3]]  # strict order for trad reward
    ppo_tr = LTRPPODataset(q, is_train=True, max_tags=3)
    assert len(ppo_tr) == 15
    assert ppo_tr.get(0)["text"].shape == (2, 16)
    ppo_ev = LTRPPODataset(q, is_train=False)
    assert ppo_ev.get(0)["text"].shape == (20, 16)


def test_loader_shuffle_and_wraparound():
    q = LetorQueries(make_letor_groups(n_queries=7))
    ds = LTRPointwiseDataset(q)
    loader = Loader(ds, batch_size=3, shuffle=True, seed=1)
    batches = list(loader)
    assert len(batches) == 3
    for b in batches:
        assert b["text"].shape == (3, 20, 16)
    loader.set_epoch(1)
    batches2 = list(loader)
    assert not np.allclose(batches[0]["text"], batches2[0]["text"])


def test_eval_loader_bucketing(tmp_path):
    jp, hp = make_movienet(tmp_path, n_items=6, max_tag_range=(3, 7))
    ds = MovieNetDataset(jp, hp, "eval", max_imgs=2)
    ev = EvalLoader(ds, buckets=[4, 8], batch_size=2)
    seen = 0
    for b in ev:
        t = b["text"].shape[1]
        assert t in (4, 8)
        assert b["mask"].shape == (2, t)
        seen += int(b["mask"].any(axis=1).sum())
    assert seen == 6

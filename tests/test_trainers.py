"""End-to-end smoke tests: every stage trains on synthetic fixtures on the
fake 8-device CPU mesh (dp=2) and produces finite losses / metrics in
range. Mirrors the reference's eval-as-test strategy (SURVEY §4) but as
real pytest units."""

import numpy as np
import pytest

from fixtures import make_letor_groups, make_movienet
from lr2ppo_tpu.config import Config, ModelConfig
from lr2ppo_tpu.data import (
    EvalLoader,
    LetorQueries,
    Loader,
    LTRPPODataset,
    LTRPointwiseDataset,
    LTRRewardDataset,
    MovieNetDataset,
)
from lr2ppo_tpu.train.pointwise import PointwiseTrainer, TwoDataTrainer, project_tsv
from lr2ppo_tpu.train.ppo import PPOTrainer
from lr2ppo_tpu.train.reward import RewardTrainer

TINY = dict(feat_size=16, seq_length=4, max_imgs=2, visual_feat_dim=16,
            num_heads=4)


def tiny_config(tmp_path, family="multimodal", mode="reg", **kw):
    cfg = Config()
    model = ModelConfig(**{**TINY, "family": family, "mode": mode})
    cfg = cfg.replace(
        model=model,
        epochs_num=kw.pop("epochs_num", 1),
        batch_size=4,
        report_steps=1000,
        output_model_path=str(tmp_path / "best.ckpt"),
        seed=3,
    )
    cfg.mesh.dp = 2
    for k, v in kw.items():
        setattr(cfg, k, v)
    return cfg


def test_pointwise_tabular_e2e(tmp_path):
    groups = make_letor_groups(n_queries=8, docs=6, n_feat=16)
    q = LetorQueries(groups)
    ds = LTRPointwiseDataset(q)
    train = Loader(ds, batch_size=4, shuffle=True, seed=0)
    ev = EvalLoader(ds, buckets=[6], batch_size=4)
    cfg = tiny_config(tmp_path, family="tabular", epochs_num=2)
    tr = PointwiseTrainer(cfg)
    state, best = tr.fit(train, ev)
    assert 0.0 < best <= 1.0
    assert (tmp_path / "best.ckpt").exists()


@pytest.mark.heavy
def test_pointwise_multimodal_cls_e2e(tmp_path):
    jp, hp = make_movienet(tmp_path / "d", n_items=8)
    ds = MovieNetDataset(jp, hp, "pointwise", max_tags=4, max_imgs=2)
    train = Loader(ds, batch_size=4, shuffle=True)
    ev_ds = MovieNetDataset(jp, hp, "eval", max_imgs=2)
    ev = EvalLoader(ev_ds, buckets=[8], batch_size=4)
    cfg = tiny_config(tmp_path, mode="cls")
    tr = PointwiseTrainer(cfg)
    state, best = tr.fit(train, ev)
    assert 0.0 < best <= 1.0


@pytest.mark.heavy
def test_reward_trainer_multimodal(tmp_path):
    jp, hp = make_movienet(tmp_path / "d", n_items=6, with_index=True)
    tr_ds = MovieNetDataset(jp, hp, "reward", max_imgs=2)
    ev_ds = MovieNetDataset(jp, hp, "reward_eval", max_tags=2, max_imgs=2)
    train = Loader(tr_ds, batch_size=4, shuffle=True)
    ev = Loader(ev_ds, batch_size=4, shuffle=False)
    cfg = tiny_config(tmp_path, epochs_num=1)
    tr = RewardTrainer(cfg)
    state, best = tr.fit(train, ev)
    assert 0.0 <= best <= 1.0


@pytest.mark.heavy
def test_reward_trainer_tabular_learns_separable(tmp_path):
    # labels encoded in the features -> accuracy should beat chance
    groups = make_letor_groups(n_queries=6, docs=8, n_feat=16, seed=1)
    for q, g in groups.items():
        g[:, 2] = g[:, 0] * 2.0  # feature 0 = 2*label, separable
    qq = LetorQueries(groups)
    tr_ds = LTRRewardDataset(qq, max_tags=8, relevance_classes=3, seed=0)
    ev_ds = LTRRewardDataset(qq, max_tags=4, relevance_classes=3, seed=9)
    train = Loader(tr_ds, batch_size=4, shuffle=True)
    ev = Loader(ev_ds, batch_size=4, shuffle=False)
    cfg = tiny_config(tmp_path, family="tabular", epochs_num=4)
    cfg.optim.learning_rate = 1e-3
    tr = RewardTrainer(cfg)
    state, best = tr.fit(train, ev)
    assert best > 0.55


@pytest.mark.heavy
def test_ppo_end_to_end(tmp_path):
    jp, hp = make_movienet(tmp_path / "d", n_items=6)
    cfg = tiny_config(tmp_path, epochs_num=1)
    cfg.ppo.update_timesteps = 2
    cfg.data.max_tags = 4

    def make_train_loader(epoch):
        ds = MovieNetDataset(jp, hp, "ppo", max_tags=2, max_imgs=2,
                             seed=epoch)
        return Loader(ds, batch_size=4, shuffle=True, seed=epoch)

    ev_ds = MovieNetDataset(jp, hp, "eval", max_imgs=2)
    ev = EvalLoader(ev_ds, buckets=[8], batch_size=4)
    tr = PPOTrainer(cfg)
    astate, cstate, best = tr.fit(make_train_loader, ev)
    assert 0.0 < best <= 1.0
    assert int(astate.step) >= 2  # at least one sweep of 2 memories ran


@pytest.mark.heavy
@pytest.mark.parametrize("mode", [True, "actor"])
def test_ppo_rollout_int8(tmp_path, monkeypatch, mode):
    """--rollout_int8: rollouts run from int8 views of the live
    actor/critic params, re-quantized once per sweep ('actor' keeps
    the critic bf16 — the fast profile's bs=256-fitting variant, r5).
    Zero the size gates so the tiny model actually takes the quantized
    path, and force the fused-FFN Pallas kernel off (its AUTO default
    is off on the multi-device CPU test backend anyway; the kernel has
    its own parity tests in test_int8.py)."""
    from lr2ppo_tpu.ops import int8 as int8_mod

    monkeypatch.setattr(int8_mod, "INT8_MIN_KERNEL_ELEMENTS", 0)
    monkeypatch.setattr(int8_mod, "INT8_DYNQUANT_MIN_FLOPS", 0)
    monkeypatch.setattr(int8_mod, "INT8_DYNQUANT_MIN_WIDTH", 0)
    jp, hp = make_movienet(tmp_path / "d", n_items=6)
    cfg = tiny_config(tmp_path, epochs_num=1)
    cfg.ppo.update_timesteps = 2
    cfg.ppo.rollout_int8 = mode
    cfg.data.max_tags = 4

    def make_train_loader(epoch):
        ds = MovieNetDataset(jp, hp, "ppo", max_tags=2, max_imgs=2,
                             seed=epoch)
        return Loader(ds, batch_size=4, shuffle=True, seed=epoch)

    ev_ds = MovieNetDataset(jp, hp, "eval", max_imgs=2)
    ev = EvalLoader(ev_ds, buckets=[8], batch_size=4)
    tr = PPOTrainer(cfg)
    astate, cstate, best = tr.fit(make_train_loader, ev)
    assert np.isfinite(best) and 0.0 <= best <= 1.0
    assert int(astate.step) >= 2
    # the trained params stay full-precision floats (int8 only ever
    # lives in the rollout views)
    k = astate.params["params"]["trunk"]["xit"]["ffn_fc1"]["kernel"]
    assert np.issubdtype(np.asarray(k).dtype, np.floating)


@pytest.mark.heavy
def test_ppo_tabular_smoke(tmp_path):
    groups = make_letor_groups(n_queries=6, docs=6, n_feat=16)
    q = LetorQueries(groups)
    cfg = tiny_config(tmp_path, family="tabular", epochs_num=1)
    cfg.ppo.update_timesteps = 2

    def make_train_loader(epoch):
        return Loader(LTRPPODataset(q, True, max_tags=2, seed=epoch),
                      batch_size=4, shuffle=True, seed=epoch)

    ev = EvalLoader(LTRPPODataset(q, False), buckets=[6], batch_size=4)
    tr = PPOTrainer(cfg)
    astate, cstate, best = tr.fit(make_train_loader, ev)
    assert np.isfinite(best)


@pytest.mark.heavy
def test_two_data_trainer_and_projection(tmp_path):
    ga = make_letor_groups(n_queries=4, docs=5, n_feat=7, seed=0)
    gb = make_letor_groups(n_queries=4, docs=5, n_feat=11, seed=1)
    qa, qb = LetorQueries(ga), LetorQueries(gb)
    cfg = tiny_config(tmp_path, family="tabular")
    cfg.model.trad_dims = [7, 11]
    loaders = [Loader(LTRPointwiseDataset(qa), 4),
               Loader(LTRPointwiseDataset(qb), 4)]
    evs = [EvalLoader(LTRPointwiseDataset(qa), buckets=[5], batch_size=4),
           EvalLoader(LTRPointwiseDataset(qb), buckets=[5], batch_size=4)]
    tr = TwoDataTrainer(cfg)
    state, best = tr.fit_two(loaders, evs)
    assert 0.0 < best <= 1.0

    # projection exporter: rows [label qid f...] -> [label qid 16 floats]
    rows = np.concatenate([np.zeros((6, 2), np.float32),
                           np.random.RandomState(0).randn(6, 7).astype(np.float32)],
                          axis=1)
    inp = tmp_path / "in.tsv"
    np.savetxt(inp, rows, delimiter="\t", fmt="%g")
    out = tmp_path / "out.tsv"
    project_tsv(cfg, state.params, str(inp), str(out), batch=4)
    got = np.loadtxt(out, delimiter="\t", ndmin=2)
    assert got.shape == (6, 2 + 16)

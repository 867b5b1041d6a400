"""Aux subsystems: NaN guard, trace window no-op, full-state save/resume."""

import numpy as np
import pytest

from fixtures import make_letor_groups
from lr2ppo_tpu.data import EvalLoader, LetorQueries, Loader, LTRPointwiseDataset
from lr2ppo_tpu.train.pointwise import PointwiseTrainer
from lr2ppo_tpu.utils import NonFiniteLossError, TraceWindow, check_finite


def test_check_finite():
    assert check_finite(1.5, 3) == 1.5
    with pytest.raises(NonFiniteLossError, match="step 7"):
        check_finite(float("nan"), 7)
    with pytest.raises(NonFiniteLossError, match="ckpt/x"):
        check_finite(float("inf"), 1, checkpoint_hint="ckpt/x")


@pytest.mark.heavy
def test_reward_trainer_aborts_on_nonfinite_loss(tmp_path):
    """Failure-detection parity: the reward trainer (like pointwise/PPO)
    must raise NonFiniteLossError at report time instead of training on
    silently (reference drops into pdb, ppo.py:576-578)."""
    from fixtures import make_movienet
    from lr2ppo_tpu.config import Config, ModelConfig
    from lr2ppo_tpu.data.movienet import MovieNetDataset
    from lr2ppo_tpu.train.reward import RewardTrainer

    jp, hp = make_movienet(tmp_path / "d", n_items=6, with_index=True)
    cfg = Config()
    cfg = cfg.replace(
        model=ModelConfig(feat_size=16, seq_length=4, max_imgs=2,
                          visual_feat_dim=16, num_heads=4,
                          family="multimodal"),
        epochs_num=1, batch_size=4, report_steps=1,
        output_model_path=str(tmp_path / "best.ckpt"), seed=3)
    cfg.mesh.dp = 2
    cfg.optim.learning_rate = float("nan")  # step 1 poisons the params
    tr_ds = MovieNetDataset(jp, hp, "reward", max_imgs=2)
    ev_ds = MovieNetDataset(jp, hp, "reward_eval", max_tags=2, max_imgs=2)
    tr = RewardTrainer(cfg)
    with pytest.raises(NonFiniteLossError, match="best.ckpt"):
        tr.fit(Loader(tr_ds, 4, shuffle=True), Loader(ev_ds, 4))


@pytest.mark.heavy
def test_pretrain_trainer_aborts_on_nonfinite_loss(tmp_path):
    """Same failure-detection contract for the pretraining trainer."""
    from lr2ppo_tpu.config import Config
    from lr2ppo_tpu.towers.model import TowerConfig
    from lr2ppo_tpu.train.pretrain import PretrainTrainer

    class Ds:
        def set_epoch(self, e):
            pass

        def __len__(self):
            return 8

        def get(self, i):
            rng = np.random.default_rng(i)
            src = rng.integers(5, 30, 8).astype(np.int32)
            tgt = np.where(rng.random(8) < 0.3, src, 0).astype(np.int32)
            return {"src": src, "tgt": tgt, "seg": np.ones(8, np.int32)}

    cfg = Config()
    cfg = cfg.replace(epochs_num=1, batch_size=4, report_steps=1,
                      output_model_path=str(tmp_path / "tower.ckpt"),
                      seed=0)
    cfg.mesh.dp = 2
    cfg.optim.learning_rate = float("nan")
    tcfg = TowerConfig(emb_size=16, hidden_size=16, feedforward_size=32,
                       heads_num=4, layers_num=1, max_seq_length=16,
                       vocab_size=32)
    tr = PretrainTrainer(cfg, tcfg)
    with pytest.raises(NonFiniteLossError, match="tower.ckpt-best"):
        tr.fit(Loader(Ds(), 4, shuffle=False))


def test_trace_window_noop():
    tw = TraceWindow(None)
    for s in range(30):
        tw.tick(s)
    tw.close()  # never started, never crashes


def _tiny_cfg(tmp_path):
    from lr2ppo_tpu.config import Config, ModelConfig

    cfg = Config()
    cfg = cfg.replace(
        model=ModelConfig(feat_size=16, seq_length=4, max_imgs=2,
                          visual_feat_dim=16, num_heads=4, family="tabular"),
        epochs_num=1, batch_size=4, report_steps=1000,
        output_model_path=str(tmp_path / "best.ckpt"), seed=3)
    cfg.mesh.dp = 2
    return cfg


def test_resume_continues_from_saved_state(tmp_path):
    # 24 query-items / bs 4 = 6 steps/epoch; 2 epochs; save every 5
    # steps so the last saved state is step 10 (epoch 2, batch 4).
    groups = make_letor_groups(n_queries=24, docs=6, n_feat=16)
    q = LetorQueries(groups)
    ds = LTRPointwiseDataset(q)
    train = Loader(ds, batch_size=4, shuffle=True, seed=0)
    ev = EvalLoader(ds, buckets=[6], batch_size=4)

    cfg = _tiny_cfg(tmp_path).replace(save_state_steps=5, epochs_num=2)
    tr = PointwiseTrainer(cfg)
    state, _ = tr.fit(train, ev)
    assert int(state.step) == 12
    state_path = str(tmp_path / "best.ckpt.state")
    import os

    assert os.path.exists(state_path)

    cfg2 = _tiny_cfg(tmp_path).replace(resume_path=state_path,
                                       epochs_num=2)
    tr2 = PointwiseTrainer(cfg2)
    state2, best2 = tr2.fit(train, ev)
    # fast-forward: resume at epoch 2 batch 5, so exactly 2 more steps —
    # NOT a full restart at epoch 1 (which would end at 10+12=22)
    assert int(state2.step) == 12
    assert np.isfinite(best2)
    # opt_state leaves carry the same shardings as their params
    import jax

    params_leaves = jax.tree.leaves(state2.params["params"])
    mu_like = [l for l in jax.tree.leaves(state2.opt_state)
               if hasattr(l, "sharding") and l.ndim > 0]
    param_shardings = {l.shape: l.sharding for l in params_leaves}
    for leaf in mu_like:
        if leaf.shape in param_shardings:
            assert leaf.sharding == param_shardings[leaf.shape], (
                f"opt_state leaf {leaf.shape} sharding mismatch")


@pytest.mark.heavy
def test_resume_at_epoch_boundary_keeps_key_stream(tmp_path):
    """Round-4 review: the dropout key stream splits once per step
    continuously across epochs, so a resume landing exactly on an epoch
    boundary (skip_batches == 0) still has a full epoch of splits behind
    it. Burning only the in-epoch remainder replayed epoch-1 dropout
    noise; the resumed run must be BIT-identical to uninterrupted."""
    groups = make_letor_groups(n_queries=24, docs=6, n_feat=16)
    ds = LTRPointwiseDataset(LetorQueries(groups))
    train = Loader(ds, batch_size=4, shuffle=True, seed=0)

    # 6 steps/epoch, 2 epochs; save at step 6 == end of epoch 1
    cfg = _tiny_cfg(tmp_path).replace(save_state_steps=6, epochs_num=2)
    tr = PointwiseTrainer(cfg)
    state_full, _ = tr.fit(train, None)
    assert int(state_full.step) == 12
    # the step-12 save overwrote step 6; rebuild the step-6 state file
    # by rerunning one epoch with the same seed (deterministic) and the
    # SAME schedule horizon (train_steps pins the optimizer `total`)
    cfg1 = _tiny_cfg(tmp_path).replace(save_state_steps=6, epochs_num=1,
                                       output_model_path=str(
                                           tmp_path / "ep1.ckpt"))
    PointwiseTrainer(cfg1).fit(train, None, train_steps=13)

    cfg2 = _tiny_cfg(tmp_path).replace(
        resume_path=str(tmp_path / "ep1.ckpt.state"), epochs_num=2)
    state_res, _ = PointwiseTrainer(cfg2).fit(train, None)
    assert int(state_res.step) == 12
    import jax

    for a, b in zip(jax.tree.leaves(state_full.params),
                    jax.tree.leaves(state_res.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_burn_keys_matches_sequential_splits():
    import jax

    from lr2ppo_tpu.train.common import burn_keys

    key = jax.random.PRNGKey(7)
    seq = key
    for _ in range(13):
        seq, _ = jax.random.split(seq)
    np.testing.assert_array_equal(np.asarray(burn_keys(key, 13)),
                                  np.asarray(seq))
    np.testing.assert_array_equal(np.asarray(burn_keys(key, 0)),
                                  np.asarray(key))


@pytest.mark.heavy
def test_resume_from_orbax_state(tmp_path):
    # a state saved with the orbax backend (directory) must also resume:
    # load_checkpoint raises, the trainer falls back to orbax and
    # re-grafts the plain-container tree onto the optax structure
    from lr2ppo_tpu.train import checkpoints

    groups = make_letor_groups(n_queries=24, docs=6, n_feat=16)
    ds = LTRPointwiseDataset(LetorQueries(groups))
    train = Loader(ds, batch_size=4, shuffle=True, seed=0)
    ev = EvalLoader(ds, buckets=[6], batch_size=4)

    cfg = _tiny_cfg(tmp_path).replace(epochs_num=1)
    tr = PointwiseTrainer(cfg)
    state, _ = tr.fit(train, ev)
    orbax_path = str(tmp_path / "orbax.state")
    checkpoints.save_checkpoint(
        orbax_path,
        {"params": state.params, "opt_state": state.opt_state,
         "step": int(state.step)},
        {"step": int(state.step)}, backend="orbax")

    cfg2 = _tiny_cfg(tmp_path).replace(resume_path=orbax_path,
                                       epochs_num=2)
    tr2 = PointwiseTrainer(cfg2)
    state2, best2 = tr2.fit(train, ev)
    assert int(state2.step) == 12  # 6 saved + epoch-2's 6 steps
    assert np.isfinite(best2)


@pytest.mark.heavy
def test_trainer_ckpt_backend_orbax(tmp_path):
    """cfg.ckpt_backend='orbax' routes EVERY trainer save (best +
    periodic .state) through the orbax directory backend — the
    TPU-idiomatic multi-host form (each pod host writes its own shards
    instead of rank-0 gathering the full state) — and resume reads it
    back transparently."""
    import os

    pytest.importorskip("orbax.checkpoint")
    groups = make_letor_groups(n_queries=24, docs=6, n_feat=16)
    ds = LTRPointwiseDataset(LetorQueries(groups))
    train = Loader(ds, batch_size=4, shuffle=True, seed=0)
    ev = EvalLoader(ds, buckets=[6], batch_size=4)

    cfg = _tiny_cfg(tmp_path).replace(
        epochs_num=1, save_state_steps=5, ckpt_backend="orbax",
        report_steps=3)
    state, _ = PointwiseTrainer(cfg).fit(train, ev)
    assert int(state.step) == 6
    # both artifacts are orbax DIRECTORIES, not pickle files
    assert os.path.isdir(str(tmp_path / "best.ckpt"))
    assert os.path.isdir(str(tmp_path / "best.ckpt.state"))

    cfg2 = cfg.replace(resume_path=str(tmp_path / "best.ckpt.state"),
                       epochs_num=2)
    state2, best2 = PointwiseTrainer(cfg2).fit(train, ev)
    assert int(state2.step) == 12
    assert np.isfinite(best2)


@pytest.mark.heavy
def test_trainer_ckpt_backend_orbax_async(tmp_path):
    """'orbax_async' overlaps the checkpoint disk write with training
    (orbax copies device->host before save() returns, then commits from
    a background thread); fit settles pending saves before returning, so
    the artifacts are durable directories — and resume reads them like
    any orbax checkpoint."""
    import os

    pytest.importorskip("orbax.checkpoint")
    groups = make_letor_groups(n_queries=24, docs=6, n_feat=16)
    ds = LTRPointwiseDataset(LetorQueries(groups))
    train = Loader(ds, batch_size=4, shuffle=True, seed=0)
    ev = EvalLoader(ds, buckets=[6], batch_size=4)

    cfg = _tiny_cfg(tmp_path).replace(
        epochs_num=1, save_state_steps=5, ckpt_backend="orbax_async",
        report_steps=3)
    state, _ = PointwiseTrainer(cfg).fit(train, ev)
    assert int(state.step) == 6
    assert os.path.isdir(str(tmp_path / "best.ckpt"))
    assert os.path.isdir(str(tmp_path / "best.ckpt.state"))

    cfg2 = cfg.replace(resume_path=str(tmp_path / "best.ckpt.state"),
                       epochs_num=2)
    state2, best2 = PointwiseTrainer(cfg2).fit(train, ev)
    assert int(state2.step) == 12
    assert np.isfinite(best2)


def test_unknown_ckpt_backend_raises(tmp_path):
    """A typo'd backend must fail loudly, not silently write pickle."""
    from lr2ppo_tpu.train import checkpoints

    with pytest.raises(ValueError, match="orbx"):
        checkpoints.save_checkpoint(str(tmp_path / "x.ckpt"), {"w": 1},
                                    backend="orbx")


@pytest.mark.heavy
def test_ppo_resume_continues(tmp_path):
    from fixtures import make_movienet
    from lr2ppo_tpu.config import Config, ModelConfig
    from lr2ppo_tpu.data.movienet import MovieNetDataset
    from lr2ppo_tpu.train.ppo import PPOTrainer

    jp, hp = make_movienet(tmp_path / "d", n_items=8)

    def base_cfg(epochs):
        cfg = Config()
        cfg = cfg.replace(
            model=ModelConfig(feat_size=16, seq_length=4, max_imgs=2,
                              visual_feat_dim=16, num_heads=4,
                              family="multimodal", mode="reg"),
            epochs_num=epochs, batch_size=4, report_steps=1000,
            output_model_path=str(tmp_path / "best.ckpt"), seed=3,
            save_state_steps=1)
        cfg.mesh.dp = 2
        cfg.ppo.update_timesteps = 2
        return cfg

    def make_train_loader(epoch):
        ds = MovieNetDataset(jp, hp, "ppo", max_tags=2, max_imgs=2,
                             seed=epoch)
        return Loader(ds, 4, shuffle=True, seed=epoch)

    ev = EvalLoader(MovieNetDataset(jp, hp, "eval", max_imgs=2),
                    buckets=[8], batch_size=4)
    # 16 examples / bs 4 = 4 batches/epoch; sweep every 2 -> 2 sweeps/ep
    tr = PPOTrainer(base_cfg(2))
    astate, cstate, _ = tr.fit(make_train_loader, ev)
    state_path = str(tmp_path / "best.ckpt.state")
    import os

    assert os.path.exists(state_path)

    cfg2 = base_cfg(3).replace(resume_path=state_path)
    tr2 = PPOTrainer(cfg2)
    a2, c2, best2 = tr2.fit(make_train_loader, ev)
    # resumed at epoch 3 with 4 saved sweeps -> exactly 2 more sweeps of
    # 2 updates each on both nets (not a restart: that would be 10)
    assert int(a2.step) == int(astate.step) + 4
    assert int(c2.step) == int(cstate.step) + 4
    assert np.isfinite(best2)


@pytest.mark.heavy
def test_reward_resume_continues(tmp_path):
    from fixtures import make_movienet
    from lr2ppo_tpu.config import Config, ModelConfig
    from lr2ppo_tpu.data.movienet import MovieNetDataset
    from lr2ppo_tpu.train.reward import RewardTrainer

    jp, hp = make_movienet(tmp_path / "d", n_items=6, with_index=True)

    def base_cfg(epochs):
        cfg = Config()
        cfg = cfg.replace(
            model=ModelConfig(feat_size=16, seq_length=4, max_imgs=2,
                              visual_feat_dim=16, num_heads=4,
                              family="multimodal"),
            epochs_num=epochs, batch_size=4, report_steps=1000,
            output_model_path=str(tmp_path / "best.ckpt"), seed=3,
            save_state_steps=2)
        cfg.mesh.dp = 2
        return cfg

    tr_ds = MovieNetDataset(jp, hp, "reward", max_imgs=2)
    ev_ds = MovieNetDataset(jp, hp, "reward_eval", max_tags=2, max_imgs=2)
    train = Loader(tr_ds, 4, shuffle=True)
    ev = Loader(ev_ds, 4, shuffle=False)
    spe = len(train)

    tr = RewardTrainer(base_cfg(1))
    state, _ = tr.fit(train, ev)
    assert int(state.step) == spe

    cfg2 = base_cfg(2).replace(
        resume_path=str(tmp_path / "best.ckpt.state"))
    tr2 = RewardTrainer(cfg2)
    state2, best2 = tr2.fit(train, ev)
    # invariant: resuming mid-stream and running to epochs_num=2 always
    # lands on exactly 2 full epochs' worth of optimizer steps
    assert int(state2.step) == 2 * spe
    assert np.isfinite(best2)


@pytest.mark.heavy
def test_two_data_resume_continues(tmp_path):
    """VERDICT r2 #8: fit_two now has save_state_steps / resume_path /
    check_finite like every other trainer. 2 domains x 4 queries / bs 4
    = 2 steps/loader/epoch = 4 steps/epoch; save every 3 -> last state
    at step 6 (epoch 2, 2 batches in)."""
    import os

    from fixtures import make_letor_groups
    from lr2ppo_tpu.train.pointwise import TwoDataTrainer

    ga = make_letor_groups(n_queries=8, docs=5, n_feat=7, seed=0)
    gb = make_letor_groups(n_queries=8, docs=5, n_feat=11, seed=1)
    qa, qb = LetorQueries(ga), LetorQueries(gb)

    def mk_cfg():
        cfg = _tiny_cfg(tmp_path).replace(epochs_num=2, save_state_steps=3)
        cfg.model.trad_dims = [7, 11]
        return cfg

    def mk_loaders():
        return ([Loader(LTRPointwiseDataset(qa), 4, seed=5),
                 Loader(LTRPointwiseDataset(qb), 4, seed=7)],
                [EvalLoader(LTRPointwiseDataset(qa), buckets=[5],
                            batch_size=4),
                 EvalLoader(LTRPointwiseDataset(qb), buckets=[5],
                            batch_size=4)])

    loaders, evs = mk_loaders()
    tr = TwoDataTrainer(mk_cfg())
    state, _ = tr.fit_two(loaders, evs)
    assert int(state.step) == 8
    state_path = str(tmp_path / "best.ckpt.state")
    assert os.path.exists(state_path)

    loaders2, evs2 = mk_loaders()
    cfg2 = mk_cfg().replace(resume_path=state_path)
    tr2 = TwoDataTrainer(cfg2)
    state2, best2 = tr2.fit_two(loaders2, evs2)
    # resumed at epoch 2 batch 3: exactly 2 more steps, not 6+8
    assert int(state2.step) == 8
    assert np.isfinite(best2)
    # both domain projections survived the round-trip
    assert "text_proj" in state2.params["params"]
    assert "text_proj3" in state2.params["params"]

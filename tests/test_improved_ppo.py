"""Improved-PPO opt-ins (VERDICT r2 #7): GAE advantages and the real
clipped surrogate. Both default OFF — the faithful reference math is the
parity path (tests/test_training_dynamics.py pins it); these tests pin
the improved semantics and that the trainer runs end-to-end with them.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lr2ppo_tpu.ops import gae_advantages, pl_log_prob


def test_pl_log_prob_two_items_matches_softmax():
    scores = jnp.asarray([[1.0, 2.0, 0.5]])
    order = jnp.asarray([[1, 0]])
    # PL over the taken ranking: each pick is softmaxed against the
    # not-yet-picked suffix of the chosen order
    s = np.array([1.0, 2.0, 0.5])
    lp1 = s[1] - np.logaddexp(s[1], s[0])
    lp2 = s[0] - s[0]
    got = float(pl_log_prob(scores, order)[0])
    np.testing.assert_allclose(got, lp1 + lp2, rtol=1e-6)

    # full-order probabilities over 2 items sum to 1
    a = float(pl_log_prob(scores[:, :2], jnp.asarray([[0, 1]]))[0])
    b = float(pl_log_prob(scores[:, :2], jnp.asarray([[1, 0]]))[0])
    np.testing.assert_allclose(np.exp(a) + np.exp(b), 1.0, rtol=1e-6)


def test_gae_reduces_to_one_step_when_episodic():
    # cont == 0 everywhere (max_timesteps=1): adv must equal r - V
    rng = np.random.RandomState(0)
    r = jnp.asarray(rng.randn(5, 3).astype(np.float32))
    v = jnp.asarray(rng.randn(5, 3).astype(np.float32))
    cont = jnp.zeros(5)
    adv, ret = gae_advantages(r, v, cont, 0.99, 0.95)
    np.testing.assert_allclose(np.asarray(adv), np.asarray(r - v),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ret), np.asarray(r), rtol=1e-5,
                               atol=1e-6)


def test_gae_matches_reference_recursion():
    rng = np.random.RandomState(1)
    n, b = 6, 2
    gamma, lam = 0.9, 0.8
    r = rng.randn(n, b).astype(np.float32)
    v = rng.randn(n, b).astype(np.float32)
    # one trajectory of 4 steps, then one of 2
    cont = np.array([1, 1, 1, 0, 1, 0], np.float32)
    adv, ret = gae_advantages(jnp.asarray(r), jnp.asarray(v),
                              jnp.asarray(cont), gamma, lam)
    # reference recursion
    expect = np.zeros_like(r)
    nextadv = np.zeros(b, np.float32)
    nextv = np.zeros(b, np.float32)
    for i in reversed(range(n)):
        delta = r[i] + gamma * cont[i] * nextv - v[i]
        nextadv = delta + gamma * lam * cont[i] * nextadv
        expect[i] = nextadv
        nextv = v[i]
    np.testing.assert_allclose(np.asarray(adv), expect, rtol=1e-5,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(ret), expect + v, rtol=1e-5,
                               atol=1e-6)


def test_gae_rejects_misaligned_sweep_window(tmp_path):
    """use_gae + a sweep window that cuts trajectories mid-way would
    bootstrap V=0 inside a trajectory — must be rejected up front
    (ADVICE r3)."""
    from test_trainers import tiny_config
    from lr2ppo_tpu.train.ppo import PPOTrainer

    cfg = tiny_config(tmp_path, epochs_num=1)
    cfg = cfg.replace(ppo=dataclasses.replace(
        cfg.ppo, update_timesteps=3, max_timesteps=2, use_gae=True))
    with pytest.raises(ValueError, match="multiple of max_timesteps"):
        PPOTrainer(cfg).fit(lambda e: None, None)


@pytest.mark.heavy
def test_improved_ppo_trains_end_to_end(tmp_path):
    """GAE(mt=2 trajectories) + surrogate clip through the real trainer."""
    from fixtures import make_movienet
    from test_trainers import tiny_config
    from lr2ppo_tpu.data import EvalLoader, Loader, MovieNetDataset
    from lr2ppo_tpu.train.ppo import PPOTrainer

    jp, hp = make_movienet(tmp_path / "d", n_items=6)
    cfg = tiny_config(tmp_path, epochs_num=1)
    cfg = cfg.replace(ppo=dataclasses.replace(
        cfg.ppo, update_timesteps=4, max_timesteps=2, use_gae=True,
        surrogate_clip=True, eps_clip=0.2))
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
    assert int(astate.step) >= 3


def test_eval_steps_decouples_eval_cadence(tmp_path, monkeypatch):
    """--eval_steps N: the full-val NDCG pass runs every Nth sweep plus
    once at the end, instead of after every sweep (VERDICT r2 weak #9)."""
    from fixtures import make_movienet
    from test_trainers import tiny_config
    from lr2ppo_tpu.data import EvalLoader, Loader, MovieNetDataset
    from lr2ppo_tpu.train import ppo as ppo_mod

    jp, hp = make_movienet(tmp_path / "d", n_items=8)
    cfg = tiny_config(tmp_path, epochs_num=2)
    cfg.ppo.update_timesteps = 2
    cfg = cfg.replace(eval_steps=3)
    cfg.data.max_tags = 4

    calls = {"n": 0}
    real_eval = ppo_mod.evaluate_ndcg

    def counting_eval(*a, **kw):
        calls["n"] += 1
        return real_eval(*a, **kw)

    monkeypatch.setattr(ppo_mod, "evaluate_ndcg", counting_eval)

    def make_train_loader(epoch):
        ds = MovieNetDataset(jp, hp, "ppo", max_tags=2, max_imgs=2,
                             seed=epoch)
        return Loader(ds, batch_size=4, shuffle=True, seed=epoch)

    ev_ds = MovieNetDataset(jp, hp, "eval", max_imgs=2)
    ev = EvalLoader(ev_ds, buckets=[8], batch_size=4)
    tr = ppo_mod.PPOTrainer(cfg)
    astate, _, best = tr.fit(make_train_loader, ev)
    sweeps = int(astate.step) // 2
    # every 3rd sweep, plus the final pass only when the run did not end
    # on an eval boundary (no duplicated back-to-back full-val pass)
    expected = sweeps // 3 + (1 if sweeps % 3 else 0)
    assert calls["n"] == expected, (calls["n"], expected, sweeps)
    assert np.isfinite(best) and best > 0


def test_final_eval_best_reaches_resume_state(tmp_path):
    """A best score found by the end-of-run decoupled eval must reach
    the .state resume checkpoint even when the run ended on a clean
    save boundary (pending_save False) — otherwise a resumed run
    restores a stale lower watermark and can overwrite best.ckpt with
    worse params."""
    from fixtures import make_movienet
    from test_trainers import tiny_config
    from lr2ppo_tpu.data import EvalLoader, Loader, MovieNetDataset
    from lr2ppo_tpu.train import ppo as ppo_mod
    from lr2ppo_tpu.train.checkpoints import load_checkpoint

    jp, hp = make_movienet(tmp_path / "d", n_items=8)
    cfg = tiny_config(tmp_path, epochs_num=1)
    cfg.ppo.update_timesteps = 2
    # eval only at the end (cadence larger than the sweep count) and
    # save .state every sweep so pending_save is False at loop exit
    cfg = cfg.replace(eval_steps=10 ** 6, save_state_steps=2)
    cfg.data.max_tags = 4

    def make_train_loader(epoch):
        ds = MovieNetDataset(jp, hp, "ppo", max_tags=2, max_imgs=2,
                             seed=epoch)
        return Loader(ds, batch_size=4, shuffle=True, seed=epoch)

    ev_ds = MovieNetDataset(jp, hp, "eval", max_imgs=2)
    ev = EvalLoader(ev_ds, buckets=[8], batch_size=4)
    _a, _c, best = ppo_mod.PPOTrainer(cfg).fit(make_train_loader, ev)
    assert np.isfinite(best) and best > 0
    tree, _meta = load_checkpoint(cfg.output_model_path + ".state")
    # the final eval was the ONLY eval, so its score is the watermark
    # (f32 storage in the pickle: allclose, not equal)
    np.testing.assert_allclose(float(tree["best"]), best, rtol=1e-6)

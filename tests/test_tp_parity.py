"""Numeric parity of megatron tensor parallelism: training with the
fusion MLPs and tower matmuls column/row-sharded over tp must produce
the same parameters as pure data parallelism — tp changes the layout,
never the math (SURVEY §2.5; parallel/mesh.py sharding rules)."""
import numpy as np
import pytest

import jax

from lr2ppo_tpu.config import Config, ModelConfig
from lr2ppo_tpu.data import EvalLoader
from lr2ppo_tpu.data.pipeline import Loader

FEAT, SEQ, IMGS, TAGS, BS, N = 8, 3, 2, 2, 8, 16


class _DS:
    def __init__(self):
        rng = np.random.RandomState(7)
        self.items = [
            dict(text=rng.randn(TAGS, SEQ, FEAT).astype(np.float32),
                 img=rng.randn(IMGS, FEAT).astype(np.float32),
                 tgts=rng.randint(0, 3, (TAGS,)).astype(np.float32))
            for _ in range(N)]

    def set_epoch(self, e):
        pass

    def __len__(self):
        return N

    def get(self, i):
        return self.items[i]


def _cfg(dp: int, tp: int) -> Config:
    mcfg = ModelConfig(family="multimodal", feat_size=FEAT,
                       seq_length=SEQ, max_imgs=IMGS, num_heads=2,
                       mode="reg", drop_p=0.0, forward_drop_p=0.0)
    cfg = Config(model=mcfg)
    cfg = cfg.replace(epochs_num=1, batch_size=BS, report_steps=10 ** 6,
                      output_model_path="", seed=3)
    cfg.mesh.dp = dp
    cfg.mesh.tp = tp
    return cfg


def _train(dp: int, tp: int):
    from lr2ppo_tpu.train.pointwise import PointwiseTrainer

    loader = Loader(_DS(), BS, shuffle=True, seed=5, num_workers=1)
    ev = EvalLoader(_DS(), buckets=[TAGS], batch_size=BS)
    state, best = PointwiseTrainer(_cfg(dp, tp)).fit(loader, ev)
    host = jax.tree.map(np.asarray, jax.device_get(state.params))
    return host, float(best)


from fixtures import flatten_tree as _flat  # noqa: E402


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8-device mesh")
@pytest.mark.heavy
def test_tp2_matches_dp_only_training():
    p_dp, best_dp = _train(dp=8, tp=1)
    p_tp, best_tp = _train(dp=4, tp=2)
    np.testing.assert_allclose(best_tp, best_dp, rtol=1e-4)
    f_dp, f_tp = _flat(p_dp), _flat(p_tp)
    assert f_dp.keys() == f_tp.keys()
    for k in f_dp:
        # sharded matmuls reduce in a different order than replicated
        # ones: allclose, not bit-equal
        np.testing.assert_allclose(f_tp[k], f_dp[k], rtol=2e-4,
                                   atol=2e-5, err_msg=k)


def _train_ppo(dp: int, tp: int):
    from lr2ppo_tpu.train.ppo import PPOTrainer

    cfg = _cfg(dp, tp)
    cfg.ppo.update_timesteps = 2
    cfg.data.max_tags = TAGS

    def make_train_loader(epoch):
        return Loader(_DS(), BS, shuffle=True, seed=epoch, num_workers=1)

    ev = EvalLoader(_DS(), buckets=[TAGS], batch_size=BS)
    astate, _cstate, best = PPOTrainer(cfg).fit(make_train_loader, ev)
    host = jax.tree.map(np.asarray, jax.device_get(astate.params))
    return host, float(best)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8-device mesh")
@pytest.mark.heavy
def test_ppo_tp2_matches_dp_only_training():
    # the flagship stage: rollout (actor+critic+reward, sort, reward
    # gather) + |adv|-weighted rank-hinge update under tp sharding
    p_dp, best_dp = _train_ppo(dp=8, tp=1)
    p_tp, best_tp = _train_ppo(dp=4, tp=2)
    np.testing.assert_allclose(best_tp, best_dp, rtol=1e-4)
    f_dp, f_tp = _flat(p_dp), _flat(p_tp)
    assert f_dp.keys() == f_tp.keys()
    for k in f_dp:
        np.testing.assert_allclose(f_tp[k], f_dp[k], rtol=2e-4,
                                   atol=2e-5, err_msg=k)

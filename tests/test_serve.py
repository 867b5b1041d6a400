"""cli/serve.py — the production ranking service (VERDICT r4 #7):
checkpoint -> bucketed EvalLoader -> jitted _scores_and_ndcg ->
jsonl rankings, under the fake 8-device mesh (DeviceCtx dp placement,
cfg.mesh defaults). Verifies the jsonl schema, score ordering, int8
defaulting, and parity of the served scores with a direct model apply."""

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fixtures import make_movienet
from test_trainers import tiny_config
from lr2ppo_tpu.cli import ENTRY_POINTS
from lr2ppo_tpu.models import ScoreModel
from lr2ppo_tpu.train import checkpoints


def _serve_argv(cfg, jp, out, extra=()):
    m = cfg.model
    return [
        "--pretrained_model_path", cfg.output_model_path,
        "--test_path", str(jp),
        "--ranking_path", str(out),
        "--family", m.family, "--feat_size", str(m.feat_size),
        "--seq_length", str(m.seq_length), "--num_heads",
        str(m.num_heads), "--max_imgs", str(m.max_imgs),
        "--mode", m.mode, "--compute_dtype", "float32",
        "--batch_size", "4", "--dp", "2", "--item_dtype", "float32",
        *extra,
    ]


@pytest.fixture(scope="module")
def served(tmp_path_factory):
    """One checkpoint + one bf16-off serve run shared by the assertions."""
    tmp_path = tmp_path_factory.mktemp("serve")
    jp, hp = make_movienet(tmp_path / "d", n_items=8, seq=4, feat=16,
                           n_imgs_range=(1, 3))
    cfg = tiny_config(tmp_path)
    model = ScoreModel(cfg.model, jnp.float32)
    text = jnp.zeros((1, 2, cfg.model.seq_length, cfg.model.feat_size))
    img = jnp.zeros((1, cfg.model.max_imgs, cfg.model.feat_size))
    params = model.init(jax.random.PRNGKey(7), text, img)
    checkpoints.save_checkpoint(cfg.output_model_path, {"actor": params})

    from lr2ppo_tpu.cli import serve

    out = tmp_path / "rankings.jsonl"
    res = serve.main(_serve_argv(cfg, jp, out, ["--int8", "false"]))
    lines = [json.loads(ln) for ln in open(out)]
    return cfg, jp, hp, params, model, res, lines, tmp_path


def test_serve_is_an_entry_point():
    assert "serve" in ENTRY_POINTS


def test_serve_emits_one_ranking_per_item(served):
    _, jp, _, _, _, res, lines, _ = served
    items = json.load(open(jp))
    assert len(lines) == len(items) == res["items"]
    assert res["int8"] is False
    ids = {ln["id"] for ln in lines}
    assert ids == {it["id"] for it in items}


def test_serve_schema_and_ordering(served):
    _, _, _, _, _, _, lines, _ = served
    for ln in lines:
        assert set(ln) >= {"id", "pred_order", "pred_scores", "tags",
                           "tags_rearranged"}
        s = ln["pred_scores"]
        assert s == sorted(s, reverse=True)
        assert sorted(ln["pred_order"]) == list(range(len(s)))
        assert [ln["tags"][j] for j in ln["pred_order"]] \
            == ln["tags_rearranged"]
        # fixture items carry gold labels with at least one positive
        assert "ndcg" in ln and len(ln["ndcg"]) >= 1


def test_serve_scores_match_direct_apply(served):
    """The service's scores are the model's scores: recompute one item's
    tag scores with a direct apply on the same embeddings."""
    cfg, jp, hp, params, model, _, lines, _ = served
    import h5py

    items = {it["id"]: it for it in json.load(open(jp))}
    ln = lines[0]
    with h5py.File(hp, "r") as f:
        text = np.asarray(f[ln["id"]]["text_emb"], np.float32)
        img = np.asarray(f[ln["id"]]["img_emb"])[0].astype(np.float32)
    t = len(ln["pred_scores"])
    # eval mode pads/cycles images to max_imgs like the dataset does
    reps = int(np.ceil(cfg.model.max_imgs / img.shape[0]))
    img = np.tile(img, (reps, 1))[: cfg.model.max_imgs]
    scores = model.apply(params, jnp.asarray(text[None, :t]),
                         jnp.asarray(img[None]))
    direct = np.sort(np.asarray(scores[0], np.float64))[::-1]
    np.testing.assert_allclose(direct, ln["pred_scores"], rtol=1e-4,
                               atol=1e-5)


def test_serve_int8_defaults_on(served):
    cfg, jp, _, _, _, _, lines_bf16, tmp_path = served
    from lr2ppo_tpu.cli import serve

    out = tmp_path / "rankings_int8.jsonl"
    res = serve.main(_serve_argv(cfg, jp, out))
    assert res["int8"] is True
    lines = [json.loads(ln) for ln in open(out)]
    assert len(lines) == len(lines_bf16)
    # tiny kernels sit below the size gate -> numerically identical here
    by_id = {ln["id"]: ln for ln in lines_bf16}
    for ln in lines:
        np.testing.assert_allclose(ln["pred_scores"],
                                   by_id[ln["id"]]["pred_scores"],
                                   rtol=1e-4, atol=1e-5)

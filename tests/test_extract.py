"""Feature-precompute path: tiny towers embed tags + frames, write
clean_feat.h5 in the reference layout, and the MovieNet dataset consumes
it — the full offline -> online loop."""

import json

import numpy as np

from lr2ppo_tpu.data.movienet import MovieNetDataset
from lr2ppo_tpu.data.tokenizers import CharTokenizer
from lr2ppo_tpu.towers import TowerConfig
from lr2ppo_tpu.towers.extract import (
    ImageFeatureExtractor,
    TextFeatureExtractor,
    write_clean_feat,
)

import jax


def tiny_text_cfg():
    return TowerConfig.from_dict(dict(
        emb_size=16, hidden_size=16, feedforward_size=32, heads_num=4,
        layers_num=1, max_seq_length=32, dropout=0.0, vocab_size=30,
        embedding=["word", "pos"], encoder="transformer",
        mask="fully_visible", target=["mlm"]))


def tiny_vit_cfg():
    return TowerConfig.from_dict(dict(
        emb_size=16, hidden_size=16, feedforward_size=32, heads_num=4,
        layers_num=1, dropout=0.0, max_seq_length=5,
        embedding=["patch", "pos"], remove_embedding_layernorm=True,
        encoder="transformer", mask="fully_visible",
        layernorm_positioning="pre", target=["cls"],
        image_height=8, image_width=8, patch_size=4, labels_num=2))


def test_extract_to_movienet_roundtrip(tmp_path):
    from lr2ppo_tpu.towers.model import TowerModel

    tok = CharTokenizer()
    tok.vocab = {c: i for i, c in enumerate("<abcdefghij>")}
    tok.inv_vocab = {v: k for k, v in tok.vocab.items()}

    tcfg, vcfg = tiny_text_cfg(), tiny_vit_cfg()
    tmodel, vmodel = TowerModel(tcfg), TowerModel(vcfg)
    src = np.zeros((1, 8), np.int32)
    seg = np.ones((1, 8), np.int32)
    tparams = tmodel.init(jax.random.PRNGKey(0), src, seg,
                          method=tmodel.encode)
    img = np.zeros((1, 3, 8, 8), np.float32)
    vparams = vmodel.init(jax.random.PRNGKey(1), img,
                          np.ones((1, 5), np.int32), method=vmodel.encode)

    tx = TextFeatureExtractor(tcfg, tparams, tok, seq_length=8,
                              cls_id=0, sep_id=11, pad_id=1)
    ix = ImageFeatureExtractor(vcfg, vparams)

    items = []
    h5_path = str(tmp_path / "clean_feat.h5")
    import h5py

    with h5py.File(h5_path, "w") as hf:
        for iid in ("item0", "item1"):
            tags = ["abc", "def", "ghij"]
            text_emb = tx(tags, batch=2)            # (3, 8, 16)
            assert text_emb.shape == (3, 8, 16)
            frames = np.random.RandomState(0).rand(2, 3, 8, 8).astype(
                np.float32)
            img_emb = ix(frames, batch=2)           # (2, 16)
            assert img_emb.shape == (2, 16)
            write_clean_feat(h5_path, iid, text_emb, img_emb, h5_file=hf)
            items.append({"id": iid, "tags": [
                {"tag": t, "target": i % 3} for i, t in enumerate(tags)]})

    jp = tmp_path / "data.json"
    jp.write_text(json.dumps(items))
    ds = MovieNetDataset(str(jp), h5_path, "eval", max_imgs=2)
    item = ds.get(0)
    assert item["text"].shape == (3, 8, 16)
    assert item["img"].shape == (2, 16)
    assert np.isfinite(item["text"]).all()


def test_load_frames_threaded_matches_sequential(tmp_path):
    """VERDICT r2 #10: thread-pool decode must yield byte-identical
    frames in the same (sorted) order as the sequential path, skipping
    unreadable files either way."""
    from PIL import Image

    from lr2ppo_tpu.cli.preprocess import load_frames

    d = tmp_path / "item0"
    d.mkdir()
    rng = np.random.RandomState(0)
    for i in range(6):
        arr = (rng.rand(10, 12, 3) * 255).astype(np.uint8)
        Image.fromarray(arr).save(d / f"f{i:02d}.png")
    (d / "broken.png").write_bytes(b"not an image")

    seq = load_frames(str(d), 8, 8, workers=1)
    par = load_frames(str(d), 8, 8, workers=4)
    assert seq.shape == (6, 3, 8, 8)
    np.testing.assert_array_equal(seq, par)

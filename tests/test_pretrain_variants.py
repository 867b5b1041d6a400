"""LM / CLS / ViT / CLIP pretraining data processors and an LM + CLS
train-step smoke through TowerModel."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lr2ppo_tpu.data.pretrain_data import (
    ClsTsvDataset,
    LmCorpusDataset,
    MlmCorpusDataset,
)
from lr2ppo_tpu.data.tokenizers import SpaceTokenizer
from lr2ppo_tpu.towers import TowerConfig, build_model


def _vocab(tmp_path):
    vp = tmp_path / "v.txt"
    toks = ["<pad>", "<unk>", "<s>", "</s>", "<mask>"] + list("abcdefgh")
    vp.write_text("".join(t + "\n" for t in toks))
    return SpaceTokenizer(str(vp))


def test_lm_dataset_shift(tmp_path):
    tok = _vocab(tmp_path)
    corpus = tmp_path / "c.txt"
    corpus.write_text("a b c d e f g h\n" * 10)
    ds = LmCorpusDataset(str(corpus), tok, seq_length=16, vocab_size=13,
                         mask_id=4)
    item = ds.get(0)
    assert item["src"].shape == (15,) and item["tgt"].shape == (15,)
    # next-token alignment: tgt[j] is the token after src[j]
    full = np.concatenate([item["src"][:1], item["tgt"]])
    np.testing.assert_array_equal(item["src"][1:5], full[1:5])


def test_cls_dataset(tmp_path):
    tok = _vocab(tmp_path)
    tsv = tmp_path / "d.tsv"
    tsv.write_text("0\ta b c\n1\td e f g\n")
    ds = ClsTsvDataset(str(tsv), tok, seq_length=8)
    assert len(ds) == 2
    item = ds.get(1)
    assert item["tgt"] == 1
    assert item["seg"].sum() == 6  # cls + 4 tokens + sep


@pytest.mark.heavy
@pytest.mark.parametrize("target,ds_kind", [("lm", "lm"), ("cls", "cls")])
def test_tower_train_step_on_variant(tmp_path, target, ds_kind):
    tok = _vocab(tmp_path)
    cfg = TowerConfig.from_dict(dict(
        emb_size=16, hidden_size=16, feedforward_size=32, heads_num=4,
        layers_num=1, max_seq_length=32, dropout=0.0, vocab_size=13,
        embedding=["word", "pos"], encoder="transformer",
        mask="causal" if target == "lm" else "fully_visible",
        target=[target], labels_num=2, pooling="first"))
    model = build_model(cfg)
    if ds_kind == "lm":
        corpus = tmp_path / "c.txt"
        corpus.write_text("a b c d e f g h\n" * 5)
        ds = LmCorpusDataset(str(corpus), tok, 16, 13, 4)
    else:
        tsv = tmp_path / "d.tsv"
        tsv.write_text("0\ta b c\n1\td e f g\n1\th a\n0\tb c\n")
        ds = ClsTsvDataset(str(tsv), tok, 16)
    batch = {k: np.stack([ds.get(i)[k] for i in range(2)])
             for k in ds.get(0)}
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(batch["src"]),
                        jnp.asarray(batch["tgt"]), jnp.asarray(batch["seg"]))

    def loss_fn(p):
        out = model.apply(p, jnp.asarray(batch["src"]),
                          jnp.asarray(batch["tgt"]),
                          jnp.asarray(batch["seg"]))
        return out[0]

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    assert all(np.isfinite(np.asarray(g)).all()
               for g in jax.tree.leaves(grads))


def test_clip_pair_dataset_shapes(tmp_path):
    from PIL import Image

    tok = _vocab(tmp_path)
    img_path = tmp_path / "i.png"
    Image.fromarray(
        np.random.RandomState(0).randint(0, 255, (8, 8, 3), np.uint8)
    ).save(img_path)
    from lr2ppo_tpu.data.pretrain_data import ClipPairDataset

    ds = ClipPairDataset([("a b c", str(img_path))], tok, seq_length=8,
                         image_height=8, image_width=8, patch_size=4)
    item = ds.get(0)
    assert item["src_text"].shape == (8,)
    assert item["src_image"].shape == (3, 8, 8)
    assert item["seg_image"].shape == (5,)

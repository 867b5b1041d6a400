"""Composite tower paths not covered elsewhere: the transformer decoder
(seq2seq), the dual encoder + CLIP contrastive target, word_patch, and
multi-target composition."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lr2ppo_tpu.towers import TowerConfig, build_model

TINY = dict(emb_size=16, hidden_size=16, feedforward_size=32, heads_num=4,
            layers_num=1, max_seq_length=16, dropout=0.0, vocab_size=24)


def test_decoder_seq2seq_lm():
    cfg = TowerConfig.from_dict({
        **TINY, "embedding": ["word", "pos"], "encoder": "transformer",
        "mask": "fully_visible", "decoder": "transformer",
        "target": ["lm"], "has_lmtarget_bias": True})
    model = build_model(cfg)
    rng = np.random.RandomState(0)
    src = jnp.asarray(rng.randint(1, 24, (2, 8)), jnp.int32)
    seg = jnp.asarray([[1] * 8, [1] * 6 + [0] * 2], jnp.int32)
    tgt_in = jnp.asarray(rng.randint(1, 24, (2, 6)), jnp.int32)
    tgt = jnp.asarray(rng.randint(1, 24, (2, 6)), jnp.int32)
    tgt_seg = jnp.ones((2, 6), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), src, tgt, seg,
                        tgt_in=tgt_in, tgt_seg=tgt_seg)

    def loss_fn(p):
        loss, correct, denom = model.apply(p, src, tgt, seg, tgt_in=tgt_in,
                                           tgt_seg=tgt_seg)
        return loss

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    assert all(np.isfinite(np.asarray(g)).all()
               for g in jax.tree.leaves(grads))


def test_decoder_layers_num_sets_decoder_depth():
    """Round-4 review: the reference decoder reads decoder_layers_num
    (transformer_decoder.py:16) so enc/dec depths can differ; from_dict
    used to drop the key and build the decoder at encoder depth."""
    cfg = TowerConfig.from_dict({
        **TINY, "layers_num": 3, "decoder_layers_num": 2,
        "embedding": ["word", "pos"], "encoder": "transformer",
        "decoder": "transformer", "target": ["lm"]})
    assert cfg.decoder_layers_num == 2
    model = build_model(cfg)
    rng = np.random.RandomState(3)
    src = jnp.asarray(rng.randint(1, 24, (2, 8)), jnp.int32)
    seg = jnp.ones((2, 8), jnp.int32)
    tgt_in = jnp.asarray(rng.randint(1, 24, (2, 6)), jnp.int32)
    tgt = jnp.asarray(rng.randint(1, 24, (2, 6)), jnp.int32)
    tgt_seg = jnp.ones((2, 6), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), src, tgt, seg,
                        tgt_in=tgt_in, tgt_seg=tgt_seg)
    dec = params["params"]["decoder_mod"]
    enc = params["params"]["encoder"]
    dec_layers = {k.split("_self_attn")[0] for k in dec
                  if "_self_attn" in k}
    assert len(dec_layers) == 2, sorted(dec)
    assert sum(1 for k in enc if k.startswith("transformer_")) == 3


@pytest.mark.heavy
def test_dual_encoder_clr_target():
    cfg = TowerConfig.from_dict({
        **TINY, "embedding": ["word"], "encoder": "dual",
        "target": ["clr"], "projection": True, "feature_size": 8,
        "stream_0": {"encoder": "transformer", "pooling": "first",
                     "hidden_size": 16, "embedding": ["word", "pos"]},
        "stream_1": {"encoder": "transformer", "pooling": "mean",
                     "hidden_size": 16, "embedding": ["word"]},
    })
    model = build_model(cfg)
    rng = np.random.RandomState(1)
    src = (jnp.asarray(rng.randint(1, 24, (4, 6)), jnp.int32),
           jnp.asarray(rng.randint(1, 24, (4, 5)), jnp.int32))
    seg = (jnp.ones((4, 6), jnp.int32), jnp.ones((4, 5), jnp.int32))
    tgt = jnp.arange(4)
    params = model.init(jax.random.PRNGKey(0), src, tgt, seg)
    loss, correct, denom = model.apply(params, src, tgt, seg)
    assert np.isfinite(float(loss))
    assert 0 <= float(correct) <= 4
    assert float(denom) == 4.0

    grads = jax.grad(lambda p: model.apply(p, src, tgt, seg)[0])(params)
    assert all(np.isfinite(np.asarray(g)).all()
               for g in jax.tree.leaves(grads))


def test_word_patch_embedding_composite():
    from lr2ppo_tpu.towers.embeddings import WordPatchEmbedding

    m = WordPatchEmbedding(vocab_size=24, emb_size=16, image_height=8,
                           image_width=8, patch_size=4, channels_num=3)
    tokens = jnp.asarray([[1, 2, 3]], jnp.int32)
    pixels = jnp.ones((1, 3, 8, 8), jnp.float32)
    params = m.init(jax.random.PRNGKey(0), (tokens, pixels), None)
    out = m.apply(params, (tokens, pixels), None)
    assert out.shape == (1, 3 + 5, 16)       # words ++ (cls + 4 patches)


def test_multi_target_composite():
    cfg = TowerConfig.from_dict({
        **TINY, "embedding": ["word", "pos", "seg"],
        "encoder": "transformer", "target": ["mlm", "sp"]})
    model = build_model(cfg)
    rng = np.random.RandomState(2)
    src = jnp.asarray(rng.randint(5, 24, (2, 8)), jnp.int32)
    seg = jnp.ones((2, 8), jnp.int32)
    tgt = {"mlm": jnp.where(src % 3 == 0, src, 0),
           "sp": jnp.asarray([0, 1], jnp.int32)}
    params = model.init(jax.random.PRNGKey(0), src, tgt, seg)
    out = model.apply(params, src, tgt, seg)
    assert set(out.keys()) == {"mlm", "sp"}
    assert np.isfinite(float(out["mlm"][0]))
    assert np.isfinite(float(out["sp"][0]))

"""Tower zoo parity tests: the flax embeddings/encoder/targets are
checked numerically against the reference TencentPretrain torch modules
imported directly from /root/reference as an oracle (weights exported via
state_dict and converted with torch_tower_to_flax)."""

import os
import sys
from argparse import Namespace

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lr2ppo_tpu.towers import TowerConfig, build_model, torch_tower_to_flax
from lr2ppo_tpu.towers.encoders import TransformerEncoder
from lr2ppo_tpu.towers.embeddings import CompositeEmbedding, PatchEmbedding

REF = "/root/reference"


@pytest.fixture(scope="module")
def ref_modules():
    """Import the reference TencentPretrain modules (constants.py reads a
    JSON relative to CWD at import time, so chdir first)."""
    if not os.path.isdir(os.path.join(REF, "tencentpretrain")):
        pytest.skip("reference repo not mounted")
    cwd = os.getcwd()
    sys.path.insert(0, REF)
    os.chdir(REF)
    try:
        from tencentpretrain.encoders.transformer_encoder import (
            TransformerEncoder as TorchEncoder,
        )
        from tencentpretrain.embeddings.patch_embedding import (
            PatchEmbedding as TorchPatch,
        )
        from tencentpretrain.embeddings import (
            WordEmbedding as TorchWord,
            PosEmbedding as TorchPos,
            SegEmbedding as TorchSeg,
        )
        from tencentpretrain.embeddings.embedding import (
            Embedding as TorchComposite,
        )
        yield dict(encoder=TorchEncoder, patch=TorchPatch, word=TorchWord,
                   pos=TorchPos, seg=TorchSeg, composite=TorchComposite)
    finally:
        os.chdir(cwd)
        sys.path.remove(REF)


def tiny_args(**kw):
    base = dict(
        emb_size=16, hidden_size=16, feedforward_size=32, heads_num=4,
        layers_num=2, max_seq_length=12, dropout=0.0, hidden_act="gelu",
        mask="fully_visible", layernorm_positioning="post",
        layernorm="normal", feed_forward="dense",
        remove_transformer_bias=0, remove_attention_scale=0,
        remove_embedding_layernorm=False,
        factorized_embedding_parameterization=False,
        parameter_sharing=False, relative_position_embedding=False,
        has_residual_attention=False, embedding=["word", "pos", "seg"],
        vocab_size=50, image_height=8, image_width=8, patch_size=4,
        channels_num=3,
    )
    base.update(kw)
    return base


def prefixed(sd, prefix):
    return {prefix + k: v.numpy() for k, v in sd.items()}


@pytest.mark.parametrize("positioning,mask", [
    ("post", "fully_visible"),
    ("pre", "fully_visible"),
    ("post", "causal"),
    ("post", "causal_with_prefix"),
])
def test_transformer_encoder_parity(ref_modules, positioning, mask):
    import torch

    torch.manual_seed(0)
    args = tiny_args(layernorm_positioning=positioning, mask=mask)
    oracle = ref_modules["encoder"](Namespace(**args)).eval()
    params = torch_tower_to_flax(prefixed(oracle.state_dict(), "encoder."))
    cfg = TowerConfig.from_dict(args)
    enc = TransformerEncoder(cfg)

    rng = np.random.RandomState(0)
    emb = rng.randn(2, 8, 16).astype(np.float32)
    seg = np.array([[1] * 8, [1] * 5 + [0] * 3], dtype=np.int64)
    with torch.no_grad():
        ref = oracle(torch.tensor(emb), torch.tensor(seg)).numpy()
    got = enc.apply({"params": params["params"]["encoder"]},
                    jnp.asarray(emb), jnp.asarray(seg))
    np.testing.assert_allclose(np.asarray(got), ref, atol=2e-5, rtol=2e-4)


def test_composite_embedding_parity(ref_modules):
    import torch

    torch.manual_seed(1)
    args = tiny_args()
    ns = Namespace(**args)
    oracle = ref_modules["composite"](ns)
    for kind, cls_key in (("word", "word"), ("pos", "pos"), ("seg", "seg")):
        sub = ref_modules[cls_key](ns, args["vocab_size"])
        oracle.update(sub, kind)
    oracle = oracle.eval()
    params = torch_tower_to_flax(prefixed(oracle.state_dict(), "embedding."))
    cfg = TowerConfig.from_dict(args)
    emb = CompositeEmbedding(cfg)

    rng = np.random.RandomState(1)
    src = rng.randint(0, 50, (2, 8))
    seg = np.array([[1] * 8, [1, 1, 2, 2, 2, 0, 0, 0]], dtype=np.int64)
    with torch.no_grad():
        ref = oracle(torch.tensor(src), torch.tensor(seg)).numpy()
    got = emb.apply({"params": params["params"]["embedding"]},
                    jnp.asarray(src), jnp.asarray(seg))
    np.testing.assert_allclose(np.asarray(got), ref, atol=2e-5, rtol=2e-4)


def test_patch_embedding_parity(ref_modules):
    import torch

    torch.manual_seed(2)
    args = tiny_args()
    oracle = ref_modules["patch"](Namespace(**args), None).eval()
    params = torch_tower_to_flax(
        prefixed(oracle.state_dict(), "embedding.patch."))
    mine = PatchEmbedding(emb_size=16, image_height=8, image_width=8,
                          patch_size=4, channels_num=3)
    rng = np.random.RandomState(2)
    img = rng.randn(2, 3, 8, 8).astype(np.float32)
    with torch.no_grad():
        ref = oracle(torch.tensor(img), None).numpy()
    got = mine.apply(
        {"params": params["params"]["embedding"]["patch"]},
        jnp.asarray(img), None)
    np.testing.assert_allclose(np.asarray(got), ref, atol=2e-5, rtol=2e-4)


@pytest.mark.heavy
def test_vit_and_xlmr_reference_configs_build():
    """The actual reference JSON configs load and run (layers cut to 2)."""
    for path, src_fn, seq in [
        (f"{REF}/models/vit/base-16-224_config.json",
         lambda rng: rng.randn(1, 3, 224, 224).astype(np.float32), 197),
        (f"{REF}/models/xlm-roberta/base_config.json",
         lambda rng: rng.randint(0, 100, (1, 9)), 9),
    ]:
        cfg = TowerConfig.from_json(path, layers_num=2, vocab_size=100)
        model = build_model(cfg)
        rng = np.random.RandomState(0)
        src = jnp.asarray(src_fn(rng))
        seg = jnp.ones((1, seq), jnp.int32)
        params = model.init(jax.random.PRNGKey(0), src, seg,
                            method=model.encode)
        out = model.apply(params, src, seg, method=model.encode)
        assert out.shape == (1, seq, cfg.hidden_size)
        assert np.isfinite(np.asarray(out)).all()


def test_mlm_target_masked_loss_matches_gather_semantics():
    """Masked-weighting == the reference's boolean-gather mean NLL."""
    from lr2ppo_tpu.towers.targets import MlmTarget

    cfg = TowerConfig.from_dict(tiny_args())
    tgt = np.array([[0, 3, 0, 7], [2, 0, 0, 0]], dtype=np.int32)
    mem = np.random.RandomState(3).randn(2, 4, 16).astype(np.float32)
    m = MlmTarget(cfg)
    params = m.init(jax.random.PRNGKey(0), jnp.asarray(mem),
                    jnp.asarray(tgt), None)
    loss, correct, denom = m.apply(params, jnp.asarray(mem),
                                   jnp.asarray(tgt), None)
    assert np.isfinite(float(loss)) and float(denom) == pytest.approx(
        3.0, abs=1e-3)


def test_rnn_encoders_run():
    from lr2ppo_tpu.towers.encoders import build_encoder

    for enc_name in ("rnn", "lstm", "gru", "bilstm", "gatedcnn"):
        cfg = TowerConfig.from_dict(tiny_args(encoder=enc_name))
        enc = build_encoder(cfg)
        emb = jnp.asarray(
            np.random.RandomState(4).randn(2, 6, 16).astype(np.float32))
        seg = jnp.ones((2, 6), jnp.int32)
        params = enc.init(jax.random.PRNGKey(0), emb, seg)
        out = enc.apply(params, emb, seg)
        assert out.shape == (2, 6, 16)
        assert np.isfinite(np.asarray(out)).all()


@pytest.mark.parametrize("enc_name,bidir", [
    ("rnn", False), ("lstm", False), ("gru", False),
    ("lstm", True),   # torch bidirectional=True: per-layer concat
    ("birnn", False), ("bilstm", False), ("bigru", False),  # two stacks
])
def test_rnn_encoder_import_parity(ref_modules, enc_name, bidir):
    """Round-4 review: reference RnnEncoder nests its weights under the
    torch nn.RNN attribute (encoder.rnn.weight_ih_l0, rnn_encoder.py:21)
    — the importer must drop that level so RNN-family checkpoints load
    and reproduce the torch forward. The bi* classes are two independent
    stacks concatenated at the END (rnn_encoder.py:82-160), not torch
    bidirectional — both flavors are pinned here with layers_num=2,
    where the two differ."""
    import torch

    sys.path.insert(0, REF)
    try:
        from tencentpretrain.encoders import str2encoder
    finally:
        sys.path.remove(REF)
    from lr2ppo_tpu.towers.encoders import build_encoder

    torch.manual_seed(5)
    args = tiny_args(encoder=enc_name, bidirectional=bidir)
    oracle = str2encoder[enc_name](Namespace(**args)).eval()
    params = torch_tower_to_flax(prefixed(oracle.state_dict(), "encoder."))
    enc = build_encoder(TowerConfig.from_dict(args))

    rng = np.random.RandomState(5)
    emb = rng.randn(2, 6, 16).astype(np.float32)
    seg = np.ones((2, 6), dtype=np.int64)
    with torch.no_grad():
        ref = oracle(torch.tensor(emb), torch.tensor(seg)).numpy()
    got = enc.apply({"params": params["params"]["encoder"]},
                    jnp.asarray(emb), jnp.asarray(seg))
    np.testing.assert_allclose(np.asarray(got), ref, atol=2e-5, rtol=2e-4)


def test_sinusoidalpos_speech_layout_parity(ref_modules):
    """Round-4 review: speech configs switch the sinusoidal table to the
    concatenated [sin || cos] layout and size it by max_audio_frames
    (sinusoidalpos_embedding.py:20-41); text configs keep interleaved."""
    import torch

    sys.path.insert(0, REF)
    try:
        from tencentpretrain.embeddings.sinusoidalpos_embedding import (
            SinusoidalposEmbedding as TorchSin,
        )
    finally:
        sys.path.remove(REF)
    from lr2ppo_tpu.towers.embeddings import _EMB_KINDS

    args = tiny_args(embedding=["speech", "sinusoidalpos"],
                     max_audio_frames=20)
    ns = Namespace(**args, tokenizer=Namespace(vocab={"<pad>": 0}))
    oracle = TorchSin(ns, None).eval()
    cfg = TowerConfig.from_dict(args)
    ours = _EMB_KINDS["sinusoidalpos"](cfg, "sinusoidalpos")

    src = np.zeros((2, 8), dtype=np.int64)
    seg = np.array([[1] * 8, [1] * 5 + [0] * 3], dtype=np.int64)
    with torch.no_grad():
        ref = oracle(torch.tensor(src), torch.tensor(seg)).numpy()
    params = ours.init(jax.random.PRNGKey(0), jnp.asarray(src),
                       jnp.asarray(seg))
    got = ours.apply(params, jnp.asarray(src), jnp.asarray(seg))
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-5, rtol=1e-5)
    # text configs stay interleaved and DIFFER from the speech layout
    tcfg = TowerConfig.from_dict(tiny_args(max_seq_length=20))
    text_mod = _EMB_KINDS["sinusoidalpos"](tcfg, "sinusoidalpos")
    tp = text_mod.init(jax.random.PRNGKey(0), jnp.asarray(src),
                       jnp.asarray(seg))
    text_out = text_mod.apply(tp, jnp.asarray(src), jnp.asarray(seg))
    assert not np.allclose(np.asarray(text_out), ref)


def test_gatedcnn_import_parity(ref_modules):
    """Round-4 review: the reference GatedcnnEncoder stores Conv2d
    kernels plus TWO bias sources per conv (cnn_encoder.py:17-43); the
    importer folds them into the flax causal-window matmul layout."""
    import torch

    sys.path.insert(0, REF)
    try:
        from tencentpretrain.encoders import str2encoder
    finally:
        sys.path.remove(REF)
    from lr2ppo_tpu.towers.encoders import build_encoder

    torch.manual_seed(6)
    args = tiny_args(encoder="gatedcnn", kernel_size=3, block_size=2,
                     layers_num=3)
    oracle = str2encoder["gatedcnn"](Namespace(**args)).eval()
    params = torch_tower_to_flax(prefixed(oracle.state_dict(), "encoder."))
    enc = build_encoder(TowerConfig.from_dict(args))

    rng = np.random.RandomState(6)
    emb = rng.randn(2, 6, 16).astype(np.float32)
    seg = np.ones((2, 6), dtype=np.int64)
    with torch.no_grad():
        ref = oracle(torch.tensor(emb), torch.tensor(seg)).numpy()
    got = enc.apply({"params": params["params"]["encoder"]},
                    jnp.asarray(emb), jnp.asarray(seg))
    np.testing.assert_allclose(np.asarray(got), ref, atol=2e-5, rtol=2e-4)

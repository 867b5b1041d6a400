"""vilt / s2t / beit / dalle pretraining processors + the flax VQGAN
image tokenizer (reference utils/image_tokenizer.py + dataloader.py
vision/audio loaders)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lr2ppo_tpu.data.pretrain_processors import (
    CLS,
    PAD,
    SEP,
    BeitImageDataset,
    DalleDataset,
    S2tDataset,
    ViltPairsDataset,
    logmel_fbank,
    read_wav,
    utterance_cmvn,
)
from lr2ppo_tpu.data.tokenizers import ImageTokenizer, SpaceTokenizer

MASK = 4
VOCAB = 13

TINY_VQ = dict(ch=8, ch_mult=(1, 2, 2), num_res_blocks=1,
               attn_resolutions=(8,), resolution=16, z_channels=8,
               n_embed=16, embed_dim=8)


def _tok(tmp_path):
    vp = tmp_path / "v.txt"
    toks = ["<s>", "<pad>", "</s>", "<unk>", "<mask>"] + list("abcdefgh")
    vp.write_text("".join(t + "\n" for t in toks))
    return SpaceTokenizer(str(vp))


def _pngs(tmp_path, n=3, size=16):
    from PIL import Image

    rng = np.random.RandomState(0)
    paths = []
    for i in range(n):
        p = tmp_path / f"img{i}.png"
        Image.fromarray(
            rng.randint(0, 255, (size, size, 3), np.uint8)).save(p)
        paths.append(str(p))
    return paths


def _wav(tmp_path, name="a.wav", seconds=0.2, rate=16000):
    import wave

    t = np.arange(int(rate * seconds)) / rate
    x = (0.4 * np.sin(2 * np.pi * 440 * t) * 32767).astype(np.int16)
    p = tmp_path / name
    with wave.open(str(p), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(x.tobytes())
    return str(p)


# ---------------------------------------------------------------------------
# VQGAN tokenizer
# ---------------------------------------------------------------------------

@pytest.mark.heavy
def test_vqgan_tokenize_deterministic_static():
    tok = ImageTokenizer(vqgan_config=TINY_VQ, seed=0)
    px = np.linspace(0, 1, 2 * 3 * 16 * 16, dtype=np.float32
                     ).reshape(2, 3, 16, 16)
    a = tok.tokenize_images(px)
    b = tok.tokenize_images(px)
    assert a.shape == (2, tok.cfg.tokens_per_image)
    np.testing.assert_array_equal(a, b)
    assert a.min() >= 0 and a.max() < TINY_VQ["n_embed"]


def test_vqgan_taming_checkpoint_roundtrip(tmp_path):
    """Export random flax params as a taming-keyed torch state_dict and
    re-import: the mapping must reproduce the exact tree (validates the
    importer against the published checkpoint layout)."""
    import torch

    from lr2ppo_tpu.towers.vqgan import (
        VQGANConfig, VQGANEncoder, load_taming_checkpoint)

    cfg = VQGANConfig(**TINY_VQ)
    model = VQGANEncoder(cfg)
    px = jnp.zeros((1, 3, 16, 16), jnp.float32)
    params = model.init(jax.random.PRNGKey(1), px)

    def to_taming_key(mod_path):
        name = mod_path[0]
        if name == "codebook":
            return "quantize.embedding.weight", None
        if name == "quant_conv":
            return "quant_conv", mod_path[1:]
        if name.startswith("down_"):
            parts = name.split("_")
            if parts[2] == "downsample":
                return f"encoder.down.{parts[1]}.downsample.conv", \
                    mod_path[1:]
            return (f"encoder.down.{parts[1]}.{parts[2]}.{parts[3]}",
                    mod_path[1:])
        if name.startswith("mid_"):
            return "encoder.mid." + name[4:], mod_path[1:]
        return "encoder." + name, mod_path[1:]

    sd = {}

    def walk(node, path):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(v, path + (k,))
            return
        base, rest = to_taming_key(path)
        arr = np.asarray(node)
        if rest is None:
            sd[base] = torch.tensor(arr)
            return
        mods, leaf = rest[:-1], rest[-1]
        for m in mods:
            base += "." + m
        if leaf == "kernel":
            sd[base + ".weight"] = torch.tensor(
                np.transpose(arr, (3, 2, 0, 1)))
        elif leaf == "scale":
            sd[base + ".weight"] = torch.tensor(arr)
        else:
            sd[base + ".bias"] = torch.tensor(arr)

    walk(params["params"], ())
    ckpt = tmp_path / "vq.ckpt"
    torch.save({"state_dict": sd}, str(ckpt))

    restored = load_taming_checkpoint(str(ckpt), cfg)
    flat_a = jax.tree_util.tree_leaves_with_path(params)
    flat_b = dict(jax.tree_util.tree_leaves_with_path(restored))
    assert len(flat_a) == len(flat_b)
    for path, leaf in flat_a:
        np.testing.assert_allclose(np.asarray(leaf),
                                   np.asarray(flat_b[path]), atol=1e-6,
                                   err_msg=str(path))


# ---------------------------------------------------------------------------
# processors
# ---------------------------------------------------------------------------

def test_vilt_dataset(tmp_path):
    tok = _tok(tmp_path)
    paths = _pngs(tmp_path, n=4)
    pairs = [("a b c", paths[0]), ("d e f", paths[1]),
             ("g h a", paths[2]), ("b c d", paths[3])]
    ds = ViltPairsDataset(pairs, tok, seq_length=8, vocab_size=VOCAB,
                          mask_id=MASK, image_height=16, image_width=16,
                          patch_size=8)
    img_seq = (16 // 8) * (16 // 8) + 1
    matches = set()
    for e in range(6):
        ds.set_epoch(e)
        for i in range(len(ds)):
            it = ds.get(i)
            assert it["src_text"].shape == (8,)
            assert it["src_image"].shape == (3, 16, 16)
            assert it["tgt_mlm"].shape == (8 + img_seq,)
            assert (it["tgt_mlm"][8:] == 0).all()
            assert (it["seg"][8:] == 2).all()
            matches.add(int(it["tgt_match"]))
    assert matches == {0, 1}


def test_fbank_and_cmvn(tmp_path):
    x, rate = read_wav(_wav(tmp_path))
    assert rate == 16000 and x.ndim == 1
    feat = logmel_fbank(x * (2 ** 15), rate, n_mels=24)
    assert feat.shape[1] == 24 and feat.shape[0] > 10
    norm = utterance_cmvn(feat)
    np.testing.assert_allclose(norm.mean(0), 0.0, atol=1e-4)
    np.testing.assert_allclose(norm.std(0), 1.0, atol=1e-2)


def test_s2t_dataset(tmp_path):
    tok = _tok(tmp_path)
    wav = _wav(tmp_path)
    tsv = tmp_path / "s.tsv"
    tsv.write_text(f"a b c\t{wav}\nd e\t{wav}\n")
    ds = S2tDataset(str(tsv), tok, tgt_seq_length=8,
                    max_audio_frames=64, n_mels=24)
    assert len(ds) == 2
    it = ds.get(0)
    assert it["src"].shape == (64, 24)
    assert it["seg"].shape == (16,)          # 64 / 2**2
    assert it["seg"].sum() > 0
    # decoder stream alignment
    real = it["tgt_seg"].astype(bool)
    n = int(real.sum())
    np.testing.assert_array_equal(it["tgt_in"][1:n], it["tgt_out"][:n - 1])


def test_beit_dataset(tmp_path):
    tok = ImageTokenizer(vqgan_config=TINY_VQ, seed=0)
    paths = _pngs(tmp_path, n=2, size=16)
    ds = BeitImageDataset(paths, tok, image_height=16, image_width=16,
                          patch_size=8, mask_rate=0.3)
    it = ds.get(0)
    seq = (16 // 8) ** 2 + 1
    assert it["src_image"].shape == (3, 16, 16)
    assert it["seg"].shape == (seq,)
    assert it["mask"].shape == (max(int((seq - 1) * 0.3), 1),)
    assert (it["mask"] > 0).all()            # cls position never masked
    nz = np.flatnonzero(it["tgt"])
    assert set(nz).issubset(set(it["mask"].tolist()))
    ds.set_epoch(1)
    assert (ds.get(0)["mask"] != it["mask"]).any() or \
        (ds.get(0)["tgt"] != it["tgt"]).any()


def test_dalle_dataset(tmp_path):
    tok = _tok(tmp_path)
    itok = ImageTokenizer(vqgan_config=TINY_VQ, seed=0)
    paths = _pngs(tmp_path, n=2, size=16)
    ds = DalleDataset([("a b", paths[0]), ("c d e", paths[1])], tok,
                      itok, text_seq_length=8, vocab_bias=VOCAB)
    it = ds.get(0)
    n_img = itok.cfg.tokens_per_image
    n_text = 4                               # [CLS] a b [SEP]
    assert it["src"].shape == (8 + n_img,)
    # reference packing: image tokens immediately after the text, pads
    # at the END (dataloader.py:922-928)
    assert (it["seg"][:n_text] == 1).all()
    assert (it["seg"][n_text: n_text + n_img] == 2).all()
    assert (it["seg"][n_text + n_img:] == 0).all()
    assert (it["src"][n_text: n_text + n_img] >= VOCAB).all()
    # causal shift over the real prefix; last real position targets SEP
    n_real = n_text + n_img
    np.testing.assert_array_equal(it["tgt"][: n_real - 1],
                                  it["src"][1: n_real])
    assert it["tgt"][n_real - 1] == SEP
    assert (it["tgt"][n_real:] == 0).all()


# ---------------------------------------------------------------------------
# e2e: each multimodal form trains with falling loss
# ---------------------------------------------------------------------------

from test_pretrain_processors import _e2e  # noqa: E402


@pytest.mark.slow
def test_e2e_vilt(tmp_path):
    tok = _tok(tmp_path)
    paths = _pngs(tmp_path, n=6)
    rng = np.random.default_rng(0)
    pairs = [(" ".join(rng.choice(list("abcdefgh"), 4)), p)
             for p in paths for _ in range(3)]
    ds = ViltPairsDataset(pairs, tok, seq_length=8, vocab_size=VOCAB,
                          mask_id=MASK, image_height=16, image_width=16,
                          patch_size=8)
    _e2e(ds, "vilt", dict(vocab_size=VOCAB,
                          embedding=["word_patch"],
                          image_height=16, image_width=16, patch_size=8,
                          encoder="transformer", mask="fully_visible",
                          target=["mlm", "sp"]))


@pytest.mark.slow
def test_e2e_s2t(tmp_path):
    tok = _tok(tmp_path)
    wav = _wav(tmp_path)
    rows = [f"{' '.join(['a', 'b', 'c'][:1 + i % 3])}\t{wav}"
            for i in range(12)]
    tsv = tmp_path / "s.tsv"
    tsv.write_text("\n".join(rows) + "\n")
    ds = S2tDataset(str(tsv), tok, tgt_seq_length=8,
                    max_audio_frames=32, n_mels=16)
    _e2e(ds, "seq2seq", dict(vocab_size=VOCAB,
                             embedding=["speech"],
                             tgt_embedding=["word", "pos"],
                             encoder="transformer", mask="fully_visible",
                             decoder="transformer", target=["lm"]))


@pytest.mark.slow
def test_e2e_beit(tmp_path):
    itok = ImageTokenizer(vqgan_config=TINY_VQ, seed=0)
    paths = _pngs(tmp_path, n=8, size=16)
    ds = BeitImageDataset(paths * 2, itok, image_height=16,
                          image_width=16, patch_size=8, mask_rate=0.5)
    _e2e(ds, "beit", dict(vocab_size=TINY_VQ["n_embed"],
                          embedding=["masked_patch", "pos"],
                          image_height=16, image_width=16, patch_size=8,
                          encoder="transformer", mask="fully_visible",
                          target=["mlm"]))


@pytest.mark.slow
def test_e2e_dalle(tmp_path):
    tok = _tok(tmp_path)
    itok = ImageTokenizer(vqgan_config=TINY_VQ, seed=0)
    paths = _pngs(tmp_path, n=4, size=16)
    pairs = [("a b c", p) for p in paths] * 3
    ds = DalleDataset(pairs, tok, itok, text_seq_length=8,
                      vocab_bias=VOCAB)
    _e2e(ds, "simple", dict(vocab_size=VOCAB + TINY_VQ["n_embed"],
                            embedding=["word", "pos", "seg"],
                            encoder="transformer", mask="causal",
                            target=["lm"]))


def test_cli_registry_covers_multimodal():
    from lr2ppo_tpu.cli.pretrain import str2dataset, str2form

    for k in ("vit", "clip", "vilt", "s2t", "beit", "dalle"):
        assert k in str2dataset and k in str2form

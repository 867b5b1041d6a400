"""Pretraining pipeline: MLM masking semantics, corpus packing, and an
end-to-end tiny MLM run through the CLI on the fake 8-device mesh."""

import json

import numpy as np
import pytest

from lr2ppo_tpu.data.pretrain_data import MlmCorpusDataset, mask_tokens


def test_mask_tokens_semantics():
    rng = np.random.default_rng(0)
    ids = np.arange(10, 110, dtype=np.int32).reshape(1, 100)
    seg = np.ones_like(ids)
    src, tgt = mask_tokens(ids, seg, vocab_size=200, mask_id=4, rng=rng,
                           mlm_prob=0.5)
    sel = tgt > 0
    assert 0.2 < sel.mean() < 0.8            # ~half selected
    assert (tgt[sel] == ids[sel]).all()      # targets keep original ids
    assert (src[~sel] == ids[~sel]).all()    # unselected untouched
    assert (src[sel] == 4).sum() > 0         # some [MASK]


def test_corpus_packing(tmp_path):
    from lr2ppo_tpu.data.tokenizers import CharTokenizer

    vp = tmp_path / "v.txt"
    vp.write_text("".join(f"{c}\n" for c in "<unk> a b c d e".split()))
    corpus = tmp_path / "c.txt"
    corpus.write_text("abcde\n" * 20)
    tok = CharTokenizer(str(vp))
    ds = MlmCorpusDataset(str(corpus), tok, seq_length=16, vocab_size=6,
                          mask_id=0, mlm_prob=0.5, special_limit=1)
    assert len(ds) >= 6
    item = ds.get(0)
    assert item["src"].shape == (16,)
    a = ds.get(1)
    ds.set_epoch(2)
    b = ds.get(1)
    assert not np.array_equal(a["src"], b["src"])  # fresh masks per epoch


@pytest.mark.heavy
def test_pretrain_cli_e2e(tmp_path):
    from lr2ppo_tpu.cli import pretrain

    vp = tmp_path / "v.txt"
    toks = ["<pad>", "<unk>", "<s>", "</s>", "<mask>"] + list("abcdefgh")
    vp.write_text("".join(t + "\n" for t in toks))
    # space-separated letters so tokens land above special_limit=5 and
    # actually get masked (whole words would all map to <unk>)
    corpus = tmp_path / "c.txt"
    corpus.write_text("".join("a b c d e f g h\n" for _ in range(30)))
    tcfg = tmp_path / "tower.json"
    tcfg.write_text(json.dumps({
        "emb_size": 16, "hidden_size": 16, "feedforward_size": 32,
        "heads_num": 4, "layers_num": 2, "max_seq_length": 32,
        "dropout": 0.0, "embedding": ["word", "pos"],
        "encoder": "transformer", "mask": "fully_visible",
        "target": ["mlm"],
    }))
    best = pretrain.main([
        "--corpus_path", str(corpus), "--tower_config", str(tcfg),
        "--tokenizer", "space", "--vocab_path", str(vp),
        "--output_model_path", str(tmp_path / "mlm"),
        "--batch_size", "4", "--accumulation_steps", "2",
        "--seq_length", "16", "--total_steps", "6",
        "--report_steps", "2", "--dp", "2",
    ])
    assert np.isfinite(best)
    assert (tmp_path / "mlm").exists()
    assert (tmp_path / "mlm-best").exists()


@pytest.mark.parametrize("proc", ["bert", "t5", "bilm", "cls_mlm"])
def test_pretrain_cli_new_processors(tmp_path, proc):
    """Round-2 processors drive end-to-end through the real CLI: arg
    wiring (tgt_seq_length, sentinel growth, form routing) + one short
    training run each."""
    from lr2ppo_tpu.cli import pretrain

    vp = tmp_path / "v.txt"
    toks = ["<s>", "<pad>", "</s>", "<unk>", "<mask>"] + list("abcdefgh")
    vp.write_text("".join(t + "\n" for t in toks))
    corpus = tmp_path / "c.txt"
    rng = np.random.default_rng(0)
    if proc in ("bert",):          # blank-line separated docs
        blocks = []
        for _ in range(6):
            blocks.extend(" ".join(rng.choice(list("abcdefgh"), 5))
                          for _ in range(4))
            blocks.append("")
        corpus.write_text("\n".join(blocks) + "\n")
    elif proc == "cls_mlm":        # label \t text
        corpus.write_text("".join(
            f"{i % 2}\t{' '.join(rng.choice(list('abcdefgh'), 5))}\n"
            for i in range(24)))
    else:                          # raw lines
        corpus.write_text("a b c d e f g h\n" * 24)
    targets = {"bert": ["mlm", "sp"], "t5": ["lm"], "bilm": ["bilm"],
               "cls_mlm": ["mlm", "cls"]}[proc]
    tcfg = tmp_path / "tower.json"
    cfg = {
        "emb_size": 16, "hidden_size": 16, "feedforward_size": 32,
        "heads_num": 4, "layers_num": 1, "max_seq_length": 32,
        "dropout": 0.0, "embedding": ["word", "pos", "seg"],
        "encoder": "transformer", "mask": "fully_visible",
        "target": targets, "labels_num": 2, "pooling": "first",
    }
    if proc == "t5":
        cfg["decoder"] = "transformer"
    if proc == "bilm":
        cfg["encoder"] = "bilstm"
        cfg["embedding"] = ["word"]
    tcfg.write_text(json.dumps(cfg))
    best = pretrain.main([
        "--corpus_path", str(corpus), "--tower_config", str(tcfg),
        "--data_processor", proc,
        "--tokenizer", "space", "--vocab_path", str(vp),
        "--output_model_path", str(tmp_path / proc),
        "--batch_size", "4", "--seq_length", "12",
        "--tgt_seq_length", "12", "--total_steps", "4",
        "--report_steps", "2", "--dp", "2",
    ])
    assert np.isfinite(best)
    assert (tmp_path / proc).exists()

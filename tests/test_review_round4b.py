"""Round-4 second review batch: regressions for the post-landing
code-review findings on the newest commits.

1. Decoder-side embedding gates read the GLOBAL args.embedding like the
   reference's constructors (model_builder.py:30-33 builds tgt modules
   with the same args), not the per-side tgt list.
2. MLM masking excludes frame/special ids by IDENTITY (reference
   mask.py:40,113), not only by the low-id heuristic — required for
   BERT-layout vocabs whose [CLS]/[SEP] sit above special_limit.
3. The pretrain CLI exposes --ckpt_backend (README documents it).
4. --max_audio_frames explicitness survives argparse prefix
   abbreviation, and the dataset sees the same resolved value as the
   tower position tables.
5. MovieNet preload() only caches items that produced examples (ppo
   mode skips 1-tag items AFTER registering them).
"""

import dataclasses
import json

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from lr2ppo_tpu.towers.model import TowerConfig, TowerModel  # noqa: E402


def _s2t_cfg(**kw):
    base = dict(
        emb_size=16, hidden_size=16, feedforward_size=32, heads_num=4,
        layers_num=1, max_seq_length=8, max_audio_frames=16, dropout=0.0,
        vocab_size=50, embedding=["speech", "sinusoidalpos"],
        tgt_embedding=["word", "pos"], encoder="transformer",
        mask="fully_visible", decoder="transformer", target=["lm"])
    base.update(kw)
    return TowerConfig.from_dict(base)


class TestTgtEmbeddingGates:
    def test_tgt_pos_table_sized_by_global_speech_gate(self):
        """Reference PosEmbedding sizes by max(max_seq_length,
        max_audio_frames) whenever 'speech' is in the GLOBAL
        args.embedding (pos_embedding.py:12-14) — including when it is
        constructed for the decoder side, whose own tgt_embedding list
        has no 'speech'."""
        cfg = _s2t_cfg()
        model = TowerModel(cfg)
        b, frames, mels, t = 2, 16, 8, 6
        src = jnp.zeros((b, frames, mels), jnp.float32)
        seg = jnp.ones((b, frames // 4), jnp.int32)
        tgt = jnp.ones((b, t), jnp.int32)
        tgt_seg = jnp.ones((b, t), jnp.int32)
        params = model.init(jax.random.PRNGKey(0), src, tgt, seg,
                            tgt_in=tgt, tgt_seg=tgt_seg)
        table = params["params"]["tgt_embedding"]["pos"]["embedding"]
        assert table.shape[0] == 16, (
            f"decoder pos table has {table.shape[0]} rows; the reference "
            "sizes it max(max_seq_length=8, max_audio_frames=16)=16")

    def test_tgt_sinusoidal_layout_follows_global_gate(self):
        """The reference's arrange_sincos_cross switch reads the global
        list too (sinusoidalpos_embedding.py:20-26): an s2t decoder with
        tgt_embedding=['word','sinusoidalpos'] gets the concatenated
        [sin||cos] speech layout, sized by max_audio_frames."""
        from lr2ppo_tpu.towers.embeddings import _EMB_KINDS

        cfg = _s2t_cfg(tgt_embedding=["word", "sinusoidalpos"])
        tgt_cfg = dataclasses.replace(cfg, embedding=cfg.tgt_embedding,
                                      gate_embedding=cfg.embedding)
        sin = _EMB_KINDS["sinusoidalpos"](tgt_cfg, "sinusoidalpos")
        assert sin.interleaved is False
        assert sin.max_seq_length == 16
        # and the per-side fallback (no gate) keeps text behavior
        plain = _EMB_KINDS["sinusoidalpos"](
            dataclasses.replace(cfg, embedding=["word", "sinusoidalpos"]),
            "sinusoidalpos")
        assert plain.interleaved is True
        assert plain.max_seq_length == 8

    def test_word_sqrt_scale_gates_on_global_list(self):
        """WordEmbedding's sqrt(emb) scale gates on 'sinusoidalpos' in
        the GLOBAL args.embedding (word_embedding.py:13-15): a decoder
        list containing sinusoidalpos does NOT scale when the global
        list lacks it."""
        from lr2ppo_tpu.towers.embeddings import _EMB_KINDS

        cfg = _s2t_cfg(embedding=["word", "pos"],
                       tgt_embedding=["word", "sinusoidalpos"])
        tgt_cfg = dataclasses.replace(cfg, embedding=cfg.tgt_embedding,
                                      gate_embedding=cfg.embedding)
        assert _EMB_KINDS["word"](tgt_cfg, "word").sinusoidalpos is False
        # per-side fallback unchanged
        side = dataclasses.replace(cfg, embedding=["word", "sinusoidalpos"])
        assert _EMB_KINDS["word"](side, "word").sinusoidalpos is True

    def test_towermodel_threads_gate_to_tgt_embedding(self):
        cfg = _s2t_cfg()
        model = TowerModel(cfg)
        b, frames, mels, t = 1, 16, 8, 4
        src = jnp.zeros((b, frames, mels), jnp.float32)
        seg = jnp.ones((b, frames // 4), jnp.int32)
        tgt = jnp.ones((b, t), jnp.int32)
        # the model must still train end-to-end with the corrected table
        params = model.init(jax.random.PRNGKey(1), src, tgt, seg,
                            tgt_in=tgt, tgt_seg=jnp.ones_like(tgt))
        out = model.apply(params, src, tgt, seg, tgt_in=tgt,
                          tgt_seg=jnp.ones_like(tgt))
        assert all(np.isfinite(np.asarray(x)).all()
                   for x in jax.tree.leaves(out))


class TestMaskSpecialsByIdentity:
    def test_mask_tokens_excludes_frame_ids(self):
        from lr2ppo_tpu.data.pretrain_data import mask_tokens

        cls_id, sep_id, mask_id = 101, 102, 103
        rng = np.random.default_rng(0)
        ids = np.array([cls_id, 10, 11, 101, 12, sep_id, 0, 0], np.int32)
        seg = np.array([1, 1, 1, 1, 1, 1, 0, 0], np.int32)
        for trial in range(200):
            src, tgt = mask_tokens(
                ids, seg, vocab_size=120, mask_id=mask_id, rng=rng,
                mlm_prob=0.9, special_limit=5,
                exclude_ids=(cls_id, sep_id, 0, mask_id))
            # frame positions never selected (tgt=0) and never rewritten
            for j in (0, 3, 5):
                assert tgt[j] == 0 and src[j] == ids[j], (trial, j, src)

    def test_random_replacement_never_draws_excluded(self):
        from lr2ppo_tpu.data.pretrain_data import mask_tokens

        rng = np.random.default_rng(1)
        ids = np.arange(10, 74, dtype=np.int32)
        seg = np.ones_like(ids)
        ex = (30, 31, 32, 40)
        hits = 0
        for _ in range(50):
            src, tgt = mask_tokens(
                ids, seg, vocab_size=75, mask_id=4, rng=rng,
                mlm_prob=1.0, keep_prob=0.0, random_prob=1.0,
                special_limit=5, exclude_ids=ex)
            # REPLACED positions never receive an excluded id (original
            # occurrences of those ids stay in place, unselected)
            changed = src != ids
            assert not np.isin(src[changed], np.asarray(ex)).any()
            assert not tgt[np.isin(ids, np.asarray(ex))].any()
            hits += int(changed.sum())
        assert hits > 0  # replacements actually happened

    def test_random_replacement_uniform_over_allowed(self):
        """The redraw must stay UNIFORM over allowed ids like the
        reference's rejection loop (mask.py:38-41) — remapping excluded
        draws onto a neighbor would pile their whole mass onto the id
        after each excluded run."""
        from lr2ppo_tpu.data.pretrain_data import mask_tokens

        rng = np.random.default_rng(0)
        ids = np.full(6000, 6, np.int32)
        seg = np.ones_like(ids)
        src, _ = mask_tokens(ids, seg, vocab_size=15, mask_id=3, rng=rng,
                             mlm_prob=1.0, keep_prob=0.0, random_prob=1.0,
                             special_limit=5, exclude_ids=(7, 8, 14))
        vals, counts = np.unique(src, return_counts=True)
        assert not set(vals.tolist()) & {7, 8, 14}
        # 7 allowed ids, ~857 expected each; a neighbor-remap would give
        # id 9 three shares (~2571)
        assert counts.max() < 1.5 * counts.min(), dict(
            zip(vals.tolist(), counts.tolist()))

    def test_frame_ids_snapshotted_at_construction(self):
        """set_special_ids AFTER a dataset is built must not
        desynchronize masking/framing from the instances that were
        framed under the previous layout."""
        from lr2ppo_tpu.data import pretrain_processors as pp
        from lr2ppo_tpu.data.pretrain_processors import T5CorpusDataset

        class Tok:
            vocab = {str(i): i for i in range(40)}

            def encode(self, text):
                return [10 + (sum(map(ord, w)) % 20)
                        for w in text.split()]

        old = (pp.CLS, pp.PAD, pp.SEP)
        pp.set_special_ids(cls_id=7, pad_id=1, sep_id=9)
        try:
            import os
            import tempfile

            with tempfile.TemporaryDirectory() as d:
                path = os.path.join(d, "c.txt")
                with open(path, "w") as f:
                    f.write("a b c d e f\n" * 10)
                ds = T5CorpusDataset(path, Tok(), seq_length=16,
                                     tgt_seq_length=24, vocab_size=40,
                                     sentinel_start=40, seed=3,
                                     mlm_prob=0.5)
                # layout flips AFTER construction (second tokenizer in
                # the same process) — the built instances keep theirs
                pp.set_special_ids(cls_id=0, pad_id=1, sep_id=2)
                for i in range(len(ds)):
                    item = ds.get(i)
                    assert item["src"][0] == 7
                    assert item["tgt_in"][0] == 7  # decoder CLS
        finally:
            pp.set_special_ids(*old)

    def test_t5_keeps_bert_layout_framing(self):
        """With specials realigned to a BERT-ish layout (cls=7, sep=9 —
        both above special_limit=5), T5 masking must never collapse the
        CLS/SEP framing into a sentinel span."""
        from lr2ppo_tpu.data import pretrain_processors as pp
        from lr2ppo_tpu.data.pretrain_processors import T5CorpusDataset

        class Tok:
            vocab = {str(i): i for i in range(40)}

            def encode(self, text):
                return [10 + (sum(map(ord, w)) % 20) for w in text.split()]

        old = (pp.CLS, pp.PAD, pp.SEP)
        pp.set_special_ids(cls_id=7, pad_id=1, sep_id=9)
        try:
            import tempfile, os

            with tempfile.TemporaryDirectory() as d:
                path = os.path.join(d, "c.txt")
                with open(path, "w") as f:
                    f.write("a b c d e f g h\n" * 20)
                ds = T5CorpusDataset(path, Tok(), seq_length=16,
                                     tgt_seq_length=24, vocab_size=40,
                                     sentinel_start=40, seed=3,
                                     mlm_prob=0.5)
                for epoch in range(4):
                    ds.set_epoch(epoch)
                    for i in range(len(ds)):
                        item = ds.get(i)
                        src, seg = item["src"], item["seg"]
                        n = int(seg.sum())
                        assert src[0] == 7, (epoch, i, src[:4])
                        # no SEP swallowed into a span: every SEP the
                        # packed row had survives in the compacted src
                        row = ds.ids[i][ds.seg[i] > 0]
                        assert (src[:n] == 9).sum() == (row == 9).sum()
        finally:
            pp.set_special_ids(*old)


def test_pretrain_cli_exposes_ckpt_backend(tmp_path):
    """README documents --ckpt_backend under the pretrain CLI; the flag
    must exist and route into the trainer config (orbax directory on
    disk instead of a pickle file)."""
    from lr2ppo_tpu.cli import pretrain

    vp = tmp_path / "v.txt"
    toks = ["<s>", "<pad>", "</s>", "<unk>", "<mask>"] + list("abcdefgh")
    vp.write_text("".join(t + "\n" for t in toks))
    corpus = tmp_path / "c.txt"
    corpus.write_text("a b c d e f g h\n" * 8)
    tcfg = tmp_path / "tower.json"
    tcfg.write_text(json.dumps({
        "emb_size": 16, "hidden_size": 16, "feedforward_size": 32,
        "heads_num": 4, "layers_num": 1, "max_seq_length": 16,
        "dropout": 0.0, "embedding": ["word", "pos", "seg"],
        "encoder": "transformer", "mask": "fully_visible",
        "target": ["mlm"]}))
    out = tmp_path / "m"
    pretrain.main([
        "--corpus_path", str(corpus), "--vocab_path", str(vp),
        "--tower_config", str(tcfg), "--data_processor", "mlm",
        "--output_model_path", str(out), "--batch_size", "4",
        "--seq_length", "16", "--epochs_num", "1",
        "--report_steps", "2", "--learning_rate", "1e-3",
        "--dp", "2", "--ckpt_backend", "orbax"])
    best = tmp_path / "m-best"
    assert best.exists() and best.is_dir(), (
        "--ckpt_backend orbax must write an orbax directory")


def test_max_audio_frames_abbreviation_is_explicit(tmp_path):
    """argparse accepts unambiguous prefixes; --max_audio must count as
    an explicit CLI value (overriding the tower JSON) and the dataset
    must be built with the SAME resolved value as the pos tables."""
    from lr2ppo_tpu.cli import pretrain

    # parse-level check through the real parser wiring: run a tiny s2t
    # job where the JSON says 64 but the abbreviated flag says 32
    wav = tmp_path / "a.wav"
    import struct
    import wave

    with wave.open(str(wav), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        rng = np.random.default_rng(0)
        pcm = (rng.standard_normal(1600) * 3000).astype(np.int16)
        w.writeframes(struct.pack(f"<{len(pcm)}h", *pcm))
    vp = tmp_path / "v.txt"
    vp.write_text("".join(t + "\n" for t in
                          ["<s>", "<pad>", "</s>", "<unk>", "<mask>",
                           "a", "b", "c"]))
    tsv = tmp_path / "s.tsv"
    tsv.write_text(f"a b c\t{wav}\n" * 4)
    tcfg = tmp_path / "tower.json"
    tcfg.write_text(json.dumps({
        "emb_size": 16, "hidden_size": 16, "feedforward_size": 32,
        "heads_num": 4, "layers_num": 1, "max_seq_length": 8,
        "max_audio_frames": 64, "dropout": 0.0,
        "embedding": ["speech", "sinusoidalpos"],
        "tgt_embedding": ["word", "pos"], "encoder": "transformer",
        "mask": "fully_visible", "decoder": "transformer",
        "target": ["lm"]}))
    out = tmp_path / "m"
    pretrain.main([
        "--corpus_path", str(tsv), "--vocab_path", str(vp),
        "--tower_config", str(tcfg), "--data_processor", "s2t",
        "--output_model_path", str(out), "--batch_size", "2",
        "--seq_length", "8", "--tgt_seq_length", "8", "--epochs_num", "1",
        "--report_steps", "2", "--learning_rate", "1e-3",
        "--dp", "2", "--max_audio", "32"])   # abbreviated, explicit
    assert (tmp_path / "m-best").exists()
    # the explicit CLI value (32) must beat the JSON's 64: the decoder
    # pos table is sized max(max_seq_length=8, max_audio_frames)
    from lr2ppo_tpu.train.checkpoints import load_any

    tree = load_any(str(tmp_path / "m-best"))
    params = tree.get("params", tree)
    table = params["tgt_embedding"]["pos"]["embedding"]
    assert table.shape[0] == 32, (
        f"pos table {table.shape}: the tower was sized by the JSON's "
        "max_audio_frames, not the explicit (abbreviated) CLI flag")


def test_pretrain_total_steps_cycles_epochs(tmp_path):
    """An explicit total_steps is the training budget: the reference
    trainer cycles the stream until total_steps (trainer.py:95-178);
    epochs_num must not silently truncate it mid-schedule."""
    from lr2ppo_tpu.config import Config
    from lr2ppo_tpu.data.pipeline import Loader
    from lr2ppo_tpu.towers.model import TowerConfig
    from lr2ppo_tpu.train.pretrain import PretrainTrainer

    class Ds:
        def set_epoch(self, e):
            pass

        def __len__(self):
            return 8

        def get(self, i):
            rng = np.random.default_rng(i)
            src = rng.integers(5, 30, 8).astype(np.int32)
            tgt = np.where(rng.random(8) < 0.3, src, 0).astype(np.int32)
            return {"src": src, "tgt": tgt, "seg": np.ones(8, np.int32)}

    cfg = Config().replace(epochs_num=1, batch_size=4, report_steps=100,
                           output_model_path="", seed=0)
    cfg.mesh.dp = 2
    tcfg = TowerConfig(emb_size=16, hidden_size=16, feedforward_size=32,
                       heads_num=4, layers_num=1, max_seq_length=16,
                       vocab_size=32)
    tr = PretrainTrainer(cfg, tcfg)
    # 2 steps/epoch; 7 total steps needs 4 cycles despite epochs_num=1
    state, _ = tr.fit(Loader(Ds(), 4, shuffle=False), total_steps=7)
    assert int(state.step) == 7


def test_reward_epoch_end_eval_not_duplicated(tmp_path, monkeypatch):
    """When the epoch's last step hits the report cadence, the epoch-end
    eval must not re-run the identical full validation pass."""
    import h5py

    from lr2ppo_tpu.config import Config, ModelConfig
    from lr2ppo_tpu.data.movienet import MovieNetDataset
    from lr2ppo_tpu.data.pipeline import Loader
    from lr2ppo_tpu.train import reward as reward_mod

    h5p = tmp_path / "feat.h5"
    data = []
    with h5py.File(h5p, "w") as f:
        for i in range(4):
            iid = f"it{i}"
            data.append({"id": iid,
                         "tags": [{"tag": "a", "target": 1},
                                  {"tag": "b", "target": 0},
                                  {"tag": "c", "target": 2}],
                         "index": [[0, 1], [1, 2]]})
            g = f.create_group(iid)
            g["text_emb"] = np.random.default_rng(i).standard_normal(
                (3, 4, 16)).astype(np.float32)
            g["img_emb"] = np.random.default_rng(i + 9).standard_normal(
                (1, 2, 16)).astype(np.float32)
    cfg = Config().replace(
        model=ModelConfig(feat_size=16, seq_length=4, max_imgs=2,
                          visual_feat_dim=16, num_heads=4,
                          family="multimodal"),
        epochs_num=1, batch_size=4, report_steps=1,
        output_model_path=str(tmp_path / "best.ckpt"), seed=3)
    cfg.mesh.dp = 2
    tr_ds = MovieNetDataset(None, str(h5p), "reward", max_imgs=2,
                            data=data)
    ev_ds = MovieNetDataset(None, str(h5p), "reward_eval", max_tags=2,
                            max_imgs=2, data=data)
    calls = []
    real = reward_mod.evaluate_pairwise
    monkeypatch.setattr(
        reward_mod, "evaluate_pairwise",
        lambda *a, **k: (calls.append(1), real(*a, **k))[1])
    tr = reward_mod.RewardTrainer(cfg)
    tr.fit(Loader(tr_ds, 4, shuffle=True), Loader(ev_ds, 4))
    steps = len(tr_ds) // 4
    # report_steps=1 evals at EVERY step incl. the epoch's last —
    # the epoch-end pass must be skipped, not doubled
    assert len(calls) == steps, (len(calls), steps)


def test_movienet_preload_skips_exampleless_items(tmp_path):
    import h5py

    from lr2ppo_tpu.data.movienet import MovieNetDataset

    h5p = tmp_path / "feat.h5"
    data = [
        {"id": "one_tag", "tags": [{"tag": "a", "target": 1}]},
        {"id": "ok", "tags": [{"tag": "a", "target": 1},
                              {"tag": "b", "target": 0},
                              {"tag": "c", "target": 2}]},
    ]
    with h5py.File(h5p, "w") as f:
        for item in data:
            g = f.create_group(item["id"])
            t = len(item["tags"])
            g["text_emb"] = np.ones((t, 4, 8), np.float32)
            g["img_emb"] = np.ones((1, 2, 8), np.float32)
    ds = MovieNetDataset(json_path=None, h5_path=str(h5p), mode="ppo",
                         max_tags=2, data=data)
    ds.preload()
    assert set(ds._ram) == {"ok"}, (
        "preload cached embeddings for items that produced no examples")

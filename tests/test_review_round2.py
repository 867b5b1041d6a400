"""Regression tests for the round-2 self-review findings: PPO mid-batch
sweep, ProcessLoader cross-epoch slot validity, BEiT grid alignment,
8-bit WAV decode, T5 sentinel vocab growth, resume-after-completion,
and epoch-fresh PPO pair sampling without dataset rebuild."""

import numpy as np
import pytest

from fixtures import make_movienet
from lr2ppo_tpu.data.movienet import MovieNetDataset
from lr2ppo_tpu.data.pipeline import Loader, ProcessLoader


@pytest.mark.heavy
def test_ppo_sweep_mid_batch_timesteps(tmp_path):
    # max_timesteps=3 with update_timesteps=2: the sweep fires on a
    # batch's FIRST/SECOND timestep; the remaining timesteps must still
    # see the batch (regression: b=None crashed the next rollout)
    from lr2ppo_tpu.config import Config, ModelConfig, PPOConfig
    from lr2ppo_tpu.train.ppo import PPOTrainer

    jp, hp = make_movienet(tmp_path / "d", n_items=4)
    cfg = Config()
    cfg = cfg.replace(
        model=ModelConfig(feat_size=16, seq_length=4, max_imgs=2,
                          visual_feat_dim=16, num_heads=4,
                          family="multimodal"),
        ppo=PPOConfig(max_timesteps=3, update_timesteps=2),
        epochs_num=1, batch_size=4, report_steps=1000,
        output_model_path=str(tmp_path / "best.ckpt"), seed=0)
    cfg.mesh.dp = 2

    def mk(epoch):
        ds = MovieNetDataset(jp, hp, "ppo", max_tags=2, max_imgs=2,
                             seed=epoch)
        return Loader(ds, 4, shuffle=True, seed=epoch)

    from lr2ppo_tpu.data import EvalLoader

    ev = EvalLoader(MovieNetDataset(jp, hp, "eval", max_imgs=2),
                    buckets=[8], batch_size=4)
    astate, cstate, best = PPOTrainer(cfg).fit(mk, ev)
    assert np.isfinite(best)
    assert int(astate.step) >= 2          # at least two sweeps ran


class _SlowDs:
    def __init__(self, n=40):
        self.n = n
        self.epoch = 0

    def set_epoch(self, epoch):
        self.epoch = epoch

    def __len__(self):
        return self.n

    def get(self, i):
        return {"x": np.full(4, i + 1000 * self.epoch, np.float32)}


def test_process_loader_batch_valid_across_epoch_boundary():
    # the LAST batch of an epoch must stay valid while the next epoch's
    # first batches are produced (regression: __iter__ re-freed the
    # holdback slots, letting workers overwrite a held batch)
    pl = ProcessLoader(_SlowDs(40), 4, shuffle=False, num_workers=2)
    last = None
    for b in pl:
        last = b                     # keep the live shared-memory view
    held = {k: np.array(v) for k, v in last.items()}   # snapshot

    pl.set_epoch(1)
    it = iter(pl)
    next(it)                         # workers are now filling slots
    import time

    time.sleep(0.3)                  # give workers time to (wrongly)
    # recycle the held slot — makes a regression deterministic on a
    # 1-core host rather than a scheduling coin-flip
    for k in held:
        np.testing.assert_array_equal(held[k], np.array(last[k]))
    # drain to let the pool settle, then close
    for _ in it:
        pass
    pl.close()


def test_beit_grid_align_remap_and_identity():
    from lr2ppo_tpu.data.pretrain_processors import BeitImageDataset

    ds = BeitImageDataset.__new__(BeitImageDataset)
    ds.gh, ds.gw = 2, 2
    ds.h, ds.w = 16, 16
    # identity when the grids already coincide
    np.testing.assert_array_equal(
        ds._grid_align(np.arange(4)), np.arange(4))
    # 4x4 token grid -> 2x2 patch grid: patch (r, c) takes the token of
    # the SAME image region (rows/cols 0 and 2 of the finer grid)
    np.testing.assert_array_equal(
        ds._grid_align(np.arange(16)), np.array([0, 2, 8, 10]))
    # non-square: 4x2 token grid (h=2w) -> 2x2 patch grid
    ds.h, ds.w = 32, 16
    np.testing.assert_array_equal(
        ds._grid_align(np.arange(8)), np.array([0, 1, 4, 5]))


def test_read_wav_8bit_unsigned(tmp_path):
    import wave

    from lr2ppo_tpu.data.pretrain_processors import read_wav

    t = np.linspace(0, 1, 800, endpoint=False)
    wav = np.sin(2 * np.pi * 13 * t)

    p16 = tmp_path / "a16.wav"
    with wave.open(str(p16), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(800)
        w.writeframes((wav * 32767).astype(np.int16).tobytes())
    p8 = tmp_path / "a8.wav"
    with wave.open(str(p8), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(1)
        w.setframerate(800)
        w.writeframes((wav * 127 + 128).clip(0, 255)
                      .astype(np.uint8).tobytes())

    x16, _ = read_wav(str(p16))
    x8, _ = read_wav(str(p8))
    # 8-bit is unsigned PCM: decoded waveform must match the 16-bit one
    # up to quantization error, not be flipped around the midpoint
    assert np.abs(x8 - x16).max() < 0.02
    assert np.corrcoef(x8, x16)[0, 1] > 0.999


@pytest.mark.heavy
def test_t5_sentinel_start_explicit_grows_vocab(tmp_path):
    # passing --sentinel_start explicitly (even past len(vocab), the
    # documented default) must still grow the embedding to cover the
    # sentinel ids (regression: explicit flag disabled the growth)
    import json

    from lr2ppo_tpu.cli import pretrain as P

    corpus = tmp_path / "c.txt"
    corpus.write_text("a b c d e f g h\n" * 24)
    vocab = tmp_path / "v.txt"
    toks = ["<s>", "<pad>", "</s>", "<unk>", "<mask>"] + list("abcdefgh")
    vocab.write_text("".join(t + "\n" for t in toks))
    tcfg = tmp_path / "tower.json"
    tcfg.write_text(json.dumps({
        "emb_size": 16, "hidden_size": 16, "feedforward_size": 32,
        "heads_num": 4, "layers_num": 1, "max_seq_length": 32,
        "dropout": 0.0, "embedding": ["word", "pos", "seg"],
        "encoder": "transformer", "mask": "fully_visible",
        "decoder": "transformer", "target": ["lm"],
    }))
    start = len(toks) + 7
    best = P.main([
        "--corpus_path", str(corpus), "--tower_config", str(tcfg),
        "--data_processor", "t5", "--tokenizer", "space",
        "--vocab_path", str(vocab),
        "--output_model_path", str(tmp_path / "t5"),
        "--batch_size", "2", "--seq_length", "16",
        "--tgt_seq_length", "8", "--total_steps", "2",
        "--report_steps", "2", "--sentinel_start", str(start),
        "--dp", "2",
    ])
    assert np.isfinite(best)   # OOB sentinel embeds would NaN/clamp


def test_resume_after_completion_is_noop(tmp_path):
    from fixtures import make_letor_groups
    from lr2ppo_tpu.config import Config, ModelConfig
    from lr2ppo_tpu.data import (EvalLoader, LetorQueries, Loader,
                                 LTRPointwiseDataset)
    from lr2ppo_tpu.train.pointwise import PointwiseTrainer

    groups = make_letor_groups(n_queries=8, docs=4, n_feat=16)
    q = LetorQueries(groups)
    ds = LTRPointwiseDataset(q)
    train = Loader(ds, batch_size=4, shuffle=True, seed=0)
    ev = EvalLoader(ds, buckets=[6], batch_size=4)

    cfg = Config()
    cfg = cfg.replace(
        model=ModelConfig(feat_size=16, seq_length=4, max_imgs=2,
                          visual_feat_dim=16, num_heads=4,
                          family="tabular"),
        epochs_num=1, batch_size=4, report_steps=1000,
        output_model_path=str(tmp_path / "best.ckpt"), seed=1,
        save_state_steps=1)
    cfg.mesh.dp = 2
    tr = PointwiseTrainer(cfg)
    state, _ = tr.fit(train, ev)
    done = int(state.step)

    cfg2 = cfg.replace(resume_path=str(tmp_path / "best.ckpt.state"))
    state2, _ = PointwiseTrainer(cfg2).fit(train, ev)
    # run already completed: resume must not train further
    assert int(state2.step) == done


def test_loader_abandoned_iterator_does_not_corrupt_next_epoch():
    # next(iter(loader)) then abandoning used to leave running collation
    # workers writing the reuse_buffers slot pool while the next
    # iteration collated into the same slots
    ds = _SlowDs(64)
    ref = Loader(_SlowDs(64), 8, shuffle=True, seed=1, reuse_buffers=True)
    expect = [{k: np.array(v) for k, v in b.items()} for b in ref]

    ld = Loader(ds, 8, shuffle=True, seed=1, reuse_buffers=True)
    next(iter(ld))                       # abandon a started iteration
    got = [{k: np.array(v) for k, v in b.items()} for b in ld]
    assert len(got) == len(expect)
    for a, b in zip(expect, got):
        for k in a:
            np.testing.assert_array_equal(a[k], b[k])


def test_loader_second_iterator_preempts_first_without_hanging():
    # starting a new iteration ends the previous one (documented
    # single-active-iterator semantics); regression: the preempted
    # consumer blocked forever on its queue
    ld = Loader(_SlowDs(40), 4, shuffle=False, num_workers=2,
                reuse_buffers=True)
    it1 = iter(ld)
    next(it1)
    got2 = [dict(b) for b in ld]         # preempts it1
    assert len(got2) == 10
    # must terminate (not hang) AND never yield stale queued batches
    # whose reuse_buffers slots the new iteration rewrote
    assert list(it1) == []


def test_process_loader_close_after_abandoned_iterator():
    # close() tears down the pool and queues; the next iteration must
    # not wait for tasks that can no longer complete
    pl = ProcessLoader(_SlowDs(24), 4, shuffle=False, num_workers=2)
    next(iter(pl))                       # leaves dispatched tasks
    pl.close()
    got = [dict(b) for b in pl]          # fresh pool; must not hang
    assert len(got) == 6
    pl.close()


def test_loader_first_batch_matches_iteration():
    ld = Loader(_SlowDs(24), 8, shuffle=True, seed=5, reuse_buffers=True)
    fb = {k: np.array(v) for k, v in ld.first_batch().items()}
    it_first = next(iter(ld))
    for k in fb:
        np.testing.assert_array_equal(fb[k], np.array(it_first[k]))


def test_process_loader_abandoned_iterator_drains():
    pl = ProcessLoader(_SlowDs(40), 4, shuffle=False, num_workers=2)
    ref = [{k: np.array(v) for k, v in b.items()} for b in pl]
    next(iter(pl))                       # abandon mid-flight dispatches
    got = [{k: np.array(v) for k, v in b.items()} for b in pl]
    assert len(got) == len(ref)
    for a, b in zip(ref, got):
        for k in a:
            np.testing.assert_array_equal(a[k], b[k])
    pl.close()


def test_state_checkpoint_carries_best_watermark(tmp_path):
    from fixtures import make_letor_groups
    from lr2ppo_tpu.config import Config, ModelConfig
    from lr2ppo_tpu.data import (EvalLoader, LetorQueries, Loader,
                                 LTRPointwiseDataset)
    from lr2ppo_tpu.train.common import load_state_tree
    from lr2ppo_tpu.train.pointwise import PointwiseTrainer

    q = LetorQueries(make_letor_groups(n_queries=8, docs=4, n_feat=16))
    ds = LTRPointwiseDataset(q)
    train = Loader(ds, batch_size=4, shuffle=True, seed=0)
    ev = EvalLoader(ds, buckets=[6], batch_size=4)
    cfg = Config()
    cfg = cfg.replace(
        model=ModelConfig(feat_size=16, seq_length=4, max_imgs=2,
                          visual_feat_dim=16, num_heads=4,
                          family="tabular"),
        epochs_num=1, batch_size=4, report_steps=1000,
        output_model_path=str(tmp_path / "best.ckpt"), seed=1,
        save_state_steps=2)
    cfg.mesh.dp = 2
    state, best = PointwiseTrainer(cfg).fit(train, ev)
    tree, _ = load_state_tree(str(tmp_path / "best.ckpt.state"))
    # the periodic state carries the best-metric watermark so a resumed
    # run cannot overwrite a superior save-best checkpoint
    assert "best" in tree


def test_load_any_reads_orbax_directory(tmp_path):
    pytest.importorskip("orbax.checkpoint")
    import jax.numpy as jnp

    from lr2ppo_tpu.train import checkpoints

    tree = {"params": {"w": jnp.ones((3, 2))}}
    path = str(tmp_path / "ck")
    checkpoints.save_checkpoint(path, tree, {"step": 1}, backend="orbax")
    got = checkpoints.load_any(path)
    np.testing.assert_array_equal(np.asarray(got["params"]["w"]),
                                  np.ones((3, 2)))


def test_pointwise_trains_without_eval_loader(tmp_path):
    from fixtures import make_letor_groups
    from lr2ppo_tpu.config import Config, ModelConfig
    from lr2ppo_tpu.data import LetorQueries, Loader, LTRPointwiseDataset
    from lr2ppo_tpu.train.pointwise import PointwiseTrainer

    q = LetorQueries(make_letor_groups(n_queries=8, docs=4, n_feat=16))
    ds = LTRPointwiseDataset(q)
    train = Loader(ds, batch_size=4, shuffle=True, seed=0)
    cfg = Config()
    cfg = cfg.replace(
        model=ModelConfig(feat_size=16, seq_length=4, max_imgs=2,
                          visual_feat_dim=16, num_heads=4,
                          family="tabular"),
        epochs_num=1, batch_size=4, report_steps=1,   # eval every step
        output_model_path="", seed=1)
    cfg.mesh.dp = 2
    state, _ = PointwiseTrainer(cfg).fit(train, None)
    assert int(state.step) == len(train)


def test_mlm_seg_not_fooled_by_token_equal_to_pad_id(tmp_path):
    # a REAL token whose id equals pad_id must keep seg=1 (regression:
    # seg was derived by value-matching, hiding it from attention/MLM)
    from lr2ppo_tpu.data.pretrain_data import MlmCorpusDataset

    class Tok:
        # token 'x' encodes to id 1 == pad_id
        def encode(self, text):
            return [1 if w == "x" else 5 for w in text.split()]

    corpus = tmp_path / "c.txt"
    corpus.write_text("x x x x x x\n" * 4)
    ds = MlmCorpusDataset(str(corpus), Tok(), seq_length=8, vocab_size=16,
                          mask_id=4)
    full_rows = ds.seg[:-1]          # every full row is padding-free
    assert (full_rows == 1).all(), "token id == pad_id lost its seg"


def test_decoder_pre_ln_final_norm_and_relpos():
    # reference transformer_decoder.py:31-38,90-91: pre-LN stacks end
    # with a final layer norm and self-attention gets relative position
    # bias (bidirectional=False)
    import jax
    import jax.numpy as jnp

    from lr2ppo_tpu.towers.model import TowerConfig, build_model

    cfg = TowerConfig(emb_size=16, hidden_size=16, feedforward_size=32,
                      heads_num=4, layers_num=1, max_seq_length=16,
                      vocab_size=32, embedding=["word"],
                      encoder="transformer", decoder="transformer",
                      target=["lm"], layernorm_positioning="pre",
                      relative_position_embedding=True)
    m = build_model(cfg)
    src = jnp.ones((2, 8), jnp.int32)
    seg = jnp.ones((2, 8), jnp.int32)
    tgt = jnp.ones((2, 6), jnp.int32)
    p = m.init(jax.random.PRNGKey(0), src, tgt, seg,
               tgt_in=tgt, tgt_seg=jnp.ones((2, 6), jnp.int32))
    dec = p["params"]["decoder_mod"]
    assert "layer_norm" in dec, "pre-LN decoder needs the final norm"
    assert "self_pos_emb" in dec, "decoder self-attn needs rel-pos bias"


def test_torch_import_routes_decoder_keys():
    from lr2ppo_tpu.towers.torch_import import _route_tower_key

    assert _route_tower_key(
        "decoder.transformer_decoder.0.self_attn.linear_layers.0.weight"
    ) == ["decoder_mod", "transformer_decoder_0_self_attn",
          "linear_layers_0", "weight"]
    assert _route_tower_key("decoder.layer_norm.gamma") == [
        "decoder_mod", "layer_norm", "gamma"]
    assert _route_tower_key(
        "decoder.transformer_decoder.0.layer_norm_1.gamma") == [
        "decoder_mod", "transformer_decoder_0_layer_norm_1", "gamma"]


def test_sinusoidal_embedding_full_length():
    # sequences up to max_seq_length must not crash despite the +2 row
    # shift (the reference's table is 2 rows short at the limit)
    import jax.numpy as jnp

    from lr2ppo_tpu.towers.embeddings import SinusoidalposEmbedding

    m = SinusoidalposEmbedding(max_seq_length=8, emb_size=6)
    seg = jnp.ones((2, 8), jnp.int32)
    out = m.apply({}, jnp.ones((2, 8), jnp.int32), seg)
    assert out.shape == (2, 8, 6)
    assert np.isfinite(np.asarray(out)).all()


def test_dalle_last_real_position_targets_sep(tmp_path):
    from PIL import Image

    from lr2ppo_tpu.data.pretrain_processors import SEP, DalleDataset
    from lr2ppo_tpu.data.tokenizers import ImageTokenizer

    TINY_VQ = dict(ch=8, ch_mult=(1, 2, 2), num_res_blocks=1,
                   attn_resolutions=(8,), resolution=16, z_channels=8,
                   n_embed=16, embed_dim=8)
    img = tmp_path / "i.png"
    Image.fromarray(np.zeros((16, 16, 3), np.uint8)).save(img)

    class Tok:
        def encode(self, text):
            return [7, 8]

    ds = DalleDataset([("ab", str(img))], Tok(),
                      ImageTokenizer(vqgan_config=TINY_VQ, seed=0),
                      text_seq_length=8, vocab_bias=16)
    it = ds.get(0)
    seg = it["seg"]
    last_real = int(np.flatnonzero(seg > 0)[-1])
    assert it["tgt"][last_real] == SEP, "stopping signal must survive"
    # reference packing: no pad gap between text and image; pads only
    # at the end, and they yield no predictions
    pad_positions = np.flatnonzero(seg == 0)
    assert (pad_positions > last_real).all()
    assert (it["tgt"][pad_positions] == 0).all()


def test_pretrain_frames_with_tokenizer_special_ids(tmp_path):
    # a BERT-layout vocab must frame instances with ITS [CLS]/[SEP]/[PAD]
    # ids, not the XLM-R 0/2/1 defaults (regression: hardcoded layout)
    from lr2ppo_tpu.cli.pretrain import _special_ids
    from lr2ppo_tpu.data.pretrain_data import MlmCorpusDataset
    from lr2ppo_tpu.data.tokenizers import str2tokenizer

    vocab = tmp_path / "bert_vocab.txt"
    toks = ["[PAD]", "[unused0]", "[unused1]", "[UNK]", "[CLS]", "[SEP]",
            "[MASK]", "hello", "world"]
    vocab.write_text("".join(t + "\n" for t in toks))
    tok = str2tokenizer["space"](str(vocab))
    cls_id, pad_id, sep_id = _special_ids(tok)
    assert (cls_id, pad_id, sep_id) == (4, 0, 5)

    corpus = tmp_path / "c.txt"
    corpus.write_text("hello world\n" * 4)
    ds = MlmCorpusDataset(str(corpus), tok, seq_length=8, vocab_size=9,
                          mask_id=6, cls_id=cls_id, sep_id=sep_id,
                          pad_id=pad_id)
    row = ds.ids[0]
    assert row[0] == 4                     # [CLS], not id 0 (= [PAD])
    assert sep_id in row                   # [SEP] closes each line


def test_mask_id_raises_without_mask_token(tmp_path):
    from lr2ppo_tpu.cli.pretrain import _mask_id

    class Tok:
        vocab = {"a": 0, "b": 1}
        specials = {}

    with pytest.raises(SystemExit, match="mask token"):
        _mask_id(Tok())


def test_tower_params_get_tp_sharding():
    # the encoder qkv/FFN matmuls must pick up the megatron tp split
    # (round-2: towers previously replicated over tp)
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    from lr2ppo_tpu.parallel.mesh import make_mesh, param_shardings
    from lr2ppo_tpu.towers.model import TowerConfig, build_model

    cfg = TowerConfig(emb_size=16, hidden_size=16, feedforward_size=32,
                      heads_num=4, layers_num=1, max_seq_length=16,
                      vocab_size=32)
    m = build_model(cfg)
    src = jnp.ones((2, 8), jnp.int32)
    p = m.init(jax.random.PRNGKey(0), src, jnp.zeros((2, 8), jnp.int32),
               jnp.ones((2, 8), jnp.int32))
    mesh = make_mesh(dp=4, tp=2)
    sh = param_shardings(p, mesh)
    enc = sh["params"]["encoder"]["transformer_0"]
    assert enc["self_attn"]["linear_layers_0"]["kernel"].spec == P(None, "tp")
    assert enc["self_attn"]["final_linear"]["kernel"].spec == P("tp", None)
    assert enc["feed_forward"]["linear_1"]["kernel"].spec == P(None, "tp")
    assert enc["feed_forward"]["linear_2"]["kernel"].spec == P("tp", None)


@pytest.mark.heavy
def test_tower_pretrain_step_runs_with_tp(tmp_path):
    # full jitted pretrain step with tp-sharded tower params executes
    # and stays finite on the fake dp x tp mesh
    import jax
    import numpy as np

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

    cfg = Config()
    cfg = cfg.replace(epochs_num=1, batch_size=4, report_steps=100,
                      output_model_path="", seed=0)
    cfg.mesh.dp = 2
    cfg.mesh.tp = 2
    tcfg = TowerConfig(emb_size=16, hidden_size=16, feedforward_size=32,
                       heads_num=4, layers_num=1, max_seq_length=16,
                       vocab_size=32)
    tr = PretrainTrainer(cfg, tcfg)
    state, _ = tr.fit(Loader(Ds(), 4, shuffle=False))
    assert int(state.step) == 2
    assert all(np.isfinite(np.asarray(x)).all()
               for x in jax.tree.leaves(state.params))


def test_clr_target_works_with_compute_dtype():
    # regression: CompositeTarget built targets positionally as
    # (cfg, dtype) but ClrTarget's second field was axis_name — any
    # non-None dtype (i.e. EVERY trainer) crashed CLIP pretraining with
    # 'unbound axis name'
    import jax
    import jax.numpy as jnp

    from lr2ppo_tpu.towers.model import TowerConfig, build_model

    cfg = TowerConfig(
        emb_size=16, hidden_size=16, feedforward_size=32, heads_num=4,
        layers_num=1, max_seq_length=16, vocab_size=32,
        encoder="dual", target=["clr"],
        stream_0=dict(embedding=["word"], encoder="transformer",
                      pooling="first", hidden_size=16),
        stream_1=dict(embedding=["word"], encoder="transformer",
                      pooling="first", hidden_size=16))
    m = build_model(cfg, jnp.float32)          # non-None dtype
    src = (jnp.ones((4, 8), jnp.int32), jnp.ones((4, 8), jnp.int32))
    seg = (jnp.ones((4, 8), jnp.int32), jnp.ones((4, 8), jnp.int32))
    p = m.init(jax.random.PRNGKey(0), src, jnp.arange(4), seg)
    loss, correct, denom = m.apply(p, src, jnp.arange(4), seg)
    assert np.isfinite(float(loss))
    assert float(denom) == 4.0 and 0 <= float(correct) <= 4


@pytest.mark.heavy
def test_e2e_clip_pretrain_cli(tmp_path):
    # the clip processor end-to-end through the real CLI (dual tower +
    # clr target + bf16-free default dtype path)
    import json

    from PIL import Image

    from lr2ppo_tpu.cli import pretrain as P

    rng = np.random.RandomState(0)
    rows = []
    for i in range(8):
        p = tmp_path / f"im{i}.png"
        Image.fromarray(rng.randint(0, 255, (16, 16, 3), np.uint8)).save(p)
        rows.append(f"cap {i} word\t{p}")
    tsv = tmp_path / "pairs.tsv"
    tsv.write_text("\n".join(rows) + "\n")
    vocab = tmp_path / "v.txt"
    vocab.write_text("".join(t + "\n" for t in
                             ["<s>", "<pad>", "</s>", "<unk>", "<mask>",
                              "cap", "word"] + [str(i) for i in range(8)]))
    tcfg = tmp_path / "tower.json"
    tcfg.write_text(json.dumps({
        "emb_size": 16, "hidden_size": 16, "feedforward_size": 32,
        "heads_num": 4, "layers_num": 1, "max_seq_length": 32,
        "dropout": 0.0, "encoder": "dual", "target": ["clr"],
        "projection": True, "feature_size": 8,
        "image_height": 16, "image_width": 16, "patch_size": 8,
        "stream_0": {"embedding": ["word", "pos"],
                     "encoder": "transformer", "pooling": "first",
                     "hidden_size": 16},
        "stream_1": {"embedding": ["patch", "pos"],
                     "encoder": "transformer", "pooling": "first",
                     "hidden_size": 16},
    }))
    best = P.main([
        "--corpus_path", str(tsv), "--tower_config", str(tcfg),
        "--data_processor", "clip", "--tokenizer", "space",
        "--vocab_path", str(vocab),
        "--output_model_path", str(tmp_path / "clip"),
        "--batch_size", "4", "--seq_length", "8", "--total_steps", "2",
        "--report_steps", "2", "--dp", "2",
    ])
    assert np.isfinite(best)


def test_best_saver_ignores_nan(tmp_path):
    from lr2ppo_tpu.train.common import BestSaver

    s = BestSaver(str(tmp_path / "b.ckpt"))
    assert s.maybe_save(0.5, {"w": np.ones(2)})
    assert not s.maybe_save(float("nan"), {"w": np.zeros(2)})
    assert s.best == 0.5
    from lr2ppo_tpu.train import checkpoints

    tree, _ = checkpoints.load_checkpoint(str(tmp_path / "b.ckpt"))
    np.testing.assert_array_equal(np.asarray(tree["w"]), np.ones(2))


def test_pretrain_rejects_indivisible_accum(tmp_path):
    from lr2ppo_tpu.config import Config
    from lr2ppo_tpu.data.pipeline import Loader
    from lr2ppo_tpu.towers.model import TowerConfig
    from lr2ppo_tpu.train.pretrain import PretrainTrainer

    class Ds:
        def set_epoch(self, e):
            pass

        def __len__(self):
            return 12

        def get(self, i):
            return {"src": np.ones(8, np.int32),
                    "tgt": np.zeros(8, np.int32),
                    "seg": np.ones(8, np.int32)}

    cfg = Config()
    cfg = cfg.replace(epochs_num=1, batch_size=4, output_model_path="")
    cfg.mesh.dp = 2
    tcfg = TowerConfig(emb_size=16, hidden_size=16, feedforward_size=32,
                       heads_num=4, layers_num=1, max_seq_length=16,
                       vocab_size=32)
    tr = PretrainTrainer(cfg, tcfg, accumulation_steps=3)
    with pytest.raises(ValueError, match="divisible"):
        tr.fit(Loader(Ds(), 4, shuffle=False))


@pytest.mark.heavy
def test_pretrain_resume_continues(tmp_path):
    from lr2ppo_tpu.config import Config
    from lr2ppo_tpu.data.pipeline import Loader
    from lr2ppo_tpu.towers.model import TowerConfig
    from lr2ppo_tpu.train.pretrain import PretrainTrainer

    class Ds:
        def set_epoch(self, e):
            pass

        def __len__(self):
            return 16

        def get(self, i):
            rng = np.random.default_rng(i)
            src = rng.integers(5, 30, 8).astype(np.int32)
            tgt = np.where(rng.random(8) < 0.3, src, 0).astype(np.int32)
            return {"src": src, "tgt": tgt, "seg": np.ones(8, np.int32)}

    def cfg_for(epochs):
        cfg = Config()
        cfg = cfg.replace(epochs_num=epochs, batch_size=4, report_steps=2,
                          output_model_path=str(tmp_path / "pt"), seed=2)
        cfg.mesh.dp = 2
        return cfg

    tcfg = TowerConfig(emb_size=16, hidden_size=16, feedforward_size=32,
                       heads_num=4, layers_num=1, max_seq_length=16,
                       vocab_size=32)
    tr = PretrainTrainer(cfg_for(1), tcfg)
    state, _ = tr.fit(Loader(Ds(), 4, shuffle=False),
                      save_checkpoint_steps=2)
    assert int(state.step) == 4
    import os

    assert os.path.exists(str(tmp_path / "pt-4"))

    cfg2 = cfg_for(2).replace(resume_path=str(tmp_path / "pt-4"))
    tr2 = PretrainTrainer(cfg2, tcfg)
    state2, _ = tr2.fit(Loader(Ds(), 4, shuffle=False))
    assert int(state2.step) == 8       # exactly one more epoch


def test_movienet_ppo_pairs_fresh_per_epoch(tmp_path):
    jp, hp = make_movienet(tmp_path, n_items=3)
    ds = MovieNetDataset(jp, hp, "ppo", max_tags=8, max_imgs=2, seed=0)
    a = [ds.get(i)["tgts"].tolist() for i in range(len(ds))]
    texts0 = ds.get(0)["text"].copy()
    # same epoch: deterministic re-fetch (PPO sweep re-materialization)
    np.testing.assert_array_equal(ds.get(0)["text"], texts0)
    ds.set_epoch(1)
    b = [ds.get(i)["tgts"].tolist() for i in range(len(ds))]
    assert a != b                    # fresh pairs without a rebuild

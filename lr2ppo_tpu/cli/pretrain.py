"""Tower pretraining CLI (replaces the reference pretrain.py ->
tencentpretrain/trainer.py path). MLM pretraining of any tower config:

  python -m lr2ppo_tpu.cli.pretrain --corpus_path corpus.txt \
    --vocab_path models/huggingface_gpt2_vocab.txt --tokenizer bpe \
    --merges_path models/huggingface_gpt2_merges.txt \
    --tower_config models/xlm-roberta/base_config.json \
    --output_model_path ckpt/mlm --total_steps 10000
"""

from __future__ import annotations

import argparse

from lr2ppo_tpu.config import Config
from lr2ppo_tpu.data.pipeline import Loader
from lr2ppo_tpu.data.pretrain_data import (
    ClsTsvDataset,
    LmCorpusDataset,
    MlmCorpusDataset,
)
from lr2ppo_tpu.data.pretrain_data import ClipPairDataset, VitImageDataset
from lr2ppo_tpu.data.pretrain_processors import (
    AlbertDocsDataset,
    BartDocsDataset,
    BeitImageDataset,
    BertDocsDataset,
    BilmCorpusDataset,
    ClsMlmTsvDataset,
    DalleDataset,
    GsgDocsDataset,
    MtTsvDataset,
    PrefixlmTsvDataset,
    S2tDataset,
    T5CorpusDataset,
    ViltPairsDataset,
)
from lr2ppo_tpu.data.tokenizers import str2tokenizer
from lr2ppo_tpu.towers.model import TowerConfig
from lr2ppo_tpu.train.pretrain import PretrainTrainer


def _special_ids(tok):
    """(cls, pad, sep) ids from the tokenizer's resolved specials,
    falling back to the XLM-R layout (0/1/2) when the vocab has none
    (e.g. GPT-2 BPE)."""
    v = tok.vocab or {}

    def gid(key, default):
        t = tok.specials.get(key)
        return v[t] if t in v else default

    return gid("cls_token", 0), gid("pad_token", 1), gid("sep_token", 2)


def _special_ids_csp(tok):
    """(cls, sep, pad) — the pretrain_data constructors' arg order."""
    c, p, sep = _special_ids(tok)
    return c, sep, p


def _mask_id(tok):
    name = tok.specials.get("mask_token", "<mask>")
    mid = tok.vocab.get(name)
    if mid is None:
        # a silent fallback would conflate a REAL token (e.g. GPT-2's
        # <|endoftext|>, the last vocab row) with the mask sentinel
        raise SystemExit(
            f"tokenizer vocab has no mask token ({name!r}); masked "
            f"pretraining needs one — add it to the vocab or pick a "
            f"tokenizer that defines it (the reference's MLM recipes "
            f"all use mask-bearing vocabs)")
    return mid


# data_processor -> dataset builder (the reference's str2trainer /
# str2dataset registries, trainer.py:534-539 + utils/dataset.py)
str2dataset = {
    "mlm": lambda path, tok, args, cfg: MlmCorpusDataset(
        path, tok, args.seq_length, cfg.vocab_size, _mask_id(tok),
        *_special_ids_csp(tok), seed=args.seed),
    "lm": lambda path, tok, args, cfg: LmCorpusDataset(
        path, tok, args.seq_length + 1, cfg.vocab_size, 0,
        *_special_ids_csp(tok)),
    "cls": lambda path, tok, args, cfg: ClsTsvDataset(
        path, tok, args.seq_length, *_special_ids_csp(tok)),
    "bert": lambda path, tok, args, cfg: BertDocsDataset(
        path, tok, args.seq_length, cfg.vocab_size, _mask_id(tok),
        seed=args.seed, short_seq_prob=args.short_seq_prob,
        dup_factor=args.dup_factor),
    "albert": lambda path, tok, args, cfg: AlbertDocsDataset(
        path, tok, args.seq_length, cfg.vocab_size, _mask_id(tok),
        seed=args.seed, short_seq_prob=args.short_seq_prob,
        dup_factor=args.dup_factor),
    "cls_mlm": lambda path, tok, args, cfg: ClsMlmTsvDataset(
        path, tok, args.seq_length, cfg.vocab_size, _mask_id(tok),
        seed=args.seed),
    "bilm": lambda path, tok, args, cfg: BilmCorpusDataset(
        path, tok, args.seq_length),
    "mt": lambda path, tok, args, cfg: MtTsvDataset(
        path, tok, args.seq_length, args.tgt_seq_length),
    "t5": lambda path, tok, args, cfg: T5CorpusDataset(
        path, tok, args.seq_length, args.tgt_seq_length, cfg.vocab_size,
        sentinel_start=(args.sentinel_start
                        if args.sentinel_start is not None
                        else len(tok.vocab)), seed=args.seed),
    "gsg": lambda path, tok, args, cfg: GsgDocsDataset(
        path, tok, args.seq_length, args.tgt_seq_length, _mask_id(tok),
        strategy=args.sentence_selection_strategy, seed=args.seed),
    "bart": lambda path, tok, args, cfg: BartDocsDataset(
        path, tok, args.seq_length, cfg.vocab_size, _mask_id(tok),
        seed=args.seed),
    "prefixlm": lambda path, tok, args, cfg: PrefixlmTsvDataset(
        path, tok, args.seq_length),
    # vision / audio processors: corpora are tsv manifests of
    # (label|text|transcript, file path) per the reference
    # FileWithLabel/FileWithText/File dataset formats
    "vit": lambda path, tok, args, cfg: VitImageDataset(
        [(p, int(lbl)) for lbl, p in _read_tsv(path)],
        cfg.image_height, cfg.image_width, cfg.patch_size),
    "clip": lambda path, tok, args, cfg: ClipPairDataset(
        _read_tsv(path), tok, args.seq_length,
        cfg.image_height, cfg.image_width, cfg.patch_size),
    "vilt": lambda path, tok, args, cfg: ViltPairsDataset(
        _read_tsv(path), tok, args.seq_length, cfg.vocab_size,
        _mask_id(tok), cfg.image_height, cfg.image_width,
        cfg.patch_size, seed=args.seed),
    "s2t": lambda path, tok, args, cfg: S2tDataset(
        path, tok, args.tgt_seq_length, args.max_audio_frames),
    "beit": lambda path, tok, args, cfg: BeitImageDataset(
        [l[0] for l in _read_tsv(path, n=1)], _image_tok(args),
        cfg.image_height, cfg.image_width, cfg.patch_size,
        seed=args.seed),
    "dalle": lambda path, tok, args, cfg: DalleDataset(
        _read_tsv(path), tok, _image_tok(args), args.seq_length,
        vocab_bias=len(tok.vocab)),
}


def _read_tsv(path, n=2):
    rows = []
    with open(path, encoding="utf-8") as f:
        for line in f:
            parts = line.rstrip("\n").split("\t")
            if len(parts) >= n and parts[0]:
                rows.append(tuple(parts[:n]) if n > 1 else (parts[0],))
    return rows


def _image_tok(args):
    from lr2ppo_tpu.data.tokenizers import ImageTokenizer

    return ImageTokenizer(vqgan_model_path=args.vqgan_model_path,
                          seed=args.seed)

# data_processor -> train-step batch form (train/pretrain.py form_args)
str2form = {
    "mlm": "simple", "lm": "simple", "cls": "simple",
    "prefixlm": "simple",
    "bert": "pair_sp", "albert": "pair_sp",
    "cls_mlm": "pair_cls",
    "bilm": "bilm",
    "mt": "seq2seq", "t5": "seq2seq", "gsg": "seq2seq", "bart": "seq2seq",
    "vit": "simple", "clip": "clip", "vilt": "vilt", "s2t": "seq2seq",
    "beit": "beit", "dalle": "simple",
}


def main(argv=None):
    p = argparse.ArgumentParser(description="lr2ppo-tpu tower pretraining")
    p.add_argument("--corpus_path", required=True)
    p.add_argument("--tower_config", required=True)
    p.add_argument("--data_processor", default="mlm",
                   choices=sorted(str2dataset))
    p.add_argument("--tokenizer", default="bpe",
                   choices=["char", "space", "bert", "bpe", "xlmroberta"])
    p.add_argument("--vocab_path", default=None)
    p.add_argument("--merges_path", default=None)
    p.add_argument("--spm_model_path", default=None)
    p.add_argument("--tokenizer_json", default=None)
    p.add_argument("--output_model_path", default="ckpt/pretrained")
    p.add_argument("--pretrained_model_path", default=None)
    p.add_argument("--resume_path", default=None,
                   help="step-numbered checkpoint to resume from")
    p.add_argument("--log_path", default=None)
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--accumulation_steps", type=int, default=1)
    p.add_argument("--seq_length", type=int, default=128)
    p.add_argument("--tgt_seq_length", type=int, default=128)
    p.add_argument("--short_seq_prob", type=float, default=0.1)
    p.add_argument("--dup_factor", type=int, default=1)
    p.add_argument("--sentinel_start", type=int, default=None,
                   help="first T5 sentinel id (default: len(vocab))")
    p.add_argument("--sentence_selection_strategy", default="random",
                   choices=["random", "lead"])
    p.add_argument("--vqgan_model_path", default=None,
                   help="taming VQModel checkpoint for beit/dalle "
                        "(random-weight tokenizer without it)")
    # None sentinel so explicitness is read off the parsed value (an
    # argv scan misses argparse prefix abbreviations like --max_audio);
    # precedence: 256 default < tower JSON < explicit CLI
    p.add_argument("--max_audio_frames", type=int, default=None)
    p.add_argument("--total_steps", type=int, default=None)
    p.add_argument("--epochs_num", type=int, default=1)
    p.add_argument("--report_steps", type=int, default=100)
    p.add_argument("--save_checkpoint_steps", type=int, default=0)
    p.add_argument("--learning_rate", type=float, default=1e-4)
    p.add_argument("--seed", type=int, default=7)
    p.add_argument("--dp", type=int, default=-1)
    p.add_argument("--tp", type=int, default=1,
                   help="tensor-parallel split of qkv/FFN matmuls")
    p.add_argument("--zero1", action="store_true",
                   help="ZeRO-1: dp-shard the Adam moments "
                        "(parallel/mesh.py:shard_optimizer)")
    p.add_argument("--fsdp", action="store_true",
                   help="FSDP/ZeRO-3: store params dp-sharded (implies "
                        "--zero1; parallel/mesh.py:shard_params_fsdp)")
    p.add_argument("--pp", type=int, default=1,
                   help="GPipe pipeline stages over the encoder layer "
                        "stack (parallel/pipeline.py; 'simple' batch "
                        "forms, composes with dp)")
    p.add_argument("--pp_microbatches", type=int, default=0,
                   help="pipeline microbatches per micro step (0 = --pp)")
    p.add_argument("--compute_dtype", default="float32")
    p.add_argument("--hash_dropout", action="store_true",
                   help="zero-residual hash dropout at every tower "
                        "dropout site (ops/hash_dropout.py)")
    p.add_argument("--sp", action="store_true",
                   help="sequence-parallel activation sharding over tp "
                        "(Megatron-SP at layer granularity; requires "
                        "--tp > 1)")
    p.add_argument("--ckpt_backend", default="pickle",
                   choices=["pickle", "orbax", "orbax_async"],
                   help="checkpoint form for save-best/.state/step "
                        "files (train/checkpoints.py); resume "
                        "auto-detects either")
    from lr2ppo_tpu.config import _parse_bool

    # same syntax as every config-based CLI: bare `--distributed` or
    # `--distributed true|false`
    p.add_argument("--distributed", type=_parse_bool, nargs="?",
                   const=True, default=False,
                   help="multi-host pod: run this CLI once per host "
                        "(torchrun replacement); coordinator/count/rank "
                        "resolve from TPU metadata unless given")
    p.add_argument("--coordinator", default=None)
    p.add_argument("--num_processes", type=int, default=None)
    p.add_argument("--process_id", type=int, default=None)
    p.add_argument("--jax_platform", default="",
                   help="force a jax backend before first use (env "
                        "vars are too late under sitecustomize pins)")
    args = p.parse_args(argv)

    # BEFORE first backend use
    from lr2ppo_tpu.parallel.mesh import init_runtime

    init_runtime(jax_platform=args.jax_platform,
                 distributed=args.distributed,
                 coordinator=args.coordinator,
                 num_processes=args.num_processes,
                 process_id=args.process_id)

    if args.tokenizer == "bpe":
        tok = str2tokenizer["bpe"](args.vocab_path, args.merges_path)
    elif args.tokenizer == "xlmroberta":
        tok = str2tokenizer["xlmroberta"](
            spm_model_path=args.spm_model_path,
            tokenizer_json_path=args.tokenizer_json)
    else:
        tok = str2tokenizer[args.tokenizer](args.vocab_path)

    # frame instances with the tokenizer's ACTUAL special ids (the
    # processor defaults assume the XLM-R 0/1/2 layout)
    cls_id, pad_id, sep_id = _special_ids(tok)
    from lr2ppo_tpu.data import pretrain_processors as _pp

    _pp.set_special_ids(cls_id, pad_id, sep_id)

    # T5 sentinels / DALL-E image tokens live past the vocab end; grow
    # the embedding to fit
    extra_vocab = 0
    if args.data_processor == "t5":
        # sentinels occupy [sentinel_start, sentinel_start + 100); grow
        # the embedding to cover them wherever the user places them
        start = (args.sentinel_start if args.sentinel_start is not None
                 else len(tok.vocab))
        extra_vocab = max(0, start + 100 - len(tok.vocab))
    elif args.data_processor == "dalle":
        from lr2ppo_tpu.towers.vqgan import VQGANConfig

        extra_vocab = VQGANConfig().n_embed
    vocab_size = max(len(tok.vocab), 1) + extra_vocab
    if args.data_processor == "beit":  # mlm head over the image codebook
        from lr2ppo_tpu.towers.vqgan import VQGANConfig

        vocab_size = VQGANConfig().n_embed
    # grow-only max_seq_length: respect the JSON's own value (XLM-R
    # uses 514; clobbering it breaks pretrained-checkpoint pos tables)
    import json as _json

    with open(args.tower_config) as _f:
        _raw_tower = _json.load(_f)
    _raw_msl = _raw_tower.get("max_seq_length",
                              TowerConfig().max_seq_length)
    # speech pos tables size by max_audio_frames (reference
    # pos_embedding.py:12-14); precedence defaults < JSON < explicit CLI
    _maf = (args.max_audio_frames if args.max_audio_frames is not None
            else _raw_tower.get("max_audio_frames", 256))
    # the dataset builders read args.max_audio_frames — keep it equal to
    # the value the tower's pos tables are sized for
    args.max_audio_frames = _maf
    if args.sp and args.tp <= 1:
        raise SystemExit("--sp shards the sequence over tp; pass --tp > 1")
    tower_cfg = TowerConfig.from_json(
        args.tower_config, vocab_size=vocab_size,
        max_seq_length=max(args.seq_length, _raw_msl),
        max_audio_frames=_maf,
        **({"hash_dropout": True} if args.hash_dropout else {}),
        **({"seq_parallel": True} if args.sp else {}))
    ds = str2dataset[args.data_processor](args.corpus_path, tok, args,
                                          tower_cfg)
    # reference accumulation semantics: each optimizer step consumes
    # accumulation_steps micro-batches of batch_size rows (the trainer
    # folds the loader batch into (accum, batch_size, ...))
    from lr2ppo_tpu.cli._common import pod_shard

    loader = Loader(ds, args.batch_size * args.accumulation_steps,
                    shuffle=True, seed=args.seed, reuse_buffers=True,
                    shard=pod_shard(),
                    shard_chunks=max(args.accumulation_steps, 1))

    cfg = Config()
    cfg = cfg.replace(
        epochs_num=args.epochs_num, batch_size=args.batch_size,
        report_steps=args.report_steps, seed=args.seed,
        output_model_path=args.output_model_path, log_path=args.log_path,
        pretrained_model_path=args.pretrained_model_path,
        resume_path=args.resume_path, ckpt_backend=args.ckpt_backend)
    cfg.optim.learning_rate = args.learning_rate
    cfg.mesh.dp = args.dp
    cfg.mesh.tp = args.tp
    cfg.mesh.zero1 = args.zero1
    cfg.mesh.fsdp = args.fsdp
    cfg.mesh.pp = args.pp
    cfg.mesh.pp_microbatches = args.pp_microbatches
    cfg.mesh.compute_dtype = args.compute_dtype

    trainer = PretrainTrainer(cfg, tower_cfg, args.accumulation_steps,
                              form=str2form[args.data_processor])
    _state, best = trainer.fit(loader, args.total_steps,
                               args.save_checkpoint_steps)
    return best


if __name__ == "__main__":
    main()

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
from lr2ppo_tpu.data.tokenizers import str2tokenizer
from lr2ppo_tpu.towers.model import TowerConfig
from lr2ppo_tpu.train.pretrain import PretrainTrainer

# data_processor -> dataset builder (the reference's str2trainer /
# str2dataset registries, trainer.py:534-539 + utils/dataset.py)
str2dataset = {
    "mlm": lambda path, tok, args, cfg: MlmCorpusDataset(
        path, tok, args.seq_length, cfg.vocab_size,
        tok.vocab.get(tok.specials.get("mask_token", "<mask>"),
                      len(tok.vocab) - 1), seed=args.seed),
    "lm": lambda path, tok, args, cfg: LmCorpusDataset(
        path, tok, args.seq_length + 1, cfg.vocab_size, 0),
    "cls": lambda path, tok, args, cfg: ClsTsvDataset(
        path, tok, args.seq_length),
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
    p.add_argument("--log_path", default=None)
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--accumulation_steps", type=int, default=1)
    p.add_argument("--seq_length", type=int, default=128)
    p.add_argument("--total_steps", type=int, default=None)
    p.add_argument("--epochs_num", type=int, default=1)
    p.add_argument("--report_steps", type=int, default=100)
    p.add_argument("--save_checkpoint_steps", type=int, default=0)
    p.add_argument("--learning_rate", type=float, default=1e-4)
    p.add_argument("--seed", type=int, default=7)
    p.add_argument("--dp", type=int, default=-1)
    p.add_argument("--compute_dtype", default="float32")
    args = p.parse_args(argv)

    if args.tokenizer == "bpe":
        tok = str2tokenizer["bpe"](args.vocab_path, args.merges_path)
    elif args.tokenizer == "xlmroberta":
        tok = str2tokenizer["xlmroberta"](
            spm_model_path=args.spm_model_path,
            tokenizer_json_path=args.tokenizer_json)
    else:
        tok = str2tokenizer[args.tokenizer](args.vocab_path)

    tower_cfg = TowerConfig.from_json(
        args.tower_config, vocab_size=max(len(tok.vocab), 1),
        max_seq_length=max(args.seq_length,
                           TowerConfig().max_seq_length))
    ds = str2dataset[args.data_processor](args.corpus_path, tok, args,
                                          tower_cfg)
    loader = Loader(ds, args.batch_size, shuffle=True, seed=args.seed,
                    reuse_buffers=True)

    cfg = Config()
    cfg = cfg.replace(
        epochs_num=args.epochs_num, batch_size=args.batch_size,
        report_steps=args.report_steps, seed=args.seed,
        output_model_path=args.output_model_path, log_path=args.log_path,
        pretrained_model_path=args.pretrained_model_path)
    cfg.optim.learning_rate = args.learning_rate
    cfg.mesh.dp = args.dp
    cfg.mesh.compute_dtype = args.compute_dtype

    trainer = PretrainTrainer(cfg, tower_cfg, args.accumulation_steps)
    _state, best = trainer.fit(loader, args.total_steps,
                               args.save_checkpoint_steps)
    return best


if __name__ == "__main__":
    main()

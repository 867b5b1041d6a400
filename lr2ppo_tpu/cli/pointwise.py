"""Stage-1 multimodal pointwise trainer CLI (reference pointwise.sh ->
finetune/pointwise.py:main)."""

from __future__ import annotations

from lr2ppo_tpu.config import parse_config
from lr2ppo_tpu.cli._common import (maybe_init_distributed,
                                    movienet_eval_loader,
                                    movienet_train_loader)
from lr2ppo_tpu.train.pointwise import PointwiseTrainer


def main(argv=None) -> float:
    cfg = parse_config(argv, "lr2ppo-tpu stage-1 pointwise (multimodal)")
    maybe_init_distributed(cfg)
    train = movienet_train_loader(cfg, "pointwise")
    ev = movienet_eval_loader(cfg)
    _state, best = PointwiseTrainer(cfg).fit(train, ev)
    return best


if __name__ == "__main__":
    main()

"""Stage-2 multimodal pairwise reward trainer CLI (reference
reward_pair_dataloader.sh -> finetune/reward_pair_dataloader.py:main)."""

from __future__ import annotations

from lr2ppo_tpu.config import parse_config
from lr2ppo_tpu.cli._common import (maybe_init_distributed,
                                    movienet_eval_loader,
                                    movienet_train_loader)
from lr2ppo_tpu.train.reward import RewardTrainer


def main(argv=None) -> float:
    cfg = parse_config(argv, "lr2ppo-tpu stage-2 reward (multimodal)")
    maybe_init_distributed(cfg)
    train = movienet_train_loader(cfg, "reward")
    ev = movienet_eval_loader(cfg, mode="reward_eval")
    _state, best = RewardTrainer(cfg).fit(train, ev)
    return best


if __name__ == "__main__":
    main()

"""Stage-2 tabular reward trainer CLI (reference reward_trad.sh ->
finetune/reward_trad.py; hinge margin 0.01, 5 relevance classes)."""

from __future__ import annotations

from lr2ppo_tpu.config import parse_config
from lr2ppo_tpu.cli._common import (force_family,
                                    letor_reward_loaders,
                                    maybe_init_distributed)
from lr2ppo_tpu.train.reward import RewardTrainer


def main(argv=None) -> float:
    cfg = parse_config(argv, "lr2ppo-tpu stage-2 reward (tabular)")
    maybe_init_distributed(cfg)
    cfg = force_family(cfg, "tabular")
    train, ev = letor_reward_loaders(cfg)
    _state, best = RewardTrainer(cfg).fit(train, ev)
    return best


if __name__ == "__main__":
    main()

"""Stage-3 LR2PPO trainer CLI (reference ppo.sh -> finetune/ppo.py:main).

The trainset is rebuilt each epoch for fresh pair sampling (ppo.py:816).
"""

from __future__ import annotations

from lr2ppo_tpu.config import parse_config
from lr2ppo_tpu.cli._common import movienet_eval_loader, movienet_train_loader
from lr2ppo_tpu.train.ppo import PPOTrainer


def main(argv=None) -> float:
    cfg = parse_config(argv, "lr2ppo-tpu stage-3 LR2PPO (multimodal)")

    def make_train_loader(epoch: int):
        return movienet_train_loader(cfg, "ppo", seed=epoch)

    ev = movienet_eval_loader(cfg)
    _astate, _cstate, best = PPOTrainer(cfg).fit(make_train_loader, ev)
    return best


if __name__ == "__main__":
    main()

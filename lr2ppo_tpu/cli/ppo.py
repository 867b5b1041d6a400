"""Stage-3 LR2PPO trainer CLI (reference ppo.sh -> finetune/ppo.py:main).

The reference rebuilds the trainset each epoch for fresh pair sampling
(ppo.py:816); here set_epoch reseeds the in-get pair draw instead.
"""

from __future__ import annotations

from lr2ppo_tpu.config import parse_config
from lr2ppo_tpu.cli._common import (maybe_init_distributed,
                                    movienet_eval_loader,
                                    movienet_train_loader)
from lr2ppo_tpu.train.ppo import PPOTrainer


def main(argv=None) -> float:
    cfg = parse_config(argv, "lr2ppo-tpu stage-3 LR2PPO (multimodal)")
    maybe_init_distributed(cfg)

    # ONE loader for the whole run: fresh per-epoch pair sampling comes
    # from the trainer's loader.set_epoch(n) (the pair is drawn from the
    # (epoch, item) rng inside MovieNetDataset.get), so the RAM preload
    # and worker pool are paid once, not per epoch
    holder = {}

    def make_train_loader(epoch: int):
        if "loader" not in holder:
            holder["loader"] = movienet_train_loader(cfg, "ppo")
        return holder["loader"]

    ev = movienet_eval_loader(cfg)
    _astate, _cstate, best = PPOTrainer(cfg).fit(make_train_loader, ev)
    return best


if __name__ == "__main__":
    main()

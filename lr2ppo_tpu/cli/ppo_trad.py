"""Stage-3 tabular LR2PPO trainer CLI (reference ppo_trad.sh ->
finetune/ppo_trad.py)."""

from __future__ import annotations

from lr2ppo_tpu.config import parse_config
from lr2ppo_tpu.cli._common import force_family, letor_ppo_loaders, maybe_init_distributed
from lr2ppo_tpu.train.ppo import PPOTrainer


def main(argv=None) -> float:
    cfg = parse_config(argv, "lr2ppo-tpu stage-3 LR2PPO (tabular)")
    maybe_init_distributed(cfg)
    cfg = force_family(cfg, "tabular")
    make_train_loader, ev = letor_ppo_loaders(cfg)
    _astate, _cstate, best = PPOTrainer(cfg).fit(make_train_loader, ev)
    return best


if __name__ == "__main__":
    main()

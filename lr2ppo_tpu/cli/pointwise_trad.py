"""Stage-1 tabular pointwise trainer CLI (reference pointwise_trad.sh ->
finetune/pointwise_trad.py). train/dev paths point at grouped LETOR .h5
files (or a dir with train.h5/test.h5)."""

from __future__ import annotations

from lr2ppo_tpu.config import parse_config
from lr2ppo_tpu.cli._common import (force_family,
                                    letor_pointwise_loaders,
                                    maybe_init_distributed)
from lr2ppo_tpu.train.pointwise import PointwiseTrainer


def main(argv=None) -> float:
    cfg = parse_config(argv, "lr2ppo-tpu stage-1 pointwise (tabular)")
    maybe_init_distributed(cfg)
    cfg = force_family(cfg, "tabular")
    train, ev = letor_pointwise_loaders(cfg)
    _state, best = PointwiseTrainer(cfg).fit(train, ev)
    return best


if __name__ == "__main__":
    main()

"""Feature-unification trainer CLI (reference pointwise_2data_trad.sh ->
finetune/pointwise_2data_trad.py): joint pointwise training on two raw
LETOR domains (46-d MQ2008 + 136-d Web10K) with alternating batches.

--train_path/--dev_path = domain A grouped h5, --train_path2/--dev_path2
= domain B grouped h5. The raw feature dims are inferred from the data
and become the model's trad_dims (text_proj / text_proj3,
pointwise_2data_trad.py:136-151)."""

from __future__ import annotations

import dataclasses

from lr2ppo_tpu.config import parse_config
from lr2ppo_tpu.cli._common import (force_family,
                                    letor_eval_loader,
                                    letor_queries,
                                    maybe_init_distributed,
                                    pod_shard)
from lr2ppo_tpu.data import Loader, LTRPointwiseDataset
from lr2ppo_tpu.train.pointwise import TwoDataTrainer


def main(argv=None) -> float:
    cfg = parse_config(argv, "lr2ppo-tpu 2-data unification (tabular)")
    maybe_init_distributed(cfg)
    cfg = force_family(cfg, "tabular")
    qa = letor_queries(cfg.data.train_path)
    qb = letor_queries(cfg.data.train_path2)
    dims = [next(iter(qa.groups.values())).shape[1] - 2,
            next(iter(qb.groups.values())).shape[1] - 2]
    cfg = cfg.replace(model=dataclasses.replace(cfg.model, trad_dims=dims))

    # reuse_buffers like letor_pointwise_loaders: fit_two consumes each
    # batch before the next yield, and fresh multi-MB batch allocs
    # page-fault ~4x slower than slot reuse on this host class
    loaders = [Loader(LTRPointwiseDataset(q), cfg.batch_size, shuffle=True,
                      seed=cfg.seed, num_workers=cfg.data.num_workers,
                      reuse_buffers=True, shard=pod_shard())
               for q in (qa, qb)]
    evs = [letor_eval_loader(cfg, LTRPointwiseDataset, path=p2)
           for p2 in (cfg.data.dev_path, cfg.data.dev_path2)]
    _state, best = TwoDataTrainer(cfg).fit_two(loaders, evs)
    return best


if __name__ == "__main__":
    main()

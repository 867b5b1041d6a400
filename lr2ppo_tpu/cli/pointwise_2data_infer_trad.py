"""Feature projection exporter CLI (reference
pointwise_2data_infer_trad.sh -> finetune/pointwise_2data_infer_trad.py):
loads a 2-data checkpoint and projects every row of --input_features_path
(tsv [label, qid, raw feats]) to 768-d, writing --output_features_path."""

from __future__ import annotations

import dataclasses

from lr2ppo_tpu.config import parse_config
from lr2ppo_tpu.cli._common import force_family, maybe_init_distributed
from lr2ppo_tpu.train import checkpoints
from lr2ppo_tpu.train.pointwise import project_tsv


def _dims_from_params(params: dict) -> list:
    """Recover the raw input dims of the two projections from their fc1
    kernel shapes (text_proj = dims[0], text_proj3 = dims[1] — the
    reference naming, pointwise_2data_trad.py:136-137)."""
    tree = params.get("params", params)
    dims = []
    for name in ("text_proj", "text_proj3"):
        if name in tree:
            dims.append(int(tree[name]["fc1"]["kernel"].shape[0]))
    return dims


def main(argv=None) -> None:
    cfg = parse_config(argv, "lr2ppo-tpu 2-data projection exporter")
    maybe_init_distributed(cfg)
    cfg = force_family(cfg, "tabular")
    params = checkpoints.load_any(cfg.pretrained_model_path)
    dims = _dims_from_params(params)
    if dims:
        cfg = cfg.replace(
            model=dataclasses.replace(cfg.model, trad_dims=dims))
    project_tsv(cfg, params, cfg.data.input_features_path,
                cfg.data.output_features_path)


if __name__ == "__main__":
    main()

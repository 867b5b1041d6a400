"""CLI entry points mirroring the reference's 10 launch scripts
(SURVEY §1 L6). Run as `python -m lr2ppo_tpu.cli.<name> --flags`, or
`python -m lr2ppo_tpu.cli <name> --flags`."""

ENTRY_POINTS = (
    "pointwise",
    "reward_pair_dataloader",
    "ppo",
    "ppo_eval",
    "pointwise_trad",
    "pointwise_2data_trad",
    "pointwise_2data_infer_trad",
    "reward_trad",
    "ppo_trad",
    "ppo_eval_trad",
    "preprocess_data",
    "preprocess",
    "pretrain",
    "serve",
)

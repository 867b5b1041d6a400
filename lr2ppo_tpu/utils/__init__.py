from lr2ppo_tpu.utils.logging import init_logger, MetricLogger  # noqa: F401

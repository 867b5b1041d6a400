from lr2ppo_tpu.utils.logging import init_logger, MetricLogger  # noqa: F401
from lr2ppo_tpu.utils.guards import (  # noqa: F401
    NonFiniteLossError,
    StepTimer,
    TraceWindow,
    check_finite,
    maybe_trace,
)

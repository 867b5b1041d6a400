from lr2ppo_tpu.models.layers import Mlp, XiT, XiTAttention  # noqa: F401
from lr2ppo_tpu.models.scorer import (  # noqa: F401
    ScoreModel,
    SeqScoreModel,
    ActorCritic,
    TwoDataScoreModel,
)

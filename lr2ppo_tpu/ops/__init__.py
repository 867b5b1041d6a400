from lr2ppo_tpu.ops.losses import (  # noqa: F401
    cls_expected_scores,
    smooth_l1_loss,
    nll_3way_loss,
    rank_hinge_loss,
    reward_pair_hinge_loss,
    clipped_value_loss,
    categorical_kl,
    categorical_entropy,
    log_sig_loss,
    safe_log,
    pl_log_prob,
    gae_advantages,
)
from lr2ppo_tpu.ops.ndcg import (  # noqa: F401
    dcg_at_k,
    ndcg_at_k,
    ndcg_from_scores,
    NDCG_AT_K_DEFAULT,
    AverageNDCGMeter,
)

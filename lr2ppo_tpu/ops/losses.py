"""Pure-jnp loss functions with exact reference semantics.

Each function documents the reference source (path:line into the LR2PPO
repo) whose behavior it reproduces. All are shape-polymorphic, jit- and
vmap-friendly, and free of data-dependent control flow (branches become
`jnp.where` so XLA sees static graphs).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def safe_log(t: Array, eps: float = 1e-20) -> Array:
    """log(max(t, eps)) — reference finetune/ppo.py:431-432."""
    return jnp.log(jnp.clip(t, min=eps))


def smooth_l1_loss(pred: Array, target: Array, beta: float = 0.3) -> Array:
    """SmoothL1 (Huber) with beta, mean reduction.

    Reference: nn.SmoothL1Loss(beta=0.3) in finetune/pointwise.py:229 —
    0.5*d^2/beta for |d|<beta else |d|-0.5*beta.
    """
    d = jnp.abs(pred.reshape(-1) - target.reshape(-1).astype(pred.dtype))
    loss = jnp.where(d < beta, 0.5 * d * d / beta, d - 0.5 * beta)
    return loss.mean()


def nll_3way_loss(logits: Array, targets: Array) -> Array:
    """NLLLoss(LogSoftmax(logits)) — finetune/pointwise.py:233 ('cls' mode)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    tgt = targets.reshape(-1)
    picked = jnp.take_along_axis(
        logp.reshape(-1, logits.shape[-1]), tgt[:, None], axis=-1
    )
    return -picked.mean()


def rank_hinge_loss(scores: Array, indices: Array, margin: float) -> Array:
    """RankLoss — finetune/ppo.py:38-55.

    Gathers `scores` by `indices` (the desired order, best first), forms all
    upper-triangular pairwise gaps, and averages hinge violations
    relu(margin - (s_i - s_j)) over the count of *violating* pairs (not all
    pairs). Returns 0 when no pair violates (hinge_cnt == 0 branch).

    scores:  (B, T) float
    indices: (B, K) int — order to enforce
    """
    s = jnp.take_along_axis(scores, indices, axis=1)          # (B, K)
    diff = margin - (s[:, :, None] - s[:, None, :])           # (B, K, K)
    diff = jnp.triu(diff, k=1)
    hinge = jnp.maximum(diff, 0.0)
    cnt = jnp.sum(jnp.sign(hinge))
    total = hinge.sum()
    # hinge_cnt==0 => total==0, so total/max(cnt,1) == 0 matches the branch
    return total / jnp.maximum(cnt, 1.0)


def reward_pair_hinge_loss(chosen: Array, rejected: Array,
                           margin: float = 1.0) -> Array:
    """Stage-2 reward loss relu(m - (s_chosen - s_rejected)).mean().

    Reference: finetune/reward_pair_dataloader.py:355-357 (margin 1.0,
    multimodal) and finetune/reward_trad.py:273 (margin 0.01, tabular).
    """
    return jnp.maximum(margin - (chosen - rejected), 0.0).mean()


def clipped_value_loss(values: Array, rewards: Array, old_values: Array,
                       clip: float) -> Array:
    """PPO-style clipped value loss — finetune/ppo.py:494-498."""
    value_clipped = old_values + jnp.clip(values - old_values, -clip, clip)
    l1 = (value_clipped.reshape(-1) - rewards) ** 2
    l2 = (values.reshape(-1) - rewards) ** 2
    return jnp.maximum(l1, l2).mean()


def categorical_kl(old_scores: Array, new_scores: Array,
                   axis: int = -1) -> Array:
    """KL(softmax(old) || softmax(new)) summed over `axis`, no reduction.

    Reference: finetune/ppo.py:544-548 (per-sample KL penalty over the
    2-tag score axis, with logs clamped at 1e-20).
    """
    p_old = jax.nn.softmax(old_scores, axis=axis)
    p_new = jax.nn.softmax(new_scores, axis=axis)
    return (p_old * (safe_log(p_old) - safe_log(p_new))).sum(axis=axis)


def categorical_entropy(scores: Array, axis: int = -1) -> Array:
    """-(p * log p).sum(axis) with p = softmax(scores) — ppo.py:550-553."""
    p = jax.nn.softmax(scores, axis=axis)
    return -(p * safe_log(p)).sum(axis=axis)


def log_sig_loss(chosen: Array, rejected: Array) -> Array:
    """-log(sigmoid(chosen - rejected) + 1e-10).mean().

    Reference: finetune/pointwise.py:62-66 (log_sig, alternative pairwise
    objective kept for API parity).
    """
    probs = jax.nn.sigmoid(chosen - rejected)
    return -jnp.log(probs + 1e-10).mean()


def cls_expected_scores(logits):
    """'cls'-mode action scores = expected relevance over the 3 classes,
    softmax(p)[1]*1 + softmax(p)[2]*2 (reference ppo.py:855-859). Shared
    by the PPO rollout/update and the batched NDCG evaluator."""
    p = jax.nn.softmax(logits, axis=-1)
    return p[..., 1] * 1.0 + p[..., 2] * 2.0


def pl_log_prob(scores: Array, order: Array) -> Array:
    """Plackett-Luce log-probability of picking `order` (B, K) under
    `scores` (B, T): sum_i [ s_{o_i} - logsumexp(s_{o_i..o_K}) ].

    Used by the improved-PPO clipped surrogate (ppo.surrogate_clip):
    the rollout's deterministic re-ranking is read as a sample from the
    PL distribution its scores induce, giving a proper probability
    ratio for the clip (the reference parses eps_clip but never uses
    it, ppo.py:730)."""
    s = jnp.take_along_axis(scores, order.astype(jnp.int32), axis=1)
    rev = jnp.flip(s, axis=1)
    lse = jnp.flip(jax.lax.associative_scan(jnp.logaddexp, rev, axis=1),
                   axis=1)
    return (s - lse).sum(axis=1)


def gae_advantages(rewards: Array, values: Array, cont: Array,
                   gamma: float, lam: float):
    """Generalized Advantage Estimation over a stacked memory window.

    rewards/values: (N, B) — the sweep's memories in rollout order;
    cont: (N,) 1.0 where memory i+1 continues memory i's trajectory
    (same batch, next timestep), 0.0 at trajectory/sweep boundaries
    (bootstrap V=0 — episodes end when the window does).
    Returns (advantages, returns), each (N, B).
    """
    v_next = jnp.concatenate([values[1:], jnp.zeros_like(values[-1:])])
    delta = rewards + gamma * cont[:, None] * v_next - values

    def step(carry, x):
        d, c = x
        a = d + gamma * lam * c * carry
        return a, a

    _, adv_rev = jax.lax.scan(
        step, jnp.zeros_like(delta[0]),
        (jnp.flip(delta, 0), jnp.flip(cont)[:, None].astype(delta.dtype)))
    adv = jnp.flip(adv_rev, 0)
    return adv, adv + values

"""Unit tests for lr2ppo_tpu.ops.losses against hand-computed values and a
torch-cpu oracle implementing the reference formulas (finetune/ppo.py:38-55,
:494-498, :544-553; pointwise.py:229; reward_pair_dataloader.py:355-357)."""

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from lr2ppo_tpu.ops import (
    categorical_entropy,
    categorical_kl,
    clipped_value_loss,
    log_sig_loss,
    nll_3way_loss,
    rank_hinge_loss,
    reward_pair_hinge_loss,
    smooth_l1_loss,
)


def torch_rank_loss(scores, indices, margin):
    # reference RankLoss semantics (ppo.py:38-55)
    scores = torch.tensor(scores)
    indices = torch.tensor(indices)
    sorted_scores = torch.gather(scores, 1, indices)
    diff = margin - (sorted_scores.unsqueeze(2) - sorted_scores.unsqueeze(1))
    diff = torch.triu(diff, diagonal=1)
    hinge = torch.relu(diff)
    cnt = torch.sign(hinge).sum()
    if cnt == 0:
        return float(hinge.sum())
    return float(hinge.sum() / cnt)


def test_smooth_l1_matches_torch():
    rng = np.random.RandomState(0)
    pred = rng.randn(40).astype(np.float32)
    tgt = rng.randint(0, 3, size=40).astype(np.float32)
    ours = float(smooth_l1_loss(jnp.array(pred), jnp.array(tgt), beta=0.3))
    ref = float(torch.nn.SmoothL1Loss(beta=0.3)(
        torch.tensor(pred), torch.tensor(tgt)))
    assert abs(ours - ref) < 1e-6


def test_nll_3way_matches_torch():
    rng = np.random.RandomState(1)
    logits = rng.randn(10, 3).astype(np.float32)
    tgt = rng.randint(0, 3, size=10)
    ours = float(nll_3way_loss(jnp.array(logits), jnp.array(tgt)))
    ref = float(torch.nn.NLLLoss()(
        torch.nn.LogSoftmax(dim=-1)(torch.tensor(logits)),
        torch.tensor(tgt)))
    assert abs(ours - ref) < 1e-5


@pytest.mark.parametrize("margin", [0.01, 1.0])
def test_rank_hinge_matches_reference(margin):
    rng = np.random.RandomState(2)
    scores = rng.randn(6, 2).astype(np.float32)
    indices = np.stack([rng.permutation(2) for _ in range(6)]).astype(np.int64)
    ours = float(rank_hinge_loss(jnp.array(scores), jnp.array(indices), margin))
    ref = torch_rank_loss(scores, indices, margin)
    assert abs(ours - ref) < 1e-6


def test_rank_hinge_zero_violations():
    # widely separated scores in the demanded order -> no violating pair
    scores = jnp.array([[5.0, 1.0], [9.0, 2.0]])
    idx = jnp.array([[0, 1], [0, 1]])
    assert float(rank_hinge_loss(scores, idx, margin=0.01)) == 0.0


def test_rank_hinge_counts_only_violations():
    # one violating pair out of one: loss = relu(m - (s0 - s1)) / 1
    scores = jnp.array([[1.0, 2.0]])
    idx = jnp.array([[0, 1]])
    got = float(rank_hinge_loss(scores, idx, margin=0.01))
    assert abs(got - (0.01 - (1.0 - 2.0))) < 1e-6


def test_clipped_value_loss_matches_reference():
    rng = np.random.RandomState(3)
    v = rng.randn(16).astype(np.float32)
    r = rng.randn(16).astype(np.float32)
    ov = rng.randn(16).astype(np.float32)
    clip = 0.5
    ours = float(clipped_value_loss(jnp.array(v), jnp.array(r), jnp.array(ov), clip))
    tv, tr, tov = map(torch.tensor, (v, r, ov))
    vc = tov + (tv - tov).clamp(-clip, clip)
    ref = float(torch.mean(torch.max((vc - tr) ** 2, (tv - tr) ** 2)))
    assert abs(ours - ref) < 1e-6


def test_kl_and_entropy_match_reference():
    rng = np.random.RandomState(4)
    old = rng.randn(8, 2).astype(np.float32)
    new = rng.randn(8, 2).astype(np.float32)
    kl = np.asarray(categorical_kl(jnp.array(old), jnp.array(new)))
    ent = np.asarray(categorical_entropy(jnp.array(new)))

    def tlog(t):
        return torch.log(t.clamp(min=1e-20))

    to, tn = torch.tensor(old).softmax(-1), torch.tensor(new).softmax(-1)
    ref_kl = (to * (tlog(to) - tlog(tn))).sum(-1).numpy()
    ref_ent = -(tn * tlog(tn)).sum(-1).numpy()
    np.testing.assert_allclose(kl, ref_kl, atol=2e-4)
    np.testing.assert_allclose(ent, ref_ent, atol=2e-4)


def test_reward_pair_hinge():
    c = jnp.array([2.0, 0.0])
    r = jnp.array([0.0, 1.0])
    # relu(1-2)=0, relu(1+1)=2 -> mean 1.0
    assert abs(float(reward_pair_hinge_loss(c, r, 1.0)) - 1.0) < 1e-6


def test_log_sig_matches_reference():
    c = jnp.array([0.3, -0.2])
    r = jnp.array([0.1, 0.4])
    probs = torch.sigmoid(torch.tensor([0.2, -0.6]))
    ref = float((-torch.log(probs + 1e-10)).mean())
    assert abs(float(log_sig_loss(c, r)) - ref) < 1e-5

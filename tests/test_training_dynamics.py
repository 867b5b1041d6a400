"""Training-dynamics parity: run the reference stage-1 pointwise update
math (finetune/pointwise.py:300-313 — SmoothL1(beta=0.3) -> backward ->
grouped AdamW(correct_bias=False) -> linear-warmup scheduler step) as a
CPU-torch oracle and our jitted train step side by side from IDENTICAL
weights and data, and require the loss trajectories to match.

This extends round-1's forward-only oracle parity to the optimizer/loss
dynamics — the strongest attainable substitute for replaying the
reference's golden logs without the real dataset (VERDICT round 1 #5).
"""

import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lr2ppo_tpu.config import Config, ModelConfig
from lr2ppo_tpu.models import ScoreModel
from lr2ppo_tpu.train.checkpoints import torch_to_flax
from lr2ppo_tpu.train.common import init_state
from lr2ppo_tpu.train.optim import build_optimizer
from lr2ppo_tpu.train.pointwise import make_train_step

REF = "/root/reference"
HAS_REF = os.path.isdir(os.path.join(REF, "finetune"))

FEAT, SEQ, IMGS, HEADS, TAGS, BS = 16, 4, 2, 4, 3, 2
STEPS = 10
LR, WARMUP_FRAC = 1e-3, 0.1


def _torch_actor():
    import torch.nn as nn

    sys.path.insert(0, os.path.join(REF, "finetune"))
    import xit as ref_xit
    import torch
    import torch.nn.functional as F

    class TorchMlp(nn.Module):
        def __init__(self, i, h, o):
            super().__init__()
            self.fc1 = nn.Linear(i, h)
            self.fc2 = nn.Linear(h, o)

        def forward(self, x):
            return self.fc2(F.gelu(self.fc1(x)))

    class TorchActor(nn.Module):
        def __init__(self):
            super().__init__()
            self.text_proj = TorchMlp(FEAT, 4 * FEAT, FEAT)
            self.img_proj = TorchMlp(FEAT, 4 * FEAT, FEAT)
            self.xit = ref_xit.XiT(feat_size=FEAT, num_heads=HEADS,
                                   drop_p=0.0, forward_drop_p=0.0)
            self.out_layer = TorchMlp((SEQ + IMGS) * FEAT, 4 * FEAT, FEAT)
            self.head = nn.Linear(FEAT, 1)

        def forward(self, text_emb, img_emb):
            t = self.text_proj(text_emb)
            im = self.img_proj(img_emb)
            bs, tags = t.shape[:2]
            t = t.reshape(bs * tags, SEQ, FEAT)
            im = im.reshape(bs * tags, IMGS, FEAT)
            x = self.xit((t, im))
            x = torch.cat([x, im], dim=1)
            x = self.out_layer(x.reshape(x.shape[0], -1))
            return self.head(x.reshape(bs, tags, FEAT))[..., 0]

    return TorchActor()


def _reference_train(oracle, batches, total_steps):
    """The reference training loop verbatim: grouped AdamW
    (tencentpretrain/utils/optimizers.py, correct_bias=False) + linear
    warmup + SmoothL1(beta=0.3), stepping the scheduler per batch
    (pointwise.py:274-313)."""
    import torch

    sys.path.insert(0, REF)
    # the reference loads a token map relative to CWD at import time
    # (tencentpretrain/utils/constants.py:4 — the SURVEY §1 gotcha)
    cwd = os.getcwd()
    os.chdir(REF)
    try:
        from tencentpretrain.utils.optimizers import (
            AdamW, get_linear_schedule_with_warmup)
    finally:
        os.chdir(cwd)

    no_decay = ["bias", "gamma", "beta"]
    grouped = [
        {"params": [p for n, p in oracle.named_parameters()
                    if not any(x in n for x in no_decay)],
         "weight_decay": 0.01},
        {"params": [p for n, p in oracle.named_parameters()
                    if any(x in n for x in no_decay)],
         "weight_decay": 0.0},
    ]
    opt = AdamW(grouped, lr=LR, correct_bias=False)
    sched = get_linear_schedule_with_warmup(
        opt, num_warmup_steps=int(total_steps * WARMUP_FRAC),
        num_training_steps=total_steps)
    crit = torch.nn.SmoothL1Loss(beta=0.3)
    losses = []
    oracle.train()
    for text, img, tgts in batches:
        t_img = torch.tensor(img)[:, None].repeat(1, TAGS, 1, 1)
        opt.zero_grad()
        scores = oracle(torch.tensor(text), t_img)
        loss = crit(scores, torch.tensor(tgts))
        loss.backward()
        opt.step()
        sched.step()
        losses.append(float(loss))
    return losses


@pytest.mark.skipif(not HAS_REF, reason="reference repo not mounted")
def test_pointwise_training_trajectory_matches_reference():
    import torch

    torch.manual_seed(7)
    oracle = _torch_actor()
    flax_params = torch_to_flax(
        {k: v.numpy() for k, v in oracle.state_dict().items()})

    rng = np.random.RandomState(11)
    batches = [
        (rng.randn(BS, TAGS, SEQ, FEAT).astype(np.float32),
         rng.randn(BS, IMGS, FEAT).astype(np.float32),
         rng.randint(0, 3, (BS, TAGS)).astype(np.float32))
        for _ in range(STEPS)
    ]

    ref_losses = _reference_train(oracle, batches, STEPS)

    mcfg = ModelConfig(family="multimodal", feat_size=FEAT, seq_length=SEQ,
                       max_imgs=IMGS, num_heads=HEADS, mode="reg",
                       drop_p=0.0, forward_drop_p=0.0)
    cfg = Config(model=mcfg)
    cfg.optim.learning_rate = LR
    cfg.optim.warmup = WARMUP_FRAC
    model = ScoreModel(mcfg)
    tx = build_optimizer(cfg.optim, STEPS)
    state = init_state(flax_params, tx)
    step = make_train_step(model, tx, "reg")
    key = jax.random.PRNGKey(0)   # dropout rates are 0: rng is inert
    ours = []
    for text, img, tgts in batches:
        state, loss = step(state, key, jnp.asarray(text), jnp.asarray(img),
                           jnp.asarray(tgts))
        ours.append(float(loss))

    # identical weights + data + optimizer math: trajectories must track
    # within float32 accumulation noise across all 10 steps
    np.testing.assert_allclose(ours, ref_losses, rtol=2e-3, atol=2e-4)
    # step 1 is pre-update: must match at forward-parity tightness
    assert abs(ours[0] - ref_losses[0]) < 5e-5, (ours[0], ref_losses[0])
    # and training must actually be moving
    assert ref_losses[-1] != ref_losses[0]

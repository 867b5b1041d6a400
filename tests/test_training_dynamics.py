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


def _torch_seq_scorer(tags_for_pos: int = 4):
    """Torch oracle of the reference Critic/Reward (ppo.py:247-350):
    gather tags by index FIRST, per-tag fusion trunk, + pos_emb,
    causal XiT (the reference 'causal' mask is a no-op — proven
    bit-identical to the default mask in
    tests/test_models.py::test_causal_xit_is_noop_mask_parity, so the
    oracle uses the default mask, which runs on CPU), head on the last
    position."""
    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    sys.path.insert(0, os.path.join(REF, "finetune"))
    import xit as ref_xit

    class TorchMlp(nn.Module):
        def __init__(self, i, h, o):
            super().__init__()
            self.fc1 = nn.Linear(i, h)
            self.fc2 = nn.Linear(h, o)

        def forward(self, x):
            return self.fc2(F.gelu(self.fc1(x)))

    class TorchSeqScorer(nn.Module):
        def __init__(self):
            super().__init__()
            self.text_proj = TorchMlp(FEAT, 4 * FEAT, FEAT)
            self.img_proj = TorchMlp(FEAT, 4 * FEAT, FEAT)
            self.pos_emb = nn.Embedding(4, FEAT)
            self.xit = ref_xit.XiT(feat_size=FEAT, num_heads=HEADS,
                                   drop_p=0.0, forward_drop_p=0.0)
            self.xitt = ref_xit.XiT(feat_size=FEAT, num_heads=HEADS,
                                    drop_p=0.0, forward_drop_p=0.0)
            self.out_layer = TorchMlp((SEQ + IMGS) * FEAT, 4 * FEAT, FEAT)
            self.head = nn.Linear(FEAT, 1)

        def forward(self, text_emb, img_emb, tgts, index):
            # index rearrangement before the trunk (ppo.py:265-271);
            # img_emb arrives tiled per tag like the reference rollout
            # (ppo.py:831-832)
            bs = text_emb.shape[0]
            bi = torch.arange(bs).view(bs, 1)
            text = text_emb[bi, index]
            img = img_emb[bi, index]
            t = self.text_proj(text)
            im = self.img_proj(img)
            k = index.shape[1]
            t = t.reshape(bs * k, SEQ, FEAT)
            im = im.reshape(bs * k, IMGS, FEAT)
            x = self.xit((t, im))
            x = torch.cat([x, im], dim=1)
            x = self.out_layer(x.reshape(x.shape[0], -1))
            x = x.reshape(bs, k, FEAT)
            x = x + self.pos_emb(torch.arange(k)).unsqueeze(0)
            x = self.xitt((x, x))
            return self.head(x)[:, -1, 0]

    return TorchSeqScorer()


@pytest.mark.skipif(not HAS_REF, reason="reference repo not mounted")
@pytest.mark.heavy
def test_reward_training_trajectory_matches_reference():
    """Stage-2 dynamics oracle (VERDICT r2 #2a): the reference reward
    hinge step (finetune/reward_pair_dataloader.py:347-365 — dual
    forward, relu(1-(chosen-reject)).mean(), grouped
    AdamW(correct_bias=False), per-step linear scheduler) vs our jitted
    make_train_step from identical weights and data."""
    import torch

    from lr2ppo_tpu.train.reward import make_train_step as make_reward_step

    tags = 4
    torch.manual_seed(13)
    oracle = _torch_seq_scorer()
    flax_params = torch_to_flax(
        {k: v.numpy() for k, v in oracle.state_dict().items()})

    rng = np.random.RandomState(21)
    batches = []
    for _ in range(STEPS):
        # 4-index orderings into the tag axis (reward_pair_dataloader
        # builds [prefix 0,1] ++ chosen/reject pair; any valid indices
        # exercise the same math)
        chosen = np.stack([rng.permutation(tags) for _ in range(BS)])
        reject = np.stack([rng.permutation(tags) for _ in range(BS)])
        batches.append((
            rng.randn(BS, tags, SEQ, FEAT).astype(np.float32),
            rng.randn(BS, IMGS, FEAT).astype(np.float32),
            rng.randint(0, 3, (BS, tags)).astype(np.int64),
            chosen.astype(np.int64), reject.astype(np.int64)))

    # --- reference loop (reward_pair_dataloader.py:347-365 verbatim;
    # its AdamW/scheduler come from the same tencentpretrain modules the
    # stage-1 oracle imports) ---
    cwd = os.getcwd()
    sys.path.insert(0, REF)
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
        opt, num_warmup_steps=int(STEPS * WARMUP_FRAC),
        num_training_steps=STEPS)
    ref_losses, ref_accs = [], []
    oracle.train()
    for text, img, tgts, chosen, reject in batches:
        oracle.zero_grad()
        t_img = torch.tensor(img)[:, None].repeat(1, tags, 1, 1)
        cs = oracle(torch.tensor(text), t_img, torch.tensor(tgts),
                    torch.tensor(chosen))
        rs = oracle(torch.tensor(text), t_img, torch.tensor(tgts),
                    torch.tensor(reject))
        loss = torch.relu(1 - (cs - rs)).mean()
        acc = (cs > rs).float().mean()
        loss.backward()
        opt.step()
        sched.step()
        ref_losses.append(float(loss))
        ref_accs.append(float(acc))

    # --- ours ---
    mcfg = ModelConfig(family="multimodal", feat_size=FEAT, seq_length=SEQ,
                       max_imgs=IMGS, num_heads=HEADS, mode="reg",
                       drop_p=0.0, forward_drop_p=0.0)
    cfg = Config(model=mcfg)
    cfg.optim.learning_rate = LR
    cfg.optim.warmup = WARMUP_FRAC
    from lr2ppo_tpu.models import SeqScoreModel

    model = SeqScoreModel(mcfg)
    tx = build_optimizer(cfg.optim, STEPS)
    state = init_state(flax_params, tx)
    step = make_reward_step(model, tx, margin=1.0)
    key = jax.random.PRNGKey(0)
    ours, our_accs = [], []
    for text, img, tgts, chosen, reject in batches:
        state, loss, acc = step(state, key, jnp.asarray(text),
                                jnp.asarray(img),
                                jnp.asarray(chosen), jnp.asarray(reject))
        ours.append(float(loss))
        our_accs.append(float(acc))

    np.testing.assert_allclose(ours, ref_losses, rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(our_accs, ref_accs, atol=1e-6)
    assert abs(ours[0] - ref_losses[0]) < 5e-5, (ours[0], ref_losses[0])
    assert ref_losses[-1] != ref_losses[0]


@pytest.mark.skipif(not HAS_REF, reason="reference repo not mounted")
@pytest.mark.heavy
def test_ppo_training_trajectory_matches_reference():
    """Stage-3 dynamics oracle (VERDICT r2 #2b): the ACTUAL reference
    update code — finetune/ppo.py:train_model imported and called
    verbatim (RankLoss, KL penalty, advantage flip, clipped value loss,
    dual AdamW, per-sweep schedulers; dist stubbed to world=1) — driven
    alongside our jitted rollout/update from identical weights and
    data, comparing loss/KL/entropy/value trajectories over 10 sweeps
    AND the rollout memories themselves."""
    import types

    import torch

    from lr2ppo_tpu.train.ppo import make_rollout_step, make_update_step

    SWEEPS, UPD = 10, 2       # 10 sweeps x 2 memories each
    tags = 2                  # stage-3 trains on 2-tag pairs
    LR_C = 3e-4               # distinct critic lr exercises the dual path

    torch.manual_seed(17)
    t_actor = _torch_actor()
    t_critic = _torch_seq_scorer()

    class RefActor(torch.nn.Module):
        """Adapter matching the reference Actor call contract in
        train_model (ppo.py:518-527): returns (ce_loss, flat logits)."""

        def __init__(self, inner):
            super().__init__()
            self.inner = inner

        def forward(self, text_emb, img_emb, tgts):
            logits = self.inner(text_emb, img_emb)
            return torch.zeros(()), logits.reshape(-1)

    class RefModel(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.actor = RefActor(t_actor)
            self.critic = t_critic

    ref_model = RefModel()

    aflax = torch_to_flax(
        {k: v.numpy() for k, v in t_actor.state_dict().items()})
    cflax = torch_to_flax(
        {k: v.numpy() for k, v in t_critic.state_dict().items()})
    # frozen reward model: fresh weights, shared by both sides
    torch.manual_seed(23)
    t_reward = _torch_seq_scorer().eval()
    rflax = torch_to_flax(
        {k: v.numpy() for k, v in t_reward.state_dict().items()})

    # --- import the reference module (the CWD token-map gotcha) ---
    cwd = os.getcwd()
    sys.path.insert(0, os.path.join(REF, "finetune"))
    sys.path.insert(0, REF)
    os.chdir(REF)
    try:
        import ppo as ref_ppo
        from tencentpretrain.utils.optimizers import (
            AdamW, get_linear_schedule_with_warmup)
    finally:
        os.chdir(cwd)

    # world=1: all_reduce is identity, div_(1) is identity
    ref_ppo.dist = types.SimpleNamespace(
        all_reduce=lambda t: None, get_world_size=lambda: 1)

    def grouped(module, lr):
        no_decay = ["bias", "gamma", "beta"]
        return AdamW([
            {"params": [p for n, p in module.named_parameters()
                        if not any(x in n for x in no_decay)],
             "weight_decay": 0.01},
            {"params": [p for n, p in module.named_parameters()
                        if any(x in n for x in no_decay)],
             "weight_decay": 0.0}], lr=lr, correct_bias=False)

    total_rollouts = SWEEPS * UPD          # max_timesteps=1
    opt = grouped(ref_model.actor, LR)
    copt = grouped(ref_model.critic, LR_C)
    # the reference scheduler horizon is in ROLLOUT steps but ticks per
    # sweep (ppo.py:796 vs :612-613) — reproduce the quirk on both sides
    sched = get_linear_schedule_with_warmup(
        opt, int(total_rollouts * WARMUP_FRAC), total_rollouts)
    csched = get_linear_schedule_with_warmup(
        copt, int(total_rollouts * WARMUP_FRAC), total_rollouts)

    args = types.SimpleNamespace(
        is_master=False, mode="reg", kl_div_loss_weight=0.001,
        entropy_weight=0.001, value_clip=0.5)

    rng = np.random.RandomState(31)
    batches = [
        (rng.randn(BS, tags, SEQ, FEAT).astype(np.float32),
         rng.randn(BS, IMGS, FEAT).astype(np.float32),
         rng.randint(0, 3, (BS, tags)).astype(np.int64))
        for _ in range(total_rollouts)
    ]

    # --- our side: trainer-identical rollout/update programs ---
    mcfg = ModelConfig(family="multimodal", feat_size=FEAT, seq_length=SEQ,
                       max_imgs=IMGS, num_heads=HEADS, mode="reg",
                       drop_p=0.0, forward_drop_p=0.0)
    cfg = Config(model=mcfg)
    cfg.optim.learning_rate = LR
    cfg.optim.critic_learning_rate = LR_C
    cfg.optim.warmup = WARMUP_FRAC
    from lr2ppo_tpu.models import ScoreModel, SeqScoreModel

    actor = ScoreModel(mcfg)
    critic = SeqScoreModel(mcfg)
    reward = SeqScoreModel(mcfg)

    def mk(base_lr):
        return build_optimizer(
            cfg.optim, total_rollouts, lr=base_lr,
            schedule_wrap=lambda s: (lambda t: s(t // UPD)))

    atx, ctx_tx = mk(LR), mk(LR_C)
    astate = init_state(aflax, atx)
    cstate = init_state(cflax, ctx_tx)
    rollout = make_rollout_step(actor, critic, reward, "reg")
    update = make_update_step(actor, critic, atx, ctx_tx, cfg)
    key = jax.random.PRNGKey(0)   # dropout rates are 0: rng is inert

    ref_traj, our_traj = [], []
    ref_memories, our_memories = [], []
    ref_model.eval()
    for i, (text, img, tgts) in enumerate(batches):
        t_text = torch.tensor(text)
        t_img = torch.tensor(img)[:, None].repeat(1, tags, 1, 1)
        t_tgts = torch.tensor(tgts)
        state0 = np.broadcast_to(np.arange(tags, dtype=np.int64),
                                 (BS, tags)).copy()
        # reference rollout (ppo.py:860-884)
        with torch.no_grad():
            _, logits = ref_model.actor(t_text, t_img, t_tgts)
            scores_t = logits.reshape(BS, tags)
            value_t = ref_model.critic(t_text, t_img, t_tgts,
                                       torch.tensor(state0))
            _, order = torch.sort(scores_t, dim=-1, descending=True)
            nxt = torch.stack([
                torch.index_select(torch.tensor(state0)[i_], 0, order[i_])
                for i_ in range(BS)])
            nxt = torch.cat(
                [torch.arange(2).unsqueeze(0).repeat(BS, 1), nxt], dim=1)
            rew_t = t_reward(t_text, t_img, t_tgts, nxt)
        ref_memories.append([torch.tensor(state0), nxt, scores_t.clone(),
                             rew_t.clone(), value_t.clone(), t_text, t_img,
                             t_tgts])

        # our rollout
        scores, value, next_state, rew = rollout(
            astate.params, cstate.params, rflax,
            jnp.asarray(text), jnp.asarray(img), jnp.asarray(state0))
        our_memories.append((jnp.asarray(text), jnp.asarray(img),
                             jnp.asarray(state0), next_state, scores, rew,
                             value))

        # rollout parity: identical memories on both sides
        np.testing.assert_allclose(np.asarray(scores), scores_t.numpy(),
                                   atol=5e-5)
        np.testing.assert_allclose(np.asarray(value), value_t.numpy(),
                                   atol=5e-5)
        np.testing.assert_array_equal(np.asarray(next_state), nxt.numpy())
        np.testing.assert_allclose(np.asarray(rew), rew_t.numpy(),
                                   atol=5e-5)

        if (i + 1) % UPD == 0:
            ref_model.train()
            out = ref_ppo.train_model(args, ref_model, opt, copt, sched,
                                      csched, ref_memories, epoch=1)
            ref_model.eval()
            ref_memories = []
            # [policy, value, kl, old_value, value, rewards_ori,
            #  rewards, advantages, rank, entropy]
            ref_traj.append([float(x) for x in out])

            agg = None
            for mem in our_memories:
                key, sub = jax.random.split(key)
                astate, cstate, metrics = update(astate, cstate, sub, *mem)
                agg = metrics if agg is None else jax.tree.map(
                    jnp.add, agg, metrics)
            our_memories = []
            our_traj.append({k: float(v) / UPD for k, v in agg.items()})

    assert len(ref_traj) == SWEEPS
    names = ["policy_loss", "value_loss", "kl", "old_value", "value",
             "rewards_ori", "rewards", "advantages", "rank_loss", "entropy"]
    ref_cols = {n: [row[j] for row in ref_traj]
                for j, n in enumerate(names)}
    for n in names:
        ours_col = [row[n] for row in our_traj]
        np.testing.assert_allclose(
            ours_col, ref_cols[n], rtol=5e-3, atol=5e-4,
            err_msg=f"trajectory diverged on {n}")
    # and the actor must actually be learning
    assert ref_cols["policy_loss"][-1] != ref_cols["policy_loss"][0]


@pytest.mark.skipif(not HAS_REF, reason="reference repo not mounted")
@pytest.mark.heavy
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

"""Stage 3 — LR2PPO actor-critic trainer.

Reference: finetune/ppo.py (multimodal) / finetune/ppo_trad.py (tabular).
The recipe (ppo.py:815-915): per batch of 2-tag pairs,

  rollout  — actor scores the pair, critic values the current state
             (tag order), the pair is re-ranked by score (the 'action'),
             next_state = [0,1] ++ permuted order, the FROZEN stage-2
             reward model scores next_state; the 8-tuple memory is stored;
  update   — every update_timesteps memories: for each memory recompute
             actor scores + critic value, KL(old||new) penalty shifts the
             reward, one-step advantage = reward - old_value (no GAE),
             policy loss = RankLoss(margin .01 over the demanded order,
             flipped when advantage < -0.1) * |advantage| - entropy_w * H,
             critic loss = PPO-clipped value loss; separate AdamW steps;
             schedulers step once per sweep (ppo.py:612-613).

TPU design: rollout and update are each ONE jitted program (actor+critic+
reward forwards fused by XLA); memories keep the small tensors on host and
re-feed the (already host-resident) batch during the sweep, so HBM holds
only params+optimizer state. Batch axis shards over dp; the wide MLPs over
tp. Gradients sync through pjit (true DP — documented improvement over the
reference's unsynced replicas, SURVEY §2.5).
"""

from __future__ import annotations

from functools import partial
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from lr2ppo_tpu.config import Config
from lr2ppo_tpu.models import ScoreModel, SeqScoreModel
from lr2ppo_tpu.ops import (
    categorical_entropy,
    cls_expected_scores,
    categorical_kl,
    clipped_value_loss,
    rank_hinge_loss,
)
from lr2ppo_tpu.train import checkpoints
from lr2ppo_tpu.train.common import (
    BestSaver, DeviceCtx, TrainState, apply_updates, burn_keys,
    init_state, peek_batch)
from lr2ppo_tpu.train.evaluate import evaluate_ndcg, format_ndcg
from lr2ppo_tpu.train.optim import build_optimizer
from lr2ppo_tpu.utils import MetricLogger, init_logger


def make_rollout_step(actor: ScoreModel, critic: SeqScoreModel,
                      reward: SeqScoreModel, mode: str):
    @jax.jit
    def rollout_step(actor_p, critic_p, reward_p, text, img, state):
        logits = actor.apply(actor_p, text, img)
        scores = cls_expected_scores(logits) if mode == "cls" else logits
        value = critic.apply(critic_p, text, img, state)
        order = jnp.argsort(-scores, axis=-1)            # descending
        permuted = jnp.take_along_axis(state, order, axis=1)
        b = scores.shape[0]
        prefix = jnp.broadcast_to(jnp.arange(2, dtype=state.dtype)[None],
                                  (b, 2))
        next_state = jnp.concatenate([prefix, permuted], axis=1)  # (B, 4)
        rew = reward.apply(reward_p, text, img, next_state)
        return scores, value, next_state, rew

    return rollout_step


def make_update_step(actor: ScoreModel, critic: SeqScoreModel,
                     atx, ctx_tx, cfg: Config):
    mode = cfg.model.mode
    ppo = cfg.ppo

    # donate the two train states: XLA aliases the old params/moments into
    # the new ones, halving update-step peak HBM (critical: the fusion
    # out_layer alone is 500M params)
    @partial(jax.jit, donate_argnums=(0, 1))
    def update_step(astate: TrainState, cstate: TrainState, rng,
                    text, img, state, next_state, old_scores, rewards,
                    old_value, gae_adv=None, gae_ret=None):
        ra, rc = jax.random.split(rng)

        def actor_loss(params):
            logits = actor.apply({"params": params}, text, img, False,
                                 rngs={"dropout": ra})
            scores = cls_expected_scores(logits) if mode == "cls" else logits
            kl = categorical_kl(old_scores, scores)            # (B,)
            entropy = categorical_entropy(scores)              # (B,)
            rew = rewards - ppo.kl_div_loss_weight * kl        # (B,)
            if ppo.use_gae:
                # improved mode (VERDICT r2 #7): GAE advantages computed
                # over the sweep window (ops/losses.py:gae_advantages),
                # KL penalty applied the same way the faithful path
                # folds it into the one-step advantage
                adv = gae_adv - ppo.kl_div_loss_weight * kl
            else:
                adv = rew - old_value                          # one-step
            tail = next_state[:, -2:]
            flip = adv < ppo.advantage_eps
            rank_states = jnp.where(flip[:, None], tail[:, ::-1], tail)
            rank_loss = rank_hinge_loss(scores, rank_states, ppo.rank_margin)
            policy = rank_loss * jnp.abs(adv) - ppo.entropy_weight * entropy
            if ppo.surrogate_clip:
                # real clipped surrogate: ratio of Plackett-Luce
                # probabilities of the ranking the rollout actually took
                # — gives the reference's parsed-but-dead eps_clip
                # (ppo.py:730) actual semantics
                from lr2ppo_tpu.ops import pl_log_prob

                logp_new = pl_log_prob(scores, tail)
                logp_old = pl_log_prob(old_scores, tail)
                ratio = jnp.exp(logp_new - logp_old)
                a = jax.lax.stop_gradient(adv)
                policy = policy - jnp.minimum(
                    ratio * a,
                    jnp.clip(ratio, 1.0 - ppo.eps_clip,
                             1.0 + ppo.eps_clip) * a)
            loss = policy.mean()
            aux = {
                "kl": kl.mean(), "entropy": entropy.mean(),
                "rewards": rew.mean(), "advantages": adv.mean(),
                "rank_loss": rank_loss, "rewards_adj": rew,
            }
            return loss, aux

        (ploss, aux), agrads = jax.value_and_grad(actor_loss, has_aux=True)(
            astate.params["params"])
        new_astate = apply_updates(astate, {"params": agrads}, atx)

        rew_detached = jax.lax.stop_gradient(aux.pop("rewards_adj"))
        # GAE mode regresses the critic on the window returns instead of
        # the KL-shifted one-step reward
        vtarget = gae_ret if ppo.use_gae else rew_detached

        def critic_loss(params):
            value = critic.apply({"params": params}, text, img, state, False,
                                 rngs={"dropout": rc})
            vloss = clipped_value_loss(value, vtarget, old_value,
                                       ppo.value_clip)
            return vloss, value

        (vloss, value), cgrads = jax.value_and_grad(
            critic_loss, has_aux=True)(cstate.params["params"])
        new_cstate = apply_updates(cstate, {"params": cgrads}, ctx_tx)

        metrics = {
            "policy_loss": ploss, "value_loss": vloss,
            "old_value": old_value.mean(), "value": value.mean(),
            "rewards_ori": rewards.mean(), **aux,
        }
        return new_astate, new_cstate, metrics

    return update_step


class PPOTrainer:
    def __init__(self, cfg: Config, use_mesh: bool = True):
        self.cfg = cfg
        self.logger = init_logger(cfg.log_path)
        self.metrics = MetricLogger(
            cfg.log_path + ".jsonl" if cfg.log_path else None)
        dtype = jnp.dtype(cfg.mesh.compute_dtype)
        self.actor = ScoreModel(cfg.model, dtype)
        self.critic = SeqScoreModel(cfg.model, dtype)
        # the reward model is FROZEN (ppo.py:780): under ppo.reward_int8
        # it runs int8 weight-static matmuls (2x MXU rate, half the
        # param HBM; ops/int8.py) — the trainable actor/critic stay at
        # the compute dtype
        import dataclasses

        int8_mcfg = dataclasses.replace(cfg.model, int8=True)
        self.reward = SeqScoreModel(
            int8_mcfg if cfg.ppo.reward_int8 else cfg.model, dtype)
        # ppo.rollout_int8: rollout-side actor/critic twins that consume
        # int8 trees re-quantized from the live params once per sweep
        # (the rollout is no-grad; config.py:PPOConfig.rollout_int8).
        # 'actor' mode keeps the critic bf16 — half the twin HBM, fits
        # bs=256 on a 16 GB chip where dual twins OOM (r5 ledger in
        # config.py).
        from lr2ppo_tpu.config import rollout_int8_mode

        self.ri8 = rollout_int8_mode(cfg.ppo.rollout_int8)
        self.r_actor = (ScoreModel(int8_mcfg, dtype)
                        if self.ri8 != "0" else self.actor)
        self.r_critic = (SeqScoreModel(int8_mcfg, dtype)
                         if self.ri8 == "1" else self.critic)
        self.ctx = DeviceCtx(cfg.mesh.dp, cfg.mesh.tp, enabled=use_mesh,
                             cast_dtype=cfg.mesh.compute_dtype,
                             zero1=cfg.mesh.zero1,
                             fsdp=cfg.mesh.fsdp)
        from lr2ppo_tpu.ops import gae_advantages

        self._gae_jit = partial(jax.jit, static_argnums=(3, 4))(
            gae_advantages)

    # -- parameter loading (key contract: ppo.py:769-771) ---------------
    def init_params(self, sample_batch, seed: int, reward_only: bool = False):
        """Build (actor, critic, reward) param trees; `reward_only`
        skips the actor/critic work (resume restores those from the
        .state checkpoint, so loading the multi-GB actor ckpt — or
        jit-initializing two extra models — would be thrown away)."""
        cfg = self.cfg
        key = jax.random.PRNGKey(seed)
        b = {k: jnp.asarray(v) for k, v in sample_batch.items()}
        idx4 = jnp.zeros((b["text"].shape[0], 4), jnp.int32)
        ka, kc, kr = jax.random.split(key, 3)
        actor_p = None
        if not reward_only:
            if cfg.pretrained_model_path:
                actor_p = checkpoints.load_any(cfg.pretrained_model_path)
            else:
                actor_p = self.actor.init(ka, b["text"], b.get("img"))
        if cfg.reward_model_path:
            # stage-2 ckpt initializes BOTH critic and reward: one
            # deserialization serves both. Reward must OWN its buffers
            # (jnp.array copies) — the update step donates the critic's,
            # and a shared buffer would be deleted under the frozen
            # reward model after the first sweep.
            critic_p = checkpoints.load_any(cfg.reward_model_path)
            if reward_only:          # critic comes from the .state resume
                critic_p, reward_p = None, critic_p
            else:
                reward_p = jax.tree.map(jnp.array, critic_p)
        elif reward_only:
            critic_p = None
            reward_p = self.reward.init(kr, b["text"], b.get("img"), idx4)
        else:
            critic_p = self.critic.init(kc, b["text"], b.get("img"), idx4)
            reward_p = self.reward.init(kr, b["text"], b.get("img"), idx4)
        # the reward model is frozen (ppo.py:780): store its ~520M params
        # at the compute dtype — fp32 copies of a pure-inference model
        # cost an extra GB of HBM the update step needs
        if cfg.ppo.reward_int8:
            from lr2ppo_tpu.ops.int8 import quantize_tree

            reward_p = quantize_tree(
                reward_p, jnp.dtype(self.ctx.cast_dtype or jnp.float32))
        elif self.ctx.cast_dtype is not None:
            reward_p = jax.tree.map(
                lambda x: x.astype(self.ctx.cast_dtype)
                if jnp.issubdtype(x.dtype, jnp.floating) else x, reward_p)
        place = self.ctx.place_params
        return (None if actor_p is None else place(actor_p),
                None if critic_p is None else place(critic_p),
                place(reward_p))

    def fit(self, make_train_loader, eval_loader,
            train_steps: Optional[int] = None):
        """make_train_loader(epoch) -> Loader (trainset is rebuilt per
        epoch for fresh pair sampling, ppo.py:816)."""
        cfg = self.cfg
        upd = cfg.ppo.update_timesteps
        if cfg.ppo.use_gae and upd % max(cfg.ppo.max_timesteps, 1) != 0:
            # GAE bootstraps V=0 at the sweep-window edge; when the
            # window cuts a trajectory mid-way that zero bootstrap would
            # bias the tail advantages (the next timestep's value is not
            # yet rolled out, so it cannot be bootstrapped correctly) —
            # require aligned windows instead (ADVICE r3)
            raise ValueError(
                f"ppo.use_gae requires update_timesteps ({upd}) to be a "
                f"multiple of max_timesteps ({cfg.ppo.max_timesteps}): a "
                f"sweep window that cuts a trajectory mid-way would "
                f"bootstrap GAE with V=0 inside the trajectory")
        loader0 = make_train_loader(1)
        steps_per_epoch = len(loader0)
        total = train_steps or int(steps_per_epoch * cfg.epochs_num) + 1

        # schedulers tick once per sweep (ppo.py:612-613): remap the
        # optimizer-step axis to sweeps inside the shared builder
        def mk(base_lr):
            return self.ctx.wrap_optimizer(build_optimizer(
                cfg.optim, total, lr=base_lr,
                schedule_wrap=lambda s: (lambda t: s(t // upd))))
        atx, ctx_tx = mk(cfg.optim.learning_rate), mk(
            cfg.optim.critic_learning_rate)

        first = peek_batch(loader0)
        start_epoch, skip_batches = 1, 0
        time_ctr, step = 0, 0
        resume_best = -np.inf
        if cfg.resume_path:
            # full PPO resume (reference has save-best only): both train
            # states + the rollout/sweep counters, with the data stream
            # fast-forwarded to the restored position
            from lr2ppo_tpu.train.common import (
                load_state_tree, restore_train_state)

            tree, meta = load_state_tree(cfg.resume_path)
            astate = restore_train_state(
                self.ctx, atx, tree["actor"]["params"],
                tree["actor"]["opt_state"], tree["astep"])
            cstate = restore_train_state(
                self.ctx, ctx_tx, tree["critic"]["params"],
                tree["critic"]["opt_state"], tree["astep"])
            _, _, reward_p = self.init_params(first, cfg.seed,
                                              reward_only=True)
            step = int(tree["step"])
            time_ctr = int(tree["time_ctr"])
            resume_best = float(tree.get("best", -np.inf))
            consumed = time_ctr // max(cfg.ppo.max_timesteps, 1)
            # past the last epoch -> resume is a no-op (empty range)
            start_epoch = consumed // steps_per_epoch + 1
            skip_batches = consumed % steps_per_epoch
            self.logger.info(
                f"resumed PPO from {cfg.resume_path} @ sweep {step} "
                f"(epoch {start_epoch}, skipping {skip_batches} batches)")
        else:
            actor_p, critic_p, reward_p = self.init_params(first, cfg.seed)
            astate = init_state(actor_p, atx)
            cstate = init_state(critic_p, ctx_tx)

        rollout_step = make_rollout_step(self.r_actor, self.r_critic,
                                         self.reward, cfg.model.mode)
        update_step = make_update_step(self.actor, self.critic, atx, ctx_tx,
                                       cfg)
        # rollout_int8: int8 views of the live params, rebuilt lazily
        # after every sweep (the only place params change). qa/qc are
        # dropped BEFORE requantizing so the old trees' HBM frees first.
        quant = None
        if self.ri8 != "0":
            from lr2ppo_tpu.ops.int8 import quantize_tree

            dtype = jnp.dtype(self.ctx.cast_dtype or jnp.float32)
            quant = jax.jit(partial(quantize_tree, other_dtype=dtype))
        qa = qc = None

        def rollout_params():
            nonlocal qa, qc
            if quant is None:
                return astate.params, cstate.params
            if qa is None:
                qa = quant(astate.params)
                if self.ri8 == "1":
                    qc = quant(cstate.params)
            # 'actor' mode: the critic rolls out from its live bf16
            # params (cstate changes per sweep — read it fresh)
            return qa, (qc if self.ri8 == "1" else cstate.params)
        saver = BestSaver(cfg.output_model_path, self.logger,
                          backend=cfg.ckpt_backend)
        saver.best = max(saver.best, resume_best)
        key = jax.random.PRNGKey(cfg.seed + 2)
        # one split per completed sweep: keep the dropout key stream
        # aligned with an uninterrupted run after resume (ADVICE r3)
        key = burn_keys(key, step)
        def _save_state(astate, cstate, step, time_ctr, best):
            checkpoints.save_checkpoint(
                cfg.output_model_path + ".state",
                {"actor": {"params": astate.params,
                           "opt_state": astate.opt_state},
                 "critic": {"params": cstate.params,
                            "opt_state": cstate.opt_state},
                 "astep": int(astate.step),
                 "step": step, "time_ctr": time_ctr, "best": best},
                {"step": step}, backend=cfg.ckpt_backend)

        memories: List[dict] = []
        pending_save = False
        self.logger.info(
            f"Start PPO: {steps_per_epoch} rollout steps/epoch, "
            f"update every {upd}")

        device_memories: Optional[bool] = None
        if jax.process_count() > 1:
            # pod: rollout outputs are dp-sharded GLOBAL arrays spanning
            # non-addressable devices — np.asarray on them (the
            # host-memory path) is impossible, and re-gathering per
            # sweep would defeat the sharded input path. Memories stay
            # device-resident; each process holds only its shards, so
            # the per-process HBM cost is projected/world.
            device_memories = True
            self.logger.info(
                "PPO memories: device-resident (multi-process pod; "
                "host-resident memories are single-process only)")
        for epoch in range(start_epoch, cfg.epochs_num + 1):
            loader = make_train_loader(epoch)
            loader.set_epoch(epoch)
            # recycled-buffer loaders (ProcessLoader shared slots, thread
            # Loader reuse_buffers) invalidate a batch after a few
            # yields; anything retained across the sweep must be copied
            must_copy = (getattr(loader, "shared_slots", False)
                         or getattr(loader, "reuse_buffers", False))
            batch_iter = iter(loader)
            if epoch == start_epoch and skip_batches:
                from itertools import islice

                batch_iter = islice(batch_iter, skip_batches, None)
            for batch in batch_iter:
                if device_memories is None:
                    # one sweep's batches fit under the HBM budget ->
                    # keep them device-resident: the sweep re-uploads
                    # NOTHING (the reference also kept memories on GPU,
                    # ppo.py:882-883). Otherwise host numpy (+ guard).
                    # A sweep holds upd/max_timesteps DISTINCT batches
                    # (all of one batch's timesteps share its buffers),
                    # stored at the compute dtype after put's cast.
                    def _put_bytes(v):
                        a = np.asarray(v)
                        if (self.ctx.cast_dtype is not None
                                and np.issubdtype(a.dtype, np.floating)):
                            return a.size * jnp.dtype(
                                self.ctx.cast_dtype).itemsize
                        return a.nbytes
                    per = sum(_put_bytes(v) for v in batch.values())
                    mt = max(cfg.ppo.max_timesteps, 1)
                    # worst-case distinct batches a upd-timestep sweep
                    # window touches: upd/mt when aligned, else the
                    # window can start at a batch's LAST timestep
                    # (phase mt-1) -> 1 + ceil((upd-1)/mt)
                    distinct = (upd // mt if upd % mt == 0
                                else (upd + mt - 2) // mt + 1)
                    projected = per * distinct / 1e9
                    device_memories = (
                        projected <= cfg.ppo.device_memory_gb)
                    self.logger.info(
                        f"PPO memories: {'device' if device_memories else 'host'}"
                        f"-resident (~{projected:.2f} GB / sweep)")
                    if not device_memories and projected > 8.0:
                        self.logger.warning(
                            f"PPO memory buffer will hold ~"
                            f"{projected:.1f} GB of host batches "
                            f"({per / 1e6:.0f} MB x {distinct}); consider "
                            f"a bf16 loader dtype, smaller batch_size, "
                            f"or smaller update_timesteps")
                if (device_memories and must_copy
                        and jax.default_backend() == "cpu"):
                    # on the CPU backend jnp.asarray can ALIAS the
                    # loader's recycled host buffer, so a device-resident
                    # memory would silently change when the buffer is
                    # reused — copy first. On a real accelerator put is a
                    # true H2D copy, no host copy needed.
                    batch = {k: np.array(v) for k, v in batch.items()}
                b = self.ctx.put(batch)
                if not device_memories:
                    # ONE retained host copy per batch, shared by all of
                    # its timesteps' memories
                    host_batch = ({k: np.array(v)
                                   for k, v in batch.items()}
                                  if must_copy else batch)
                # bsz is the PROCESS-LOCAL row count (pod loaders are
                # shard=(rank, world)); put_array assembles the global
                # dp-sharded state the same way put assembled the batch
                bsz, tags = batch["tgts"].shape
                state = self.ctx.put_array(np.broadcast_to(
                    np.arange(tags, dtype=np.int32), (bsz, tags)).copy())
                for _t in range(cfg.ppo.max_timesteps):
                    ra_p, rc_p = rollout_params()
                    scores, value, next_state, rew = rollout_step(
                        ra_p, rc_p, reward_p,
                        b["text"], b.get("img"), state)
                    if device_memories:
                        memories.append({
                            "dev": (b["text"], b.get("img"), state,
                                    next_state, scores, rew, value),
                            "t": _t,
                        })
                    else:
                        memories.append({
                            "batch": host_batch,
                            "state": np.asarray(state),
                            "next_state": np.asarray(next_state),
                            "old_scores": np.asarray(scores),
                            "rewards": np.asarray(rew),
                            "old_value": np.asarray(value),
                            "t": _t,
                        })
                    state = next_state
                    time_ctr += 1
                    if time_ctr % upd == 0:
                        # drop the rollout batch's device buffers before
                        # the sweep re-puts every memory batch — holding
                        # them costs the update step ~0.6GB of HBM; only
                        # safe once this batch's timestep loop is done
                        # (a sweep can fire mid-batch when max_timesteps
                        # does not divide update_timesteps)
                        if _t == cfg.ppo.max_timesteps - 1:
                            b = None
                        key, sub = jax.random.split(key)
                        astate, cstate, agg = self._sweep(
                            update_step, astate, cstate, sub, memories)
                        memories = []
                        qa = qc = None      # params changed: requantize
                        step += 1
                        if (cfg.save_state_steps
                                and step % cfg.save_state_steps == 0):
                            # defer to a batch boundary with an empty
                            # memory buffer so the restored counters
                            # describe a clean resume point (a mid-batch
                            # save would replay already-swept timesteps)
                            pending_save = True
                        from lr2ppo_tpu.utils import check_finite

                        check_finite(agg["policy_loss"], step, "policy_loss",
                                     cfg.output_model_path)
                        check_finite(agg["value_loss"], step, "value_loss",
                                     cfg.output_model_path)
                        self.logger.info(f"Training step: {step}")
                        for k, v in agg.items():
                            self.logger.info(f"{k}: {v:.6f}")
                        # eval_steps decouples the full-val NDCG pass
                        # from the sweep cadence (0 = reference: every
                        # sweep, ppo.py:930)
                        if (cfg.eval_steps <= 0
                                or step % cfg.eval_steps == 0):
                            result = evaluate_ndcg(
                                self.actor, astate.params, eval_loader,
                                put=self.ctx.put_eval)
                            self.logger.info(
                                "Val NDCG:" + format_ndcg(result))
                            self.metrics.log(
                                step, ndcg_full=result[100000000], **agg)
                            saver.maybe_save(
                                result[100000000],
                                {"actor": astate.params,
                                 "critic": cstate.params})
                        else:
                            self.metrics.log(step, **agg)
                if pending_save and not memories:
                    # batch boundary + drained memory buffer: the
                    # (step, time_ctr) pair resumes exactly here
                    _save_state(astate, cstate, step, time_ctr,
                                saver.best)
                    pending_save = False
        improved = False
        try:
            if (cfg.eval_steps > 0 and step > 0
                    and step % cfg.eval_steps != 0):
                # final eval so a decoupled cadence still scores/saves
                # the end-of-run model — skipped when the last sweep
                # already evaluated these exact params. Runs BEFORE the
                # .state flush below so a best score found here reaches
                # the resume state (a stale lower `best` would let a
                # later resumed run overwrite best.ckpt with a worse
                # model).
                result = evaluate_ndcg(self.actor, astate.params,
                                       eval_loader, put=self.ctx.put_eval)
                self.logger.info("Final val NDCG:" + format_ndcg(result))
                self.metrics.log(step, ndcg_full=result[100000000])
                improved = saver.maybe_save(result[100000000],
                                            {"actor": astate.params,
                                             "critic": cstate.params})
        finally:
            # `finally`: a crash inside the final eval must not lose the
            # end-of-run resume point. Flush when the run ended off a
            # clean batch boundary (.state otherwise stale by up to an
            # lcm window) OR when the final eval raised the best
            # watermark (a .state carrying the old lower best would let
            # a later resumed run overwrite best.ckpt with worse params)
            if pending_save or improved:
                _save_state(astate, cstate, step, time_ctr, saver.best)
        # orbax_async: settle pending background saves before returning
        checkpoints.wait_for_async_saves()
        self.logger.info(f"Best NDCG: {saver.best}")
        return astate, cstate, saver.best

    def _sweep(self, update_step, astate, cstate, key, memories):
        """One PPO update sweep over the collected memories.

        Perf contract (round-1 finding: 200 blocking host syncs/sweep):
        - metrics accumulate as DEVICE arrays and are fetched exactly
          once at the end — no per-memory float() sync;
        - the next memory's H2D transfer is enqueued before the current
          update is dispatched (double buffering: jax device_put and the
          update dispatch are both async, so DMA overlaps compute).
        """
        def put(mem):
            if "dev" in mem:          # device-resident: nothing to move
                return mem["dev"]
            b = self.ctx.put(mem["batch"])
            return (b["text"], b.get("img"), jnp.asarray(mem["state"]),
                    jnp.asarray(mem["next_state"]),
                    jnp.asarray(mem["old_scores"]),
                    jnp.asarray(mem["rewards"]),
                    jnp.asarray(mem["old_value"]))

        gae_kw = [{} for _ in memories]
        if self.cfg.ppo.use_gae and memories:
            # GAE over the whole sweep window in ONE tiny jitted scan —
            # the (N, B) reward/value stacks stay on device, no host sync
            g = self.cfg.ppo

            def _rv(m):
                if "dev" in m:
                    return m["dev"][5], m["dev"][6]
                return jnp.asarray(m["rewards"]), jnp.asarray(m["old_value"])

            pairs = [_rv(m) for m in memories]
            rew_stack = jnp.stack([p[0] for p in pairs])
            val_stack = jnp.stack([p[1] for p in pairs])
            ts = [m["t"] for m in memories]
            cont = np.zeros(len(memories), np.float32)
            for i in range(len(memories) - 1):
                # memory i+1 continues i's trajectory iff it is the next
                # timestep of the SAME batch (timesteps of one batch are
                # appended consecutively)
                cont[i] = 1.0 if ts[i + 1] == ts[i] + 1 else 0.0
            adv_all, ret_all = self._gae_jit(
                rew_stack, val_stack, jnp.asarray(cont),
                g.gae_gamma, g.gae_lambda)
            gae_kw = [{"gae_adv": adv_all[i], "gae_ret": ret_all[i]}
                      for i in range(len(memories))]

        agg = None
        pending = put(memories[0]) if memories else None
        for i in range(len(memories)):
            cur, pending = pending, (put(memories[i + 1])
                                     if i + 1 < len(memories) else None)
            key, sub = jax.random.split(key)
            astate, cstate, metrics = update_step(astate, cstate, sub, *cur,
                                                  **gae_kw[i])
            agg = metrics if agg is None else jax.tree.map(
                jnp.add, agg, metrics)
        n = max(len(memories), 1)
        host = jax.device_get(agg) if agg is not None else {}
        return astate, cstate, {k: float(v) / n for k, v in host.items()}

"""Stage 2 — pairwise reward model trainer (both families).

Reference: finetune/reward_pair_dataloader.py (multimodal, hinge margin
1.0, :355-357) and finetune/reward_trad.py (tabular, margin 0.01, :273).
One jitted step runs BOTH forwards (chosen + rejected 4-index orderings)
and the update; eval is pairwise accuracy with the psum'd counters of the
reference (:395-404) collapsing into an ordinary batched mean.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from lr2ppo_tpu.config import Config
from lr2ppo_tpu.models import SeqScoreModel
from lr2ppo_tpu.ops import reward_pair_hinge_loss
from lr2ppo_tpu.train import checkpoints
from lr2ppo_tpu.train.common import (
    BestSaver, DeviceCtx, TrainState, apply_updates, burn_keys,
    init_state, peek_batch, save_train_state)
from lr2ppo_tpu.train.optim import build_optimizer
from lr2ppo_tpu.utils import MetricLogger, check_finite, init_logger


def make_train_step(model, tx, margin: float):
    # note: no `tgts` — the pairwise hinge is label-free (the labels are
    # baked into the chosen/reject index orderings by the dataset,
    # reference reward_pair_dataloader.py:127-143)
    @jax.jit
    def train_step(state: TrainState, rng, text, img, chosen, reject):
        def loss_fn(params):
            r1, r2 = jax.random.split(rng)
            cs = model.apply(params, text, img, chosen, False,
                             rngs={"dropout": r1})
            rs = model.apply(params, text, img, reject, False,
                             rngs={"dropout": r2})
            loss = reward_pair_hinge_loss(cs, rs, margin)
            acc = (cs > rs).mean()
            return loss, acc

        (loss, acc), grads = jax.value_and_grad(
            lambda p: loss_fn({"params": p}), has_aux=True)(
            state.params["params"])
        return apply_updates(state, {"params": grads}, tx), loss, acc

    return train_step


@partial(jax.jit, static_argnums=(0,))
def _eval_step(model_apply, params, text, img, chosen, reject):
    cs = model_apply(params, text, img, chosen)
    rs = model_apply(params, text, img, reject)
    return (cs > rs).astype(jnp.float32)


def evaluate_pairwise(model, params, eval_loader, put=None) -> float:
    correct, total = 0.0, 0
    for batch in eval_loader:
        # wrap-padded rows in the final batch must not be double-counted
        valid = np.asarray(batch.pop(
            "_valid", np.ones(batch["tgts"].shape[0], bool)))
        b = put(batch) if put else {k: jnp.asarray(v)
                                    for k, v in batch.items()}
        hits = _eval_step(model.apply, params, b["text"], b.get("img"),
                          b["chosen_index"], b["reject_index"])
        from lr2ppo_tpu.parallel.mesh import fetch_global

        hits = fetch_global(hits)[valid]
        correct += float(hits.sum())
        total += hits.size
    return correct / max(total, 1)


class RewardTrainer:
    def __init__(self, cfg: Config, margin: Optional[float] = None,
                 use_mesh: bool = True):
        self.cfg = cfg
        self.logger = init_logger(cfg.log_path)
        self.metrics = MetricLogger(
            cfg.log_path + ".jsonl" if cfg.log_path else None)
        dtype = jnp.dtype(cfg.mesh.compute_dtype)
        self.model = SeqScoreModel(cfg.model, dtype)
        # reference margins: 1.0 multimodal, 0.01 tabular
        self.margin = margin if margin is not None else (
            1.0 if cfg.model.family == "multimodal" else 0.01)
        self.ctx = DeviceCtx(cfg.mesh.dp, cfg.mesh.tp, enabled=use_mesh,
                             cast_dtype=cfg.mesh.compute_dtype,
                             zero1=cfg.mesh.zero1,
                             fsdp=cfg.mesh.fsdp)

    def init_params(self, sample_batch, seed: int):
        cfg = self.cfg
        if cfg.pretrained_model_path:
            params = checkpoints.load_any(cfg.pretrained_model_path)
            self.logger.info(f"loaded {cfg.pretrained_model_path}")
        else:
            b = {k: jnp.asarray(v) for k, v in sample_batch.items()}
            params = self.model.init(jax.random.PRNGKey(seed), b["text"],
                                     b.get("img"), b["chosen_index"])
        return self.ctx.place_params(params)

    def fit(self, train_loader, eval_loader,
            train_steps: Optional[int] = None):
        cfg = self.cfg
        steps_per_epoch = len(train_loader)
        total = train_steps or int(steps_per_epoch * cfg.epochs_num) + 1
        tx = self.ctx.wrap_optimizer(build_optimizer(cfg.optim, total))
        step, start_epoch, skip_batches = 0, 1, 0
        resume_best = -np.inf
        if cfg.resume_path:
            from lr2ppo_tpu.train.common import resume_fit_state

            (state, step, start_epoch, skip_batches,
             resume_best) = resume_fit_state(
                cfg, self.ctx, tx, steps_per_epoch, self.logger)
        else:
            first = peek_batch(train_loader)
            state = init_state(self.init_params(first, cfg.seed), tx)
        train_step = make_train_step(self.model, tx, self.margin)
        saver = BestSaver(cfg.output_model_path, self.logger,
                          backend=cfg.ckpt_backend)
        saver.best = max(saver.best, resume_best)
        key = jax.random.PRNGKey(cfg.seed + 1)
        # burn the TOTAL completed steps, not the in-epoch remainder:
        # the stream splits once per step across all epochs
        key = burn_keys(key, step)
        last_eval_step = -1
        for epoch in range(start_epoch, cfg.epochs_num + 1):
            train_loader.set_epoch(epoch)
            batch_iter = iter(train_loader)
            if epoch == start_epoch and skip_batches:
                from itertools import islice

                batch_iter = islice(batch_iter, skip_batches, None)
            for batch in batch_iter:
                b = self.ctx.put(batch)
                key, sub = jax.random.split(key)
                state, loss, acc = train_step(
                    state, sub, b["text"], b.get("img"),
                    b["chosen_index"], b["reject_index"])
                step += 1
                if cfg.save_state_steps and step % cfg.save_state_steps == 0:
                    save_train_state(cfg.output_model_path + ".state",
                                     state, step, saver.best,
                                     cfg.ckpt_backend)
                if step % cfg.report_steps == 0:
                    loss_v = check_finite(
                        float(loss), step,
                        checkpoint_hint=cfg.output_model_path)
                    self.logger.info(
                        f"epoch {epoch} step {step} "
                        f"loss {loss_v:.6f} acc {float(acc):.4f}")
                    val_acc = evaluate_pairwise(self.model, state.params,
                                                eval_loader, put=self.ctx.put_eval)
                    self.logger.info(f"val accuracy: {val_acc:.4f}")
                    self.metrics.log(step, loss=loss_v, acc=val_acc)
                    saver.maybe_save(val_acc, state.params)
                    last_eval_step = step
            # skip the epoch-end eval when the epoch's last step just
            # ran the identical full pass at the report cadence
            if step != last_eval_step:
                val_acc = evaluate_pairwise(self.model, state.params,
                                            eval_loader,
                                            put=self.ctx.put_eval)
                self.logger.info(
                    f"epoch {epoch} val accuracy: {val_acc:.4f}")
                saver.maybe_save(val_acc, state.params)
        # orbax_async: settle pending background saves before returning
        checkpoints.wait_for_async_saves()
        self.logger.info(f"Best Acc: {saver.best}")
        return state, saver.best

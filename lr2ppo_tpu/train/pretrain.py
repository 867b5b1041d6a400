"""Tower pretraining trainer (TPU-native replacement for the reference
tencentpretrain/trainer.py:95-178, which is dead code in the reference —
SURVEY §2.3 — but rebuilt live here).

One jitted step = grad-accumulated forward/backward + AdamW update over
the dp mesh; throughput (tokens/s) and loss/acc logged every
report_steps; step-numbered and best checkpoints (trainer.py:138-145).
Gradient accumulation runs as a lax.scan over microbatches inside the
compiled step, so accumulation costs no host round-trips.
"""

from __future__ import annotations

import time
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from lr2ppo_tpu.config import Config
from lr2ppo_tpu.towers.model import TowerConfig, TowerModel
from lr2ppo_tpu.train import checkpoints
from lr2ppo_tpu.train.common import (
    BestSaver, DeviceCtx, TrainState, apply_updates, burn_keys,
    init_state, peek_batch, save_train_state)
from lr2ppo_tpu.train.optim import build_optimizer
from lr2ppo_tpu.utils import MetricLogger, check_finite, init_logger


def _norm_target_out(out, rows: int):
    """Targets return (loss, correct, denom) for mlm/lm/bilm but
    (loss, correct) for cls/sp, and {name: tuple} for composites —
    normalize to (loss, correct, denom)."""
    if isinstance(out, dict):
        parts = [_norm_target_out(v, rows) for v in out.values()]
        return (sum(p[0] for p in parts), sum(p[1] for p in parts),
                sum(p[2] for p in parts))
    if len(out) == 2:
        return out[0], out[1], jnp.asarray(float(rows))
    return out


def form_args(form: str, mb):
    """Map a batch dict onto TowerModel.__call__ positional args for each
    processor family (the reference's per-trainer forward_propagation
    signatures, trainer.py:196-521)."""
    if form == "simple":
        return (mb["src"], mb["tgt"], mb["seg"])
    if form == "pair_sp":
        return (mb["src"], {"mlm": mb["tgt_mlm"], "sp": mb["tgt_sp"]},
                mb["seg"])
    if form == "pair_cls":
        return (mb["src"], {"mlm": mb["tgt_mlm"], "cls": mb["tgt_cls"]},
                mb["seg"])
    if form == "bilm":
        return (mb["src"], (mb["tgt_fwd"], mb["tgt_bwd"]), mb["seg"])
    if form == "seq2seq":
        return (mb["src"], mb["tgt_out"], mb["seg"], mb["tgt_in"],
                mb["tgt_seg"])
    if form == "vilt":
        return ((mb["src_text"], mb["src_image"]),
                {"mlm": mb["tgt_mlm"], "sp": mb["tgt_match"]}, mb["seg"])
    if form == "clip":
        return ((mb["src_text"], mb["src_image"]), mb["tgt"],
                (mb["seg_text"], mb["seg_image"]))
    if form == "beit":
        return ((mb["src_image"], mb["mask"]), mb["tgt"], mb["seg"])
    raise KeyError(f"unknown batch form: {form}")


def make_pretrain_step_form(model: TowerModel, tx, accum: int = 1,
                            form: str = "simple", loss_override=None):
    """Grad-accumulated train step over a dict batch whose leaves are
    (accum, micro_bs, ...) arrays; the micro-batch axis scans inside the
    compiled program. `loss_override(params, mb, mrng)` replaces the
    plain model.apply loss (the pipeline-parallel path)."""

    @partial(jax.jit, donate_argnums=(0,))
    def step(state: TrainState, rng, batch):
        def loss_fn(params, mb, mrng):
            if loss_override is not None:
                loss, correct, denom = loss_override(params, mb, mrng)
                return loss, (correct, denom)
            out = model.apply({"params": params}, *form_args(form, mb),
                              deterministic=False, rngs={"dropout": mrng})
            rows = jax.tree.leaves(mb)[0].shape[0]
            loss, correct, denom = _norm_target_out(out, rows)
            return loss, (correct, denom)

        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        rngs = jax.random.split(rng, accum)

        def micro(carry, xs):
            gsum, lsum, csum, dsum = carry
            mb, mrng = xs
            (loss, (correct, denom)), grads = grad_fn(
                state.params["params"], mb, mrng)
            gsum = jax.tree.map(jnp.add, gsum, grads)
            return (gsum, lsum + loss, csum + correct, dsum + denom), None

        zero = jax.tree.map(jnp.zeros_like, state.params["params"])
        (gsum, lsum, csum, dsum), _ = jax.lax.scan(
            micro, (zero, 0.0, 0.0, 0.0), (batch, rngs))
        grads = jax.tree.map(lambda g: g / accum, gsum)
        new_state = apply_updates(state, {"params": grads}, tx)
        metrics = {"loss": lsum / accum, "acc": csum / jnp.maximum(dsum, 1.0)}
        return new_state, metrics

    return step


def make_pretrain_step(model: TowerModel, tx, accum: int = 1):
    """Positional (src, tgt, seg) wrapper around the 'simple' form —
    the original mlm/lm/cls/vit entry point."""
    inner = make_pretrain_step_form(model, tx, accum, "simple")

    def step(state: TrainState, rng, src, tgt, seg):
        return inner(state, rng, {"src": src, "tgt": tgt, "seg": seg})

    return step


def make_pretrain_step_pp(model: TowerModel, tower_cfg, tx, accum,
                          mesh, pp: int, microbatches: int, dtype=None):
    """Pipeline-parallel pretrain step ('simple' form): the encoder
    stack runs the GPipe schedule over the mesh's pp axis
    (parallel/pipeline.py), everything else — grad-accum scan, AdamW
    update — is the ordinary step. `state.params` holds the PACKED
    layout (STACK_KEY stages)."""
    from lr2ppo_tpu.parallel.pipeline import make_pp_loss_apply

    loss_apply = make_pp_loss_apply(model, tower_cfg, mesh, pp,
                                    microbatches, dtype)

    def pp_loss(params, mb, mrng):
        return loss_apply({"params": params}, mb["src"], mb["tgt"],
                          mb["seg"], mrng, deterministic=False)

    return make_pretrain_step_form(model, tx, accum, "simple",
                                   loss_override=pp_loss)


class PretrainTrainer:
    def __init__(self, cfg: Config, tower_cfg: TowerConfig,
                 accumulation_steps: int = 1, use_mesh: bool = True,
                 form: str = "simple"):
        self.cfg = cfg
        self.tower_cfg = tower_cfg
        self.accum = max(accumulation_steps, 1)
        self.form = form
        self.logger = init_logger(cfg.log_path)
        self.metrics = MetricLogger(
            cfg.log_path + ".jsonl" if cfg.log_path else None)
        dtype = jnp.dtype(cfg.mesh.compute_dtype)
        self.model = TowerModel(tower_cfg, dtype)
        self.pp = max(cfg.mesh.pp, 1) if use_mesh else 1
        if self.pp > 1:
            from lr2ppo_tpu.parallel.pipeline import check_pp_supported

            check_pp_supported(tower_cfg, cfg.mesh)
            if form != "simple":
                raise ValueError(
                    f"--pp supports the 'simple' batch form "
                    f"(mlm/lm/cls/vit); got {form!r}")
            if jax.process_count() > 1:
                raise ValueError("--pp is single-process in v1 "
                                 "(pod assembly not wired)")
        self.pp_micro = (cfg.mesh.pp_microbatches or self.pp)
        self.ctx = DeviceCtx(cfg.mesh.dp, cfg.mesh.tp, enabled=use_mesh,
                             cast_dtype=cfg.mesh.compute_dtype,
                             zero1=cfg.mesh.zero1,
                             fsdp=cfg.mesh.fsdp, pp=self.pp)

    def _mesh_ctx(self):
        """Mesh context for traces that carry bare-PartitionSpec
        sharding constraints (TowerConfig.seq_parallel): jax requires
        `jax.set_mesh` around such traces. Null context otherwise."""
        import contextlib

        if (getattr(self.tower_cfg, "seq_parallel", False)
                and self.ctx.mesh is not None):
            return jax.set_mesh(self.ctx.mesh)
        return contextlib.nullcontext()

    def init_params(self, sample):
        if self.cfg.pretrained_model_path:
            from lr2ppo_tpu.towers import load_tower_checkpoint

            params = load_tower_checkpoint(self.cfg.pretrained_model_path)
        else:
            mb = {k: jnp.asarray(v) for k, v in sample.items()}
            with self._mesh_ctx():
                params = self.model.init(
                    jax.random.PRNGKey(self.cfg.seed),
                    *form_args(self.form, mb))
        if self.pp > 1:
            # checkpoints are UNPACKED (per-layer) on disk; pack the
            # stages host-side, then place_params routes the stack to
            # P('pp')
            from lr2ppo_tpu.parallel.pipeline import pack_pipeline_params

            params = pack_pipeline_params(
                params, self.tower_cfg.layers_num, self.pp)
        return self.ctx.place_params(params)

    def _export_tree(self, params):
        """Model-checkpoint form of `state.params`: pp runs unpack the
        stages back to the per-layer layout (host-side), so -best and
        final checkpoints stay byte-compatible with non-pp consumers and
        the torch exporter. Periodic .state saves keep the packed layout
        (resume with the same --pp)."""
        if self.pp <= 1:
            return params
        from lr2ppo_tpu.parallel.pipeline import unpack_pipeline_params

        return unpack_pipeline_params(
            jax.tree.map(np.asarray, jax.device_get(params)),
            self.tower_cfg.layers_num, self.pp)

    def _fold(self, batch):
        """(accum*micro, ...) host batch -> (accum, micro, ...) device
        arrays with the micro-batch axis sharded over dp."""
        out = {}
        for k, v in batch.items():
            if k.startswith("_"):
                continue
            v = np.asarray(v)
            v = v.reshape(self.accum, v.shape[0] // self.accum,
                          *v.shape[1:])
            if self.ctx.mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P

                sh = NamedSharding(self.ctx.mesh, P(None, "dp"))
                if jax.process_count() > 1:
                    # pod: v holds this process's micro rows (the loader's
                    # per-chunk shard slice); assemble the global
                    # (accum, micro_global, ...) batch
                    out[k] = jax.make_array_from_process_local_data(sh, v)
                else:
                    out[k] = jax.device_put(v, sh)
            else:
                out[k] = jnp.asarray(v)
        return out

    def fit(self, train_loader, total_steps: Optional[int] = None,
            save_checkpoint_steps: int = 0):
        cfg = self.cfg
        steps_per_epoch = len(train_loader)
        total = total_steps or steps_per_epoch * cfg.epochs_num
        # an explicit --total_steps is the training budget (the
        # reference trainer cycles the stream until total_steps,
        # trainer.py:95-178) — cycle extra epochs rather than silently
        # stopping at epochs_num with the schedule still mid-warmup
        epochs = cfg.epochs_num
        if total_steps:
            epochs = max(epochs, -(-total_steps // max(steps_per_epoch, 1)))
        tx = self.ctx.wrap_optimizer(build_optimizer(cfg.optim, total))
        first = peek_batch(train_loader)
        rows = next(v for k, v in first.items()
                    if not k.startswith("_")).shape[0]
        if rows % self.accum:
            raise ValueError(
                f"batch_size {rows} must be divisible by "
                f"accumulation_steps {self.accum}")
        if self.ctx.mesh is not None:
            dp = self.ctx.mesh.shape["dp"]
            # `rows` is this PROCESS's share: the global micro-batch is
            # world x larger (Loader(shard=..., shard_chunks=accum))
            global_micro = (rows // self.accum) * jax.process_count()
            if global_micro % dp:
                raise ValueError(
                    f"global micro-batch {global_micro} "
                    f"(batch_size/accumulation_steps) must be divisible "
                    f"by dp={dp}")
            if self.pp > 1:
                m = self.pp_micro
                if global_micro % m or (global_micro // m) % dp:
                    raise ValueError(
                        f"micro-batch {global_micro} must split into "
                        f"--pp_microbatches={m} pipeline microbatches "
                        f"each divisible by dp={dp}")
        step, start_epoch, skip_batches = 0, 1, 0
        resume_best = -np.inf
        if cfg.resume_path:
            from lr2ppo_tpu.train.common import resume_fit_state

            (state, step, start_epoch, skip_batches,
             resume_best) = resume_fit_state(
                cfg, self.ctx, tx, steps_per_epoch, self.logger,
                total=total)
        else:
            micro = {k: v[: v.shape[0] // self.accum]
                     for k, v in first.items() if not k.startswith("_")}
            state = init_state(self.init_params(micro), tx)
        if self.pp > 1:
            step_fn = make_pretrain_step_pp(
                self.model, self.tower_cfg, tx, self.accum,
                self.ctx.mesh, self.pp, self.pp_micro,
                jnp.dtype(cfg.mesh.compute_dtype))
        else:
            step_fn = make_pretrain_step_form(self.model, tx, self.accum,
                                              self.form)
        key = jax.random.PRNGKey(cfg.seed + 1)
        # burn the TOTAL completed steps, not the in-epoch remainder:
        # the stream splits once per step across all epochs
        key = burn_keys(key, step)

        saver = BestSaver(
            cfg.output_model_path + "-best" if cfg.output_model_path
            else "", self.logger, backend=cfg.ckpt_backend)
        saver.best = max(saver.best, resume_best)
        tokens_since, t_last = 0, time.perf_counter()
        for epoch in range(start_epoch, epochs + 1):
            train_loader.set_epoch(epoch)
            batch_iter = iter(train_loader)
            if epoch == start_epoch and skip_batches:
                from itertools import islice

                batch_iter = islice(batch_iter, skip_batches, None)
            for batch in batch_iter:
                folded = self._fold(batch)
                key, sub = jax.random.split(key)
                with self._mesh_ctx():   # sp: bare-P constraints trace
                    state, m = step_fn(state, sub, folded)
                step += 1
                tok_key = next(k for k in ("src", "src_text", "src_image")
                               if k in batch)
                tokens_since += int(np.prod(batch[tok_key].shape[:2]))
                if step % cfg.report_steps == 0:
                    loss, acc = float(m["loss"]), float(m["acc"])
                    loss = check_finite(
                        loss, step,
                        checkpoint_hint=(cfg.output_model_path + "-best"
                                         if cfg.output_model_path else None))
                    dt = time.perf_counter() - t_last
                    tps = tokens_since / max(dt, 1e-9)
                    self.logger.info(
                        f"step {step}/{total} loss {loss:.4f} "
                        f"acc {acc:.4f} | {tps:,.0f} tokens/s")
                    self.metrics.log(step, loss=loss, acc=acc, tokens_s=tps)
                    tokens_since, t_last = 0, time.perf_counter()
                    # mirror maybe_save's improvement test BEFORE the pp
                    # export — _export_tree is a full device->host fetch
                    # + unpack, far too costly to run on every report
                    # step that isn't a new best
                    if acc > saver.best:
                        saver.maybe_save(acc,
                                         self._export_tree(state.params),
                                         {"step": step, "acc": acc})
                if save_checkpoint_steps and step % save_checkpoint_steps == 0:
                    # resumable via --resume_path (same payload shape as
                    # the other trainers' .state checkpoints)
                    save_train_state(f"{cfg.output_model_path}-{step}",
                                     state, step, saver.best,
                                     cfg.ckpt_backend)
                if step >= total:
                    break
            if step >= total:
                break
        if cfg.output_model_path:
            checkpoints.save_checkpoint(cfg.output_model_path,
                                        self._export_tree(state.params),
                                        {"step": step},
                                        backend=cfg.ckpt_backend)
        # orbax_async: settle pending background saves before returning
        checkpoints.wait_for_async_saves()
        return state, saver.best

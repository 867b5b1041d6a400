"""Shared trainer plumbing: train state, device placement, save-best."""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from lr2ppo_tpu.parallel import make_mesh, put_batch, shard_params
from lr2ppo_tpu.train import checkpoints


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jax.Array


def init_state(params, tx: optax.GradientTransformation) -> TrainState:
    return TrainState(params, tx.init(params["params"]),
                      jnp.zeros([], jnp.int32))


def apply_updates(state: TrainState, grads, tx) -> TrainState:
    updates, new_opt = tx.update(grads["params"], state.opt_state,
                                 state.params["params"])
    new_params = {"params": optax.apply_updates(state.params["params"],
                                                updates)}
    return TrainState(new_params, new_opt, state.step + 1)


class DeviceCtx:
    """Mesh + placement helpers; mesh=None means default single device.

    `cast_dtype` (e.g. bfloat16): float inputs are cast on the host
    before transfer — the models compute in that dtype anyway, and
    shipping f32 embeddings doubles both HBM residency and host->device
    bytes (a (256,2,196,768) text batch is 1.2GB in f32 vs 0.6GB bf16;
    the f32 inputs alone pushed full-scale training out of memory)."""

    def __init__(self, dp: int = -1, tp: int = 1, enabled: bool = True,
                 cast_dtype=None, zero1: bool = False, fsdp: bool = False,
                 pp: int = 1):
        if pp > 1 and enabled:
            # GPipe pipeline mesh (parallel/pipeline.py): ('dp','pp')
            # axes, plus 'tp' when composed (--pp N --tp M); placement
            # routes stacked stage params to P('pp', ...megatron).
            # check_pp_supported has already rejected zero1/fsdp.
            from lr2ppo_tpu.parallel.pipeline import make_pp_mesh

            self.mesh = make_pp_mesh(dp, pp, tp=max(tp, 1))
        else:
            self.mesh = make_mesh(dp, tp) if enabled else None
        self.pp = pp if (pp > 1 and self.mesh is not None) else 1
        self.cast_dtype = (jnp.dtype(cast_dtype)
                           if cast_dtype is not None else None)
        # zero1/fsdp are meaningful only with a real dp axis to shard
        # over; fsdp implies zero1 (the moments follow the params'
        # dp-sharded layout — parallel/mesh.py:_zero_spec is the shared
        # rule for both trees)
        self.fsdp = bool(fsdp and self.mesh is not None
                         and self.mesh.shape.get("dp", 1) > 1)
        self.zero1 = bool((zero1 or self.fsdp) and self.mesh is not None
                          and self.mesh.shape.get("dp", 1) > 1)

    def _cast(self, v):
        v = np.asarray(v)
        if (self.cast_dtype is not None and v.dtype != self.cast_dtype
                and np.issubdtype(v.dtype, np.floating)):
            return v.astype(self.cast_dtype)
        return v

    def put(self, batch):
        batch = {k: self._cast(v) for k, v in batch.items()}
        if self.mesh is None:
            return {k: jnp.asarray(v) for k, v in batch.items()}
        return put_batch(batch, self.mesh)

    def put_eval(self, batch):
        """Placement for EVAL batches. Eval loaders are deterministic
        and NOT process-sharded (every rank assembles the identical full
        batch, like the reference's rank-duplicated eval); on a pod each
        rank must therefore contribute only its slice of that full copy
        or the assembled global batch would hold every row world times
        (and world-x the eval compute)."""
        batch = {k: self._cast(v) for k, v in batch.items()}
        if self.mesh is None:
            return {k: jnp.asarray(v) for k, v in batch.items()}
        import jax as _jax

        if _jax.process_count() == 1:
            return put_batch(batch, self.mesh)
        from lr2ppo_tpu.parallel.mesh import put_global

        return {k: put_global(v, self.mesh, from_full_copy=True)
                for k, v in batch.items()}

    def put_array(self, v, axis: int = 0):
        """One array -> device, batch axis over dp (no dtype cast).
        On a pod, `v` holds this process's LOCAL rows (same contract as
        put); single-device/no-mesh is a plain transfer."""
        if self.mesh is None:
            return jnp.asarray(v)
        from lr2ppo_tpu.parallel.mesh import put_global

        return put_global(np.asarray(v), self.mesh, axis=axis)

    def place_params(self, tree):
        if self.mesh is None:
            return tree
        if self.pp > 1:
            from lr2ppo_tpu.parallel.pipeline import place_pipeline_tree

            return place_pipeline_tree(tree, self.mesh)
        if self.fsdp:
            from lr2ppo_tpu.parallel import shard_params_fsdp

            return shard_params_fsdp(tree, self.mesh)
        return shard_params(tree, self.mesh)

    def place_opt(self, tree):
        """Optimizer-state placement: zero1 dp-shards the moments,
        otherwise the param rules apply (moment trees mirror the param
        paths, so the same tp specs match — and under pp the same
        STACK_KEY paths route the stacked moments to P('pp'))."""
        if self.mesh is None:
            return tree
        if self.pp > 1:
            from lr2ppo_tpu.parallel.pipeline import place_pipeline_tree

            return place_pipeline_tree(tree, self.mesh)
        if self.zero1:
            from lr2ppo_tpu.parallel import shard_opt_state

            return shard_opt_state(tree, self.mesh)
        return shard_params(tree, self.mesh)

    def wrap_optimizer(self, tx):
        """ZeRO-1 (cfg.mesh.zero1): return a tx whose state is placed
        and kept dp-sharded (parallel/mesh.py:shard_optimizer); identity
        when zero1 is off and there is no fsdp. Under fsdp the updates
        are ALSO constrained to the params' dp-sharded layout so the
        new params keep the fsdp placement through the jitted step."""
        if not self.zero1:
            return tx
        from lr2ppo_tpu.parallel import shard_optimizer

        return shard_optimizer(tx, self.mesh,
                               constrain_updates=self.fsdp)


def save_train_state(path: str, state: TrainState, step: int, best,
                     backend: str = "pickle") -> None:
    """The single-model resumable .state payload (one shape for
    pointwise/two-data/reward/pretrain; resume_fit_state reads it).
    PPO's _save_state extends it with the second TrainState and its
    rollout counters."""
    checkpoints.save_checkpoint(
        path,
        {"params": state.params, "opt_state": state.opt_state,
         "step": step, "best": best},
        {"step": step}, backend=backend)


def load_state_tree(path: str):
    """Backend-aware full-state load: pickle file or orbax directory
    (the same dispatch as checkpoints.load_any, shared here so the two
    sniffers cannot diverge)."""
    import os

    # an orbax_async save may still be committing `path` in the
    # background; settle so the resume sees the finished directory
    checkpoints.wait_for_async_saves()
    if os.path.isdir(path):             # orbax backends write directories
        return checkpoints.load_orbax_checkpoint(path)
    return checkpoints.load_checkpoint(path)


def restore_train_state(ctx: DeviceCtx, tx, params_tree, opt_tree,
                        step) -> TrainState:
    """Rebuild a TrainState from a restored host tree with production
    placement: params via the megatron sharding rules, opt_state
    re-grafted onto the native optax structure (orbax restores plain
    containers) and placed by the same rules (moment trees mirror the
    param paths; scalars replicate)."""
    params = ctx.place_params(params_tree)
    ref_struct = jax.tree.structure(
        jax.eval_shape(tx.init, params["params"]))
    if jax.tree.structure(opt_tree) != ref_struct:
        opt_tree = jax.tree.unflatten(ref_struct,
                                      jax.tree.leaves(opt_tree))
    # the +0 forces a FRESH device buffer: jax caches small constants,
    # and two states sharing one step buffer break donation ("attempt
    # to donate the same buffer twice") in steps that donate both
    step_arr = jnp.asarray(np.asarray(step, np.int32)) + 0
    return TrainState(params, ctx.place_opt(opt_tree), step_arr)


class BestSaver:
    """Save-best contract (model_saver.py:4-11, ppo.py:910-915)."""

    def __init__(self, path: str, logger=None, backend: str = "pickle"):
        self.path = path
        self.best = -np.inf
        self.logger = logger
        self.backend = backend

    def maybe_save(self, metric: float, tree, metadata: Optional[dict] = None
                   ) -> bool:
        # 'not (metric > best)': NaN from a diverged eval must never
        # overwrite the real best checkpoint ('NaN <= best' is False)
        if not (metric > self.best):
            return False
        self.best = float(metric)
        if self.path:
            checkpoints.save_checkpoint(
                self.path, tree, {**(metadata or {}), "metric": self.best},
                backend=self.backend)
        if self.logger:
            self.logger.info("Best val indicator until now!")
        return True


def resume_fit_state(cfg, ctx, tx, steps_per_epoch: int, logger=None,
                     total=None):
    """Shared --resume_path restore for the single-state trainers:
    TrainState (mesh-placed), data-stream fast-forward, and the
    best-metric watermark. Returns
    (state, step, start_epoch, skip_batches, resume_best); start_epoch
    past epochs_num (or a step past `total`) makes the epoch range
    empty — resuming a finished run is a no-op."""
    tree, meta = load_state_tree(cfg.resume_path)
    state = restore_train_state(ctx, tx, tree["params"],
                                tree["opt_state"], tree["step"])
    step = int(meta.get("step", tree["step"]))
    resume_best = float(tree.get("best", -np.inf))
    start_epoch = step // steps_per_epoch + 1
    skip_batches = step % steps_per_epoch
    if total is not None and step >= total:
        start_epoch = cfg.epochs_num + 1
    if logger is not None:
        logger.info(
            f"resumed from {cfg.resume_path} @ step {step} "
            f"(epoch {start_epoch}, skipping {skip_batches} batches)")
    return state, step, start_epoch, skip_batches, resume_best


def burn_keys(key, n: int):
    """Advance the per-step dropout key stream past `n` completed steps
    so a resumed run's keys continue exactly where an uninterrupted run
    would be (ADVICE r3: fast-forwarding data without fast-forwarding
    the key stream replayed step-1 dropout noise after every resume).

    Callers must burn the TOTAL completed step count, not the in-epoch
    remainder: the stream is split once per step continuously across
    epochs, so an epoch-boundary resume still has `steps_per_epoch`
    splits behind it. One jitted fori_loop (identical chain to n
    sequential `jax.random.split(key)[0]`) instead of n host
    dispatches — resume at step 100k would otherwise stall for minutes.
    """
    if int(n) <= 0:
        return key
    return _burn_keys_jit(key, jnp.asarray(int(n), jnp.int32))


@jax.jit
def _burn_keys_jit(key, n):
    return jax.lax.fori_loop(
        0, n, lambda i, k: jax.random.split(k)[0], key)


def peek_batch(loader):
    """First batch for shape probing / param init. Prefers the loader's
    synchronous first_batch() — abandoning a started prefetch iterator
    leaves workers racing the next iteration for the collate buffers."""
    fb = getattr(loader, "first_batch", None)
    return fb() if fb is not None else next(iter(loader))

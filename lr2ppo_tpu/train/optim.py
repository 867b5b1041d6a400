"""Optimizers and LR schedules with reference semantics.

Reference: tencentpretrain/utils/optimizers.py — AdamW (HF-style,
`correct_bias=False` => no bias correction, decoupled weight decay scaled
by the *scheduled* lr) and the str2scheduler family; grouped so that
parameters whose torch name contains 'bias'/'gamma'/'beta' get no decay
(ppo.py:381-393). In the reference's finetune models no parameter is
named gamma/beta, so ONLY biases are exempt — LayerNorm scales are
decayed; we reproduce that: decay every leaf not named 'bias'.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax


class AdamState(NamedTuple):
    count: jax.Array
    mu: optax.Updates
    nu: optax.Updates


def scale_by_adam_hf(b1: float = 0.9, b2: float = 0.999, eps: float = 1e-6,
                     correct_bias: bool = False,
                     moment_dtype=None) -> optax.GradientTransformation:
    """Adam moment scaling matching the reference step math
    (optimizers.py:375-391): denom = sqrt(v) + eps, optional bias
    correction folded into the step size.

    `moment_dtype` (e.g. bfloat16) stores m/v at reduced precision —
    a TPU HBM optimization (the 500M-param out_layer dominates state);
    the moment math still runs in fp32.
    """

    def init(params):
        def z(p):
            return jnp.zeros_like(
                p, dtype=moment_dtype or p.dtype)
        return AdamState(jnp.zeros([], jnp.int32), jax.tree.map(z, params),
                         jax.tree.map(z, params))

    def update(grads, state, params=None):
        del params
        count = state.count + 1
        mu = jax.tree.map(
            lambda m, g: (b1 * m.astype(jnp.float32)
                          + (1 - b1) * g.astype(jnp.float32)),
            state.mu, grads)
        nu = jax.tree.map(
            lambda v, g: (b2 * v.astype(jnp.float32)
                          + (1 - b2) * jnp.square(g.astype(jnp.float32))),
            state.nu, grads)
        if correct_bias:
            c = count.astype(jnp.float32)
            step_scale = jnp.sqrt(1 - b2 ** c) / (1 - b1 ** c)
        else:
            step_scale = 1.0
        upd = jax.tree.map(
            lambda m, v, g: (step_scale * m / (jnp.sqrt(v) + eps)
                             ).astype(g.dtype), mu, nu, grads)
        store = (lambda t: jax.tree.map(
            lambda x: x.astype(moment_dtype), t)) if moment_dtype else (
            lambda t: t)
        return upd, AdamState(count, store(mu), store(nu))

    return optax.GradientTransformation(init, update)


def decay_mask(params) -> optax.Params:
    """True (decay) for every leaf whose flax name is not 'bias'."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def is_decay(path):
        last = path[-1]
        name = getattr(last, "key", getattr(last, "name", str(last)))
        return name != "bias"

    mask_flat = [is_decay(p) for p, _ in flat]
    treedef = jax.tree_util.tree_structure(params)
    return jax.tree_util.tree_unflatten(treedef, mask_flat)


def make_schedule(name: str, base_lr: float, train_steps: int,
                  warmup: float) -> Callable[[jax.Array], jax.Array]:
    """str2scheduler equivalents (optimizers.py:25-300). The scheduler is
    stepped once per optimizer step, starting from factor(0)."""
    w = max(int(train_steps * warmup), 1)

    if name == "constant":
        return lambda t: jnp.asarray(base_lr)
    if name == "constant_with_warmup":
        return lambda t: base_lr * jnp.minimum(1.0, (t + 0.0) / w)
    if name == "linear":
        def sched(t):
            t = t.astype(jnp.float32) if hasattr(t, "astype") else float(t)
            warm = t / w
            decay = jnp.maximum(0.0, (train_steps - t) /
                                jnp.maximum(1.0, train_steps - w))
            return base_lr * jnp.where(t < w, warm, decay)
        return sched
    if name == "cosine":
        def sched(t):
            t = t.astype(jnp.float32) if hasattr(t, "astype") else float(t)
            warm = t / w
            prog = jnp.clip((t - w) / jnp.maximum(1.0, train_steps - w), 0, 1)
            return base_lr * jnp.where(
                t < w, warm, 0.5 * (1.0 + jnp.cos(jnp.pi * prog)))
        return sched
    if name == "inverse_sqrt":
        def sched(t):
            t = t.astype(jnp.float32) if hasattr(t, "astype") else float(t)
            warm = t / w
            return base_lr * jnp.where(t < w, warm, jnp.sqrt(w / jnp.maximum(t, 1)))
        return sched
    if name == "polynomial":
        def sched(t):
            t = t.astype(jnp.float32) if hasattr(t, "astype") else float(t)
            warm = t / w
            prog = jnp.clip((t - w) / jnp.maximum(1.0, train_steps - w), 0, 1)
            return base_lr * jnp.where(t < w, warm, (1.0 - prog))
        return sched
    if name == "cosine_with_restarts":
        # hard restarts, num_cycles=1 default (optimizers.py:182-214)
        num_cycles = 1.0

        def sched(t):
            t = t.astype(jnp.float32) if hasattr(t, "astype") else float(t)
            warm = t / w
            prog = (t - w) / jnp.maximum(1.0, train_steps - w)
            cyc = 0.5 * (1.0 + jnp.cos(jnp.pi * ((num_cycles * prog) % 1.0)))
            decay = jnp.where(prog >= 1.0, 0.0, jnp.maximum(0.0, cyc))
            return base_lr * jnp.where(t < w, warm, decay)
        return sched
    if name == "tri_stage":
        # warmup -> hold -> exponential decay to final_lr_scale
        # (optimizers.py:89-148, SpecAugment paper schedule)
        init_scale, final_scale = 0.01, 0.05
        decay_steps = max(train_steps // 4, 1)

        def sched(t):
            t = t.astype(jnp.float32) if hasattr(t, "astype") else float(t)
            warm = init_scale + (1.0 - init_scale) * t / w
            decay_factor = -jnp.log(final_scale) / decay_steps
            hold_end = train_steps - decay_steps
            decay = jnp.exp(-decay_factor * (t - hold_end))
            factor = jnp.where(
                t < w, warm,
                jnp.where(t < hold_end, 1.0,
                          jnp.where(t <= train_steps, decay, final_scale)))
            return base_lr * factor
        return sched
    raise ValueError(f"unknown scheduler: {name}")


def build_optimizer(optim_cfg, train_steps: int,
                    lr: Optional[float] = None,
                    schedule_wrap=None) -> optax.GradientTransformation:
    """AdamW/Adafactor + schedule, mirroring build_optimizer
    (ppo.py:378-419). `lr` overrides (actor vs critic learning rates);
    `schedule_wrap(sched) -> sched` remaps the step axis — PPO ticks its
    schedulers once per update SWEEP, not per optimizer step
    (ppo.py:612-613), via `lambda s: lambda t: s(t // upd)`."""
    base_lr = lr if lr is not None else optim_cfg.learning_rate
    sched = make_schedule(optim_cfg.scheduler, base_lr, train_steps,
                          optim_cfg.warmup)
    if schedule_wrap is not None:
        sched = schedule_wrap(sched)
    if optim_cfg.optimizer == "adafactor":
        return optax.adafactor(learning_rate=sched)

    moment_dtype = getattr(optim_cfg, "moment_dtype", None)
    chain = [
        scale_by_adam_hf(optim_cfg.beta1, optim_cfg.beta2, optim_cfg.adam_eps,
                         optim_cfg.correct_bias,
                         jnp.dtype(moment_dtype) if moment_dtype else None),
        optax.add_decayed_weights(optim_cfg.weight_decay, mask=decay_mask),
        optax.scale_by_learning_rate(sched),  # negates
    ]
    if optim_cfg.grad_clip:
        chain.insert(0, optax.clip_by_global_norm(optim_cfg.grad_clip))
    return optax.chain(*chain)

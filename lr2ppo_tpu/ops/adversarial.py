"""Adversarial training (reference tencentpretrain/utils/adversarial.py:
FGM and PGD embedding perturbation), re-expressed functionally.

The reference mutates `param.data` in place and restores backups; under
jit we instead produce a PERTURBED PARAM TREE from (params, grads) and
take the adversarial backward at those params — same math, no mutation:

  FGM:  p' = p + eps * g / ||g||          on embedding leaves
        total grad = grad(p) + grad(p')   (backward accumulation)
  PGD:  K steps of p' = proj_{||p'-p||<=eps}(p' + alpha * g'/||g'||),
        total grad = grad(p) + grad(p'_K)
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def _is_emb(path, emb_name: str) -> bool:
    return any(emb_name in str(getattr(p, "key", getattr(p, "name", p)))
               for p in path)


def _map_emb(fn, tree, emb_name):
    return jax.tree_util.tree_map_with_path(
        lambda path, *xs: fn(*xs) if _is_emb(path, emb_name) else xs[0],
        *tree if isinstance(tree, tuple) else (tree,))


def fgm_perturb(params, grads, epsilon: float = 1e-6,
                emb_name: str = "embedding"):
    """p + eps * g/||g|| on leaves whose path contains emb_name
    (adversarial.py:14-21); zero/NaN grad norms leave the leaf alone."""

    def bump(p, g):
        norm = jnp.linalg.norm(g)
        safe = jnp.where((norm > 0) & jnp.isfinite(norm), norm, 1.0)
        r = epsilon * g / safe
        return p + jnp.where((norm > 0) & jnp.isfinite(norm), r, 0.0)

    return _map_emb(bump, (params, grads), emb_name)


def pgd_perturb(params, ref_params, grads, epsilon: float = 1.0,
                alpha: float = 0.3, emb_name: str = "embedding"):
    """One PGD ascent step + L2 ball projection around ref_params
    (adversarial.py:42-64)."""

    def step(p, p0, g):
        norm = jnp.linalg.norm(g)
        safe = jnp.where((norm > 0) & jnp.isfinite(norm), norm, 1.0)
        p = p + jnp.where((norm > 0) & jnp.isfinite(norm),
                          alpha * g / safe, 0.0)
        r = p - p0
        rn = jnp.linalg.norm(r)
        r = jnp.where(rn > epsilon, epsilon * r / jnp.maximum(rn, 1e-12), r)
        return p0 + r

    return _map_emb(step, (params, ref_params, grads), emb_name)


def adversarial_grads(loss_fn: Callable, params, mode: str = "fgm",
                      epsilon: float = 1e-6, alpha: float = 0.3,
                      pgd_k: int = 3, emb_name: str = "embedding"):
    """Clean + adversarial gradient accumulation (the reference training
    recipe around FGM.attack/restore). Returns (clean_loss, total_grads).
    """
    grad_fn = jax.value_and_grad(loss_fn)
    loss, g_clean = grad_fn(params)
    if mode == "fgm":
        p_adv = fgm_perturb(params, g_clean, epsilon, emb_name)
        _, g_adv = grad_fn(p_adv)
    elif mode == "pgd":
        p_adv = params
        g = g_clean
        for _ in range(pgd_k):
            p_adv = pgd_perturb(p_adv, params, g, epsilon, alpha, emb_name)
            _, g = grad_fn(p_adv)
        g_adv = g
    else:
        raise ValueError(f"unknown adversarial mode: {mode}")
    total = jax.tree.map(jnp.add, g_clean, g_adv)
    return loss, total

"""Int8 weight quantization for frozen inference models.

Target: the stage-3 FROZEN reward model (reference ppo.py:780 —
`freeze_layer(reward_model)`; pure inference, ~1/3 of rollout FLOPs).
TPU v5e executes s8xs8->s32 `dot_general` on the MXU at 2x the bf16
rate (394 vs 197 peak TOPS), and int8 kernels halve the frozen model's
HBM footprint (~0.5 GB at flagship scale) — so the rollout's reward
forward gets both a FLOP-rate and a bandwidth win.

Scheme (weight-static, activation-dynamic, both symmetric):
  * kernels: per-OUTPUT-channel scale = amax(|W|, in_axis) / 127,
    quantized once at load time (`quantize_tree`);
  * activations: per-ROW scale = amax(|x|, last_axis) / 127, computed
    inside the jitted forward (a cheap fused reduction);
  * y = (s8 x) @ (s8 W) accumulated in int32, rescaled by the outer
    product of the two scales, cast back to the compute dtype.

The quantized param tree keeps the flax structure: each 2-D `kernel`
leaf becomes int8 and gains a sibling `kernel_scale` (f32, per out
channel); every other float leaf is cast to `other_dtype` (bf16). The
modules (TorchDense(int8=True)) define the matching `kernel_scale`
param so `apply` consumes the tree natively.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def quantize_kernel(w: Array):
    """(in, out) float kernel -> (int8 kernel, f32 per-out-channel scale)."""
    wf = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=0)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
    return q, scale


def int8_matmul(x: Array, kernel: Array, kernel_scale: Array,
                out_dtype=None) -> Array:
    """y = x @ kernel with dynamic per-row int8 activation quantization.

    `kernel` may be pre-quantized int8 (the production path) or float
    (init/tests) — a float kernel is quantized on the fly so the module
    works with unconverted param trees too.
    """
    out_dtype = out_dtype or x.dtype
    if kernel.dtype != jnp.int8:
        kernel, kernel_scale = quantize_kernel(kernel)
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    xscale = jnp.maximum(amax, 1e-8) / 127.0
    xq = jnp.clip(jnp.round(xf / xscale), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq, kernel, (((xq.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * xscale * kernel_scale.astype(jnp.float32)
    return y.astype(out_dtype)


def quantize_tree(params, other_dtype=jnp.bfloat16):
    """Quantize every 2-D float `kernel` leaf of a flax param tree to
    int8 (+ sibling `kernel_scale`); cast remaining float leaves (bias,
    LayerNorm, pos_emb) to `other_dtype`. Returns a tree consumable by
    the same model constructed with int8=True."""

    def walk(node):
        if not isinstance(node, dict):
            if (hasattr(node, "dtype")
                    and jnp.issubdtype(node.dtype, jnp.floating)):
                return node.astype(other_dtype)
            return node
        def quantizable(v):
            return (hasattr(v, "ndim") and v.ndim == 2
                    and jnp.issubdtype(v.dtype, jnp.floating))

        out = {}
        for k, v in node.items():
            if k == "kernel" and quantizable(v):
                q, s = quantize_kernel(v)
                out["kernel"] = q
                out["kernel_scale"] = s
            elif k == "kernel_scale" and quantizable(node.get("kernel")):
                # int8-initialized trees already carry a (ones-init)
                # kernel_scale next to the kernel: it must NOT clobber
                # the scale computed from the real weights (order-
                # independent: skip whenever the sibling kernel is being
                # quantized in this dict)
                continue
            else:
                out[k] = walk(v)
        return out

    return walk(params)

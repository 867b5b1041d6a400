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

import math

import jax
import jax.numpy as jnp

Array = jax.Array

# Size gates (measured on the v5e chip, flagship reward shapes — ledger
# in PARITY.md). Raw s8 dots win 1.2-1.7x over bf16 only when the
# matmul is MXU-compute-bound; below these the dynamic-quant overhead
# (amax + round over the activations, int32->f32 epilogue) LOSES time
# (e.g. out_fc2 M=512 K=3072 N=768: 1.51 ms bf16 vs 2.37 ms int8).
#   * kernels smaller than INT8_MIN_KERNEL_ELEMENTS stay bf16 entirely
#     (qkv 768x768, heads): their HBM footprint is negligible and the
#     dot never reaches the compute-bound regime;
#   * quantized kernels still SHIP int8 (halved HBM) everywhere, but a
#     call site takes the s8 dot only when it is wide enough on BOTH
#     axes to amortize the activation-quant pass: measured at flagship
#     M=100352, the 768->3072 fc1 wins 1.31x while the 3072->768 fc2
#     LOSES 0.82x (XLA fuses the quant+rescale into the fc1 program but
#     not fc2's; the raw s8 dot alone wins 1.5x at both). Narrow or
#     small call sites dequantize to bf16 and take the plain MXU dot —
#     a ~10 us pass against the ~1 ms the s8 path would lose.
# Tests monkeypatch these to 0 to force full quantization on tiny
# models.
INT8_MIN_KERNEL_ELEMENTS = 2 * 1024 * 1024
INT8_DYNQUANT_MIN_FLOPS = 50e9
INT8_DYNQUANT_MIN_WIDTH = 1024

# Route narrow compute-bound sites through the fused Pallas kernel
# (ops/pallas_int8_matmul.py). Default OFF by measurement: the kernel
# wins in isolation at flagship fc2 (2.35 ms vs 3.41 bf16, 1.45x) but
# LOSES in the full rollout program (974.4 vs 1000.7 samples/s control;
# dequant+bf16 routing measures 1019.7) — the pallas_call boundary
# forces the gelu(fc1) intermediate (~600 MB at M=100352 K=3072 bf16)
# to materialize through HBM, where XLA instead fuses the elementwise
# producer into the bf16 matmul's operand read. Same in-isolation-wins/
# in-context-loses shape as ops/pallas_attention.py. The kernel stays
# correct + tested for memory-rich or pre-materialized call sites.
PALLAS_NARROW_SITES = False

# Route the whole deterministic int8 FFN (fc1+gelu+fc2) through the
# fully-fused Pallas kernel (ops/pallas_int8_mlp.py) — the follow-up the
# ledger above calls for: fusing BOTH dots and the gelu epilogue into
# one pallas_call keeps the (M, 4D) intermediate in VMEM, so the HBM
# round-trip that sank the lone narrow-site kernel never happens, and
# both dots run at the s8 MXU rate. Consumed by models.layers.Mlp/XiT.
# None = AUTO: on for single-device processes only — a pallas_call
# inside a multi-device SPMD jit has no partitioning rule, so XLA would
# replicate its operands (all-gathering the dp-sharded activations and
# the tp-sharded kernels); the unfused XLA path partitions cleanly and
# stays the pod routing. True/False force it (tests, A/B studies).
PALLAS_FUSED_FFN = None


def fused_ffn_enabled() -> bool:
    if PALLAS_FUSED_FFN is not None:
        return PALLAS_FUSED_FFN
    return jax.device_count() == 1


def should_quantize(shape) -> bool:
    """True when a 2-D kernel of this shape is worth storing as int8."""
    return (len(shape) == 2
            and shape[0] * shape[1] >= INT8_MIN_KERNEL_ELEMENTS)


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
    rows = math.prod(x.shape[:-1])
    compute_bound = (2 * rows * kernel.shape[0] * kernel.shape[1]
                     >= INT8_DYNQUANT_MIN_FLOPS)
    narrow = kernel.shape[1] < INT8_DYNQUANT_MIN_WIDTH
    if compute_bound and narrow and PALLAS_NARROW_SITES:
        # narrow-output compute-bound site (fc2-style): XLA fails to
        # fuse the activation-quant pass here (4.33 ms vs 3.41 ms bf16
        # at flagship fc2) and the fused Pallas kernel keeps the raw
        # s8 MXU win in isolation (2.35 ms, 1.45x over bf16) — but see
        # PALLAS_NARROW_SITES above for why this routing defaults off
        # in the full program; bit-identical numerics either way
        # (tests/test_int8.py)
        from lr2ppo_tpu.ops.pallas_int8_matmul import (
            pallas_int8_matmul, supported)

        if supported(x.shape, kernel.shape):
            return pallas_int8_matmul(
                x, kernel, kernel_scale, out_dtype,
                interpret=jax.devices()[0].platform != "tpu")
    if not compute_bound or narrow:
        # not compute-bound at this call site (or too narrow for XLA to
        # fuse the quant pass profitably, and no Pallas-supported
        # shape): dequantize (a ~10 us pass over the kernel) and take
        # the plain bf16 MXU dot — the int8 storage still halves the
        # frozen model's HBM
        w = (kernel.astype(jnp.float32)
             * kernel_scale.astype(jnp.float32)).astype(out_dtype)
        return jnp.dot(x.astype(out_dtype), w,
                       preferred_element_type=out_dtype)
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
                    and jnp.issubdtype(v.dtype, jnp.floating)
                    and should_quantize(v.shape))

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
            elif (k == "kernel_scale" and hasattr(node.get("kernel"), "dtype")
                  and node["kernel"].dtype == jnp.int8):
                # already-quantized node: pass the f32 scale through
                # untouched so quantize_tree is idempotent (the default
                # branch would downcast it to bf16, degrading every
                # int8 matmul's rescale by up to ~0.4%)
                out[k] = v
            else:
                out[k] = walk(v)
        return out

    return walk(params)

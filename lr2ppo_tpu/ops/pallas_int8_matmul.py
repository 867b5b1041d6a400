"""Fused dynamic-quant int8 matmul Pallas kernel for NARROW outputs.

Motivation (measured on the v5e chip, flagship reward shapes — see
ops/int8.py for the gate ledger): XLA fuses the per-row activation
quantization into WIDE s8 matmuls perfectly (768->3072 fc1: full int8
path 3.23 ms == 3.22 ms raw s8 dot, 1.31x over bf16), but NOT into
narrow ones (3072->768 fc2 at M=100352: full path 4.74 ms vs 2.54 ms
raw s8 dot vs 3.88 ms bf16) — the quant pass over the (M, K)
activations materializes through HBM and the int8 win inverts into a
0.82x LOSS. This kernel fuses quantize -> s8xs8->s32 MXU dot -> rescale
in one VMEM pass so fc2-style sites keep the raw-dot win.

In-context ledger (why ops/int8.py:PALLAS_NARROW_SITES defaults off):
inside the full rollout program the routing measures 974.4 samples/s vs
1000.7 control and 1019.7 for dequant+bf16 routing — the pallas_call
boundary forces the gelu(fc1) producer (~600 MB bf16 at flagship M) to
materialize through HBM, which XLA otherwise fuses into the bf16 dot's
operand read. The isolated win is real and reproducible; use this kernel where the
activation input is already materialized, or fuse the producer into the
kernel itself (a full fused-MLP kernel — future work).

Design:
  * grid over M blocks only; the full (K, N) int8 kernel + (N,) scale
    stay VMEM-resident across the grid (narrow targets: 3072x768 int8 =
    2.25 MiB, well under the ~16 MiB VMEM);
  * per block: load (BM, K) activations, per-row amax -> scale,
    round/clip to int8 (VPU), one (BM,K)x(K,N) MXU dot with int32
    accumulation, epilogue out = acc * xscale * wscale cast to the
    compute dtype — the int32 accumulator never touches HBM;
  * numerics match ops/int8.py:int8_matmul bit-for-bit (same scale
    formula, same jnp.round/clip), pinned by tests/test_int8.py.

Reference anchor: the frozen stage-3 reward model
(/root/reference/finetune/ppo.py:780) is the production consumer via
`--reward_int8`.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

# max VMEM the resident weight may take; above this the caller should
# fall back to the unfused XLA path (wide shapes are fused fine there)
_MAX_WEIGHT_VMEM = 6 * 1024 * 1024
_BM = 512                       # rows per grid step (mult of 32 for s8 tiles)


def _kernel(x_ref, w_ref, ws_ref, out_ref, *, out_dtype):
    xf = x_ref[:].astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    # divide, not multiply-by-reciprocal: the last-bit difference flips
    # round-ties a full quant step away from ops/int8.py's result
    xscale = jnp.maximum(amax, 1e-8) / 127.0
    xq = jnp.clip(jnp.round(xf / xscale), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq, w_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * xscale * ws_ref[:].astype(jnp.float32)
    out_ref[:] = y.astype(out_dtype)


def supported(x_shape, w_shape) -> bool:
    """Shapes this kernel handles profitably and within VMEM."""
    k, n = w_shape
    rows = math.prod(x_shape[:-1])
    return (x_shape[-1] == k
            and k % 128 == 0 and n % 128 == 0
            and k * n <= _MAX_WEIGHT_VMEM
            and rows >= _BM)


@functools.partial(jax.jit, static_argnames=("out_dtype", "interpret"))
def pallas_int8_matmul(x: Array, kernel: Array, kernel_scale: Array,
                       out_dtype=jnp.bfloat16,
                       interpret: bool = False) -> Array:
    """y = x @ kernel with fused per-row dynamic int8 quantization.

    `kernel` must be pre-quantized int8 (K, N) with per-out-channel
    f32 `kernel_scale` (N,); `x` is any float (..., K). Returns
    (..., N) in `out_dtype`.
    """
    *lead, k = x.shape
    n = kernel.shape[1]
    rows = math.prod(lead)
    x2 = x.reshape(rows, k)
    grid = (pl.cdiv(rows, _BM),)
    out = pl.pallas_call(
        functools.partial(_kernel, out_dtype=jnp.dtype(out_dtype)),
        grid=grid,
        in_specs=[
            pl.BlockSpec((_BM, k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, n), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_BM, n), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, n), jnp.dtype(out_dtype)),
        cost_estimate=pl.CostEstimate(
            flops=2 * rows * k * n,
            bytes_accessed=rows * k * x.dtype.itemsize + k * n
            + rows * n * jnp.dtype(out_dtype).itemsize,
            transcendentals=0),
        interpret=interpret,
    )(x2, kernel, kernel_scale.reshape(1, n))
    return out.reshape(*lead, n)

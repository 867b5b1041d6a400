"""Fully-fused int8 MLP Pallas kernel: quant -> s8 fc1 -> gelu -> quant
-> s8 fc2 in one VMEM pass.

This is the "fuse the producer into the kernel itself" follow-up the
narrow-site study called for (ops/pallas_int8_matmul.py): a lone Pallas
fc2 kernel wins in isolation but loses in context because the
pallas_call boundary forces the gelu(fc1) intermediate (~600 MB bf16 at
flagship M=100352) to materialize through HBM. Fusing the WHOLE
FFN — both matmuls, the bias/gelu epilogue, and both dynamic
activation-quant passes — keeps that intermediate in VMEM entirely:
nothing but x (M, D) and out (M, D) ever touches HBM, and both dots run
at the s8 MXU rate (2x bf16 on v5e).

Scope: the transformer FFN of frozen int8 models (the stage-3 reward
under --reward_int8, rollout actor/critic under --rollout_int8) in the
deterministic path — dropout between fc1 and fc2 is inactive there, so
fusing across it is exact. Forward-only by design: int8 models are
no-grad (reference anchor: the frozen reward at
/root/reference/finetune/ppo.py:780).

Numerics: matches the unfused gated path (ops/int8.py) up to round-tie
flips of the SECOND quantization — the two paths' stage-1 outputs
differ by ~1 ulp (different f32 op scheduling), and an element sitting
exactly on an int8 rounding boundary then flips one quant step (~0.2%
of elements, each bounded by one quant step through a w2 row; same
class of noise as dynamic quantization itself). The kernel reproduces
the unfused path's intermediate rounding by casting gelu(fc1) through
`out_dtype` before the second quant pass. Pinned against the unfused
composition in tests/test_int8.py.

Design:
  * grid over M blocks only (BM=256 rows); both int8 kernels + scales +
    biases stay VMEM-resident across the grid (flagship FFN: 768x3072 +
    3072x768 int8 = 4.5 MiB, comfortably under ~16 MiB VMEM with the
    (BM, 4D) f32 intermediate at 3 MiB);
  * per block: per-row amax -> int8 quant (VPU), s8xs8->s32 MXU dot,
    f32 epilogue (rescale + bias + exact erf gelu), second per-row
    quant, second s8 dot, rescale + bias, cast to out_dtype. The s32
    accumulators and the gelu intermediate never leave VMEM.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_BM = 256                       # rows per grid step
# combined int8 weight bytes allowed to sit VMEM-resident; the flagship
# FFN pair is 4.5 MiB, the fusion out_layer (162816x3072) is 500 MB and
# must take the unfused path
_MAX_WEIGHT_VMEM = 6 * 1024 * 1024


# Mosaic's TC lowering has no erf/erfc primitive (jax.nn.gelu
# approximate=False lowers through erfc and fails to compile), so the
# kernel carries XLA's own f32 erf: the rational polynomial
# approximation XLA emits for erf(f32) (x * P(x^2)/Q(x^2), x clamped to
# [-4, 4]; openxla math.cc ErfImpl32) — matching what the unfused path
# computes to within ~2 ulp. Validated against lax.erf in
# tests/test_int8.py.
_ERF_ALPHA = (-2.72614225801306e-10, 2.77068142495902e-08,
              -2.10102402082508e-06, -5.69250639462346e-05,
              -7.34990630326855e-04, -2.95459980854025e-03,
              -1.60960333262415e-02)
_ERF_BETA = (-1.45660718464996e-05, -2.13374055278905e-04,
             -1.68282697438203e-03, -7.37332916720468e-03,
             -1.42647390514189e-02)


def _poly(coefs, x):
    acc = jnp.full_like(x, coefs[0])
    for c in coefs[1:]:
        acc = acc * x + c
    return acc


def _erf_f32(x):
    x = jnp.clip(x, -4.0, 4.0)
    x2 = x * x
    return x * _poly(_ERF_ALPHA, x2) / _poly(_ERF_BETA, x2)


def _gelu_exact(x):
    """0.5 * x * (1 + erf(x / sqrt(2))) in f32, Mosaic-lowerable."""
    return 0.5 * x * (1.0 + _erf_f32(x * (1.0 / math.sqrt(2.0))))


def _quant_rows(xf):
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    # divide (not multiply-by-reciprocal): amax/127 differs from
    # amax*(1/127) in the last bit, which flips round-ties a full quant
    # step away from ops/int8.py's result
    xscale = jnp.maximum(amax, 1e-8) / 127.0
    xq = jnp.clip(jnp.round(xf / xscale), -127, 127).astype(jnp.int8)
    return xq, xscale


def _kernel(x_ref, w1_ref, s1_ref, b1_ref, w2_ref, s2_ref, b2_ref,
            out_ref, *, out_dtype):
    xq, xs = _quant_rows(x_ref[:].astype(jnp.float32))
    acc1 = jax.lax.dot_general(
        xq, w1_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    h = (acc1.astype(jnp.float32) * xs * s1_ref[:].astype(jnp.float32)
         + b1_ref[:].astype(jnp.float32))
    h = _gelu_exact(h)
    # reproduce the unfused path's rounding: gelu(fc1) materializes in
    # the compute dtype there before fc2's quant pass reads it
    h = h.astype(out_dtype).astype(jnp.float32)
    hq, hs = _quant_rows(h)
    acc2 = jax.lax.dot_general(
        hq, w2_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    y = (acc2.astype(jnp.float32) * hs * s2_ref[:].astype(jnp.float32)
         + b2_ref[:].astype(jnp.float32))
    out_ref[:] = y.astype(out_dtype)


def supported(x_shape, w1_shape, w2_shape) -> bool:
    """Shapes the fused kernel handles profitably and within VMEM."""
    d, hdn = w1_shape
    rows = math.prod(x_shape[:-1])
    return (x_shape[-1] == d
            and w2_shape == (hdn, d)
            and d % 128 == 0 and hdn % 128 == 0
            and 2 * d * hdn <= _MAX_WEIGHT_VMEM
            and rows >= _BM)


@functools.partial(jax.jit,
                   static_argnames=("out_dtype", "interpret"))
def pallas_int8_mlp(x: Array, w1: Array, s1: Array, b1: Array,
                    w2: Array, s2: Array, b2: Array,
                    out_dtype=jnp.bfloat16,
                    interpret: bool = False) -> Array:
    """y = gelu(x @ w1 * s1 + b1) @ w2 * s2 + b2, with fused per-row
    dynamic int8 quantization before each dot.

    `w1` (D, H) and `w2` (H, D) must be pre-quantized int8 with
    per-out-channel f32 scales `s1` (H,) / `s2` (D,); `b1`/`b2` are the
    float biases; `x` is any float (..., D). Returns (..., D) in
    `out_dtype`.
    """
    *lead, d = x.shape
    hdn = w1.shape[1]
    rows = math.prod(lead)
    x2 = x.reshape(rows, d)
    grid = (pl.cdiv(rows, _BM),)
    out = pl.pallas_call(
        functools.partial(_kernel, out_dtype=jnp.dtype(out_dtype)),
        grid=grid,
        in_specs=[
            pl.BlockSpec((_BM, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, hdn), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hdn), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hdn), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hdn, d), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_BM, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, d), jnp.dtype(out_dtype)),
        cost_estimate=pl.CostEstimate(
            flops=2 * rows * d * hdn * 2,
            bytes_accessed=(rows * d * (x.dtype.itemsize
                                        + jnp.dtype(out_dtype).itemsize)
                            + 2 * d * hdn),
            transcendentals=rows * hdn),
        interpret=interpret,
    )(x2, w1, s1.reshape(1, hdn), b1.reshape(1, hdn),
      w2, s2.reshape(1, d), b2.reshape(1, d))
    return out.reshape(*lead, d)

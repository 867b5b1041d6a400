"""Pallas TPU dropout kernel.

Why a kernel: measured on the flagship PPO update step, threefry mask
generation for the (B, T, 196, 3072) FFN dropout costs ~25% of step time
and its u32/f32 temporaries are 1.15GB each at batch 256 (they OOM'd a
standalone forward). This kernel draws bits from the TPU hardware PRNG
(`pltpu.prng_seed` / `prng_random_bits`) inside VMEM and never
materializes a mask in HBM; the backward pass REGENERATES the same mask
from the same per-block seed instead of saving it (recompute-over-store,
the standard TPU trade).

Semantics match flax nn.Dropout: keep with probability (1-rate), scale
kept values by 1/(1-rate).

Measured trade-off on a 16GB v5e at the flagship PPO step: the opaque
pallas_call boundary forces the surrounding gelu/FFN activations to
materialize in HBM (XLA can no longer fuse or remat through it), which
costs MORE memory than the threefry masks it avoids — bs=256 OOMs with
the kernel (even gated to the single 308M-element site) but fits with
threefry, and threefry@256 (762 samples/s) beats kernel@128 (732). Hence
ModelConfig.pallas_dropout defaults to False; the kernel pays off when
HBM is not the binding constraint (larger chips, smaller models).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# rows per grid step; cols are processed whole (feature dims here are
# 768/3072 — a (256, 3072) f32 block is 3MB of VMEM)
_BLOCK_ROWS = 256


def _dropout_kernel(seed_ref, x_ref, out_ref, *, rate: float):
    # distinct stream per grid step, deterministic in (seed, step)
    pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
    # prng_random_bits yields int32 — bitcast before the unsigned compare
    bits = pltpu.bitcast(pltpu.prng_random_bits(x_ref.shape), jnp.uint32)
    keep_threshold = jnp.uint32((1.0 - rate) * 0xFFFFFFFF)
    keep = bits <= keep_threshold
    scale = 1.0 / (1.0 - rate)
    out_ref[:] = jnp.where(keep, x_ref[:] * scale, 0.0).astype(out_ref.dtype)


def _run(x2d: jax.Array, seed: jax.Array, rate: float,
         interpret: bool) -> jax.Array:
    rows, cols = x2d.shape
    grid = pl.cdiv(rows, _BLOCK_ROWS)
    return pl.pallas_call(
        functools.partial(_dropout_kernel, rate=rate),
        out_shape=jax.ShapeDtypeStruct(x2d.shape, x2d.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(grid,),
            in_specs=[pl.BlockSpec((_BLOCK_ROWS, cols), lambda i, s: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((_BLOCK_ROWS, cols), lambda i, s: (i, 0),
                                   memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(seed.reshape(1).astype(jnp.int32), x2d)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def tpu_dropout(x: jax.Array, seed: jax.Array, rate: float,
                interpret: bool = False) -> jax.Array:
    """Dropout via the TPU hardware PRNG. `seed` is an int32 scalar (fold
    a PRNG key with seed_from_key); `rate` in [0, 1)."""
    if rate <= 0.0:
        return x
    shape = x.shape
    x2d = x.reshape(-1, shape[-1])
    return _run(x2d, seed, rate, interpret).reshape(shape)


def _fwd(x, seed, rate, interpret):
    return tpu_dropout(x, seed, rate, interpret), seed


def _bwd(rate, interpret, seed, g):
    # same seed -> same bits -> same mask; applying the kernel to the
    # cotangent IS multiplying by mask/(1-rate)
    if rate <= 0.0:
        return g, None
    shape = g.shape
    g2d = g.reshape(-1, shape[-1])
    return _run(g2d, seed, rate, interpret).reshape(shape), None


tpu_dropout.defvjp(_fwd, _bwd)


def seed_from_key(key: jax.Array) -> jax.Array:
    """PRNG key -> int32 scalar seed (one tiny threefry draw)."""
    return jax.random.randint(key, (), minval=jnp.iinfo(jnp.int32).min,
                              maxval=jnp.iinfo(jnp.int32).max,
                              dtype=jnp.int32)

"""Zero-residual hash dropout: murmur-mixed iota instead of threefry,
with a custom_vjp that REGENERATES the mask in the backward from a
scalar seed — no mask, no RNG temporaries, nothing saved.

Why this exists (the round-1/2 dropout ledger, all measured at the
flagship PPO update step, bs=256 on a 16GB v5e):

  * threefry (`jax.random.bernoulli`): ~27 ms of mask generation per
    72 ms model fwd+bwd, plus the stored masks travel HBM;
  * pallas hardware-PRNG kernel (ops/pallas_dropout.py): kills the RNG
    cost but its opaque call boundary stops XLA fusing/rematting the
    surrounding FFN — bs=256 OOMs;
  * packed-bits threefry (ops/fast_dropout.py): 4x cheaper RNG but the
    jax.checkpoint wrapper pins the gelu inputs as residuals — OOMs
    alone, and with trunk remat the recompute costs more than it saves.

This kernel-free variant removes BOTH costs at once and cannot OOM:

  * mask bits come from the murmur3 finalizer applied to
    (flat position ^ seed*golden) — ~6 integer VPU ops per element vs
    threefry's ~100+, and it fuses into the surrounding elementwise
    graph (iota never touches HBM);
  * dropout is linear in x, so the backward is the SAME masked scaling
    applied to the cotangent; the custom_vjp saves only the uint32 seed
    and re-mixes the iota — residuals are one scalar, so enabling it
    FREES the ~1GB of bool masks threefry keeps live across the step.

Keep probability uses the full 32 hash bits (no 1/256 quantization like
fast_dropout). The murmur3 fmix32 finalizer is a bijection with full
avalanche: marginal keep probability is exact to 2^-32 and pairwise
position correlations are O(2^-32); per-site/per-step independence comes
from the flax "dropout" RNG key folded into the seed. The stream differs
from canonical jax threefry — exposed as ModelConfig.hash_dropout.

Measured (flagship PPO step, bs=256, v5e): update 247.7 -> 167.6 ms,
statistically identical to running with dropout DISABLED (166.8 ms) —
the full 81 ms threefry + mask cost (24% of the step) disappears.
bench.py: 748 -> 975 samples/s (5.07x the 4-GPU reference baseline).
bench.py enables it by default; ModelConfig default stays False so the
canonical-threefry stream remains the trainers' default RNG.

Tower pretraining (TowerConfig.hash_dropout / `pretrain --hash_dropout`,
bert-base MLM geometry, bs=256 seq=128, bf16, v5e): 319 -> 233 ms/step
= 802 -> 1100 samples/s (1.37x) — the dropout share is even larger at
encoder scale than in the fusion models.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

_GOLDEN = np.uint32(0x9E3779B9)
_M1 = np.uint32(0x85EBCA6B)
_M2 = np.uint32(0xC2B2AE35)


def _fmix32(h: jax.Array) -> jax.Array:
    """murmur3 finalizer: full-avalanche bijection on uint32."""
    h = h ^ (h >> 16)
    h = h * _M1
    h = h ^ (h >> 13)
    h = h * _M2
    h = h ^ (h >> 16)
    return h


def _threshold(rate: float) -> np.uint32:
    # keep iff hash < threshold; exact at 32-bit granularity
    t = int(round((1.0 - rate) * 4294967296.0))
    return np.uint32(min(t, 4294967295))


def _apply(x: jax.Array, seed: jax.Array, rate: float) -> jax.Array:
    thr = _threshold(rate)
    keep_eff = float(thr) / 4294967296.0
    idx = jax.lax.iota(jnp.uint32, x.size)
    h = _fmix32(idx ^ (seed.astype(jnp.uint32) * _GOLDEN))
    keep = (h < thr).reshape(x.shape)
    scale = np.asarray(1.0 / keep_eff, dtype=x.dtype)
    return jnp.where(keep, x * scale, np.zeros((), x.dtype))


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def hash_dropout(x: jax.Array, seed: jax.Array, rate: float) -> jax.Array:
    """nn.Dropout semantics; `seed` a uint32/int32 scalar (use
    seed_from_key on a PRNG key), `rate` a static float in [0, 1)."""
    return _apply(x, seed, rate)


def _fwd(x, seed, rate):
    return _apply(x, seed, rate), seed


def _bwd(rate, seed, g):
    # dropout is linear: cotangent gets the identical mask+scale. The
    # seed cotangent is float0 (integer primal).
    return (_apply(g, seed, rate),
            np.zeros(np.shape(seed), dtype=jax.dtypes.float0))


hash_dropout.defvjp(_fwd, _bwd)


def module_dropout(module, x: jax.Array, rate: float, deterministic: bool,
                   use_hash: bool, use_fast: bool = False,
                   use_pallas: bool = False,
                   pallas_min_elements: int = 128 * 1024 * 1024
                   ) -> jax.Array:
    """THE dropout site for flax modules — every backend dispatch lives
    here so a backend fix reaches all callers (towers and the fusion
    models alike). Precedence: hash (zero-residual murmur) > fast
    (packed bits) > pallas (hardware PRNG, size-gated) > canonical
    nn.Dropout (threefry). Call from inside @nn.compact with the
    defining module as `module`."""
    if deterministic or rate == 0.0:
        return x
    if use_hash:
        from lr2ppo_tpu.ops.pallas_dropout import seed_from_key

        return hash_dropout(x, seed_from_key(module.make_rng("dropout")),
                            rate)
    if use_fast:
        from lr2ppo_tpu.ops.fast_dropout import packed_dropout

        return packed_dropout(x, module.make_rng("dropout"), rate)
    if use_pallas and x.size >= pallas_min_elements:
        from lr2ppo_tpu.ops.pallas_dropout import seed_from_key, tpu_dropout

        return tpu_dropout(x, seed_from_key(module.make_rng("dropout")),
                           rate)
    from flax import linen as nn

    return nn.Dropout(rate)(x, deterministic=False)

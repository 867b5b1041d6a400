"""Packed-bits dropout: 4 masks per threefry uint32, pure jnp.

Measured at the flagship PPO geometry, threefry mask generation adds
~27 ms to each 72 ms fwd+bwd (bs=256): jax.random.bernoulli burns a full
uint32 of randomness per element. Dropout only needs enough bits to
compare against the keep-probability, so this draws one uint32 per FOUR
elements and compares each byte — 4x less threefry work, and unlike the
pallas kernel (ops/pallas_dropout.py) it stays inside XLA fusion, so it
costs no extra HBM.

Trade-off: the keep probability quantizes to 1/256 steps (rate 0.1 ->
effective 0.1016). Statistically immaterial for regularization; exposed
as ModelConfig.fast_dropout (off by default for bit-faithful RNG).

Hardware results at the flagship PPO step (bs=256, v5e): alone it OOMs
— jax.checkpoint around the mask keeps the gelu inputs as residuals and
still lands 1GB over; combined with trunk remat it fits but the trunk
recompute costs more than the RNG saves (629 samples/s vs 762 for plain
threefry). Use it when remat is already required for other reasons.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def _packed_dropout_impl(x: jax.Array, key: jax.Array,
                         rate: float) -> jax.Array:
    n = x.size
    n_words = -(-n // 4)
    bits = jax.random.bits(key, (n_words,), jnp.uint32)
    # unpack 4 bytes per word -> (n_words, 4) uint32 in [0, 255]
    shifts = jnp.asarray([0, 8, 16, 24], jnp.uint32)
    bytes_ = (bits[:, None] >> shifts[None, :]) & jnp.uint32(0xFF)
    threshold = np.uint32(int(round((1.0 - rate) * 256.0)))  # keep if <
    keep = (bytes_ < threshold).reshape(-1)[:n].reshape(x.shape)
    eff_keep = float(threshold) / 256.0
    return jnp.where(keep, x / eff_keep, 0.0).astype(x.dtype)


# checkpoint: regenerate the mask in the backward instead of saving the
# (B,T,196,3072) bool masks as residuals — without this, XLA keeps ~2GB
# of masks live across the update step and bs=256 OOMs
_packed_dropout_remat = jax.checkpoint(
    _packed_dropout_impl, static_argnums=(2,),
    policy=jax.checkpoint_policies.nothing_saveable)


def packed_dropout(x: jax.Array, key: jax.Array, rate: float) -> jax.Array:
    """nn.Dropout semantics with byte-granular keep probability."""
    if rate <= 0.0:
        return x
    return _packed_dropout_remat(x, key, rate)

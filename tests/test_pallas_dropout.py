"""Pallas dropout kernel.

The TPU interpreter on CPU models the kernel's dataflow but its PRNG
returns constant bits (everything kept) — so CPU tests cover shapes,
scaling, the rate-0 fast path, and the custom-VJP plumbing; the
statistical semantics (zero fraction, determinism in seed, backward mask
identity) require the hardware PRNG and only run on a real TPU. They
were hardware-verified (rate 0.1 -> zero-frac 0.0997, 0.5 -> 0.5006,
deterministic, bwd==fwd mask)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from lr2ppo_tpu.ops.pallas_dropout import seed_from_key, tpu_dropout

ON_TPU = jax.devices()[0].platform == "tpu"
INTERP = pltpu.InterpretParams()


def test_rate_zero_is_identity():
    x = jnp.ones((8, 128))
    out = tpu_dropout(x, jnp.int32(3), 0.0, interpret=INTERP)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x))


def test_shapes_and_scaling_interpreted():
    # interpreter PRNG keeps everything -> pure 1/(1-rate) scaling
    x = jnp.asarray(np.random.RandomState(0).randn(300, 3, 128),
                    jnp.float32)
    out = tpu_dropout(x, jnp.int32(42), 0.3, interpret=INTERP)
    assert out.shape == x.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(x) / 0.7,
                               rtol=1e-5)


def test_custom_vjp_pipeline_interpreted():
    x = jnp.ones((256, 128), jnp.float32)
    g = jax.grad(lambda x: jnp.sum(
        tpu_dropout(x, jnp.int32(7), 0.5, interpret=INTERP) ** 2))(x)
    # all-keep interpreter masks: d/dx (x/keep)^2 = 2x/keep^2
    np.testing.assert_allclose(np.asarray(g), 2.0 / 0.25, rtol=1e-5)


def test_seed_from_key_scalar():
    s = seed_from_key(jax.random.PRNGKey(0))
    assert s.shape == () and s.dtype == jnp.int32


@pytest.mark.skipif(not ON_TPU, reason="hardware PRNG required")
def test_statistics_on_tpu():
    x = jnp.ones((512, 3072), jnp.float32)
    out = np.asarray(tpu_dropout(x, jnp.int32(42), 0.3))
    zero_frac = (out == 0).mean()
    assert 0.25 < zero_frac < 0.35
    kept = out[out != 0]
    np.testing.assert_allclose(kept, 1.0 / 0.7, rtol=1e-6)


@pytest.mark.skipif(not ON_TPU, reason="hardware PRNG required")
def test_deterministic_and_backward_on_tpu():
    x = jnp.asarray(np.random.RandomState(1).randn(512, 3072), jnp.float32)
    a = np.asarray(tpu_dropout(x, jnp.int32(7), 0.5))
    b = np.asarray(tpu_dropout(x, jnp.int32(7), 0.5))
    np.testing.assert_array_equal(a, b)
    g = jax.grad(lambda x: jnp.sum(tpu_dropout(x, jnp.int32(7), 0.5) ** 2))(x)
    np.testing.assert_allclose(np.asarray(g), 2 * a / 0.5, rtol=1e-5)

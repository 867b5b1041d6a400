"""Packed-bits dropout: statistics, scaling, determinism, gradients."""

import pytest
import numpy as np

import jax
import jax.numpy as jnp

from lr2ppo_tpu.ops.fast_dropout import packed_dropout


def test_statistics_and_scaling():
    x = jnp.ones((512, 512), jnp.float32)
    out = np.asarray(packed_dropout(x, jax.random.PRNGKey(0), 0.3))
    zero_frac = (out == 0).mean()
    # effective rate quantized to byte granularity: 1 - 179/256 = 0.3008
    assert 0.27 < zero_frac < 0.33
    kept = out[out != 0]
    np.testing.assert_allclose(kept, 256.0 / 179.0, rtol=1e-6)
    assert abs(out.mean() - 1.0) < 0.02     # expectation preserved


def test_adjacent_elements_not_correlated():
    # 4 masks share one uint32 word; their bytes must still be
    # independent enough that runs of 4 aren't all-equal too often
    x = jnp.ones((1, 4096), jnp.float32)
    out = np.asarray(packed_dropout(x, jax.random.PRNGKey(1), 0.5))
    quads = (out != 0).reshape(-1, 4)
    # P(all-4 equal) = 2 * 0.5^4 = 0.125; allow slack
    all_equal = ((quads.sum(1) == 0) | (quads.sum(1) == 4)).mean()
    assert 0.05 < all_equal < 0.25


def test_deterministic_and_grad():
    x = jnp.asarray(np.random.RandomState(0).randn(128, 256), jnp.float32)
    k = jax.random.PRNGKey(7)
    a = np.asarray(packed_dropout(x, k, 0.5))
    b = np.asarray(packed_dropout(x, k, 0.5))
    np.testing.assert_array_equal(a, b)
    g = jax.grad(lambda x: jnp.sum(packed_dropout(x, k, 0.5) ** 2))(x)
    keep = 128.0 / 256.0
    np.testing.assert_allclose(np.asarray(g), 2 * a / keep, rtol=1e-5)


def test_rate_zero_identity():
    x = jnp.ones((8, 8))
    np.testing.assert_array_equal(
        np.asarray(packed_dropout(x, jax.random.PRNGKey(0), 0.0)),
        np.asarray(x))


@pytest.mark.heavy
def test_xit_flag_trains():
    from lr2ppo_tpu.config import ModelConfig
    from lr2ppo_tpu.models import ScoreModel

    cfg = ModelConfig(feat_size=16, seq_length=4, max_imgs=2, num_heads=4,
                      fast_dropout=True)
    m = ScoreModel(cfg)
    text = jnp.ones((2, 2, 4, 16))
    img = jnp.ones((2, 2, 16))
    p = m.init(jax.random.PRNGKey(0), text, img)
    g = jax.grad(lambda p: m.apply(
        p, text, img, False, rngs={"dropout": jax.random.PRNGKey(1)}
    ).sum())(p)
    assert all(np.isfinite(np.asarray(x)).all()
               for x in jax.tree.leaves(g))

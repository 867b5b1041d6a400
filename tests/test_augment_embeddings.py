"""SpecAugment and the speech / masked-patch embeddings."""

import numpy as np

import jax
import jax.numpy as jnp

from lr2ppo_tpu.data.augment import SpecAugment
from lr2ppo_tpu.towers.embeddings import MaskedPatchEmbedding, SpeechEmbedding


def test_specaugment_masks():
    spec = np.ones((100, 40), np.float32) * 5.0
    aug = SpecAugment(freq_mask_N=2, freq_mask_F=8, time_mask_N=2,
                      time_mask_T=10, mask_value=0.0, seed=0)
    out = aug(spec)
    assert out.shape == spec.shape
    assert (out == 0.0).any()               # something masked
    assert (out == 5.0).sum() > out.size // 2  # most untouched
    # zero-config: identity
    assert (SpecAugment()(spec) == spec).all()


def test_specaugment_time_warp():
    spec = np.arange(200, dtype=np.float32).reshape(50, 4)
    aug = SpecAugment(time_warp_W=5, seed=1)
    out = aug(spec)
    assert out.shape == spec.shape
    assert np.isfinite(out).all()


def test_masked_patch_embedding():
    m = MaskedPatchEmbedding(emb_size=16, image_height=8, image_width=8,
                             patch_size=4, channels_num=3)
    pixels = jnp.asarray(np.random.RandomState(0).rand(2, 3, 8, 8),
                         jnp.float32)
    mask = jnp.asarray([[1, 2], [3, 4]], jnp.int32)  # patch positions
    params = m.init(jax.random.PRNGKey(0), (pixels, mask), None)
    out = m.apply(params, (pixels, mask), None)
    assert out.shape == (2, 5, 16)           # cls + 4 patches
    # masked positions equal the learned mask embedding (normal-init per
    # the reference trainer's re-init; zeros would NaN the LN backward)
    mask_emb = np.asarray(params["params"]["mask_emb"])[0]
    np.testing.assert_allclose(np.asarray(out[0, 1]), mask_emb, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out[1, 4]), mask_emb, atol=1e-6)
    assert not np.allclose(np.asarray(out[0, 3]), mask_emb)  # unmasked kept


def test_masked_patch_duplicate_index_idempotent():
    """Round-4 review: the reference scatter_ overwrite is idempotent —
    a duplicated mask index (e.g. padding a short list by repeating an
    entry) must still yield exactly mask_emb, not a negated-and-doubled
    corruption from a raw occurrence count."""
    m = MaskedPatchEmbedding(emb_size=16, image_height=8, image_width=8,
                             patch_size=4, channels_num=3)
    pixels = jnp.asarray(np.random.RandomState(2).rand(1, 3, 8, 8),
                         jnp.float32)
    mask = jnp.asarray([[2, 2, 2]], jnp.int32)   # same index thrice
    params = m.init(jax.random.PRNGKey(0), (pixels, mask), None)
    out = m.apply(params, (pixels, mask), None)
    mask_emb = np.asarray(params["params"]["mask_emb"])[0]
    np.testing.assert_allclose(np.asarray(out[0, 2]), mask_emb, atol=1e-6)


def test_speech_embedding_subsamples():
    m = SpeechEmbedding(emb_size=16, conv_layers=2, kernel_size=5,
                        in_dim=8)
    x = jnp.asarray(np.random.RandomState(1).randn(2, 20, 8), jnp.float32)
    params = m.init(jax.random.PRNGKey(0), x, None)
    out = m.apply(params, x, None)
    assert out.shape == (2, 5, 16)           # 20 -> 10 -> 5 frames
    assert np.isfinite(np.asarray(out)).all()

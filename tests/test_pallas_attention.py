"""Fused pallas attention: kernel parity with the jnp reference (plain
interpret mode works — no PRNG involved), and encoder-level equivalence
with the pallas_attention flag on/off."""

import numpy as np

import jax
import jax.numpy as jnp

from lr2ppo_tpu.ops.pallas_attention import fused_attention, reference_attention
from lr2ppo_tpu.towers import TowerConfig
from lr2ppo_tpu.towers.encoders import TransformerEncoder


def test_kernel_matches_reference():
    rng = np.random.RandomState(0)
    b, h, s, dh = 2, 4, 24, 16
    q, k, v = (jnp.asarray(rng.randn(b, h, s, dh), jnp.float32)
               for _ in range(3))
    bias = jnp.where(jnp.arange(s)[None] < 20, 0.0, -10000.0)
    bias = jnp.broadcast_to(bias, (b, s)).astype(jnp.float32)
    got = fused_attention(q, k, v, bias, 0.25, interpret=True)
    want = reference_attention(q, k, v, bias, 0.25)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-4)


def test_encoder_flag_is_output_equivalent():
    base = dict(emb_size=16, hidden_size=16, feedforward_size=32,
                heads_num=4, layers_num=2, max_seq_length=12, dropout=0.0,
                vocab_size=10, mask="fully_visible",
                layernorm_positioning="post", embedding=["word"])
    rng = np.random.RandomState(1)
    emb = jnp.asarray(rng.randn(2, 8, 16), jnp.float32)
    seg = jnp.asarray([[1] * 8, [1] * 5 + [0] * 3], jnp.int32)
    outs = []
    params = None
    for flag in (False, True):
        cfg = TowerConfig.from_dict({**base, "pallas_attention": flag})
        enc = TransformerEncoder(cfg)
        if params is None:
            params = enc.init(jax.random.PRNGKey(0), emb, seg)
        outs.append(np.asarray(enc.apply(params, emb, seg)))
    np.testing.assert_allclose(outs[0], outs[1], atol=2e-5, rtol=2e-4)


def test_flag_off_for_causal_and_training():
    # causal masks and non-deterministic passes must not take the fused
    # path (it would be wrong / non-differentiable-by-design)
    cfg = TowerConfig.from_dict(dict(
        emb_size=16, hidden_size=16, feedforward_size=32, heads_num=4,
        layers_num=1, max_seq_length=12, dropout=0.1, vocab_size=10,
        mask="causal", embedding=["word"], pallas_attention=True))
    enc = TransformerEncoder(cfg)
    emb = jnp.ones((2, 6, 16))
    seg = jnp.ones((2, 6), jnp.int32)
    params = enc.init(jax.random.PRNGKey(0), emb, seg)
    out = enc.apply(params, emb, seg)          # causal -> jnp path
    assert np.isfinite(np.asarray(out)).all()
    out2 = enc.apply(params, emb, seg, False,
                     rngs={"dropout": jax.random.PRNGKey(1)})
    assert np.isfinite(np.asarray(out2)).all()  # training -> jnp path

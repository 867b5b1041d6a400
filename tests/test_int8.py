"""Int8 frozen-reward quantization (ops/int8.py; VERDICT r2 #6).

The stage-3 reward model is pure inference (reference ppo.py:780
freezes it), so int8 weight-static / activation-dynamic matmuls are a
legitimate TPU optimization: s8xs8->s32 runs the MXU at 2x the bf16
rate and the kernel HBM halves. These tests pin the numerics and the
param-tree contract; the convergence-neutrality test lives in
tests/test_convergence.py.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lr2ppo_tpu.config import Config, ModelConfig
from lr2ppo_tpu.models import SeqScoreModel
from lr2ppo_tpu.ops.int8 import int8_matmul, quantize_kernel, quantize_tree


def test_int8_matmul_tracks_f32():
    rng = np.random.RandomState(0)
    x = rng.randn(64, 96).astype(np.float32)
    w = (rng.randn(96, 48) * 0.05).astype(np.float32)
    ref = x @ w
    q, s = quantize_kernel(jnp.asarray(w))
    assert q.dtype == jnp.int8 and s.shape == (48,)
    got = np.asarray(int8_matmul(jnp.asarray(x), q, s, jnp.float32))
    # per-row activation + per-channel weight scales: ~1% relative error
    denom = np.maximum(np.abs(ref), np.abs(ref).mean())
    assert float(np.max(np.abs(got - ref) / denom)) < 0.05


def test_int8_matmul_quantizes_float_kernel_on_the_fly():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(8, 16), jnp.float32)
    w = jnp.asarray(rng.randn(16, 4), jnp.float32)
    a = int8_matmul(x, w, None, jnp.float32)
    q, s = quantize_kernel(w)
    b = int8_matmul(x, q, s, jnp.float32)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_quantize_tree_structure_and_model_parity():
    mcfg = ModelConfig(feat_size=32, seq_length=6, max_imgs=2, num_heads=4,
                       drop_p=0.0, forward_drop_p=0.0)
    rng = np.random.RandomState(2)
    text = jnp.asarray(rng.randn(4, 2, 6, 32), jnp.float32)
    img = jnp.asarray(rng.randn(4, 2, 32), jnp.float32)
    idx = jnp.zeros((4, 4), jnp.int32)

    m32 = SeqScoreModel(mcfg)
    p = m32.init(jax.random.PRNGKey(0), text, img, idx)
    ref = np.asarray(m32.apply(p, text, img, idx))

    pq = quantize_tree(p, jnp.float32)
    # every 2-D kernel became int8 with a sibling scale; pos_emb untouched
    flat = jax.tree_util.tree_flatten_with_path(pq)[0]
    kernels = [(path, leaf) for path, leaf in flat
               if getattr(path[-1], "key", None) == "kernel"]
    assert kernels and all(leaf.dtype == jnp.int8 for _, leaf in kernels)
    scales = [path for path, _ in flat
              if getattr(path[-1], "key", None) == "kernel_scale"]
    assert len(scales) == len(kernels)
    assert pq["params"]["pos_emb"].dtype == jnp.float32

    m8 = SeqScoreModel(dataclasses.replace(mcfg, int8=True))
    got = np.asarray(m8.apply(pq, text, img, idx))
    spread = float(np.abs(ref).max()) + 1e-6
    assert float(np.max(np.abs(got - ref))) < 0.05 * spread

    # quantizing a tree that ALREADY carries (ones-init) kernel_scale
    # leaves — an int8-initialized model's tree — must compute the real
    # scales, not keep the ones (regression: the ones used to clobber
    # the computed scale and outputs were off by orders of magnitude)
    p8init = m8.init(jax.random.PRNGKey(0), text, img, idx)
    p8init = jax.tree.map(lambda a, b: a if a.dtype == jnp.int8 else b,
                          p8init, p8init)   # structural no-op, keeps tree
    # graft the f32 weights into the int8-init structure, then quantize
    def graft(dst, src):
        out = {}
        for k, v in dst.items():
            if isinstance(v, dict):
                out[k] = graft(v, src[k]) if k in src else v
            elif k == "kernel_scale":
                out[k] = v                    # ones init
            else:
                out[k] = src[k]
        return out

    grafted = graft(p8init, p)
    gq = quantize_tree(grafted, jnp.float32)
    got2 = np.asarray(m8.apply(gq, text, img, idx))
    np.testing.assert_allclose(got2, got, atol=1e-6)

    # ranking preserved on well-separated scores
    if np.all(np.diff(np.sort(ref)) > 0.05 * spread):
        assert (np.argsort(ref) == np.argsort(got)).all()


def test_ppo_trainer_builds_int8_reward():
    from lr2ppo_tpu.train.ppo import PPOTrainer

    mcfg = ModelConfig(feat_size=16, seq_length=4, max_imgs=2, num_heads=2,
                       drop_p=0.0, forward_drop_p=0.0)
    cfg = Config(model=mcfg)
    cfg = cfg.replace(ppo=dataclasses.replace(cfg.ppo, reward_int8=True))
    tr = PPOTrainer(cfg, use_mesh=False)
    assert tr.reward.cfg.int8 and not tr.critic.cfg.int8

    rng = np.random.RandomState(3)
    batch = {"text": rng.randn(2, 2, 4, 16).astype(np.float32),
             "img": rng.randn(2, 2, 16).astype(np.float32),
             "tgts": rng.randint(0, 3, (2, 2)).astype(np.float32)}
    _, _, reward_p = tr.init_params(batch, seed=0)
    kq = reward_p["params"]["trunk"]["out_layer"]["fc1"]["kernel"]
    assert kq.dtype == jnp.int8
    assert "kernel_scale" in reward_p["params"]["trunk"]["out_layer"]["fc1"]
    # and the rollout program runs with the quantized tree
    from lr2ppo_tpu.train.ppo import make_rollout_step

    actor_p, critic_p, _ = tr.init_params(batch, seed=0)
    roll = make_rollout_step(tr.actor, tr.critic, tr.reward, "reg")
    state0 = jnp.broadcast_to(jnp.arange(2, dtype=jnp.int32), (2, 2))
    scores, value, nxt, rew = roll(actor_p, critic_p, reward_p,
                                   jnp.asarray(batch["text"]),
                                   jnp.asarray(batch["img"]), state0)
    assert np.isfinite(np.asarray(rew)).all()

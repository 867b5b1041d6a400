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
from lr2ppo_tpu.ops import int8 as int8_mod
from lr2ppo_tpu.ops.int8 import int8_matmul, quantize_kernel, quantize_tree


@pytest.fixture(autouse=True)
def _force_quantization(monkeypatch):
    """The production size gates (ops/int8.py: only kernels >= 2M
    elements quantize, only wide compute-bound call sites take the s8
    dot) would leave these tiny test models entirely un-quantized; zero
    them so the tests exercise the full int8 path. The gates themselves
    are pinned by test_production_size_gates."""
    monkeypatch.setattr(int8_mod, "INT8_MIN_KERNEL_ELEMENTS", 0)
    monkeypatch.setattr(int8_mod, "INT8_DYNQUANT_MIN_FLOPS", 0)
    monkeypatch.setattr(int8_mod, "INT8_DYNQUANT_MIN_WIDTH", 0)


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


@pytest.mark.heavy
def test_quantize_tree_idempotent():
    """Round-4 review: re-quantizing an already-quantized tree must be a
    no-op — the f32 kernel_scale leaves used to fall into the default
    float branch and get silently downcast to bf16."""
    rng = np.random.RandomState(7)
    big = (2048, 1024)  # above the size gate so the kernel quantizes
    p = {"params": {"fc": {"kernel": jnp.asarray(
        rng.randn(*big), jnp.float32),
        "bias": jnp.zeros((big[1],), jnp.float32)}}}
    q1 = quantize_tree(p)
    q2 = quantize_tree(q1)
    assert q1["params"]["fc"]["kernel"].dtype == jnp.int8
    assert q1["params"]["fc"]["kernel_scale"].dtype == jnp.float32
    assert q2["params"]["fc"]["kernel_scale"].dtype == jnp.float32
    for a, b in zip(jax.tree.leaves(q1), jax.tree.leaves(q2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


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


@pytest.mark.heavy
def test_xit_fused_ffn_matches_unfused(monkeypatch):
    """XiT with int8=True on the deterministic path routes its FFN
    through the fused Pallas kernel when the shapes qualify; the result
    must match the unfused composition (PALLAS_FUSED_FFN=False) within
    second-quant tie-flip noise, on the SAME quantized tree."""
    from lr2ppo_tpu.models.layers import XiT

    # the AUTO default disables fusion on this 8-fake-device test
    # backend (no SPMD partitioning rule for pallas_call); force it on
    monkeypatch.setattr(int8_mod, "PALLAS_FUSED_FFN", True)
    d, heads = 128, 4
    blk = XiT(feat_size=d, num_heads=heads, drop_p=0.0,
              forward_drop_p=0.0, dtype=jnp.float32, int8=True)
    rng = np.random.RandomState(7)
    # rows = 2*160 = 320 >= the kernel's 256-row block, not a multiple
    # of it (exercises the padded edge block through the model path)
    x = jnp.asarray(rng.randn(2, 160, d), jnp.float32)
    y = jnp.asarray(rng.randn(2, 12, d), jnp.float32)

    p = blk.init(jax.random.PRNGKey(3), x, y)
    pq = quantize_tree(p, jnp.float32)
    assert pq["params"]["ffn_fc1"]["kernel"].dtype == jnp.int8

    hdn = 4 * d
    from lr2ppo_tpu.ops.pallas_int8_mlp import supported
    assert supported((2, 160, d), (d, hdn), (hdn, d))

    fused = np.asarray(blk.apply(pq, x, y, deterministic=True))
    monkeypatch.setattr(int8_mod, "PALLAS_FUSED_FFN", False)
    unfused = np.asarray(blk.apply(pq, x, y, deterministic=True))
    diff = np.abs(fused - unfused)
    spread = np.abs(unfused).max() + 1e-6
    assert (diff <= 1e-5 * spread).mean() > 0.98
    assert diff.max() < 0.02 * spread


def test_pallas_int8_mlp_matches_unfused_composition():
    """The fully-fused FFN kernel (ops/pallas_int8_mlp.py) must match
    the unfused gated composition (int8 fc1 + bias + exact gelu + int8
    fc2 + bias) up to second-quant round-tie flips: the two paths'
    stage-1 outputs differ by ~1 ulp (different f32 op scheduling), and
    an element sitting exactly on a rounding boundary of the SECOND
    quantization then flips a full int8 step (~0.2% of elements, each
    bounded by one quant step through a w2 row). Rows NOT a multiple of
    the 256-row block to exercise the padded edge block."""
    from lr2ppo_tpu.ops.pallas_int8_mlp import pallas_int8_mlp, supported

    rng = np.random.RandomState(11)
    x = jnp.asarray(rng.randn(530, 256), jnp.float32)
    w1 = jnp.asarray(rng.randn(256, 512) * 0.05, jnp.float32)
    b1 = jnp.asarray(rng.randn(512) * 0.01, jnp.float32)
    w2 = jnp.asarray(rng.randn(512, 256) * 0.05, jnp.float32)
    b2 = jnp.asarray(rng.randn(256) * 0.01, jnp.float32)
    q1, s1 = quantize_kernel(w1)
    q2, s2 = quantize_kernel(w2)
    assert supported(x.shape, q1.shape, q2.shape)
    h = int8_matmul(x, q1, s1, jnp.float32) + b1     # gates zeroed: s8
    h = jax.nn.gelu(h, approximate=False)
    ref = np.asarray(int8_matmul(h, q2, s2, jnp.float32) + b2)
    got = np.asarray(pallas_int8_mlp(x, q1, s1, b1, q2, s2, b2,
                                     jnp.float32, interpret=True))
    diff = np.abs(got - ref)
    # vast majority bit-close; the tie-flip tail bounded by one quant
    # step of the second quantization propagated through a w2 row
    assert (diff <= 2e-5).mean() > 0.99
    step_bound = (float(jnp.max(jnp.abs(h))) / 127.0
                  * float(jnp.max(jnp.abs(w2))))
    assert diff.max() < 4.0 * step_bound
    assert diff.mean() < 1e-4
    # leading batch dims reshape through
    x3 = x.reshape(2, 265, 256)
    got3 = pallas_int8_mlp(x3, q1, s1, b1, q2, s2, b2, jnp.float32,
                           interpret=True)
    np.testing.assert_allclose(np.asarray(got3).reshape(530, 256),
                               np.asarray(got), atol=0, rtol=0)
    # refusals: mismatched pair, tiny rows, giant weights
    assert not supported((530, 256), (256, 512), (512, 128))
    assert not supported((64, 256), (256, 512), (512, 256))
    assert not supported((530, 2048), (2048, 4096), (4096, 2048))


def test_pallas_int8_matmul_matches_xla_path():
    """The fused Pallas kernel (ops/pallas_int8_matmul.py) must be
    bit-identical to the unfused XLA s8 path: same per-row scale
    formula, same round/clip. Rows deliberately NOT a multiple of the
    512-row block to exercise the padded edge block."""
    from lr2ppo_tpu.ops.pallas_int8_matmul import (pallas_int8_matmul,
                                                   supported)

    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.randn(1040, 256), jnp.float32)
    w = jnp.asarray(rng.randn(256, 128) * 0.05, jnp.float32)
    q, s = quantize_kernel(w)
    assert supported(x.shape, w.shape)
    ref = int8_matmul(x, q, s, jnp.float32)          # gates zeroed: s8 path
    got = pallas_int8_matmul(x, q, s, jnp.float32, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=1e-5)
    # unsupported shapes are refused (K not a lane multiple; tiny rows)
    assert not supported((1040, 100), (100, 128))
    assert not supported((64, 256), (256, 128))


def test_narrow_compute_bound_site_routes_to_pallas(monkeypatch):
    """With PALLAS_NARROW_SITES on, int8_matmul must hand narrow
    compute-bound call sites to the fused Pallas kernel and the result
    must equal the plain s8 computation. (The routing defaults off —
    ledger at ops/int8.py:PALLAS_NARROW_SITES.)"""
    from lr2ppo_tpu.ops import pallas_int8_matmul as pmod

    monkeypatch.setattr(int8_mod, "PALLAS_NARROW_SITES", True)
    monkeypatch.setattr(int8_mod, "INT8_DYNQUANT_MIN_FLOPS", 0)
    monkeypatch.setattr(int8_mod, "INT8_DYNQUANT_MIN_WIDTH", 10 ** 9)

    calls = {"n": 0}
    real = pmod.pallas_int8_matmul

    def spy(x, k, s, out_dtype=jnp.bfloat16, interpret=False):
        calls["n"] += 1
        return real(x, k, s, out_dtype, interpret=True)

    monkeypatch.setattr(pmod, "pallas_int8_matmul", spy)
    rng = np.random.RandomState(8)
    x = jnp.asarray(rng.randn(520, 256), jnp.float32)
    w = jnp.asarray(rng.randn(256, 128) * 0.05, jnp.float32)
    q, s = quantize_kernel(w)
    got = int8_matmul(x, q, s, jnp.float32)
    assert calls["n"] == 1

    monkeypatch.setattr(int8_mod, "INT8_DYNQUANT_MIN_WIDTH", 0)
    ref = int8_matmul(x, q, s, jnp.float32)          # plain s8 path
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=1e-5)


@pytest.mark.heavy
def test_production_size_gates(monkeypatch):
    """At PRODUCTION thresholds: small kernels stay float with no
    kernel_scale sibling (module and quantize_tree agree on the tree
    structure), and a narrow/small call site on a quantized kernel takes
    the dequantize+bf16 path — bit-close to the float matmul, with no
    activation-quant error."""
    monkeypatch.setattr(int8_mod, "INT8_MIN_KERNEL_ELEMENTS",
                        2 * 1024 * 1024)
    monkeypatch.setattr(int8_mod, "INT8_DYNQUANT_MIN_FLOPS", 50e9)
    monkeypatch.setattr(int8_mod, "INT8_DYNQUANT_MIN_WIDTH", 1024)

    from lr2ppo_tpu.models.layers import TorchDense

    # (768, 768) = 589k elements: below the kernel gate
    m = TorchDense(768, int8=True)
    p = m.init(jax.random.PRNGKey(0), jnp.zeros((2, 768)))
    assert "kernel_scale" not in p["params"]
    assert p["params"]["kernel"].dtype == jnp.float32
    q = quantize_tree(p, jnp.float32)
    assert q["params"]["kernel"].dtype == jnp.float32   # left alone

    # (768, 3072) = 2.36M: above the kernel gate -> int8 + scale, and
    # the module consumes the quantized tree
    m2 = TorchDense(3072, int8=True)
    p2 = m2.init(jax.random.PRNGKey(0), jnp.zeros((2, 768)))
    assert "kernel_scale" in p2["params"]
    q2 = quantize_tree(p2, jnp.float32)
    assert q2["params"]["kernel"].dtype == jnp.int8
    x = jnp.asarray(np.random.RandomState(0).randn(4, 768), jnp.float32)
    ref = np.asarray(x @ p2["params"]["kernel"])
    # 4 rows -> far below the FLOPs gate: dequant path, only weight-
    # quantization error (~0.8% of the per-channel amax), NOT the
    # coarser activation-quant error
    got = np.asarray(m2.apply(q2, x) - p2["params"]["bias"])
    amax = np.abs(np.asarray(p2["params"]["kernel"])).max(0) * x.shape[-1]
    assert float(np.max(np.abs(got - ref))) < 0.01 * float(amax.max())


@pytest.mark.heavy
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

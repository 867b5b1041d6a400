"""ZeRO-1 optimizer-state sharding (`parallel/mesh.py:shard_optimizer`,
`cfg.mesh.zero1`): the persistent Adam moments are partitioned across
the dp axis instead of replicated on every dp rank. The math must be
identical to the unsharded update (same psum-reduced grads, same
per-element moment arithmetic — only placement differs), the moments
must actually BE sharded (that's the HBM saving), and they must STAY
sharded through the jitted step (the with_sharding_constraint leg).

No reference counterpart: the reference's DP replicas each hold full
optimizer state (finetune/misc.py keeps no sharding of any kind); this
is a TPU-native scaling capability on top of parity.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from lr2ppo_tpu.config import Config, ModelConfig, OptimConfig
from lr2ppo_tpu.parallel import mesh as mesh_mod
from lr2ppo_tpu.parallel.mesh import make_mesh, opt_state_shardings
from lr2ppo_tpu.train.common import DeviceCtx, apply_updates, init_state
from lr2ppo_tpu.train.optim import build_optimizer

needs8 = pytest.mark.skipif(len(jax.devices()) < 8,
                            reason="needs 8-device mesh")


def _specs(tree, mesh):
    out = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(
            opt_state_shardings(tree, mesh),
            is_leaf=lambda x: hasattr(x, "spec"))[0]:
        name = "/".join(getattr(p, "key", getattr(p, "name", str(p)))
                        for p in path)
        out[name] = leaf.spec
    return out


@needs8
def test_zero_spec_composes_with_tp():
    """tp-ruled kernels gain dp on their FREE axis; replicated leaves
    shard their largest dp-divisible axis; small/indivisible leaves and
    scalars stay put."""
    mesh = make_mesh(dp=4, tp=2)
    tree = {
        "fc1": {"kernel": np.zeros((256, 512), np.float32),   # P(None,tp)
                "bias": np.zeros((512,), np.float32)},        # tiny
        "embedding": np.zeros((1024, 64), np.float32),        # P() base
        "odd": np.zeros((333, 333), np.float32),              # nothing % 4
        "count": np.zeros((), np.int32),                      # scalar
    }
    specs = _specs(tree, mesh)
    assert specs["fc1/kernel"] == P("dp", "tp")
    assert specs["fc1/bias"] == P("tp")          # below ZERO1_MIN_ELEMENTS
    assert specs["embedding"] == P("dp", None)
    assert specs["odd"] == P()
    assert specs["count"] == P()


@needs8
def test_moments_sharded_and_stay_sharded_through_step():
    mesh_dp = 8
    ctx = DeviceCtx(dp=mesh_dp, tp=1, zero1=True)
    key = jax.random.PRNGKey(0)
    params = {"params": {"fc1": {
        "kernel": jax.random.normal(key, (256, 512), jnp.float32),
        "bias": jnp.zeros((512,), jnp.float32)}}}
    params = ctx.place_params(params)
    tx = ctx.wrap_optimizer(build_optimizer(OptimConfig(), 10))
    state = init_state(params, tx)

    def kernel_leaves(opt):
        return [leaf for path, leaf in
                jax.tree_util.tree_flatten_with_path(opt)[0]
                if getattr(leaf, "ndim", 0) == 2]

    for leaf in kernel_leaves(state.opt_state):
        assert "dp" in tuple(leaf.sharding.spec), leaf.sharding
        shard = leaf.addressable_shards[0].data
        assert shard.size == leaf.size // mesh_dp, (shard.shape,
                                                    leaf.shape)

    @jax.jit
    def step(state, x, y):
        def loss(p):
            out = x @ p["params"]["fc1"]["kernel"] + \
                p["params"]["fc1"]["bias"]
            return jnp.mean((out - y) ** 2)
        grads = {"params": jax.grad(loss)(state.params)["params"]}
        return apply_updates(state, grads, tx)

    x = ctx.put_array(np.random.RandomState(0).randn(
        16, 256).astype(np.float32))
    y = ctx.put_array(np.random.RandomState(1).randn(
        16, 512).astype(np.float32))
    state2 = step(state, x, y)
    # the constraint must hold the moments dp-sharded through the step
    for leaf in kernel_leaves(state2.opt_state):
        assert "dp" in tuple(leaf.sharding.spec), leaf.sharding
        shard = leaf.addressable_shards[0].data
        assert shard.size == leaf.size // mesh_dp


FEAT, SEQ, IMGS, TAGS, BS, N = 8, 3, 2, 2, 8, 16


class _DS:
    def __init__(self):
        rng = np.random.RandomState(7)
        self.items = [
            dict(text=rng.randn(TAGS, SEQ, FEAT).astype(np.float32),
                 img=rng.randn(IMGS, FEAT).astype(np.float32),
                 tgts=rng.randint(0, 3, (TAGS,)).astype(np.float32))
            for _ in range(N)]

    def set_epoch(self, e):
        pass

    def __len__(self):
        return N

    def get(self, i):
        return self.items[i]


def _cfg(zero1: bool) -> Config:
    mcfg = ModelConfig(family="multimodal", feat_size=FEAT,
                       seq_length=SEQ, max_imgs=IMGS, num_heads=2,
                       mode="reg", drop_p=0.0, forward_drop_p=0.0)
    cfg = Config(model=mcfg)
    cfg = cfg.replace(epochs_num=1, batch_size=BS, report_steps=10 ** 6,
                      output_model_path="", seed=3)
    cfg.mesh.dp = 8
    cfg.mesh.zero1 = zero1
    return cfg


def _train(zero1: bool, monkeypatch):
    from lr2ppo_tpu.data import EvalLoader
    from lr2ppo_tpu.data.pipeline import Loader
    from lr2ppo_tpu.train.pointwise import PointwiseTrainer

    # the tiny test model's leaves are all below the production
    # threshold — drop it so every dp-divisible leaf shards
    monkeypatch.setattr(mesh_mod, "ZERO1_MIN_ELEMENTS", 0)
    loader = Loader(_DS(), BS, shuffle=True, seed=5, num_workers=1)
    ev = EvalLoader(_DS(), buckets=[TAGS], batch_size=BS)
    state, best = PointwiseTrainer(_cfg(zero1)).fit(loader, ev)
    host = jax.tree.map(np.asarray, jax.device_get(state.params))
    return host, float(best), state


@needs8
def test_zero1_training_matches_unsharded(monkeypatch):
    from fixtures import flatten_tree

    p_base, best_base, _ = _train(False, monkeypatch)
    p_z, best_z, state_z = _train(True, monkeypatch)
    np.testing.assert_allclose(best_z, best_base, rtol=1e-5)
    f_base, f_z = flatten_tree(p_base), flatten_tree(p_z)
    assert f_base.keys() == f_z.keys()
    for k in f_base:
        # same grads, same per-element update — only the moment
        # placement differs; CPU math should agree to float noise
        np.testing.assert_allclose(f_z[k], f_base[k], rtol=1e-5,
                                   atol=1e-6, err_msg=k)
    # and the zero1 run's moments really were sharded
    sharded = [leaf for path, leaf in
               jax.tree_util.tree_flatten_with_path(
                   state_z.opt_state)[0]
               if hasattr(leaf, "sharding")
               and "dp" in tuple(leaf.sharding.spec)]
    assert sharded, "no moment leaf carried a dp sharding"


@needs8
def test_zero1_state_checkpoint_roundtrip(tmp_path, monkeypatch):
    """A .state saved from a zero1 run restores onto the mesh with the
    moments re-sharded (and the values intact) — and restores equally
    well into a zero1=False context (host trees are full values)."""
    monkeypatch.setattr(mesh_mod, "ZERO1_MIN_ELEMENTS", 0)
    ctx = DeviceCtx(dp=8, tp=1, zero1=True)
    key = jax.random.PRNGKey(1)
    params = ctx.place_params({"params": {"fc1": {
        "kernel": jax.random.normal(key, (64, 128), jnp.float32),
        "bias": jnp.zeros((128,), jnp.float32)}}})
    tx = ctx.wrap_optimizer(build_optimizer(OptimConfig(), 10))
    state = init_state(params, tx)
    from lr2ppo_tpu.train.common import (load_state_tree,
                                         restore_train_state,
                                         save_train_state)

    path = str(tmp_path / "z.state")
    save_train_state(path, state, 0, -np.inf)
    tree, _meta = load_state_tree(path)
    for target_ctx in (ctx, DeviceCtx(dp=8, tp=1, zero1=False)):
        target_tx = target_ctx.wrap_optimizer(
            build_optimizer(OptimConfig(), 10))
        restored = restore_train_state(target_ctx, target_tx,
                                       tree["params"],
                                       tree["opt_state"], tree["step"])
        for (pa, a), (pb, b) in zip(
                jax.tree_util.tree_flatten_with_path(
                    state.opt_state)[0],
                jax.tree_util.tree_flatten_with_path(
                    restored.opt_state)[0]):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

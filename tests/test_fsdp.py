"""FSDP / ZeRO-3 parameter sharding (`parallel/mesh.py:shard_params_fsdp`,
`cfg.mesh.fsdp`): params are STORED dp-sharded — the XLA SPMD partitioner
inserts the all-gather at use and the reduce-scatter of the grads into
the dp-sharded optimizer update. The math must be identical to plain dp
(the gathered weights are the same values), the params must actually BE
sharded (that's the HBM saving), and they must STAY sharded through the
jitted step (the constrain_updates leg of shard_optimizer).

No reference counterpart: the reference's DP replicas each hold the full
model (finetune/misc.py keeps no sharding of any kind); this is a
TPU-native scaling capability on top of parity, the params-side
companion of ZeRO-1 (tests/test_zero1.py).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from lr2ppo_tpu.config import Config, ModelConfig, OptimConfig
from lr2ppo_tpu.parallel import mesh as mesh_mod
from lr2ppo_tpu.parallel.mesh import fsdp_param_shardings, make_mesh
from lr2ppo_tpu.train.common import DeviceCtx, apply_updates, init_state
from lr2ppo_tpu.train.optim import build_optimizer

needs8 = pytest.mark.skipif(len(jax.devices()) < 8,
                            reason="needs 8-device mesh")


def _specs(tree, mesh):
    out = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(
            fsdp_param_shardings(tree, mesh, check_coverage=False),
            is_leaf=lambda x: hasattr(x, "spec"))[0]:
        name = "/".join(getattr(p, "key", getattr(p, "name", str(p)))
                        for p in path)
        out[name] = leaf.spec
    return out


@needs8
def test_fsdp_specs_compose_with_tp():
    """Param shardings use the SAME dp-composition rule as the zero1
    moments (_zero_spec): tp-ruled kernels gain dp on their free axis,
    replicated leaves (embeddings!) shard their largest dp-divisible
    axis, small/indivisible leaves and scalars stay replicated."""
    mesh = make_mesh(dp=4, tp=2)
    tree = {
        "fc1": {"kernel": np.zeros((256, 512), np.float32),  # P(None,tp)
                "bias": np.zeros((512,), np.float32)},       # tiny
        "embedding": np.zeros((1024, 64), np.float32),       # P() base
        "odd": np.zeros((333, 333), np.float32),             # nothing % 4
    }
    specs = _specs(tree, mesh)
    assert specs["fc1/kernel"] == P("dp", "tp")
    assert specs["fc1/bias"] == P("tp")        # below ZERO1_MIN_ELEMENTS
    assert specs["embedding"] == P("dp", None)
    assert specs["odd"] == P()


@needs8
def test_params_sharded_and_stay_sharded_through_step(monkeypatch):
    monkeypatch.setattr(mesh_mod, "ZERO1_MIN_ELEMENTS", 0)
    mesh_dp = 8
    ctx = DeviceCtx(dp=mesh_dp, tp=1, fsdp=True)
    assert ctx.fsdp and ctx.zero1          # fsdp implies zero1
    key = jax.random.PRNGKey(0)
    params = {"params": {"fc1": {
        "kernel": jax.random.normal(key, (256, 512), jnp.float32),
        "bias": jnp.zeros((512,), jnp.float32)}}}
    params = ctx.place_params(params)
    kern = params["params"]["fc1"]["kernel"]
    assert "dp" in tuple(kern.sharding.spec), kern.sharding
    assert (kern.addressable_shards[0].data.size
            == kern.size // mesh_dp)
    tx = ctx.wrap_optimizer(build_optimizer(OptimConfig(), 10))
    state = init_state(params, tx)
    # the moments inherit the params' fsdp layout (zeros_like) and the
    # zero1 placement must accept them as already correct
    mu_kernels = [leaf for path, leaf in
                  jax.tree_util.tree_flatten_with_path(state.opt_state)[0]
                  if getattr(leaf, "ndim", 0) == 2]
    for leaf in mu_kernels:
        assert "dp" in tuple(leaf.sharding.spec), leaf.sharding

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
    # constrain_updates must hold the NEW params dp-sharded — without it
    # XLA may legally re-replicate them at the step boundary and the HBM
    # saving silently evaporates
    kern2 = state2.params["params"]["fc1"]["kernel"]
    assert "dp" in tuple(kern2.sharding.spec), kern2.sharding
    assert (kern2.addressable_shards[0].data.size
            == kern2.size // mesh_dp)


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


def _cfg(fsdp: bool) -> Config:
    mcfg = ModelConfig(family="multimodal", feat_size=FEAT,
                       seq_length=SEQ, max_imgs=IMGS, num_heads=2,
                       mode="reg", drop_p=0.0, forward_drop_p=0.0)
    cfg = Config(model=mcfg)
    cfg = cfg.replace(epochs_num=1, batch_size=BS, report_steps=10 ** 6,
                      output_model_path="", seed=3)
    cfg.mesh.dp = 8
    cfg.mesh.fsdp = fsdp
    return cfg


def _train(fsdp: bool, monkeypatch):
    from lr2ppo_tpu.data import EvalLoader
    from lr2ppo_tpu.data.pipeline import Loader
    from lr2ppo_tpu.train.pointwise import PointwiseTrainer

    # the tiny test model's leaves are all below the production
    # threshold — drop it so every dp-divisible leaf shards
    monkeypatch.setattr(mesh_mod, "ZERO1_MIN_ELEMENTS", 0)
    loader = Loader(_DS(), BS, shuffle=True, seed=5, num_workers=1)
    ev = EvalLoader(_DS(), buckets=[TAGS], batch_size=BS)
    state, best = PointwiseTrainer(_cfg(fsdp)).fit(loader, ev)
    host = jax.tree.map(np.asarray, jax.device_get(state.params))
    return host, float(best), state


@needs8
def test_fsdp_training_matches_dp(monkeypatch):
    from fixtures import flatten_tree

    p_base, best_base, _ = _train(False, monkeypatch)
    p_f, best_f, state_f = _train(True, monkeypatch)
    np.testing.assert_allclose(best_f, best_base, rtol=1e-5)
    f_base, f_f = flatten_tree(p_base), flatten_tree(p_f)
    assert f_base.keys() == f_f.keys()
    for k in f_base:
        # the gathered weights are the same values — only storage
        # placement differs; CPU math should agree to float noise
        np.testing.assert_allclose(f_f[k], f_base[k], rtol=1e-5,
                                   atol=1e-6, err_msg=k)
    # and the fsdp run's params really were (and stayed) sharded
    sharded = [leaf for path, leaf in
               jax.tree_util.tree_flatten_with_path(state_f.params)[0]
               if hasattr(leaf, "sharding")
               and "dp" in tuple(leaf.sharding.spec)]
    assert sharded, "no param leaf carried a dp sharding after training"


@needs8
def test_fsdp_state_checkpoint_roundtrip(tmp_path, monkeypatch):
    """A .state saved from an fsdp run restores onto the mesh with the
    params re-sharded (values intact) — and restores equally well into
    an fsdp=False context (host trees are full values either way)."""
    monkeypatch.setattr(mesh_mod, "ZERO1_MIN_ELEMENTS", 0)
    ctx = DeviceCtx(dp=8, tp=1, fsdp=True)
    key = jax.random.PRNGKey(1)
    params = ctx.place_params({"params": {"fc1": {
        "kernel": jax.random.normal(key, (64, 128), jnp.float32),
        "bias": jnp.zeros((128,), jnp.float32)}}})
    tx = ctx.wrap_optimizer(build_optimizer(OptimConfig(), 10))
    state = init_state(params, tx)
    from lr2ppo_tpu.train.common import (load_state_tree,
                                         restore_train_state,
                                         save_train_state)

    path = str(tmp_path / "f.state")
    save_train_state(path, state, 0, -np.inf)
    tree, _meta = load_state_tree(path)
    for target_ctx in (ctx, DeviceCtx(dp=8, tp=1, fsdp=False)):
        target_tx = target_ctx.wrap_optimizer(
            build_optimizer(OptimConfig(), 10))
        restored = restore_train_state(target_ctx, target_tx,
                                       tree["params"],
                                       tree["opt_state"], tree["step"])
        np.testing.assert_array_equal(
            np.asarray(params["params"]["fc1"]["kernel"]),
            np.asarray(restored.params["params"]["fc1"]["kernel"]))
        for (pa, a), (pb, b) in zip(
                jax.tree_util.tree_flatten_with_path(
                    state.opt_state)[0],
                jax.tree_util.tree_flatten_with_path(
                    restored.opt_state)[0]):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        if target_ctx.fsdp:
            k = restored.params["params"]["fc1"]["kernel"]
            assert "dp" in tuple(k.sharding.spec)


@needs8
def test_fsdp_ppo_step(monkeypatch):
    """The stage-3 PPO rollout+update runs with ALL THREE param trees
    fsdp-sharded (actor/critic trainable, frozen reward inference-only)
    and the updated states keep the dp placement — the PPO-side leg of
    the fsdp envelope (the dryrun covers zero1 there)."""
    import jax.numpy as jnp

    from lr2ppo_tpu.config import Config, ModelConfig
    from lr2ppo_tpu.models import ScoreModel, SeqScoreModel
    from lr2ppo_tpu.train.ppo import make_rollout_step, make_update_step

    monkeypatch.setattr(mesh_mod, "ZERO1_MIN_ELEMENTS", 0)
    ctx = DeviceCtx(dp=8, tp=1, fsdp=True)
    mcfg = ModelConfig(family="multimodal", feat_size=32, seq_length=4,
                       max_imgs=2, num_heads=2, mode="reg")
    cfg = Config(model=mcfg)
    actor = ScoreModel(mcfg, jnp.float32)
    critic = SeqScoreModel(mcfg, jnp.float32)
    reward = SeqScoreModel(mcfg, jnp.float32)

    b, tags = 16, 2
    rng = np.random.default_rng(0)
    text = np.asarray(rng.standard_normal(
        (b, tags, mcfg.seq_length, mcfg.feat_size)), np.float32)
    img = np.asarray(rng.standard_normal(
        (b, mcfg.max_imgs, mcfg.feat_size)), np.float32)
    state0 = np.broadcast_to(np.arange(tags, dtype=np.int32),
                             (b, tags)).copy()
    idx4 = jnp.zeros((b, 4), jnp.int32)

    ka, kc, kr = jax.random.split(jax.random.PRNGKey(0), 3)
    tj, ij = jnp.asarray(text), jnp.asarray(img)
    actor_p = ctx.place_params(actor.init(ka, tj, ij))
    critic_p = ctx.place_params(critic.init(kc, tj, ij, idx4))
    reward_p = ctx.place_params(reward.init(kr, tj, ij, idx4))
    # the fsdp layout really landed on the trainable trees
    assert any("dp" in tuple(l.sharding.spec)
               for l in jax.tree.leaves(actor_p)
               if getattr(l, "ndim", 0) >= 2)

    tx = ctx.wrap_optimizer(build_optimizer(OptimConfig(), 10))
    astate = init_state(actor_p, tx)
    cstate = init_state(critic_p, tx)
    textd, imgd, state0d = (ctx.put_array(x) for x in (text, img, state0))

    rollout = make_rollout_step(actor, critic, reward, mcfg.mode)
    scores, value, next_state, rew = rollout(
        astate.params, cstate.params, reward_p, textd, imgd, state0d)
    update = make_update_step(actor, critic, tx, tx, cfg)
    astate2, cstate2, metrics = update(
        astate, cstate, jax.random.PRNGKey(1), textd, imgd, state0d,
        next_state, scores, rew, value)
    for v in jax.tree.leaves(metrics):
        assert np.isfinite(np.asarray(v)).all()
    for st in (astate2, cstate2):
        assert any("dp" in tuple(l.sharding.spec)
                   for l in jax.tree.leaves(st.params)
                   if getattr(l, "ndim", 0) >= 2), \
            "params lost the fsdp placement through the PPO update"

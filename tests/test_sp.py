"""Sequence-parallel activation sharding (`--sp`,
`TowerConfig.seq_parallel`): the residual stream between encoder layers
is constrained P('dp','tp') — stored seq-sharded over tp with GSPMD
inserting the attention-boundary collectives. Numerics must be
IDENTICAL to the unconstrained tp run (a with_sharding_constraint never
changes values, only placement); this pins forward + grads + one train
step at tp=2.

No reference counterpart (SURVEY §2.5); TPU-native scaling on top of
parity, the activation-side companion of megatron tp.
"""
import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lr2ppo_tpu.parallel.mesh import make_mesh, shard_params
from lr2ppo_tpu.towers.model import TowerConfig, TowerModel

needs8 = pytest.mark.skipif(len(jax.devices()) < 8,
                            reason="needs 8-device mesh")

B, S, V, L = 8, 16, 32, 2


def _cfg(sp: bool):
    return TowerConfig.from_dict(dict(
        emb_size=16, hidden_size=16, feedforward_size=32, heads_num=2,
        layers_num=L, max_seq_length=S, dropout=0.0, vocab_size=V,
        embedding=["word", "pos"], encoder="transformer",
        mask="fully_visible", target=["mlm"], seq_parallel=sp))


def _batch(seed=0):
    rng = np.random.default_rng(seed)
    src = jnp.asarray(rng.integers(5, V, (B, S)), jnp.int32)
    tgt = jnp.where(src % 7 == 0, src, 0)
    seg = jnp.ones((B, S), jnp.int32)
    return src, tgt, seg


@needs8
def test_sp_matches_tp_forward_and_grads():
    src, tgt, seg = _batch()
    mesh = make_mesh(dp=4, tp=2)
    model_sp, model_tp = TowerModel(_cfg(True)), TowerModel(_cfg(False))
    params = model_tp.init(jax.random.PRNGKey(0), src, tgt, seg)
    params = shard_params(params, mesh)

    def run(model):
        def loss(p):
            return model.apply(p, src, tgt, seg, deterministic=True)[0]

        with jax.set_mesh(mesh):
            l, g = jax.jit(jax.value_and_grad(loss))(params)
        return float(l), jax.tree.map(np.asarray, jax.device_get(g))

    l_sp, g_sp = run(model_sp)
    l_tp, g_tp = run(model_tp)
    np.testing.assert_allclose(l_sp, l_tp, rtol=1e-6)
    for (pa, a), (_pb, b) in zip(
            jax.tree_util.tree_flatten_with_path(g_sp)[0],
            jax.tree_util.tree_flatten_with_path(g_tp)[0]):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-7,
                                   err_msg=str(pa))


def test_sp_tower_runs_without_mesh_context():
    """An sp-configured tower must stay runnable OUTSIDE jax.set_mesh
    and under a mesh that lacks the tp axis (the GPipe ('dp','pp')
    mesh): bare-PartitionSpec with_sharding_constraint raises in both
    cases, so the encoder skips the constraint (towers/encoders.py sp()).
    Regression for the round-4 dryrun_multichip red: the pp leg inits
    the tower outside any mesh (__graft_entry__._dryrun_body)."""
    src, tgt, seg = _batch()
    model = TowerModel(_cfg(True))
    # no mesh context at all (empty abstract mesh)
    params = model.init(jax.random.PRNGKey(0), src, tgt, seg)
    loss = model.apply(params, src, tgt, seg, deterministic=True)[0]
    assert np.isfinite(float(loss))
    # mesh in context without a tp axis
    from jax.sharding import Mesh

    mesh = Mesh(np.asarray(jax.devices()[:2]).reshape(2, 1),
                ("dp", "pp"))
    with jax.set_mesh(mesh):
        loss2 = jax.jit(lambda p: model.apply(
            p, src, tgt, seg, deterministic=True)[0])(params)
    np.testing.assert_allclose(float(loss2), float(loss), rtol=1e-6)


@needs8
def test_sp_train_step_matches(tmp_path):
    """One AdamW step with sp == without, through the real pretrain
    step builder (make_pretrain_step_form) under the dp x tp mesh."""
    from lr2ppo_tpu.train.common import DeviceCtx, init_state
    from lr2ppo_tpu.train.optim import build_optimizer
    from lr2ppo_tpu.config import OptimConfig
    from lr2ppo_tpu.train.pretrain import make_pretrain_step_form

    src, tgt, seg = _batch()
    ctx = DeviceCtx(dp=4, tp=2)
    results = {}
    for sp in (False, True):
        model = TowerModel(_cfg(sp))
        with jax.set_mesh(ctx.mesh):
            params = model.init(jax.random.PRNGKey(0), src, tgt, seg)
        params = ctx.place_params(params)
        tx = build_optimizer(OptimConfig(), 10)
        state = init_state(params, tx)
        step = make_pretrain_step_form(model, tx, accum=1)
        from jax.sharding import NamedSharding, PartitionSpec as P

        sh = NamedSharding(ctx.mesh, P(None, "dp"))   # (accum, micro, ...)
        batch = {k: jax.device_put(np.asarray(v)[None], sh) for k, v in
                 (("src", src), ("tgt", tgt), ("seg", seg))}
        with jax.set_mesh(ctx.mesh):
            state, m = step(state, jax.random.PRNGKey(2), batch)
        results[sp] = (float(m["loss"]),
                       jax.tree.map(np.asarray,
                                    jax.device_get(state.params)))
    np.testing.assert_allclose(results[True][0], results[False][0],
                               rtol=1e-6)
    for (pa, a), (_pb, b) in zip(
            jax.tree_util.tree_flatten_with_path(results[True][1])[0],
            jax.tree_util.tree_flatten_with_path(results[False][1])[0]):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-7,
                                   err_msg=str(pa))


@needs8
def test_sp_pretrain_trainer_e2e(tmp_path):
    """PretrainTrainer with --tp 2 --sp: trains through _mesh_ctx and
    matches the tp-only run parameter-for-parameter (dropout 0)."""
    from lr2ppo_tpu.config import Config
    from lr2ppo_tpu.data.pipeline import Loader
    from lr2ppo_tpu.train.pretrain import PretrainTrainer

    class _DS:
        def __init__(self, n=32):
            rng = np.random.default_rng(0)
            src = rng.integers(5, V, (n, S)).astype(np.int32)
            self.items = [dict(src=src[i],
                               tgt=np.where(src[i] % 7 == 0, src[i],
                                            0).astype(np.int32),
                               seg=np.ones(S, np.int32))
                          for i in range(n)]

        def set_epoch(self, e):
            pass

        def __len__(self):
            return len(self.items)

        def get(self, i):
            return self.items[i]

    outs = {}
    for sp in (False, True):
        cfg = Config().replace(epochs_num=1, batch_size=8,
                               report_steps=100, seed=3,
                               output_model_path="")
        cfg.mesh.dp, cfg.mesh.tp = 4, 2
        tcfg = dataclasses.replace(_cfg(sp), dropout=0.0)
        tr = PretrainTrainer(cfg, tcfg, accumulation_steps=1)
        loader = Loader(_DS(), 8, shuffle=True, seed=5, num_workers=1)
        state, _ = tr.fit(loader, total_steps=3)
        outs[sp] = jax.tree.map(np.asarray, jax.device_get(state.params))
    for (pa, a), (_pb, b) in zip(
            jax.tree_util.tree_flatten_with_path(outs[True])[0],
            jax.tree_util.tree_flatten_with_path(outs[False])[0]):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6,
                                   err_msg=str(pa))

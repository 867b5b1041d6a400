"""GPipe pipeline parallelism (`parallel/pipeline.py`, `--pp`): the
packed/staged encoder must compute EXACTLY the plain TowerModel forward
(deterministic), its grads must match the unpipelined program, and the
pack/unpack layout round-trip must be lossless.

No reference counterpart (SURVEY §2.5: the reference's only strategy is
unsynced DP); this is TPU-native scaling on top of parity.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lr2ppo_tpu.parallel.pipeline import (
    STACK_KEY,
    check_pp_supported,
    make_pp_loss_apply,
    make_pp_mesh,
    pack_pipeline_params,
    place_pipeline_params,
    unpack_pipeline_params,
)
from lr2ppo_tpu.towers.model import TowerConfig, TowerModel

needs8 = pytest.mark.skipif(len(jax.devices()) < 8,
                            reason="needs 8-device mesh")

L, PP, M = 4, 4, 4
B, S, V = 8, 12, 32


def _cfg(**kw):
    base = dict(
        emb_size=16, hidden_size=16, feedforward_size=32, heads_num=2,
        layers_num=L, max_seq_length=S, dropout=0.1, vocab_size=V,
        embedding=["word", "pos"], encoder="transformer",
        mask="fully_visible", target=["mlm"])
    base.update(kw)
    return TowerConfig.from_dict(base)


def _batch(seed=0):
    rng = np.random.default_rng(seed)
    src = jnp.asarray(rng.integers(5, V, (B, S)), jnp.int32)
    tgt = jnp.where(src % 7 == 0, src, 0)
    seg = jnp.ones((B, S), jnp.int32)
    return src, tgt, seg


def _params(model, src, tgt, seg):
    return model.init(jax.random.PRNGKey(0), src, tgt, seg)


def test_pack_unpack_roundtrip():
    cfg = _cfg()
    model = TowerModel(cfg)
    src, tgt, seg = _batch()
    params = _params(model, src, tgt, seg)
    packed = pack_pipeline_params(params, L, PP)
    assert STACK_KEY in packed["params"]
    assert not any(k.startswith("transformer_")
                   for k in packed["params"]["encoder"])
    back = unpack_pipeline_params(packed, L, PP)
    flat_a = jax.tree_util.tree_leaves_with_path(params)
    flat_b = jax.tree_util.tree_leaves_with_path(back)
    assert len(flat_a) == len(flat_b)
    for (pa, a), (pb, b) in zip(sorted(flat_a, key=lambda t: str(t[0])),
                                sorted(flat_b, key=lambda t: str(t[0]))):
        assert str(pa) == str(pb)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_check_pp_supported_rejects():
    from lr2ppo_tpu.config import MeshConfig

    mesh_cfg = MeshConfig(pp=PP)
    check_pp_supported(_cfg(), mesh_cfg)           # happy path
    with pytest.raises(ValueError, match="parameter_sharing"):
        check_pp_supported(_cfg(parameter_sharing=True), mesh_cfg)
    with pytest.raises(ValueError, match="layers_num"):
        check_pp_supported(_cfg(layers_num=6), MeshConfig(pp=4))
    check_pp_supported(_cfg(), MeshConfig(pp=4, tp=2))  # pp x tp: ok
    with pytest.raises(ValueError, match="zero1"):
        check_pp_supported(_cfg(), MeshConfig(pp=4, zero1=True))
    with pytest.raises(ValueError, match="seq_parallel"):
        # sp constrains over dp x tp; under the pp mesh it would be
        # silently inert (r4 advisor)
        check_pp_supported(_cfg(seq_parallel=True), MeshConfig(pp=4))


@needs8
@pytest.mark.parametrize("lnpos", ["post", "pre"])
def test_pp_forward_and_grad_parity(lnpos):
    cfg = _cfg(layernorm_positioning=lnpos)
    model = TowerModel(cfg)
    src, tgt, seg = _batch()
    params = _params(model, src, tgt, seg)
    mesh = make_pp_mesh(dp=2, pp=PP)
    packed = place_pipeline_params(pack_pipeline_params(params, L, PP),
                                   mesh)
    loss_apply = make_pp_loss_apply(model, cfg, mesh, PP, M)

    def loss_pp(p):
        l, c, d = loss_apply(p, src, tgt, seg, jax.random.PRNGKey(1),
                             deterministic=True)
        return l, (c, d)

    def loss_ref(p):
        out = model.apply(p, src, tgt, seg, deterministic=True)
        l, c, d = out
        return l, (c, d)

    (l_pp, (c_pp, d_pp)), g_pp = jax.jit(
        jax.value_and_grad(loss_pp, has_aux=True))(packed)
    (l_ref, (c_ref, d_ref)), g_ref = jax.jit(
        jax.value_and_grad(loss_ref, has_aux=True))(params)
    np.testing.assert_allclose(float(l_pp), float(l_ref), rtol=2e-5)
    assert float(c_pp) == float(c_ref) and float(d_pp) == float(d_ref)
    # grads: unpack the pp grads back to per-layer layout and compare
    g_pp_host = jax.tree.map(np.asarray, jax.device_get(g_pp))
    g_pp_un = unpack_pipeline_params(g_pp_host, L, PP)
    fa = {str(p): v for p, v in
          jax.tree_util.tree_leaves_with_path(g_pp_un)}
    fb = {str(p): v for p, v in
          jax.tree_util.tree_leaves_with_path(
              jax.tree.map(np.asarray, jax.device_get(g_ref)))}
    assert fa.keys() == fb.keys()
    for k in fb:
        np.testing.assert_allclose(fa[k], fb[k], rtol=5e-4, atol=1e-5,
                                   err_msg=k)


@needs8
def test_pp_tp_forward_and_grad_parity():
    """pp x tp composition (VERDICT r4 #5): dp=2 x pp=2 x tp=2 over the
    fake 8-device mesh — the stage scan manual over dp/pp, megatron tp
    auto inside each stage (shard_map axis_names) — must reproduce the
    unstaged single-program loss and grads exactly, with the stacked
    kernels actually carrying both pp and tp in their shardings."""
    pp = 2
    cfg = _cfg()
    model = TowerModel(cfg)
    src, tgt, seg = _batch()
    params = _params(model, src, tgt, seg)
    mesh = make_pp_mesh(dp=2, pp=pp, tp=2)
    packed = place_pipeline_params(pack_pipeline_params(params, L, pp),
                                   mesh)
    # placement sanity: a stacked qkv kernel is sharded over BOTH axes
    qkv = packed["params"][STACK_KEY]["self_attn"]["linear_layers_0"][
        "kernel"]
    names = {e for e in qkv.sharding.spec if e}
    assert names == {"pp", "tp"}, qkv.sharding

    loss_apply = make_pp_loss_apply(model, cfg, mesh, pp, M)

    def loss_pp(p):
        l, c, d = loss_apply(p, src, tgt, seg, jax.random.PRNGKey(1),
                             deterministic=True)
        return l, (c, d)

    def loss_ref(p):
        l, c, d = model.apply(p, src, tgt, seg, deterministic=True)
        return l, (c, d)

    (l_pp, (c_pp, d_pp)), g_pp = jax.jit(
        jax.value_and_grad(loss_pp, has_aux=True))(packed)
    (l_ref, (c_ref, d_ref)), g_ref = jax.jit(
        jax.value_and_grad(loss_ref, has_aux=True))(params)
    np.testing.assert_allclose(float(l_pp), float(l_ref), rtol=2e-5)
    assert float(c_pp) == float(c_ref) and float(d_pp) == float(d_ref)
    g_pp_un = unpack_pipeline_params(
        jax.tree.map(np.asarray, jax.device_get(g_pp)), L, pp)
    fa = {str(p): v for p, v in
          jax.tree_util.tree_leaves_with_path(g_pp_un)}
    fb = {str(p): v for p, v in
          jax.tree_util.tree_leaves_with_path(
              jax.tree.map(np.asarray, jax.device_get(g_ref)))}
    assert fa.keys() == fb.keys()
    for k in fb:
        np.testing.assert_allclose(fa[k], fb[k], rtol=5e-4, atol=1e-5,
                                   err_msg=k)


@needs8
def test_pp_remat_grad_parity():
    """cfg.remat composes with pp (raw jax.checkpoint around the staged
    layer fn): identical grads, activations recomputed in the backward."""
    import dataclasses

    cfg = _cfg(dropout=0.0)
    model = TowerModel(cfg)
    src, tgt, seg = _batch()
    params = _params(model, src, tgt, seg)
    mesh = make_pp_mesh(dp=2, pp=PP)
    packed = place_pipeline_params(pack_pipeline_params(params, L, PP),
                                   mesh)
    grads = {}
    for name, c in [("plain", cfg),
                    ("remat", dataclasses.replace(cfg, remat=True))]:
        la = make_pp_loss_apply(model, c, mesh, PP, M)
        grads[name] = jax.jit(jax.grad(
            lambda p, la=la: la(p, src, tgt, seg, jax.random.PRNGKey(1),
                                deterministic=True)[0]))(packed)
    for (pa, a), (_pb, b) in zip(
            jax.tree_util.tree_flatten_with_path(grads["plain"])[0],
            jax.tree_util.tree_flatten_with_path(grads["remat"])[0]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7, err_msg=str(pa))


class _TokDS:
    """Tiny fixed MLM dataset for the trainer e2e legs."""

    def __init__(self, n=32, seed=0):
        rng = np.random.default_rng(seed)
        src = rng.integers(5, V, (n, S)).astype(np.int32)
        self.items = [dict(src=src[i],
                           tgt=np.where(src[i] % 7 == 0, src[i],
                                        0).astype(np.int32),
                           seg=np.ones(S, np.int32)) for i in range(n)]

    def set_epoch(self, e):
        pass

    def __len__(self):
        return len(self.items)

    def get(self, i):
        return self.items[i]


def _pretrain(pp, tmp_path, steps=4, resume=False, tp=1):
    from lr2ppo_tpu.config import Config
    from lr2ppo_tpu.data.pipeline import Loader
    from lr2ppo_tpu.train.pretrain import PretrainTrainer

    cfg = Config().replace(epochs_num=4, batch_size=16,
                           report_steps=2, seed=3,
                           output_model_path=str(tmp_path / f"pp{pp}tp{tp}"))
    cfg.mesh.dp = (8 // (pp * tp) if pp > 1 else 8)
    cfg.mesh.pp = pp
    cfg.mesh.tp = tp
    # dropout=0 so pp vs plain is comparable (the dropout STREAMS
    # legitimately differ between the GSPMD and shard_map paths)
    tcfg = _cfg(dropout=0.0)
    if resume:
        cfg = cfg.replace(save_state_steps=2,
                          resume_path=str(tmp_path / f"pp{pp}.state"))
    tr = PretrainTrainer(cfg, tcfg, accumulation_steps=2)
    loader = Loader(_TokDS(), 16, shuffle=True, seed=5, num_workers=1)
    state, best = tr.fit(loader, total_steps=steps)
    return tr, state, best, cfg


@needs8
@pytest.mark.heavy
def test_pp_trainer_matches_plain_and_exports_unpacked(tmp_path):
    """PretrainTrainer --pp 4: same params as the plain dp run after 4
    steps (dropout 0), and the saved model checkpoint is the UNPACKED
    per-layer layout loadable by a plain TowerModel apply."""
    from lr2ppo_tpu.train import checkpoints

    tr_pp, st_pp, _, cfg_pp = _pretrain(4, tmp_path)
    tr_pl, st_pl, _, _ = _pretrain(1, tmp_path)
    un = unpack_pipeline_params(
        jax.tree.map(np.asarray, jax.device_get(st_pp.params)), L, 4)
    fa = {str(p): v for p, v in jax.tree_util.tree_leaves_with_path(un)}
    fb = {str(p): v for p, v in jax.tree_util.tree_leaves_with_path(
        jax.tree.map(np.asarray, jax.device_get(st_pl.params)))}
    assert fa.keys() == fb.keys()
    for k in fb:
        np.testing.assert_allclose(fa[k], fb[k], rtol=5e-3, atol=2e-4,
                                   err_msg=k)
    # the final model checkpoint on disk is per-layer (unpacked) and
    # applies through a PLAIN (non-pp) TowerModel
    saved = checkpoints.load_any(cfg_pp.output_model_path)
    assert STACK_KEY not in saved["params"]
    assert "transformer_0" in saved["params"]["encoder"]
    model = TowerModel(_cfg(dropout=0.0))
    src, tgt, seg = _batch(seed=9)
    out = model.apply(saved, src, tgt, seg, deterministic=True)
    assert np.isfinite(float(out[0]))


@needs8
@pytest.mark.heavy
def test_pp_tp_trainer_matches_plain(tmp_path):
    """PretrainTrainer --pp 2 --tp 2 (dp=2): the composed mesh trains
    to the same params as the plain dp-8 run (dropout 0) — the e2e leg
    on top of test_pp_tp_forward_and_grad_parity's program-level
    proof."""
    tr_ppt, st_ppt, _, _ = _pretrain(2, tmp_path, tp=2)
    tr_pl, st_pl, _, _ = _pretrain(1, tmp_path)
    un = unpack_pipeline_params(
        jax.tree.map(np.asarray, jax.device_get(st_ppt.params)), L, 2)
    fa = {str(p): v for p, v in jax.tree_util.tree_leaves_with_path(un)}
    fb = {str(p): v for p, v in jax.tree_util.tree_leaves_with_path(
        jax.tree.map(np.asarray, jax.device_get(st_pl.params)))}
    assert fa.keys() == fb.keys()
    for k in fb:
        np.testing.assert_allclose(fa[k], fb[k], rtol=5e-3, atol=2e-4,
                                   err_msg=k)


@needs8
@pytest.mark.heavy
def test_pp_state_resume_roundtrip(tmp_path):
    """A --pp run resumes from its packed step checkpoint: the restored
    run continues to the step budget with the stacked params re-placed
    P('pp') (the documented pp .state layout contract)."""
    from lr2ppo_tpu.config import Config
    from lr2ppo_tpu.data.pipeline import Loader
    from lr2ppo_tpu.train.pretrain import PretrainTrainer

    def mk(resume_path=""):
        cfg = Config().replace(
            epochs_num=4, batch_size=16, report_steps=100, seed=3,
            output_model_path=str(tmp_path / "pp4"),
            resume_path=resume_path)
        cfg.mesh.dp, cfg.mesh.pp = 2, 4
        return PretrainTrainer(cfg, _cfg(dropout=0.0),
                               accumulation_steps=2)

    def loader():
        return Loader(_TokDS(), 16, shuffle=True, seed=5, num_workers=1)

    mk().fit(loader(), total_steps=2, save_checkpoint_steps=2)
    state_r, _ = mk(resume_path=str(tmp_path / "pp4-2")).fit(
        loader(), total_steps=4)
    leaf = jax.tree.leaves(state_r.params["params"][STACK_KEY])[0]
    assert "pp" in tuple(leaf.sharding.spec)
    assert int(state_r.step) == 4


@needs8
@pytest.mark.heavy
def test_pp_training_matches_plain(tmp_path):
    """Three optimizer steps pipelined == three steps plain (both
    deterministic), and the stacked params stay pp-sharded."""
    import optax

    cfg = _cfg()
    model = TowerModel(cfg)
    src, tgt, seg = _batch()
    params = _params(model, src, tgt, seg)
    mesh = make_pp_mesh(dp=2, pp=PP)
    packed = place_pipeline_params(pack_pipeline_params(params, L, PP),
                                   mesh)
    loss_apply = make_pp_loss_apply(model, cfg, mesh, PP, M)
    tx = optax.adamw(1e-3)

    @jax.jit
    def step_pp(p, st):
        g = jax.grad(lambda q: loss_apply(
            q, src, tgt, seg, jax.random.PRNGKey(1),
            deterministic=True)[0])(p)
        upd, st = tx.update(g, st, p)
        return optax.apply_updates(p, upd), st

    @jax.jit
    def step_ref(p, st):
        g = jax.grad(lambda q: model.apply(
            q, src, tgt, seg, deterministic=True)[0])(p)
        upd, st = tx.update(g, st, p)
        return optax.apply_updates(p, upd), st

    p_pp, st_pp = packed, jax.jit(tx.init)(packed)
    p_ref, st_ref = params, jax.jit(tx.init)(params)
    for _ in range(3):
        p_pp, st_pp = step_pp(p_pp, st_pp)
        p_ref, st_ref = step_ref(p_ref, st_ref)
    stacked = p_pp["params"][STACK_KEY]
    leaf = jax.tree.leaves(stacked)[0]
    assert "pp" in tuple(leaf.sharding.spec), leaf.sharding
    un = unpack_pipeline_params(
        jax.tree.map(np.asarray, jax.device_get(p_pp)), L, PP)
    fa = {str(p): v for p, v in jax.tree_util.tree_leaves_with_path(un)}
    fb = {str(p): v for p, v in jax.tree_util.tree_leaves_with_path(
        jax.tree.map(np.asarray, jax.device_get(p_ref)))}
    for k in fb:
        # adamw's m/sqrt(v) normalization amplifies the pipeline's
        # different float accumulation order (grads themselves match to
        # 5e-4 rel — the parity test above); after 3 steps the params
        # agree to ~1e-4 abs on O(1e-3)-scale updates
        np.testing.assert_allclose(fa[k], fb[k], rtol=5e-3, atol=2e-4,
                                   err_msg=k)

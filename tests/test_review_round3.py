"""Regression tests for the round-3 post-landing review findings
(multi-host save/metric gating, wrap-validity masks on sharded chunked
loaders)."""
import pytest
import numpy as np

from lr2ppo_tpu.data.pipeline import Loader, ProcessLoader


class _TinyDs:
    def __init__(self, n):
        self.n = n

    def set_epoch(self, epoch):
        pass

    def __len__(self):
        return self.n

    def get(self, i):
        return {"y": np.int32(i)}


def _wrap_valid_case(loader_cls):
    # n=40, bs=12 -> the last global batch holds 4 real + 8 wrapped
    # rows; world=2, chunks=2 interleaves each rank's slice per chunk.
    # _valid must equal (local_idx >= 0) exactly — computed elementwise,
    # not reconstructed from a count.
    n, world, chunks, bs = 40, 2, 2, 12
    ds = _TinyDs(n)
    order = np.arange(n)  # shuffle=False keeps the identity order
    last = np.concatenate([order[36:], order[:8] - n])
    m, ml = bs // chunks, (bs // chunks) // world
    for rank in range(world):
        ld = loader_cls(ds, bs, shuffle=False, num_workers=1,
                        shard=(rank, world), shard_chunks=chunks)
        got = {k: np.array(v) for k, v in list(ld)[-1].items()}
        if hasattr(ld, "close"):
            ld.close()  # after the copy: slots are shm-backed
        sel = np.concatenate([np.arange(a * m + rank * ml,
                                        a * m + (rank + 1) * ml)
                              for a in range(chunks)])
        idx = last[sel]
        assert "_valid" in got, "wrapped final batch must carry _valid"
        np.testing.assert_array_equal(got["_valid"], idx >= 0)
        # the data itself must be the wrap-recovered rows (i % n)
        np.testing.assert_array_equal(np.asarray(got["y"]), idx % n)


def test_thread_loader_wrap_valid_elementwise():
    _wrap_valid_case(Loader)


def test_process_loader_wrap_valid_elementwise():
    _wrap_valid_case(ProcessLoader)


def test_save_checkpoint_only_rank0_writes(tmp_path, monkeypatch):
    # pod contract: non-zero ranks run the gather but never touch the
    # file (unsynchronized multi-GB writes to one shared path corrupt it)
    import jax

    from lr2ppo_tpu.train import checkpoints

    tree = {"w": np.ones((2, 2), np.float32)}
    p = tmp_path / "sub" / "m.ckpt"
    monkeypatch.setattr(jax, "process_index", lambda: 1)
    checkpoints.save_checkpoint(str(p), tree)
    assert not p.exists() and not p.parent.exists()
    monkeypatch.setattr(jax, "process_index", lambda: 0)
    checkpoints.save_checkpoint(str(p), tree)
    loaded, _meta = checkpoints.load_checkpoint(str(p))
    np.testing.assert_array_equal(np.asarray(loaded["w"]), tree["w"])


def test_metric_logger_gated_to_rank0(tmp_path, monkeypatch):
    import jax

    from lr2ppo_tpu.utils.logging import MetricLogger

    p = tmp_path / "m.jsonl"
    monkeypatch.setattr(jax, "process_index", lambda: 1)
    ml = MetricLogger(str(p))
    ml.log(0, loss=1.0)
    assert ml.path is None and not p.exists()
    monkeypatch.setattr(jax, "process_index", lambda: 0)
    ml0 = MetricLogger(str(p))
    ml0.log(0, loss=1.0)
    assert p.exists()


@pytest.mark.heavy
def test_transformer_encoder_remat_applies():
    # remat must be flax's lifted nn.remat: raw jax.checkpoint around a
    # bound-module closure leaks scope tracers and crashed every apply
    import jax
    import jax.numpy as jnp

    from lr2ppo_tpu.towers import TowerConfig
    from lr2ppo_tpu.towers.encoders import build_encoder

    base = dict(emb_size=16, hidden_size=16, feedforward_size=32,
                heads_num=4, layers_num=2, max_seq_length=16,
                dropout=0.0, vocab_size=24, encoder="transformer")
    emb = jnp.asarray(
        np.random.RandomState(7).randn(2, 6, 16).astype(np.float32))
    seg = np.ones((2, 6), np.int32)
    outs = {}
    for remat in (False, True):
        cfg = TowerConfig.from_dict({**base, "remat": remat})
        enc = build_encoder(cfg)
        params = enc.init(jax.random.PRNGKey(0), emb, seg)
        outs[remat] = np.asarray(enc.apply(params, emb, seg))
        # and under grad, where remat actually fires
        g = jax.grad(lambda p: enc.apply(p, emb, seg).sum())(params)
        assert all(np.isfinite(np.asarray(x)).all()
                   for x in jax.tree.leaves(g))
    np.testing.assert_allclose(outs[True], outs[False], rtol=1e-6)


def test_clr_target_partial_stream_dicts():
    # stream dicts that omit pooling/hidden_size inherit the base config
    # (same overlay rule as build_encoder), instead of KeyError
    import jax
    import jax.numpy as jnp

    from lr2ppo_tpu.towers import TowerConfig, build_model

    cfg = TowerConfig.from_dict({
        "emb_size": 16, "hidden_size": 16, "feedforward_size": 32,
        "heads_num": 4, "layers_num": 1, "max_seq_length": 16,
        "dropout": 0.0, "vocab_size": 24, "embedding": ["word"],
        "encoder": "dual", "target": ["clr"], "projection": True,
        "feature_size": 8, "pooling": "mean",
        "stream_0": {"encoder": "transformer"},
        "stream_1": {"encoder": "transformer", "pooling": "first"},
    })
    model = build_model(cfg)
    rng = np.random.RandomState(3)
    src = (jnp.asarray(rng.randint(1, 24, (4, 6)), jnp.int32),
           jnp.asarray(rng.randint(1, 24, (4, 5)), jnp.int32))
    seg = (jnp.ones((4, 6), jnp.int32), jnp.ones((4, 5), jnp.int32))
    params = model.init(jax.random.PRNGKey(0), src, jnp.arange(4), seg)
    loss, _c, _d = model.apply(params, src, jnp.arange(4), seg)
    assert np.isfinite(float(loss))


def test_dense_dtype_none_keeps_bf16():
    # dtype=None must mean 'keep the input dtype': x.astype(None)
    # canonicalizes to float32, silently doubling activation width
    import jax
    import jax.numpy as jnp

    from lr2ppo_tpu.models.layers import TorchDense, cast

    x16 = jnp.ones((2, 4), jnp.bfloat16)
    assert cast(x16, None).dtype == jnp.bfloat16
    assert cast(x16, jnp.float32).dtype == jnp.float32
    dense = TorchDense(8)
    p = dense.init(jax.random.PRNGKey(0), x16)
    assert dense.apply(p, x16).dtype == jnp.bfloat16
    x32 = jnp.ones((2, 4), jnp.float32)
    assert dense.apply(p, x32).dtype == jnp.float32


def test_init_logger_file_handler_rank0(tmp_path, monkeypatch):
    import logging as pylogging

    import jax

    from lr2ppo_tpu.utils.logging import init_logger

    p = tmp_path / "run.log"
    monkeypatch.setattr(jax, "process_index", lambda: 1)
    lg = init_logger(str(p), name="t_rank1")
    assert not any(isinstance(h, pylogging.FileHandler)
                   for h in lg.handlers)
    assert not p.exists()
    monkeypatch.setattr(jax, "process_index", lambda: 0)
    lg0 = init_logger(str(p), name="t_rank0")
    assert any(isinstance(h, pylogging.FileHandler) for h in lg0.handlers)

"""Regression tests for the round-1 code-review findings."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lr2ppo_tpu.config import Config, _merge_into
from lr2ppo_tpu.data.pipeline import Loader


class _TinyDs:
    def __init__(self, n=10, fail_at=None):
        self.n = n
        self.fail_at = fail_at

    def __len__(self):
        return self.n

    def get(self, i):
        if self.fail_at is not None and i == self.fail_at:
            raise RuntimeError("corrupt item")
        return {"x": np.full(3, i, np.float32)}


def test_loader_marks_wrap_padding():
    ds = _TinyDs(10)
    loader = Loader(ds, batch_size=4, shuffle=False)
    batches = list(loader)
    assert len(batches) == 3
    assert "_valid" not in batches[0]
    valid = batches[-1]["_valid"]
    assert valid.tolist() == [True, True, False, False]  # 10 % 4 = 2 real
    # wrapped rows still carry real data (training uses them)
    assert np.isfinite(batches[-1]["x"]).all()


def test_loader_propagates_worker_errors():
    loader = Loader(_TinyDs(10, fail_at=5), batch_size=4, shuffle=False)
    with pytest.raises(RuntimeError, match="corrupt item"):
        list(loader)


def test_loader_bounded_inflight_window():
    # producer must not materialize the whole epoch up front: with many
    # batches, peak concurrently-held results stay near the window size
    import threading

    held = []
    lock = threading.Lock()

    class Tracking(_TinyDs):
        def get(self, i):
            with lock:
                held.append(i)
            return super().get(i)

    loader = Loader(Tracking(400), batch_size=4, shuffle=False,
                    num_workers=2, prefetch_depth=2)
    it = iter(loader)
    next(it)
    # after one consumed batch, only ~window batches may have been built
    with lock:
        built = len(held) // 4
    assert built <= 2 + 2 + 2, f"built {built} batches ahead"
    for _ in it:
        pass


def test_loader_reuse_buffers_yields_correct_content():
    ds = _TinyDs(40)
    plain = [b["x"].copy() for b in Loader(ds, 4, shuffle=False)]
    reuse_loader = Loader(ds, 4, shuffle=False, reuse_buffers=True,
                          num_workers=2, prefetch_depth=1)
    reused = [b["x"].copy() for b in reuse_loader]
    for a, b in zip(plain, reused):
        np.testing.assert_array_equal(a, b)
    # the pool persists and is recycled across epochs
    assert len(reuse_loader._pool) > 0
    again = [b["x"].copy() for b in reuse_loader]
    for a, b in zip(plain, again):
        np.testing.assert_array_equal(a, b)


def test_loader_reuse_buffers_slow_consumer_no_corruption():
    # Round-1 advisor HIGH finding: with a pool of window+2 slots, batch j
    # reused the slot of batch j-window-2 — exactly the batch a slow
    # consumer had just dequeued and was still reading. Hold each batch
    # while the producer races ahead and check it is never overwritten.
    import time

    class Slow(_TinyDs):
        def get(self, i):
            time.sleep(0.0002)  # keep workers busy so the window fills
            return super().get(i)

    ds = Slow(600)
    loader = Loader(ds, 4, shuffle=False, reuse_buffers=True,
                    num_workers=4, prefetch_depth=2)
    for k, batch in enumerate(loader):
        expect = np.stack([np.full(3, 4 * k + j, np.float32)
                           for j in range(4)])
        time.sleep(0.002)  # producer fills the queue + in-flight window
        np.testing.assert_array_equal(
            batch["x"], expect,
            err_msg=f"batch {k} mutated while held by the consumer")


def test_flat_max_imgs_routes_to_model_and_data():
    cfg = _merge_into(Config(), {"max_imgs": 8})
    assert cfg.model.max_imgs == 8
    assert cfg.data.max_imgs == 8


def test_cli_max_imgs_updates_both():
    from lr2ppo_tpu.config import parse_config

    cfg = parse_config(["--max_imgs", "4"])
    assert cfg.data.max_imgs == 4
    assert cfg.model.max_imgs == 4


def test_gatedcnn_layers_have_distinct_params():
    from lr2ppo_tpu.towers import TowerConfig
    from lr2ppo_tpu.towers.encoders import GatedcnnEncoder

    # emb_size == hidden_size: a name collision would silently SHARE the
    # stem's weights with layer 1
    cfg = TowerConfig.from_dict(dict(
        emb_size=16, hidden_size=16, layers_num=3, kernel_size=3,
        block_size=2, encoder="gatedcnn", dropout=0.0, vocab_size=10))
    enc = GatedcnnEncoder(cfg)
    x = jnp.ones((2, 6, 16))
    params = enc.init(jax.random.PRNGKey(0), x, jnp.ones((2, 6), jnp.int32))
    names = set(params["params"].keys())
    assert "conv_stem_w" in names
    assert "conv_layer_0_w" in names and "conv_layer_1_w" in names
    assert len(names) == 4 * 3  # (conv+gate) x (w+b) x 3 layers / 2... 12


def test_pretrain_norm_target_out():
    from lr2ppo_tpu.train.pretrain import _norm_target_out

    l, c, d = _norm_target_out((jnp.asarray(1.0), jnp.asarray(2.0)), 8)
    assert float(d) == 8.0
    l, c, d = _norm_target_out(
        (jnp.asarray(1.0), jnp.asarray(2.0), jnp.asarray(3.0)), 8)
    assert float(d) == 3.0
    l, c, d = _norm_target_out(
        {"mlm": (jnp.asarray(1.0), jnp.asarray(1.0), jnp.asarray(4.0)),
         "sp": (jnp.asarray(0.5), jnp.asarray(1.0))}, 8)
    assert float(l) == pytest.approx(1.5)


def test_letor_queries_split_selection(tmp_path):
    import h5py

    from lr2ppo_tpu.cli._common import letor_queries

    for split, qid in (("train", 1), ("test", 2)):
        with h5py.File(tmp_path / f"{split}.h5", "w") as hf:
            hf.create_dataset(str(qid),
                              data=np.zeros((4, 6), np.float32))
    assert letor_queries(str(tmp_path)).qids == [1]
    assert letor_queries(str(tmp_path), "test").qids == [2]

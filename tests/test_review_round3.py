"""Regression tests for the round-3 post-landing review findings
(multi-host save/metric gating, wrap-validity masks on sharded chunked
loaders)."""
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

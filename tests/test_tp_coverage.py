"""tp rule-table coverage guard (VERDICT r2 weak #8): a new large module
whose name misses parallel/mesh.py:_RULES must FAIL LOUDLY instead of
silently replicating across tp ranks."""

import numpy as np
import pytest

from jax.sharding import PartitionSpec as P

from lr2ppo_tpu.parallel.mesh import (
    assert_tp_coverage, make_mesh, param_shardings)


def _tree(extra=None):
    t = {"params": {
        "trunk": {"out_layer": {"fc1": {
            "kernel": np.zeros((1024, 1024), np.float32),
            "bias": np.zeros((1024,), np.float32)}}},
        "embedding": {"word": {
            "embedding": np.zeros((2048, 512), np.float32)}},
    }}
    if extra:
        t["params"].update(extra)
    return t


def test_unmatched_large_kernel_raises_under_tp():
    mesh = make_mesh(dp=4, tp=2)
    bad = {"shiny_new_block": {"kernel": np.zeros((2048, 512), np.float32)}}
    with pytest.raises(ValueError, match="shiny_new_block"):
        param_shardings(_tree(bad), mesh)
    # explicit opt-out still available
    sh = param_shardings(_tree(bad), mesh, check_coverage=False)
    assert sh["params"]["shiny_new_block"]["kernel"].spec == P()


def test_known_replicated_and_small_params_pass():
    mesh = make_mesh(dp=4, tp=2)
    # fc1 matches a rule; the embedding table is known-replicated;
    # small leaves are below the threshold
    small = {"tiny": {"kernel": np.zeros((8, 8), np.float32)}}
    sh = param_shardings(_tree(small), mesh)
    assert sh["params"]["trunk"]["out_layer"]["fc1"]["kernel"].spec == \
        P(None, "tp")
    assert_tp_coverage(_tree(small), mesh)   # no raise


def test_tp1_never_raises():
    mesh = make_mesh(dp=8, tp=1)
    bad = {"shiny_new_block": {"kernel": np.zeros((2048, 512), np.float32)}}
    param_shardings(_tree(bad), mesh)        # replicated is fine at tp=1

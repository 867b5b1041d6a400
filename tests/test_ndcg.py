"""NDCG tests: golden values, the ideal<=1e-6 -> 1 edge case (reference
ndcg.py:40-41), masked-padding invariance, and host/device agreement."""

import jax.numpy as jnp
import numpy as np

from lr2ppo_tpu.ops import (
    AverageNDCGMeter,
    NDCG_AT_K_DEFAULT,
    dcg_at_k,
    ndcg_at_k,
    ndcg_from_scores,
)


def test_dcg_golden():
    rel = np.array([3, 2, 0, 1])
    # (2^3-1)/log2(2) + (2^2-1)/log2(3) + 0 + (2^1-1)/log2(5)
    expect = 7.0 + 3.0 / np.log2(3) + 1.0 / np.log2(5)
    assert abs(dcg_at_k(rel, 10) - expect) < 1e-9
    assert abs(dcg_at_k(rel, 2) - (7.0 + 3.0 / np.log2(3))) < 1e-9


def test_ndcg_all_zero_ideal_is_one():
    assert ndcg_at_k(np.zeros(5), np.zeros(5), 5) == 1.0
    v = ndcg_from_scores(jnp.arange(5.0), jnp.zeros(5), ks=(5,))
    assert float(v[0]) == 1.0


def test_ndcg_perfect_ranking_is_one():
    gold = np.array([2, 1, 0, 1, 2])
    scores = np.array([5.0, 2.0, 0.1, 2.5, 7.0])
    order = np.argsort(-scores)
    pred_rel = gold[order]
    ideal = np.sort(gold)[::-1]
    for k in NDCG_AT_K_DEFAULT:
        host = ndcg_at_k(pred_rel, ideal, k)
        assert host <= 1.0 + 1e-9
    dev = ndcg_from_scores(jnp.array(scores), jnp.array(gold))
    host_vec = [ndcg_at_k(pred_rel, ideal, k) for k in NDCG_AT_K_DEFAULT]
    np.testing.assert_allclose(np.asarray(dev), host_vec, rtol=1e-5)


def test_device_matches_host_random():
    # single padded shape + mask: the bucketed eval path (one compile)
    rng = np.random.RandomState(7)
    T = 32
    for _ in range(8):
        t = rng.randint(2, 30)
        gold = rng.randint(0, 3, size=t)
        scores = rng.randn(t)
        order = np.argsort(-scores, kind="stable")
        pred_rel = gold[order]
        ideal = np.sort(gold)[::-1]
        host = [ndcg_at_k(pred_rel, ideal, k) for k in NDCG_AT_K_DEFAULT]
        pad_gold = np.zeros(T); pad_gold[:t] = gold
        pad_scores = np.zeros(T); pad_scores[:t] = scores
        mask = np.arange(T) < t
        dev = np.asarray(ndcg_from_scores(
            jnp.array(pad_scores), jnp.array(pad_gold), mask=jnp.array(mask)))
        np.testing.assert_allclose(dev, host, rtol=5e-5, atol=1e-6)


def test_masked_padding_invariance():
    gold = np.array([2, 0, 1], dtype=np.float32)
    scores = np.array([0.3, 0.9, -0.2], dtype=np.float32)
    base = np.asarray(ndcg_from_scores(jnp.array(scores), jnp.array(gold)))
    pad_gold = jnp.array(np.concatenate([gold, np.array([2, 2], np.float32)]))
    pad_scores = jnp.array(np.concatenate([scores, np.array([9.9, 9.9], np.float32)]))
    mask = jnp.array([True, True, True, False, False])
    padded = np.asarray(ndcg_from_scores(pad_scores, pad_gold, mask=mask))
    np.testing.assert_allclose(padded, base, rtol=1e-6)


def test_meter_value_mean():
    m = AverageNDCGMeter(ndcg_at_k=[1, 5])
    m.compute_ndcg_at_k(np.array([2, 1, 0]), np.array([2, 1, 0]))
    m.compute_ndcg_at_k(np.array([0, 1, 2]), np.array([2, 1, 0]))
    vals = m.value()
    assert vals[1] == (1.0 + 0.0 / 1.0) / 2  # second list has rel-0 at pos 1
    assert 0.0 < vals[5] <= 1.0


def test_meter_extend_matches_compute():
    m1 = AverageNDCGMeter()
    m2 = AverageNDCGMeter()
    rng = np.random.RandomState(0)
    rows = []
    for _ in range(4):
        gold = rng.randint(0, 3, size=10)
        scores = rng.randn(10)
        order = np.argsort(-scores, kind="stable")
        m1.compute_ndcg_at_k(gold[order], np.sort(gold)[::-1])
        rows.append(np.asarray(ndcg_from_scores(jnp.array(scores), jnp.array(gold))))
    m2.extend(np.stack(rows))
    v1, v2 = m1.value(), m2.value()
    for k in m1.ndcg_at_k:
        assert abs(v1[k] - v2[k]) < 1e-5

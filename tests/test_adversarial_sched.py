"""Adversarial perturbation semantics + the full scheduler zoo."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lr2ppo_tpu.ops.adversarial import (
    adversarial_grads,
    fgm_perturb,
    pgd_perturb,
)
from lr2ppo_tpu.train.optim import make_schedule


def _params():
    return {
        "embedding": {"table": jnp.ones((4, 3))},
        "encoder": {"kernel": jnp.ones((3, 3))},
    }


def test_fgm_only_touches_embedding_leaves():
    p = _params()
    g = jax.tree.map(jnp.ones_like, p)
    p2 = fgm_perturb(p, g, epsilon=0.5)
    assert not np.allclose(p2["embedding"]["table"], p["embedding"]["table"])
    np.testing.assert_array_equal(np.asarray(p2["encoder"]["kernel"]),
                                  np.asarray(p["encoder"]["kernel"]))
    # perturbation has the requested L2 norm
    delta = np.asarray(p2["embedding"]["table"] - p["embedding"]["table"])
    assert np.linalg.norm(delta) == pytest.approx(0.5, rel=1e-5)


def test_fgm_zero_grad_is_noop():
    p = _params()
    g = jax.tree.map(jnp.zeros_like, p)
    p2 = fgm_perturb(p, g, epsilon=0.5)
    np.testing.assert_array_equal(np.asarray(p2["embedding"]["table"]),
                                  np.asarray(p["embedding"]["table"]))


def test_pgd_projection_bounds_radius():
    p = _params()
    g = jax.tree.map(jnp.ones_like, p)
    cur = p
    for _ in range(5):
        cur = pgd_perturb(cur, p, g, epsilon=0.2, alpha=0.3)
    delta = np.asarray(cur["embedding"]["table"] - p["embedding"]["table"])
    assert np.linalg.norm(delta) <= 0.2 + 1e-5


def test_adversarial_grads_accumulates():
    p = {"embedding": {"w": jnp.asarray([1.0, 2.0])},
         "head": {"w": jnp.asarray([3.0])}}

    def loss(params):
        return (jnp.sum(params["embedding"]["w"] ** 2)
                + jnp.sum(params["head"]["w"] ** 2))

    loss_v, g = adversarial_grads(loss, p, "fgm", epsilon=0.1)
    clean = jax.grad(loss)(p)
    # total grad = clean + adversarial > clean alone (same sign here)
    assert np.all(np.abs(np.asarray(g["embedding"]["w"]))
                  > np.abs(np.asarray(clean["embedding"]["w"])))
    loss_v2, g2 = adversarial_grads(loss, p, "pgd", epsilon=0.1, pgd_k=2)
    assert np.isfinite(np.asarray(g2["head"]["w"])).all()


@pytest.mark.parametrize("name", [
    "constant", "constant_with_warmup", "linear", "cosine", "inverse_sqrt",
    "polynomial", "cosine_with_restarts", "tri_stage",
])
def test_schedule_zoo(name):
    s = make_schedule(name, base_lr=1.0, train_steps=100, warmup=0.1)
    vals = [float(s(jnp.asarray(t))) for t in range(0, 101, 10)]
    assert all(np.isfinite(v) and v >= 0 for v in vals)
    if name not in ("constant",):
        # warms up from below peak
        assert vals[0] <= vals[1] + 1e-6
    if name == "tri_stage":
        assert vals[0] == pytest.approx(0.01, rel=1e-3)   # init_lr_scale
        assert vals[-1] == pytest.approx(0.05, rel=0.3)   # final_lr_scale
    if name == "cosine_with_restarts":
        assert vals[-1] == pytest.approx(0.0, abs=1e-5)

"""Checkpoint interop roundtrips: flax -> reference-keyed torch .bin ->
flax must be the identity, and the exported file must load through the
same strict key contract the reference uses."""

import numpy as np

import jax
import jax.numpy as jnp

from lr2ppo_tpu.config import ModelConfig
from lr2ppo_tpu.models import ScoreModel, SeqScoreModel
from lr2ppo_tpu.train.checkpoints import (
    flax_to_torch,
    import_pretrained,
    save_torch_compatible,
    torch_to_flax,
)

TINY = dict(feat_size=16, seq_length=4, max_imgs=2, visual_feat_dim=16,
            num_heads=4)


def _trees_equal(a, b):
    fa = jax.tree_util.tree_leaves_with_path(a)
    fb = dict(jax.tree_util.tree_leaves_with_path(b))
    assert len(fa) == len(fb)
    for path, leaf in fa:
        assert path in fb, f"missing leaf {path}"
        np.testing.assert_allclose(np.asarray(leaf), np.asarray(fb[path]),
                                   rtol=1e-6, err_msg=str(path))


def test_actor_roundtrip(tmp_path):
    cfg = ModelConfig(**TINY)
    m = ScoreModel(cfg)
    text = jnp.ones((1, 2, 4, 16))
    img = jnp.ones((1, 2, 16))
    params = m.init(jax.random.PRNGKey(0), text, img)
    back = torch_to_flax({k: np.asarray(v)
                          for k, v in flax_to_torch(params).items()})
    _trees_equal(params["params"], back["params"])


def test_seq_model_roundtrip_through_file(tmp_path):
    cfg = ModelConfig(**TINY)
    m = SeqScoreModel(cfg)
    text = jnp.ones((1, 2, 4, 16))
    img = jnp.ones((1, 2, 16))
    idx = jnp.zeros((1, 4), jnp.int32)
    params = m.init(jax.random.PRNGKey(1), text, img, idx)
    path = str(tmp_path / "reward.bin")
    save_torch_compatible(path, params)
    loaded = import_pretrained(path)
    out_a = m.apply(params, text, img, idx)
    out_b = m.apply(loaded, text, img, idx)
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b),
                               rtol=1e-6)


def test_two_data_roundtrip_through_file(tmp_path):
    """2-data model interop: text_proj is a TOP-LEVEL flax module in
    TwoDataScoreModel (models/scorer.py:189-196) but lives in the trunk
    of the multimodal model — torch_to_flax must detect the 2-data
    layout (text_proj3 exists only there) and route it top-level, or
    the imported tree fails the first apply."""
    from lr2ppo_tpu.models import TwoDataScoreModel

    cfg = ModelConfig(family="tabular", trad_dims=(5, 9), **TINY)
    m = TwoDataScoreModel(cfg)
    k = jax.random.PRNGKey(2)
    t5 = jnp.ones((2, 3, 5))
    t9 = jnp.ones((2, 3, 9))
    trees = [m.init(k, t5), m.init(k, t9)]
    merged = dict(trees[0]["params"])
    for key, v in trees[1]["params"].items():
        merged.setdefault(key, v)
    params = {"params": merged}
    sd = flax_to_torch(params)
    assert "text_proj.fc1.weight" in sd and "text_proj3.fc1.weight" in sd
    path = str(tmp_path / "two_data.bin")
    save_torch_compatible(path, params)
    loaded = import_pretrained(path)
    _trees_equal(params["params"], loaded["params"])
    for x in (t5, t9):
        np.testing.assert_allclose(np.asarray(m.apply(params, x)),
                                   np.asarray(m.apply(loaded, x)),
                                   rtol=1e-6)


def test_exported_keys_match_reference_convention(tmp_path):
    cfg = ModelConfig(**TINY)
    m = ScoreModel(cfg)
    params = m.init(jax.random.PRNGKey(0), jnp.ones((1, 2, 4, 16)),
                    jnp.ones((1, 2, 16)))
    sd = flax_to_torch(params)
    # spot-check the reference key shapes (SURVEY §2.2 module tree)
    assert "text_proj.fc1.weight" in sd
    assert "xit.0.0.0.fn.1.queries.weight" in sd
    assert "xit.1.0.weight" in sd            # final LayerNorm
    assert "head.weight" in sd
    # torch orientation: Linear weights are (out, in)
    assert sd["text_proj.fc1.weight"].shape == (64, 16)

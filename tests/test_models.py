"""Model tests: shapes, gather semantics, and bit-level parity of the
faithful XiT block (and full scorer trunk) against the reference torch
implementation imported as an oracle from /root/reference."""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lr2ppo_tpu.config import ModelConfig
from lr2ppo_tpu.models import ScoreModel, SeqScoreModel, TwoDataScoreModel
from lr2ppo_tpu.models.layers import XiT
from lr2ppo_tpu.train.checkpoints import torch_to_flax

REF = "/root/reference"
HAS_REF = os.path.isdir(os.path.join(REF, "finetune"))

TINY = dict(feat_size=16, seq_length=4, max_imgs=2, visual_feat_dim=16,
            num_heads=4)


def tiny_cfg(**kw) -> ModelConfig:
    d = dict(TINY)
    d.update(kw)
    return ModelConfig(**d)


def test_score_model_multimodal_shapes():
    cfg = tiny_cfg(mode="reg")
    m = ScoreModel(cfg)
    key = jax.random.PRNGKey(0)
    text = jnp.ones((2, 3, 4, 16))
    img = jnp.ones((2, 2, 16))
    params = m.init(key, text, img)
    scores = m.apply(params, text, img)
    assert scores.shape == (2, 3)

    cfg_cls = tiny_cfg(mode="cls")
    m2 = ScoreModel(cfg_cls)
    p2 = m2.init(key, text, img)
    logits = m2.apply(p2, text, img)
    assert logits.shape == (2, 3, 3)


def test_score_model_tabular_shapes():
    cfg = tiny_cfg(family="tabular")
    m = ScoreModel(cfg)
    text = jnp.ones((2, 5, 16))
    params = m.init(jax.random.PRNGKey(0), text, None)
    assert m.apply(params, text, None).shape == (2, 5)


def test_seq_score_model_gather_and_shape():
    cfg = tiny_cfg()
    m = SeqScoreModel(cfg)
    key = jax.random.PRNGKey(1)
    text = jax.random.normal(key, (2, 6, 4, 16))
    img = jax.random.normal(key, (2, 2, 16))
    idx = jnp.array([[0, 1, 1, 0], [2, 3, 3, 2]])
    params = m.init(key, text, img, idx)
    out = m.apply(params, text, img, idx)
    assert out.shape == (2,)
    # gather semantics: permuting the UNUSED tags must not change output
    text2 = text.at[:, 4:].set(0.0)
    out2 = m.apply(params, text2, img, idx)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2), rtol=1e-5)


def test_two_data_model_selects_projection_by_dim():
    cfg = tiny_cfg(family="tabular", trad_dims=[5, 9])
    m = TwoDataScoreModel(cfg)
    key = jax.random.PRNGKey(2)
    xa = jnp.ones((2, 3, 5))
    xb = jnp.ones((2, 3, 9))
    pa = m.init(key, xa)
    names = set(pa["params"].keys())
    assert "text_proj" in names
    pb = m.init(key, xb)
    assert "text_proj3" in pb["params"]


@pytest.mark.skipif(not HAS_REF, reason="reference repo not mounted")
class TestReferenceParity:
    def _torch_xit(self, feat, heads, causal=False):
        import torch
        sys.path.insert(0, os.path.join(REF, "finetune"))
        import xit as ref_xit
        torch.manual_seed(0)
        kw = {"attention_mask": "causal"} if causal else {}
        m = ref_xit.XiT(feat_size=feat, num_heads=heads, **kw)
        m.eval()
        return m

    def test_xit_block_parity(self):
        import torch
        m = self._torch_xit(16, 4)
        sd = {f"xit.{k}": v.numpy() for k, v in m.state_dict().items()}
        flax_params = torch_to_flax(sd)["params"]["trunk"]["xit"]

        rng = np.random.RandomState(0)
        x = rng.randn(2, 3, 16).astype(np.float32)
        y = rng.randn(2, 5, 16).astype(np.float32)
        with torch.no_grad():
            ref = m((torch.tensor(x), torch.tensor(y))).numpy()

        ours = XiT(feat_size=16, num_heads=4, faithful=True).apply(
            {"params": flax_params}, jnp.array(x), jnp.array(y))
        np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-5)

    def test_causal_xit_is_noop_mask_parity(self):
        """The reference 'causal' mask is discarded (xit.py:138-140);
        faithful mode must reproduce that. The reference causal path calls
        .cuda(), so compare our causal-faithful output against the
        reference's FULLY-VISIBLE output — they must be identical."""
        import torch
        m = self._torch_xit(16, 4, causal=False)
        sd = {f"xitt.{k}": v.numpy() for k, v in m.state_dict().items()}
        flax_params = torch_to_flax(sd)["params"]["xitt"]

        rng = np.random.RandomState(1)
        x = rng.randn(2, 4, 16).astype(np.float32)
        with torch.no_grad():
            ref = m((torch.tensor(x), torch.tensor(x))).numpy()
        ours = XiT(feat_size=16, num_heads=4, causal=True, faithful=True).apply(
            {"params": flax_params}, jnp.array(x), jnp.array(x))
        np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-5)

    def test_full_scorer_parity(self):
        """Full multimodal Actor trunk parity: torch oracle built from the
        reference equations (ppo.py:196-244) + reference XiT, weights
        imported through torch_to_flax."""
        import torch
        import torch.nn as nn
        sys.path.insert(0, os.path.join(REF, "finetune"))
        import xit as ref_xit

        feat, seq, imgs, heads = 16, 4, 2, 4
        torch.manual_seed(3)

        class TorchMlp(nn.Module):
            def __init__(self, i, h, o):
                super().__init__()
                self.fc1 = nn.Linear(i, h)
                self.fc2 = nn.Linear(h, o)

            def forward(self, x):
                return self.fc2(torch.nn.functional.gelu(self.fc1(x)))

        class TorchActor(nn.Module):
            def __init__(self):
                super().__init__()
                self.text_proj = TorchMlp(feat, 4 * feat, feat)
                self.img_proj = TorchMlp(feat, 4 * feat, feat)
                self.xit = ref_xit.XiT(feat_size=feat, num_heads=heads)
                self.out_layer = TorchMlp((seq + imgs) * feat, 4 * feat, feat)
                self.head = nn.Linear(feat, 1)

            def forward(self, text_emb, img_emb):
                # img tiled per tag as in ppo.py:831-832
                t = self.text_proj(text_emb)
                im = self.img_proj(img_emb)
                bs, tags = t.shape[:2]
                t = t.reshape(bs * tags, seq, feat)
                im = im.reshape(bs * tags, imgs, feat)
                x = self.xit((t, im))
                x = torch.cat([x, im], dim=1)
                x = self.out_layer(x.reshape(x.shape[0], -1))
                return self.head(x.reshape(bs, tags, feat))[..., 0]

        oracle = TorchActor().eval()
        flax_params = torch_to_flax(
            {k: v.numpy() for k, v in oracle.state_dict().items()})

        cfg = tiny_cfg(num_heads=heads)
        model = ScoreModel(cfg)
        rng = np.random.RandomState(4)
        text = rng.randn(2, 3, seq, feat).astype(np.float32)
        img = rng.randn(2, imgs, feat).astype(np.float32)
        with torch.no_grad():
            t_img = torch.tensor(img)[:, None].repeat(1, 3, 1, 1)
            ref = oracle(torch.tensor(text), t_img).numpy()
        ours = model.apply(flax_params, jnp.array(text), jnp.array(img))
        np.testing.assert_allclose(np.asarray(ours), ref, atol=5e-5)

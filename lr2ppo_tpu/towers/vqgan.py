"""VQGAN image tokenizer: a weight-loadable flax implementation of the
taming-transformers VQModel *encode* path used by the reference's BEiT /
DALL-E processors (tencentpretrain/utils/image_tokenizer.py:1-80, which
wraps `taming.models.vqgan.VQModel.encode`).

TPU design notes
- NHWC layout + nn.Conv (XLA's native conv layout on TPU); the taming
  checkpoint's NCHW/OIHW tensors are transposed once at import.
- The whole encode (conv stack -> quant_conv -> nearest-codebook argmin)
  is one jittable function: the argmin over the (N, n_embed) distance
  matrix is a single matmul + reduction on the MXU, not a Python loop.
- `load_taming_checkpoint` maps the published checkpoint keys
  (encoder.*, quant_conv.*, quantize.embedding.weight) onto this module
  tree; random init works without weights so the data pipeline is
  testable end-to-end.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Array = jax.Array


@dataclass(frozen=True)
class VQGANConfig:
    """Mirrors taming's ddconfig + quantizer sizes (vqgan.yaml
    model.params). Defaults: the published imagenet f16-1024 model."""

    ch: int = 128
    ch_mult: Tuple[int, ...] = (1, 1, 2, 2, 4)
    num_res_blocks: int = 2
    attn_resolutions: Tuple[int, ...] = (16,)
    resolution: int = 256
    in_channels: int = 3
    z_channels: int = 256
    n_embed: int = 1024
    embed_dim: int = 256
    dropout: float = 0.0

    @property
    def tokens_per_image(self) -> int:
        f = 2 ** (len(self.ch_mult) - 1)
        return (self.resolution // f) ** 2


def _swish(x: Array) -> Array:
    return x * jax.nn.sigmoid(x)


def _gn(x: Array, name: str) -> Array:
    """taming GroupNorm(32, C): 32 groups at real widths, C groups when
    a tiny test config has fewer than 32 channels."""
    return nn.GroupNorm(min(32, x.shape[-1]), epsilon=1e-6, name=name)(x)


class ResnetBlock(nn.Module):
    out_ch: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        h = _gn(x, "norm1")
        h = nn.Conv(self.out_ch, (3, 3), padding=1, name="conv1")(_swish(h))
        h = _gn(h, "norm2")
        h = _swish(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = nn.Conv(self.out_ch, (3, 3), padding=1, name="conv2")(h)
        if x.shape[-1] != self.out_ch:
            x = nn.Conv(self.out_ch, (1, 1), name="nin_shortcut")(x)
        return x + h


class AttnBlock(nn.Module):
    @nn.compact
    def __call__(self, x: Array) -> Array:
        b, h, w, c = x.shape
        n = _gn(x, "norm")
        q = nn.Conv(c, (1, 1), name="q")(n).reshape(b, h * w, c)
        k = nn.Conv(c, (1, 1), name="k")(n).reshape(b, h * w, c)
        v = nn.Conv(c, (1, 1), name="v")(n).reshape(b, h * w, c)
        attn = jax.nn.softmax(
            jnp.einsum("bqc,bkc->bqk", q, k) * (c ** -0.5), axis=-1)
        out = jnp.einsum("bqk,bkc->bqc", attn, v).reshape(b, h, w, c)
        return x + nn.Conv(c, (1, 1), name="proj_out")(out)


class VQGANEncoder(nn.Module):
    """conv_in -> per-level resblocks (+attn) + stride-2 downsample ->
    mid (res, attn, res) -> norm/conv_out -> quant_conv -> nearest
    codebook indices."""

    cfg: VQGANConfig = VQGANConfig()

    @nn.compact
    def __call__(self, pixels01: Array,
                 deterministic: bool = True) -> Tuple[Array, Array]:
        """pixels01: (B, C, H, W) floats in [0, 1] (the repo's image
        convention). Returns (indices (B, N), z_q (B, N, embed_dim))."""
        cfg = self.cfg
        x = 2.0 * pixels01 - 1.0          # preprocess_vqgan
        x = jnp.transpose(x, (0, 2, 3, 1))  # NCHW -> NHWC
        h = nn.Conv(cfg.ch, (3, 3), padding=1, name="conv_in")(x)
        res = cfg.resolution
        for i, mult in enumerate(cfg.ch_mult):
            out_ch = cfg.ch * mult
            for j in range(cfg.num_res_blocks):
                h = ResnetBlock(out_ch, cfg.dropout,
                                name=f"down_{i}_block_{j}")(
                    h, deterministic)
                if res in cfg.attn_resolutions:
                    h = AttnBlock(name=f"down_{i}_attn_{j}")(h)
            if i != len(cfg.ch_mult) - 1:
                # taming Downsample: pad (0,1,0,1) + stride-2 valid conv
                hp = jnp.pad(h, ((0, 0), (0, 1), (0, 1), (0, 0)))
                h = nn.Conv(out_ch, (3, 3), strides=2, padding="VALID",
                            name=f"down_{i}_downsample")(hp)
                res //= 2
        h = ResnetBlock(h.shape[-1], cfg.dropout, name="mid_block_1")(
            h, deterministic)
        h = AttnBlock(name="mid_attn_1")(h)
        h = ResnetBlock(h.shape[-1], cfg.dropout, name="mid_block_2")(
            h, deterministic)
        h = _gn(h, "norm_out")
        h = nn.Conv(cfg.z_channels, (3, 3), padding=1,
                    name="conv_out")(_swish(h))
        z = nn.Conv(cfg.embed_dim, (1, 1), name="quant_conv")(h)

        # taming's VectorQuantizer inits U(-1/n, 1/n); flax's
        # nn.initializers.uniform samples [0, scale) only, so build the
        # symmetric distribution explicitly (checkpoint loads overwrite
        # this; it matters for the weightless testable-pipeline path)
        codebook = self.param(
            "codebook",
            lambda key, shape, dtype: jax.random.uniform(
                key, shape, dtype, minval=-1.0 / cfg.n_embed,
                maxval=1.0 / cfg.n_embed),
            (cfg.n_embed, cfg.embed_dim), jnp.float32)
        b, gh, gw, c = z.shape
        zf = z.reshape(b, gh * gw, c)
        # ||z - e||^2 = |z|^2 - 2 z.e + |e|^2; argmin via one matmul
        d = (jnp.sum(zf ** 2, -1, keepdims=True)
             - 2.0 * zf @ codebook.T
             + jnp.sum(codebook ** 2, -1)[None, None])
        idx = jnp.argmin(d, axis=-1)
        return idx, codebook[idx]


def load_taming_checkpoint(path: str, cfg: Optional[VQGANConfig] = None
                           ) -> dict:
    """Map a taming-transformers VQModel checkpoint (the published
    vqgan_imagenet_f16_*.ckpt files) onto VQGANEncoder params."""
    import torch

    payload = torch.load(path, map_location="cpu", weights_only=False)
    sd = payload.get("state_dict", payload)
    tree: dict = {}

    def put(pathparts, arr):
        node = tree
        for p in pathparts[:-1]:
            node = node.setdefault(p, {})
        node[pathparts[-1]] = jnp.asarray(arr)

    def conv_w(v):
        return np.transpose(v.numpy(), (2, 3, 1, 0))  # OIHW -> HWIO

    for k, v in sd.items():
        parts = k.split(".")
        if k == "quantize.embedding.weight":
            put(("codebook",), v.numpy())
            continue
        if parts[0] == "quant_conv":
            leaf = "kernel" if parts[1] == "weight" else "bias"
            put(("quant_conv", leaf),
                conv_w(v) if leaf == "kernel" else v.numpy())
            continue
        if parts[0] != "encoder":
            continue  # decoder / loss weights: encode path only
        parts = parts[1:]
        if parts[0] == "down":
            i, kind = parts[1], parts[2]
            if kind == "block":
                mod = (f"down_{i}_block_{parts[3]}", parts[4])
                tail = parts[5]
            elif kind == "attn":
                mod = (f"down_{i}_attn_{parts[3]}", parts[4])
                tail = parts[5]
            else:  # downsample.conv.{weight,bias}
                mod = (f"down_{i}_downsample",)
                tail = parts[4]
        elif parts[0] == "mid":
            mod = (f"mid_{parts[1]}", parts[2])
            tail = parts[3]
        else:  # conv_in / norm_out / conv_out
            mod = (parts[0],)
            tail = parts[1]
        is_norm = "norm" in mod[-1] or mod[0] == "norm_out"
        if tail == "weight":
            leaf, arr = (("scale", v.numpy()) if is_norm
                         else ("kernel", conv_w(v)))
        else:
            leaf, arr = "bias", v.numpy()
        put(mod + (leaf,), arr)
    if cfg is not None and "codebook" in tree:
        cb = tree["codebook"]
        if cb.shape != (cfg.n_embed, cfg.embed_dim):
            raise ValueError(
                f"VQGAN checkpoint codebook {cb.shape} does not match "
                f"config (n_embed={cfg.n_embed}, "
                f"embed_dim={cfg.embed_dim}) — pass the VQGANConfig the "
                f"checkpoint was trained with (e.g. f16_1024 vs f16_16384)")
    return {"params": tree}


def make_image_tokenizer(cfg: Optional[VQGANConfig] = None,
                         weights_path: Optional[str] = None,
                         seed: int = 0):
    """Returns (tokenize_fn, cfg): tokenize_fn(pixels01 (B,C,H,W)) ->
    (B, N) int32 codebook indices, jit-compiled. Random params when no
    weights_path (testable pipeline; pass the published ckpt for real
    tokens)."""
    cfg = cfg or VQGANConfig()
    model = VQGANEncoder(cfg)
    if weights_path:
        params = load_taming_checkpoint(weights_path, cfg)
    else:
        dummy = jnp.zeros((1, cfg.in_channels, cfg.resolution,
                           cfg.resolution), jnp.float32)
        params = model.init(jax.random.PRNGKey(seed), dummy)

    @jax.jit
    def tokenize(pixels01):
        idx, _ = model.apply(params, pixels01)
        return idx

    return tokenize, cfg

"""Fusion building blocks: Mlp and the XiT cross-attention transformer.

TPU-native re-design of the reference blocks (finetune/xit.py, plus the
Mlp duplicated in every driver, e.g. finetune/ppo.py:154-170). Faithful
mode reproduces the reference's attention quirks exactly so imported
PyTorch checkpoints produce identical outputs:

  * no pre-softmax scaling; probabilities are divided by sqrt(feat_size)
    AFTER the softmax (xit.py:142-143);
  * the 'causal' mask is a NO-OP — the reference calls the non-in-place
    `energy.masked_fill(...)` and discards the result (xit.py:138-140),
    so causal XiT attends fully-visibly.

Fast mode (`faithful=False`) is standard pre-scaled dot-product attention
with a real causal mask option.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

Array = jax.Array


def torch_linear_kernel_init(dtype=jnp.float32):
    """torch.nn.Linear default: kaiming_uniform(a=sqrt(5)) == U(+-1/sqrt(fan_in))."""
    return jax.nn.initializers.variance_scaling(
        1.0 / 3.0, "fan_in", "uniform", dtype=dtype
    )


def torch_linear_bias_init(fan_in: int, dtype=jnp.float32):
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0

    def init(key, shape, dtype=dtype):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def cast(x: Array, dtype) -> Array:
    """dtype=None means KEEP x's dtype: `x.astype(None)` is NOT a no-op
    (jnp canonicalizes None to float32, silently upcasting bf16
    activations to double-width f32 matmuls)."""
    return x if dtype is None else x.astype(dtype)


def normal_002_init(dtype=jnp.float32):
    """Reference from-scratch init: normal(0, 0.02) (ppo.py:362-365)."""
    return jax.nn.initializers.normal(0.02, dtype=dtype)


class TorchDense(nn.Module):
    """Dense layer matching torch.nn.Linear's default init.

    `init_style`: 'torch_default' | 'normal_0.02' (reference init paths,
    see pointwise.py:239-271 vs ppo.py:362-365).
    """

    features: int
    init_style: str = "torch_default"
    use_bias: bool = True
    dtype: Optional[jnp.dtype] = None
    # int8 weight-static / activation-dynamic matmul (ops/int8.py) for
    # FROZEN models (the stage-3 reward, ppo.py:780): v5e MXU runs
    # s8xs8->s32 at 2x the bf16 rate and the kernel bytes halve
    int8: bool = False

    @nn.compact
    def __call__(self, x: Array, params_only: bool = False):
        fan_in = x.shape[-1]
        if self.init_style == "normal_0.02":
            kinit = normal_002_init()
            binit = normal_002_init()
        else:
            kinit = torch_linear_kernel_init()
            binit = torch_linear_bias_init(fan_in)
        kernel = self.param("kernel", kinit, (fan_in, self.features), jnp.float32)
        use_int8 = False
        if self.int8:
            from lr2ppo_tpu.ops.int8 import int8_matmul, should_quantize

            # small kernels (qkv 768x768, heads) never pay off in int8
            # and stay plain bf16 — no kernel_scale param, matching
            # quantize_tree's gate (measured ledger in ops/int8.py)
            use_int8 = should_quantize((fan_in, self.features))
        if use_int8:
            kernel_scale = self.param(
                "kernel_scale", jax.nn.initializers.ones, (self.features,),
                jnp.float32)
        if params_only:
            # declare and hand back the leaves for an externally-fused
            # consumer (XiT routes its whole int8 FFN through one Pallas
            # kernel, ops/pallas_int8_mlp.py); `x` only supplies fan_in
            bias = (self.param("bias", binit, (self.features,), jnp.float32)
                    if self.use_bias else None)
            return kernel, (kernel_scale if use_int8 else None), bias
        dt = self.dtype or x.dtype
        if use_int8:
            y = int8_matmul(x.astype(dt), kernel, kernel_scale, dt)
        else:
            y = jnp.dot(x.astype(dt), kernel.astype(dt),
                        preferred_element_type=self.dtype)
        if self.use_bias:
            bias = self.param("bias", binit, (self.features,), jnp.float32)
            y = y + bias.astype(y.dtype)
        return y


def _fused_int8_ffn_ok(int8: bool, deterministic: bool, x_shape,
                       hdn: int, out_features: int) -> bool:
    """Route an fc1->gelu->fc2 pair through the fully-fused int8 Pallas
    kernel (ops/pallas_int8_mlp.py)? Only for frozen int8 models on the
    deterministic path (the inter-fc dropout is inactive there, so
    fusing across it is exact), at shapes the kernel supports AND where
    the site is MXU-compute-bound (same gate as the unfused s8 routing
    — below it the bf16 dequant path measures faster, ops/int8.py)."""
    if not (int8 and deterministic):
        return False
    from lr2ppo_tpu.ops import int8 as int8_ops
    from lr2ppo_tpu.ops.pallas_int8_mlp import supported

    d = x_shape[-1]
    rows = math.prod(x_shape[:-1])
    return (int8_ops.fused_ffn_enabled()
            and int8_ops.should_quantize((d, hdn))
            and int8_ops.should_quantize((hdn, out_features))
            and 2 * rows * d * hdn >= int8_ops.INT8_DYNQUANT_MIN_FLOPS
            and supported(x_shape, (d, hdn), (hdn, out_features)))


def _fused_int8_ffn(fc1: "TorchDense", fc2: "TorchDense", x: Array,
                    hdn: int, out_features: int, dtype) -> Array:
    """gelu-MLP through one Pallas kernel; quant -> s8 fc1 -> gelu ->
    quant -> s8 fc2 with the intermediate VMEM-resident throughout."""
    from lr2ppo_tpu.ops.int8 import quantize_kernel
    from lr2ppo_tpu.ops.pallas_int8_mlp import pallas_int8_mlp

    k1, s1, b1 = fc1(x, params_only=True)
    # params_only reads only fan_in from its input; fc2's is hdn
    k2, s2, b2 = fc2(jnp.zeros((1, hdn), x.dtype), params_only=True)
    if k1.dtype != jnp.int8:        # unconverted (init/test) tree
        k1, s1 = quantize_kernel(k1)
    if k2.dtype != jnp.int8:
        k2, s2 = quantize_kernel(k2)
    if b1 is None:
        b1 = jnp.zeros((hdn,), jnp.float32)
    if b2 is None:
        b2 = jnp.zeros((out_features,), jnp.float32)
    out_dtype = dtype or x.dtype
    return pallas_int8_mlp(
        x.astype(out_dtype), k1, s1, b1.astype(jnp.float32),
        k2, s2, b2.astype(jnp.float32), out_dtype=out_dtype,
        interpret=jax.devices()[0].platform != "tpu")


class Mlp(nn.Module):
    """fc1 -> GELU(exact) -> drop -> fc2 -> drop (reference ppo.py:154-170)."""

    hidden_features: int
    out_features: int
    drop: float = 0.0
    init_style: str = "torch_default"
    dtype: Optional[jnp.dtype] = None
    int8: bool = False

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        fc1 = TorchDense(self.hidden_features, self.init_style,
                         dtype=self.dtype, int8=self.int8, name="fc1")
        fc2 = TorchDense(self.out_features, self.init_style,
                         dtype=self.dtype, int8=self.int8, name="fc2")
        if _fused_int8_ffn_ok(self.int8, deterministic, x.shape,
                              self.hidden_features, self.out_features):
            return _fused_int8_ffn(fc1, fc2, x, self.hidden_features,
                                   self.out_features, self.dtype)
        x = fc1(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dropout(self.drop)(x, deterministic=deterministic)
        x = fc2(x)
        x = nn.Dropout(self.drop)(x, deterministic=deterministic)
        return x


class XiTAttention(nn.Module):
    """Multi-head cross attention, Q from x, K/V from y (xit.py:113-148)."""

    feat_size: int = 768
    num_heads: int = 8
    causal: bool = False
    faithful: bool = True
    attn_drop: float = 0.0
    init_style: str = "torch_default"
    dtype: Optional[jnp.dtype] = None
    int8: bool = False

    @nn.compact
    def __call__(self, x: Array, y: Array,
                 deterministic: bool = True) -> Array:
        d = self.feat_size
        h = self.num_heads
        dh = d // h
        q = TorchDense(d, self.init_style, dtype=self.dtype, int8=self.int8,
                       name="queries")(x)
        k = TorchDense(d, self.init_style, dtype=self.dtype, int8=self.int8,
                       name="keys")(y)
        v = TorchDense(d, self.init_style, dtype=self.dtype, int8=self.int8,
                       name="values")(y)

        *bq, nq, _ = q.shape
        *bk, nk, _ = k.shape
        q = q.reshape(*bq, nq, h, dh)
        k = k.reshape(*bk, nk, h, dh)
        v = v.reshape(*bk, nk, h, dh)

        # (..., h, nq, nk); leading batch dims of y broadcast against x's
        energy = jnp.einsum("...qhd,...khd->...hqk", q, k,
                            preferred_element_type=self.dtype or jnp.float32)

        if self.faithful:
            # reference quirk: softmax of UNSCALED energies, then divide the
            # probabilities by sqrt(feat_size); the causal mask is a no-op.
            att = jax.nn.softmax(energy, axis=-1) / math.sqrt(d)
        else:
            energy = energy / math.sqrt(dh)
            if self.causal:
                mask = jnp.tril(jnp.ones((nq, nk), dtype=bool))
                energy = jnp.where(mask, energy, jnp.finfo(energy.dtype).min)
            att = jax.nn.softmax(energy, axis=-1)

        att = nn.Dropout(self.attn_drop)(att, deterministic=deterministic)
        out = jnp.einsum("...hqk,...khd->...qhd", att, v,
                         preferred_element_type=self.dtype or jnp.float32)
        out = out.reshape(*bq, nq, d)
        out = TorchDense(d, self.init_style, dtype=self.dtype,
                         int8=self.int8, name="projection")(out)
        return out


class XiT(nn.Module):
    """One pre-LN cross-attention block + FFN + final LayerNorm.

    Reference structure (xit.py:9-42): XEncoderBlock =
      ResidualAddFusion(LN_x/LN_y -> MHA -> Dropout) then
      ResidualAdd(LN -> FFN -> Dropout), followed by XFeatureLayer (LN).

    `pallas_dropout` routes the dropout sites through the Pallas TPU
    kernel (ops/pallas_dropout.py): hardware PRNG instead of threefry —
    measured ~25% of the PPO update step was threefry mask generation for
    the (B,T,196,3072) FFN masks — and masks are regenerated in the
    backward instead of stored (the 1.15GB/site HBM temps disappear).
    Statistically identical dropout, different random stream.
    """

    feat_size: int = 768
    num_heads: int = 8
    causal: bool = False
    faithful: bool = True
    drop_p: float = 0.1
    forward_drop_p: float = 0.1
    forward_expansion: int = 4
    init_style: str = "torch_default"
    pallas_dropout: bool = False
    fast_dropout: bool = False
    hash_dropout: bool = False
    dtype: Optional[jnp.dtype] = None
    int8: bool = False

    # only tensors at least this large go through the pallas kernel: the
    # hardware-PRNG win must outweigh the fusion barrier an opaque
    # pallas_call puts around the op (small sites stay threefry+fused)
    PALLAS_DROPOUT_MIN_ELEMENTS = 128 * 1024 * 1024

    def _drop(self, x: Array, rate: float, deterministic: bool) -> Array:
        from lr2ppo_tpu.ops.hash_dropout import module_dropout

        return module_dropout(self, x, rate, deterministic,
                              self.hash_dropout, self.fast_dropout,
                              self.pallas_dropout,
                              self.PALLAS_DROPOUT_MIN_ELEMENTS)

    @nn.compact
    def __call__(self, x: Array, y: Array,
                 deterministic: bool = True) -> Array:
        xn = nn.LayerNorm(epsilon=1e-5, name="ln_x")(x)
        yn = nn.LayerNorm(epsilon=1e-5, name="ln_y")(y)
        att = XiTAttention(
            feat_size=self.feat_size, num_heads=self.num_heads,
            causal=self.causal, faithful=self.faithful,
            init_style=self.init_style, dtype=self.dtype, int8=self.int8,
            name="attn",
        )(xn, yn, deterministic=deterministic)
        att = self._drop(att, self.drop_p, deterministic)
        x = x + att

        hn = nn.LayerNorm(epsilon=1e-5, name="ln_ffn")(x)
        hdn = self.forward_expansion * self.feat_size
        fc1 = TorchDense(hdn, self.init_style, dtype=self.dtype,
                         int8=self.int8, name="ffn_fc1")
        fc2 = TorchDense(self.feat_size, self.init_style, dtype=self.dtype,
                         int8=self.int8, name="ffn_fc2")
        if _fused_int8_ffn_ok(self.int8, deterministic, hn.shape, hdn,
                              self.feat_size):
            # int8 frozen-model FFN, deterministic path (dropout between
            # fc1/fc2 inactive): one fully-fused Pallas kernel — quant ->
            # s8 fc1 -> gelu -> quant -> s8 fc2 without the gelu
            # intermediate ever leaving VMEM (ops/pallas_int8_mlp.py)
            hcur = _fused_int8_ffn(fc1, fc2, hn, hdn, self.feat_size,
                                   self.dtype)
        else:
            hcur = fc1(hn)
            hcur = nn.gelu(hcur, approximate=False)
            hcur = self._drop(hcur, self.forward_drop_p, deterministic)
            hcur = fc2(hcur)
        hcur = self._drop(hcur, self.drop_p, deterministic)
        x = x + hcur

        return nn.LayerNorm(epsilon=1e-5, name="ln_out")(x)

"""Isolated study: frozen reward (SeqScoreModel) forward at flagship
shapes — bf16 vs int8-unfused vs int8-fused-FFN. Ledger feeder only."""
import dataclasses
import os
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from lr2ppo_tpu.config import ModelConfig
from lr2ppo_tpu.models import SeqScoreModel
from lr2ppo_tpu.ops import int8 as int8_mod
from lr2ppo_tpu.ops.int8 import quantize_tree

MODE = sys.argv[1]          # bf16 | int8_unfused | int8_fused
BS = int(sys.argv[2]) if len(sys.argv) > 2 else 256

int8_mod.PALLAS_FUSED_FFN = MODE == "int8_fused"
use_int8 = MODE != "bf16"

mcfg = ModelConfig(family="multimodal", seq_length=196, max_imgs=16,
                   mode="reg")
dtype = jnp.bfloat16
model = SeqScoreModel(
    dataclasses.replace(mcfg, int8=True) if use_int8 else mcfg, dtype)

key = jax.random.PRNGKey(0)
kt, ki, kp = jax.random.split(key, 3)
text = jax.random.normal(kt, (BS, 2, 196, 768), dtype)
img = jax.random.normal(ki, (BS, 16, 768), dtype)
idx4 = jnp.zeros((BS, 4), jnp.int32)

base = SeqScoreModel(mcfg, dtype)
p = jax.jit(base.init)(kp, text, img, idx4)
p = quantize_tree(p, dtype) if use_int8 else jax.tree.map(
    lambda x: x.astype(dtype), p)

fwd = jax.jit(lambda p, t, i, x: model.apply(p, t, i, x))
out = fwd(p, text, img, idx4)
print("first:", float(out[0]))            # host fetch = real barrier
for _ in range(2):
    out = fwd(p, text, img, idx4)
float(out[0])
t0 = time.perf_counter()
N = 20
for _ in range(N):
    out = fwd(p, text, img, idx4)
_ = float(out[0])
dt = (time.perf_counter() - t0) / N
print(f"STUDY {MODE} bs={BS} reward_fwd_ms={dt * 1e3:.2f}")

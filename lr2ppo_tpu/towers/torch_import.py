"""Importer for reference TencentPretrain tower checkpoints (XLM-R,
ViT, ... .bin state_dicts) -> TowerModel flax params.

Key conventions mirrored (model key shapes observed in
tencentpretrain/models/model.py composition):
  embedding.<kind>.embedding.weight      lookup tables (no transpose)
  embedding.patch.projection.weight      Conv2d (E,C,P,P) -> (C*P*P, E)
  embedding.patch.cls_emb                as-is
  encoder.transformer.<i>.<...>          -> encoder/transformer_<i>/<...>
  *.linear_layers.<j>.weight             -> linear_layers_<j>/kernel^T
  <linear>.weight / .bias                -> kernel^T / bias
  *.gamma / *.beta                       RefLayerNorm params (as-is)
  encoder.rnn.weight_ih_l0[...]          -> encoder/weight_ih_l0 (the
                                            nn.RNN nesting is dropped;
                                            rnn_forward/rnn_backward of
                                            the bi* stacks stay nested)
  encoder.conv_1.weight + conv_b1 etc.   GatedcnnEncoder Conv2d kernels
                                            + dual bias sources folded
                                            to <conv>_w / <conv>_b
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
import numpy as np

_RENAMES = {
    "transformer": "transformer_",       # encoder.transformer.3. -> transformer_3
    "linear_layers": "linear_layers_",
    "transformer_decoder": "transformer_decoder_",
}

_TABLE_LEAVES = ("gamma", "beta", "cls_emb", "logit_scale",
                 "encoder_0_projection", "encoder_1_projection")

# the reference RnnEncoder wraps torch's nn.RNN/LSTM/GRU in a `rnn`
# attribute (rnn_encoder.py:21-26), so its flat parameters arrive as
# encoder.rnn.weight_ih_l0[...]; the flax _RecurrentEncoder declares
# them directly on the encoder with the same names — drop the nesting
_RNN_LEAVES = ("weight_ih_l", "weight_hh_l", "bias_ih_l", "bias_hh_l")


def _route_tower_key(key: str):
    parts = key.split(".")
    out = []
    i = 0
    while i < len(parts):
        p = parts[i]
        if p in _RENAMES and i + 1 < len(parts) and parts[i + 1].isdigit():
            out.append(_RENAMES[p] + parts[i + 1])
            i += 2
        elif (p == "rnn" and i + 1 < len(parts)
              and parts[i + 1].startswith(_RNN_LEAVES)):
            i += 1                       # skip the nn.RNN attribute level
        else:
            out.append(p)
            i += 1
    # decoder keys: the flax attr is `decoder_mod` and its layer modules
    # are FLAT names (`transformer_decoder_0_self_attn`, ..._layer_norm_1)
    # while the torch tree nests (`decoder.transformer_decoder.0.self_attn`)
    if out and out[0] == "decoder":
        out[0] = "decoder_mod"
        if len(out) > 2 and out[1].startswith("transformer_decoder_"):
            out[1:3] = [out[1] + "_" + out[2]]
    return out


def _fold_gatedcnn(state_dict: Dict[str, np.ndarray], tree: dict) -> None:
    """Fold reference GatedcnnEncoder weights (cnn_encoder.py:17-43)
    into the flax unfold+matmul layout and REMOVE them from state_dict.

    Per conv the reference carries a Conv2d (with its own bias) plus a
    separate randn per-channel parameter added at every position
    (cnn_encoder.py:52-53,63-66) — mathematically one bias, so both sum
    into the single flax `_b` leaf. Conv2d kernels flatten to the
    (k*in, hs) causal-window matmul kernel: stem (hs,1,k,emb) and inner
    (hs,hs,k,1) both reorder to offset-major rows."""
    prefixes = [k[: -len("conv_b1")] for k in list(state_dict)
                if k.endswith("conv_b1")
                and (len(k) == len("conv_b1") or k[-len("conv_b1") - 1]
                     == ".")]

    def kernel(arr):
        a = np.asarray(arr)
        o = a.shape[0]
        if a.shape[1] == 1:                    # stem: (hs, 1, k, emb)
            a = a[:, 0]                        # (hs, k, emb)
        else:                                  # inner: (hs, hs, k, 1)
            a = a[..., 0].transpose(0, 2, 1)   # (hs, k, hs)
        return a.reshape(o, -1).T              # (k*in, hs), offset-major

    def bias(conv_bias, extra):
        return (np.asarray(conv_bias).reshape(-1)
                + np.asarray(extra).reshape(-1))

    for prefix in prefixes:
        out = {}
        for tag, stem in (("conv", "conv"), ("gate", "gate")):
            out[f"{stem}_stem_w"] = kernel(state_dict.pop(
                f"{prefix}{tag}_1.weight"))
            out[f"{stem}_stem_b"] = bias(
                state_dict.pop(f"{prefix}{tag}_1.bias"),
                state_dict.pop(f"{prefix}{tag}_b1"))
            i = 0
            while f"{prefix}{tag}.{i}.weight" in state_dict:
                out[f"{stem}_layer_{i}_w"] = kernel(state_dict.pop(
                    f"{prefix}{tag}.{i}.weight"))
                out[f"{stem}_layer_{i}_b"] = bias(
                    state_dict.pop(f"{prefix}{tag}.{i}.bias"),
                    state_dict.pop(f"{prefix}{tag}_b.{i}"))
                i += 1
        node = tree
        for p in filter(None, prefix.rstrip(".").split(".")):
            node = node.setdefault(p, {})
        for k, v in out.items():
            node[k] = jnp.asarray(v)


def torch_tower_to_flax(state_dict: Dict[str, np.ndarray]) -> dict:
    tree: dict = {}
    state_dict = dict(state_dict)
    _fold_gatedcnn(state_dict, tree)
    for key, val in state_dict.items():
        arr = np.asarray(val)
        path = _route_tower_key(key)
        leaf = path[-1]
        if leaf == "weight":
            parent = path[-2]
            if parent == "embedding" or parent == "relative_attention_bias":
                # nn.Embedding lookup: keep orientation, collapse
                # '<mod>.embedding.weight' -> '<mod>/embedding'
                path = path[:-1]
            elif parent == "projection" and arr.ndim == 4:
                # ViT Conv2d patchify (E, C, P, P) -> (C*P*P, E)
                arr = arr.reshape(arr.shape[0], -1).T
                path = path[:-1]
            elif arr.ndim == 2:
                arr = arr.T
                path = path[:-1] + ["kernel"]
            # 1-d weights (T5LayerNorm .weight) stay as-is
        elif leaf == "bias":
            pass
        elif leaf in _TABLE_LEAVES:
            pass
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = jnp.asarray(arr)
    return {"params": tree}


def load_tower_checkpoint(path: str) -> dict:
    from lr2ppo_tpu.train.checkpoints import load_torch_checkpoint

    return torch_tower_to_flax(load_torch_checkpoint(path))

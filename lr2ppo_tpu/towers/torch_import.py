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


def _route_tower_key(key: str):
    parts = key.split(".")
    out = []
    i = 0
    while i < len(parts):
        p = parts[i]
        if p in _RENAMES and i + 1 < len(parts) and parts[i + 1].isdigit():
            out.append(_RENAMES[p] + parts[i + 1])
            i += 2
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


def torch_tower_to_flax(state_dict: Dict[str, np.ndarray]) -> dict:
    tree: dict = {}
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

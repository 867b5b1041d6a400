"""Checkpointing: native (orbax if present, else npz pytree) plus a
PyTorch state_dict importer/exporter honoring the reference key contract.

Reference key contracts (SURVEY §2.2):
  * stage-1 ckpt loads into Actor strict=True (ppo.py:358-361);
  * stage-2 reward ckpt loads into BOTH Critic and Reward strict=True
    (ppo.py:769-771);
  * ppo_eval loads one ckpt into the whole ActorCritic strict=True
    ('actor.'/'critic.' prefixes, ppo_eval.py:336-343).

NOT ported: the vit_ key-prefix remap (pointwise.py:253-258) prefixes a
vit tower ckpt's keys and loads strict=False into the Classifier — which
has NO vit_* parameters, so it is a no-op in the reference (the runtime
model consumes precomputed clean_feat.h5 features, never the tower). Raw
tower checkpoints import via towers/torch_import.py instead.

The torch module tree is flat Sequentials, e.g.
  xit.0.0.0.fn.0.ln_x.weight      (pre-attention LayerNorm on queries)
  xit.0.0.0.fn.1.queries.weight   (attention projections)
  xit.0.0.1.fn.0.weight           (pre-FFN LayerNorm)
  xit.0.0.1.fn.1.0.weight         (FFN fc1)   xit.0.0.1.fn.1.3.weight (fc2)
  xit.1.0.weight                  (final LayerNorm)
which we map onto the flax tree (trunk/{text_proj,img_proj,xit,out_layer},
pos_emb, xitt, head).
"""

from __future__ import annotations

import os
import pickle
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# torch-key <-> flax-path mapping
# ---------------------------------------------------------------------------

# suffix mapping inside one XiT block: torch tail -> flax tail
_XIT_TAILS = {
    "0.0.0.fn.0.ln_x.weight": ("ln_x", "scale"),
    "0.0.0.fn.0.ln_x.bias": ("ln_x", "bias"),
    "0.0.0.fn.0.ln_y.weight": ("ln_y", "scale"),
    "0.0.0.fn.0.ln_y.bias": ("ln_y", "bias"),
    "0.0.0.fn.1.queries.weight": ("attn", "queries", "kernel"),
    "0.0.0.fn.1.queries.bias": ("attn", "queries", "bias"),
    "0.0.0.fn.1.keys.weight": ("attn", "keys", "kernel"),
    "0.0.0.fn.1.keys.bias": ("attn", "keys", "bias"),
    "0.0.0.fn.1.values.weight": ("attn", "values", "kernel"),
    "0.0.0.fn.1.values.bias": ("attn", "values", "bias"),
    "0.0.0.fn.1.projection.weight": ("attn", "projection", "kernel"),
    "0.0.0.fn.1.projection.bias": ("attn", "projection", "bias"),
    "0.0.1.fn.0.weight": ("ln_ffn", "scale"),
    "0.0.1.fn.0.bias": ("ln_ffn", "bias"),
    "0.0.1.fn.1.0.weight": ("ffn_fc1", "kernel"),
    "0.0.1.fn.1.0.bias": ("ffn_fc1", "bias"),
    "0.0.1.fn.1.3.weight": ("ffn_fc2", "kernel"),
    "0.0.1.fn.1.3.bias": ("ffn_fc2", "bias"),
    "1.0.weight": ("ln_out", "scale"),
    "1.0.bias": ("ln_out", "bias"),
}

# modules that live under the trunk in the flax tree
_TRUNK_MODULES = ("text_proj", "img_proj", "out_layer", "xit")


def _route(torch_key: str, two_data: bool = False):
    """torch state_dict key -> flax path tuple (inside one model).

    `two_data`: the 2-data model's projections are TOP-LEVEL flax
    modules (models/scorer.py:189-196 names text_proj/text_proj3 beside
    the trunk), while the multimodal model's text_proj lives inside the
    trunk — the bare key is ambiguous, so torch_to_flax detects the
    2-data layout from the state_dict (text_proj3 only exists there,
    reference pointwise_2data_trad.py:136-151)."""
    parts = torch_key.split(".")
    head_mod = parts[0]
    if head_mod in ("xit", "xitt"):
        tail = ".".join(parts[1:])
        if tail not in _XIT_TAILS:
            raise KeyError(f"unrecognized XiT key: {torch_key}")
        flax_tail = _XIT_TAILS[tail]
        if head_mod == "xit":
            return ("trunk", "xit") + flax_tail
        return ("xitt",) + flax_tail
    if head_mod in ("text_proj", "img_proj", "out_layer") or head_mod.startswith("text_proj"):
        leaf = "kernel" if parts[-1] == "weight" else "bias"
        in_trunk = head_mod in _TRUNK_MODULES and not (
            two_data and head_mod == "text_proj")
        base = (("trunk", head_mod) if in_trunk
                else (head_mod,))  # 2-data text_projN are top-level
        return base + (parts[1], leaf)
    if head_mod == "head":
        leaf = "kernel" if parts[-1] == "weight" else "bias"
        return ("head", leaf)
    if head_mod == "pos_emb":
        return ("pos_emb",)
    raise KeyError(f"unrecognized key: {torch_key}")


def _is_linear_weight(path) -> bool:
    return path[-1] == "kernel"


def torch_to_flax(state_dict: Dict[str, np.ndarray]) -> dict:
    """Convert a (single-model) torch state_dict to a flax params dict.

    Linear weights are transposed (torch stores (out, in), flax (in, out)).
    For the 2-data model, text_proj/text_proj3 are placed at the top level
    to mirror TwoDataScoreModel.
    """
    # 2-data layout iff the second projection exists (it always does in
    # that model; no other reference model has a text_proj3)
    two_data = any(k.startswith("text_proj3") for k in state_dict)
    tree: dict = {}
    for k, v in state_dict.items():
        arr = np.asarray(v)
        path = _route(k, two_data)
        if _is_linear_weight(path):
            arr = arr.T
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        # copy=True: on the CPU backend jnp.asarray can ALIAS the numpy
        # buffer, which itself shares memory with the live torch params
        # (tensor.numpy() is a view) — an in-place torch update would
        # then silently mutate the "imported" flax tree
        node[path[-1]] = jnp.asarray(np.array(arr, copy=True))
    return {"params": tree}


def split_actor_critic(state_dict: Dict[str, np.ndarray]):
    """Split an ActorCritic checkpoint ('actor.'/'critic.' prefixes,
    ppo_eval.py:336-343) into two single-model state_dicts."""
    actor, critic = {}, {}
    for k, v in state_dict.items():
        if k.startswith("actor."):
            actor[k[len("actor."):]] = v
        elif k.startswith("critic."):
            critic[k[len("critic."):]] = v
        else:
            raise KeyError(f"unexpected ActorCritic key: {k}")
    return actor, critic


def flax_to_torch(params: dict) -> Dict[str, np.ndarray]:
    """Inverse mapping: flax params -> reference-keyed numpy state_dict."""
    tree = params.get("params", params)
    flat = {}

    def walk(node, path):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(v, path + (k,))
        else:
            flat[path] = np.asarray(node)

    walk(tree, ())
    inv_tails = {v: k for k, v in _XIT_TAILS.items()}
    out = {}
    for path, arr in flat.items():
        if path[0] == "trunk":
            mod = path[1]
            if mod == "xit":
                out[f"xit.{inv_tails[path[2:]]}"] = (
                    arr.T if path[-1] == "kernel" else arr)
            else:
                leaf = "weight" if path[-1] == "kernel" else "bias"
                out[f"{mod}.{path[2]}.{leaf}"] = (
                    arr.T if path[-1] == "kernel" else arr)
        elif path[0] == "xitt":
            out[f"xitt.{inv_tails[path[1:]]}"] = (
                arr.T if path[-1] == "kernel" else arr)
        elif path[0] == "pos_emb":
            out["pos_emb.weight"] = arr
        elif path[0] == "head":
            leaf = "weight" if path[-1] == "kernel" else "bias"
            out[f"head.{leaf}"] = arr.T if path[-1] == "kernel" else arr
        elif path[0].startswith("text_proj"):  # 2-data top-level projections
            leaf = "weight" if path[-1] == "kernel" else "bias"
            out[f"{path[0]}.{path[1]}.{leaf}"] = (
                arr.T if path[-1] == "kernel" else arr)
        else:
            raise KeyError(f"unmapped flax path {path}")
    return out


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """torch.load a reference .bin checkpoint to numpy (CPU torch)."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return {k: v.numpy() for k, v in sd.items()}


def import_pretrained(path: str, kind: str = "single") -> dict:
    """kind: 'single' (Actor/Classifier/Reward ckpt) or 'actor_critic'."""
    sd = load_torch_checkpoint(path)
    if kind == "actor_critic":
        a, c = split_actor_critic(sd)
        return {"actor": torch_to_flax(a), "critic": torch_to_flax(c)}
    return torch_to_flax(sd)


# ---------------------------------------------------------------------------
# native checkpoints (save-best contract: model_saver.py:4-11)
# ---------------------------------------------------------------------------

_ASYNC_CKPTR = None


def _async_checkpointer():
    """Process-wide orbax AsyncCheckpointer (lazy singleton): one
    background write thread serializes successive saves, and an atexit
    wait guarantees the last save commits before the process exits."""
    global _ASYNC_CKPTR
    if _ASYNC_CKPTR is None:
        import atexit

        import orbax.checkpoint as ocp

        _ASYNC_CKPTR = ocp.StandardCheckpointer()
        atexit.register(_ASYNC_CKPTR.wait_until_finished)
    return _ASYNC_CKPTR


def wait_for_async_saves() -> None:
    """Block until every pending 'orbax_async' save has committed (and
    re-raise any stored background-write failure). No-op for the sync
    backends."""
    if _ASYNC_CKPTR is not None:
        _ASYNC_CKPTR.wait_until_finished()


_BACKENDS = ("pickle", "orbax", "orbax_async")


def save_checkpoint(path: str, tree, metadata: Optional[dict] = None,
                    backend: str = "pickle") -> None:
    """Save a pytree (params and/or optimizer state) atomically.

    backend 'orbax' writes an orbax-checkpoint directory (sharded-array
    aware, multi-host safe) at `path`; 'orbax_async' additionally
    overlaps the disk write with training — orbax copies device->host
    synchronously before save() returns (so the trainers' donated update
    buffers stay safe) and commits the directory from a background
    thread (trainers wait_for_async_saves() before returning); 'pickle'
    (default) writes a single portable file."""
    if backend not in _BACKENDS:
        # an unknown backend must not silently fall through to pickle
        raise ValueError(
            f"unknown ckpt_backend {backend!r}; expected one of {_BACKENDS}")
    if backend in ("orbax", "orbax_async"):
        import orbax.checkpoint as ocp

        payload = {"tree": tree, "metadata": metadata or {}}
        if backend == "orbax_async":
            _async_checkpointer().save(os.path.abspath(path), payload,
                                       force=True)
            return
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(os.path.abspath(path), payload, force=True)
        ckptr.wait_until_finished()
        return
    # Pod contract: EVERY process must run the gather (replicate_global
    # is an XLA collective for sharded leaves), but only rank 0 pays the
    # multi-GB host copy and writes — unsynchronized ranks racing one
    # file on shared storage (the normal pod setup) interleave and
    # corrupt the pickle. The reference gates saves on is_master
    # (finetune/misc.py:77-91).
    from lr2ppo_tpu.parallel.mesh import replicate_global

    tree = jax.tree.map(replicate_global, tree)
    if jax.process_index() != 0:
        return
    host_tree = jax.tree.map(np.asarray, tree)
    os.makedirs(os.path.dirname(os.path.abspath(path)) or ".", exist_ok=True)
    payload = {"tree": host_tree, "metadata": metadata or {}}
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(payload, f, protocol=4)
    os.replace(tmp, path)


def load_orbax_checkpoint(path: str):
    import orbax.checkpoint as ocp

    # a just-scheduled orbax_async save to this path may still be
    # committing in the background — reads must see the finished form
    wait_for_async_saves()
    payload = ocp.StandardCheckpointer().restore(os.path.abspath(path))
    return payload["tree"], payload.get("metadata", {})


def load_checkpoint(path: str):
    with open(path, "rb") as f:
        payload = pickle.load(f)
    return (jax.tree.map(jnp.asarray, payload["tree"]), payload["metadata"])


def load_any(path: str, kind: str = "single"):
    """Load a native checkpoint (pickle pytree, save_checkpoint), an
    orbax checkpoint directory, or a reference torch .bin
    (import_pretrained). `kind` applies to the torch path
    ('single' | 'actor_critic'); native ppo checkpoints already carry
    {'actor','critic'} subtrees."""
    # an orbax_async save to `path` may still be committing (the
    # directory only appears at commit) — settle before sniffing the form
    wait_for_async_saves()
    if os.path.isdir(path):          # orbax backend writes a directory
        tree, _meta = load_orbax_checkpoint(path)
        return tree
    try:
        tree, _meta = load_checkpoint(path)
        return tree
    except (pickle.UnpicklingError, EOFError, KeyError, UnicodeDecodeError):
        return import_pretrained(path, kind)


def save_torch_compatible(path: str, params: dict) -> None:
    """Export params as a reference-keyed torch .bin for interop."""
    import torch

    sd = {k: torch.tensor(v) for k, v in flax_to_torch(params).items()}
    os.makedirs(os.path.dirname(os.path.abspath(path)) or ".", exist_ok=True)
    torch.save(sd, path)

"""GPipe pipeline parallelism for the tower pretraining path (`--pp`).

No reference counterpart (the reference's only strategy is unsynced DP,
SURVEY §2.5) — this is a TPU-native scaling capability: the encoder's
layer stack is split into `pp` contiguous stages whose params are
STACKED on a leading axis and sharded `P("pp")` over the mesh, so each
chip materializes only `layers_num/pp` layers. The forward runs the
classic GPipe schedule as a `lax.scan` over T = M + pp - 1 ticks inside
ONE `shard_map`: at tick t, stage s processes microbatch (t - s) and the
activations `ppermute` one hop down the pp ring. XLA overlaps each
tick's compute with the ICI hop, and `jax.grad` through the
scan + ppermute yields the reverse schedule automatically — no
hand-written backward pipeline (prototype with measured forward/grad/
optimizer-step parity: studies/pp_study.py).

Scope (asserted in `check_pp_supported`): the standard transformer
encoder without parameter sharing / residual attention / relative
position bias / factorized embeddings, no decoder, layers_num % pp == 0,
and pp composes with dp AND megatron tp (`--pp N --tp M`: the stage
scan runs manually over pp while tp rides GSPMD auto inside each
stage — see make_pipelined_encoder); zero1/fsdp stay excluded. The
covered configs are the BERT/RoBERTa/XLM-R/ViT pretraining families.

Layout contract: pipeline runs keep the PACKED param layout in their
periodic `.state` checkpoints (resume with the same --pp), but the
model checkpoints (-best / final) are saved UNPACKED via
`unpack_pipeline_params`, byte-compatible with non-pp consumers and the
torch exporter.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


Array = jax.Array

# key under params['params'] holding the [pp, layers_per_stage, ...]
# stacked encoder layers (sibling of 'embedding'/'target'/...)
STACK_KEY = "_pp_stack"


def check_pp_supported(cfg, mesh_cfg) -> None:
    """Raise with a precise message when a config is outside the pp v1
    envelope — silently wrong pipelining would be far worse."""
    bad = []
    if cfg.encoder != "transformer":
        bad.append(f"encoder={cfg.encoder!r} (only 'transformer')")
    if cfg.parameter_sharing:
        bad.append("parameter_sharing (one shared layer cannot stage)")
    if cfg.has_residual_attention:
        bad.append("has_residual_attention (cross-layer state)")
    if cfg.relative_position_embedding:
        bad.append("relative_position_embedding (shared bias module)")
    if cfg.factorized_embedding_parameterization:
        bad.append("factorized_embedding_parameterization")
    if cfg.decoder:
        bad.append("decoder (pp covers the encoder stack)")
    if getattr(cfg, "seq_parallel", False):
        bad.append("seq_parallel (sp constrains over a dp×tp mesh; "
                    "under the pp mesh it would be silently inert)")
    if cfg.layers_num % mesh_cfg.pp:
        bad.append(f"layers_num={cfg.layers_num} % pp={mesh_cfg.pp} != 0")
    if mesh_cfg.zero1 or mesh_cfg.fsdp:
        bad.append("zero1/fsdp (pp composes with dp and tp only)")
    if bad:
        raise ValueError("--pp does not support this config: "
                         + "; ".join(bad))


def make_pp_mesh(dp: int, pp: int, devices=None, tp: int = 1) -> Mesh:
    """("dp", "pp") mesh: batch rows over dp, pipeline stages over pp.

    With tp > 1 the mesh gains a "tp" axis — ("dp", "pp", "tp"), tp
    innermost so megatron activation psums ride adjacent-chip ICI —
    and the stacked stage params compose P('pp') with the standard
    megatron suffix rules (place_pipeline_tree): pipeline stays MANUAL
    (shard_map over dp/pp), tensor parallelism rides GSPMD auto inside
    each stage (shard_map axis_names)."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if dp == -1:
        dp = max(n // (pp * tp), 1)
    need = dp * pp * tp
    assert need <= n, f"mesh {dp}x{pp}x{tp} needs {need} devices, have {n}"
    if tp > 1:
        grid = np.asarray(devices[:need]).reshape(dp, pp, tp)
        return Mesh(grid, axis_names=("dp", "pp", "tp"))
    grid = np.asarray(devices[:need]).reshape(dp, pp)
    return Mesh(grid, axis_names=("dp", "pp"))


def pack_pipeline_params(params, layers_num: int, pp: int):
    """Host-side repack: pull the encoder's `transformer_{i}` subtrees
    out and stack them to [pp, layers_num/pp, ...] leaves under
    STACK_KEY. The rest of the tree (embedding, target, the encoder's
    final pre-LN layer_norm, ...) is untouched."""
    tree = dict(params["params"])
    enc = dict(tree["encoder"])
    layers = [enc.pop(f"transformer_{i}") for i in range(layers_num)]
    stacked = jax.tree.map(
        lambda *leaves: np.stack([np.asarray(x) for x in leaves]).reshape(
            (pp, layers_num // pp) + np.asarray(leaves[0]).shape),
        *layers)
    tree["encoder"] = enc
    tree[STACK_KEY] = stacked
    return {"params": tree}


def unpack_pipeline_params(params, layers_num: int, pp: int):
    """Inverse of pack_pipeline_params (host values or device arrays —
    leaves are np.asarray'd, so call it on fetched/replicated trees or
    under a single process)."""
    tree = dict(params["params"])
    stacked = tree.pop(STACK_KEY)
    enc = dict(tree["encoder"])
    for i in range(layers_num):
        s, j = divmod(i, layers_num // pp)
        enc[f"transformer_{i}"] = jax.tree.map(
            lambda a, s=s, j=j: np.asarray(a)[s, j], stacked)
    tree["encoder"] = enc
    return {"params": tree}


def place_pipeline_tree(tree, mesh: Mesh):
    """Placement for ANY pytree containing packed stages: every leaf
    under a STACK_KEY node is sharded P('pp') on its stage axis (each
    pp rank holds its stage); when the mesh also has a 'tp' axis the
    stacked leaf composes the standard megatron suffix rules
    (parallel/mesh._RULES) onto its kernel axes — P('pp', None, *tp) —
    so each stage's wide matmuls split over tp too. Everything outside
    the stack is replicated (embedding/target are depth-1; the encoder
    stack is where both axes pay). Works for param trees and for
    optimizer-state trees (the moments mirror the param paths, so their
    stacked leaves sit under the same key). Single-process only (pp pods
    would assemble via global_put like shard_params; not wired in v1)."""
    has_tp = "tp" in mesh.axis_names and mesh.shape.get("tp", 1) > 1

    def spec(path, leaf):
        names = tuple(getattr(p, "key", getattr(p, "name", str(p)))
                      for p in path)
        if STACK_KEY not in names:
            return P()
        if has_tp:
            from lr2ppo_tpu.parallel.mesh import _spec_for

            tp_spec = tuple(_spec_for(path))
            # stacked leaves are [pp, layers_per_stage, *param_shape]:
            # stage axis pp-sharded, lps replicated, then the megatron
            # entries on the original param axes
            if tp_spec and getattr(leaf, "ndim", 0) == 2 + len(tp_spec):
                return P("pp", None, *tp_spec)
        return P("pp")

    shardings = jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, spec(path, leaf)), tree)
    return jax.device_put(tree, shardings)


def place_pipeline_params(packed, mesh: Mesh):
    """Param-tree convenience wrapper over place_pipeline_tree."""
    return place_pipeline_tree(packed, mesh)


def _build_layer_module(cfg, dtype):
    from lr2ppo_tpu.towers.layers import TransformerLayer

    return TransformerLayer(
        hidden_size=cfg.hidden_size, heads_num=cfg.heads_num,
        feedforward_size=cfg.feedforward_size, dropout=cfg.dropout,
        hidden_act=cfg.hidden_act,
        layernorm_positioning=cfg.layernorm_positioning,
        layernorm=cfg.layernorm, feed_forward=cfg.feed_forward,
        attention_head_size=cfg.attention_head_size,
        has_bias=not cfg.remove_transformer_bias,
        with_scale=not cfg.remove_attention_scale,
        hash_dropout=cfg.hash_dropout, dtype=dtype)


def make_pipelined_encoder(cfg, mesh: Mesh, pp: int, microbatches: int,
                           dtype=None, deterministic: bool = False):
    """Returns encode(stacked_params, emb_micro, mask_micro, rng) ->
    hidden_micro, shard_mapped over the ('dp', 'pp') mesh.
    `deterministic` is static (it gates python control flow in the
    layers), closed over at build time.

    emb_micro/mask_micro/output: [M, mb, ...] with the row axis sharded
    over dp and the microbatch axis M in the pipeline; stacked_params:
    the STACK_KEY subtree, [pp, layers_per_stage, ...] sharded P('pp').
    """
    layer_mod = _build_layer_module(cfg, dtype)
    M, S = microbatches, pp
    lps = cfg.layers_num // pp

    def body(stage_params, emb, mask, rng):
        stage_params = jax.tree.map(lambda a: a[0], stage_params)
        idx = jax.lax.axis_index("pp")
        # decorrelate dropout across dp blocks (each block draws its own
        # mask — the GSPMD path draws one global mask; stream differs,
        # independence is preserved)
        rng = jax.random.fold_in(rng, jax.lax.axis_index("dp"))
        T = M + S - 1

        def stage_fwd(x, mask_mb, key):
            def one_layer(h, xs):
                lp, j = xs
                lkey = jax.random.fold_in(key, idx * lps + j)
                out, _ = layer_mod.apply(
                    {"params": lp}, h, mask_mb, None, None,
                    deterministic, None, rngs={"dropout": lkey})
                return out, None
            if cfg.remat:
                # cfg.remat composes with pp: recompute each staged
                # layer in the backward instead of saving its
                # activations (the layer fn here is pure — raw
                # jax.checkpoint applies, unlike the bound-module case
                # in towers/encoders.py which needs nn.remat)
                one_layer = jax.checkpoint(
                    one_layer,
                    policy=jax.checkpoint_policies.nothing_saveable)
            out, _ = jax.lax.scan(one_layer, x,
                                  (stage_params, jnp.arange(lps)))
            return out

        def tick(carry, t):
            buf, outputs = carry
            inject = jnp.where(t < M, t, M - 1)
            x_in = jnp.where(idx == 0, emb[inject], buf)
            m_idx = jnp.clip(t - idx, 0, M - 1)
            active = (t - idx >= 0) & (t - idx < M)
            key = jax.random.fold_in(rng, t)
            y = stage_fwd(x_in, mask[m_idx], key)
            y = jnp.where(active, y, x_in)
            out_slot = jnp.where(t - (S - 1) >= 0, t - (S - 1), 0)
            collect = (idx == S - 1) & (t - (S - 1) >= 0)
            outputs = jax.lax.dynamic_update_index_in_dim(
                outputs,
                jnp.where(collect, y, outputs[out_slot]),
                out_slot, 0)
            buf = jax.lax.ppermute(
                y, "pp", [(i, (i + 1) % S) for i in range(S)])
            return (buf, outputs), None

        buf0 = jnp.zeros(emb.shape[1:], emb.dtype)
        outs0 = jnp.zeros(emb.shape, emb.dtype)
        (_, outputs), _ = jax.lax.scan(tick, (buf0, outs0),
                                       jnp.arange(T))
        outputs = jnp.where(idx == S - 1, outputs, 0.0)
        return jax.lax.psum(outputs, "pp")

    xspec = P(None, "dp")
    kw = {}
    if "tp" in mesh.axis_names:
        # pp x tp composition: the pipeline schedule stays MANUAL over
        # dp/pp (axis_index/ppermute on 'pp'); 'tp' is left AUTO so the
        # stage's layer matmuls keep their megatron shardings
        # (place_pipeline_tree) and GSPMD inserts the tp activation
        # psums inside each tick — the same propagation the non-pp tp
        # path relies on under pjit.
        kw["axis_names"] = {"dp", "pp"}
    return shard_map(
        body,
        mesh=mesh,
        in_specs=(P("pp"), xspec, xspec, P()),
        out_specs=xspec,
        check_vma=False,
        **kw)


def make_pp_loss_apply(model, cfg, mesh: Mesh, pp: int, microbatches: int,
                       dtype=None):
    """Returns loss_apply(packed_params, src, tgt, seg, rng) ->
    (loss, correct, denom) — the pipelined counterpart of
    `TowerModel.apply(...)` for the 'simple' batch form (mlm/lm/cls/vit):
    embedding and target run replicated over pp (they are depth-1; the
    L-layer encoder stack is where the pipeline pays), the encoder runs
    the GPipe schedule."""
    from lr2ppo_tpu.towers.layers import additive_mask_from_seg
    from lr2ppo_tpu.towers.layers import make_layer_norm
    from lr2ppo_tpu.train.pretrain import _norm_target_out

    M = microbatches

    def loss_apply(packed, src, tgt, seg, rng, deterministic=False):
        encode = make_pipelined_encoder(cfg, mesh, pp, M, dtype,
                                        deterministic=deterministic)
        tree = dict(packed["params"])
        stacked = tree.pop(STACK_KEY)
        rest = {"params": tree}
        kemb, kenc, ktgt = jax.random.split(rng, 3)

        emb = model.apply(rest, src, seg, deterministic,
                          method="embed_only", rngs={"dropout": kemb})
        mask = additive_mask_from_seg(seg, cfg.mask)
        # [B, ...] -> [M, mb, ...] microbatches for the pipeline
        b = emb.shape[0]
        assert b % M == 0, (b, M)
        fold = lambda a: a.reshape((M, b // M) + a.shape[1:])
        hidden = encode(stacked, fold(emb), fold(mask), kenc)
        hidden = hidden.reshape((b,) + hidden.shape[2:])
        if cfg.layernorm_positioning == "pre":
            # the encoder's final norm lives under its scope in the
            # unpacked tree; apply it with the same module class
            ln = make_layer_norm(cfg.layernorm, dtype, "layer_norm")
            hidden = ln.apply(
                {"params": tree["encoder"]["layer_norm"]}, hidden)
        out = model.apply(rest, hidden, tgt, seg,
                          method="target_only", rngs={"dropout": ktgt})
        return _norm_target_out(out, src.shape[0])

    return loss_apply

"""Configuration system.

Mirrors the reference's three-level precedence (reference:
tencentpretrain/utils/config.py:6-23 + tencentpretrain/opts.py): dataclass
defaults < JSON config file < explicit CLI flags. Flag names follow the
reference shell scripts (pointwise.sh / reward_pair_dataloader.sh / ppo.sh
and the *_trad variants) so a reference user can carry their launch
commands over.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys
from dataclasses import dataclass, field
from typing import Any, List, Optional


@dataclass
class ModelConfig:
    """Architecture hyperparameters of the cross-modal fusion stack.

    Reference: finetune/ppo.py:196-350 (Actor/Critic/Reward) and
    finetune/xit.py (XiT block).
    """

    feat_size: int = 768          # embedding width (XLM-R / ViT-B hidden)
    seq_length: int = 196         # text tokens per tag (reference --seq_length)
    max_imgs: int = 16            # image tokens per item (reference --max_imgs)
    visual_feat_dim: int = 768    # reference --visual_feat_dim
    num_heads: int = 8            # xit.py:114 MultiHeadAttention default
    mlp_ratio: int = 4            # Mlp hidden = 4*768, FFN expansion = 4
    drop_p: float = 0.1           # residual dropout in XiT (xit.py:27)
    forward_drop_p: float = 0.1   # FFN internal dropout (xit.py:28)
    labels_num: int = 3           # 3 relevance classes {0,1,2}
    mode: str = "reg"             # 'reg' (SmoothL1) | 'cls' (NLL 3-way)
    num_pos: int = 4              # pos_emb table size (ppo.py:256)
    # Task family: 'multimodal' (text 196x768 + img 16x768 cross-attn) or
    # 'tabular' (one 768-d doc vector self-attended; finetune/ppo_trad.py:157-167)
    family: str = "multimodal"
    # tabular raw feature dims for the 2-data unification model
    # (finetune/pointwise_2data_trad.py:136-137: 46 -> MQ2008, 136 -> Web10K)
    trad_dims: List[int] = field(default_factory=lambda: [46, 136])
    # Replicate reference attention quirks bit-for-bit (xit.py:134-143):
    # no pre-softmax scaling, softmax-then-divide-by-sqrt(feat_size), and the
    # 'causal' mask that is a no-op (non-in-place masked_fill discarded).
    # Set False for the fast path: standard scaled-dot-product attention with
    # a real causal mask.
    faithful_attention: bool = True
    # route dropout through the Pallas TPU hardware-PRNG kernel
    # (ops/pallas_dropout.py) — statistically identical, avoids threefry
    # mask generation (~25% of the PPO update step) and the HBM mask temps
    pallas_dropout: bool = False
    # jax.checkpoint the fusion trunk: recompute activations in the
    # backward instead of storing them (unlocks larger batch per chip)
    remat: bool = False
    # packed-bits dropout (ops/fast_dropout.py): 4 masks per threefry
    # uint32 — ~4x cheaper RNG, fully XLA-fused; keep probability
    # quantizes to 1/256 steps (rate 0.1 -> 0.1016)
    fast_dropout: bool = False
    # zero-residual hash dropout (ops/hash_dropout.py): murmur-mixed
    # iota masks regenerated in the backward from a scalar seed — no
    # threefry cost, no stored masks, cannot OOM; non-canonical stream
    hash_dropout: bool = False
    # int8 weight-static/activation-dynamic matmuls (ops/int8.py) — set
    # per model INSTANCE for frozen inference models (the PPO trainer
    # flips it on its reward model under ppo.reward_int8)
    int8: bool = False
    # torch-style kaiming-uniform init (matches reference stage-1 dynamics,
    # see pointwise.py:239-271 where the roberta ckpt matches no keys and the
    # torch default init survives) vs 'normal_0.02' (ppo.py:362-365 path).
    init_style: str = "torch_default"

    @property
    def fusion_tokens(self) -> int:
        """Token count entering out_layer: xit output ++ image tokens."""
        if self.family == "tabular":
            return 2  # (1+1): xit out ++ doc token (ppo_trad.py:157)
        return self.seq_length + self.max_imgs  # 196 + 16 = 212


@dataclass
class DataConfig:
    train_path: str = ""
    dev_path: str = ""
    test_path: str = ""
    # second-domain paths for the 2-data unification trainer
    # (pointwise_2data_trad.sh passes two train/dev tsv-h5 pairs)
    train_path2: str = ""
    dev_path2: str = ""
    # projection exporter (pointwise_2data_infer_trad.sh)
    input_features_path: str = ""
    output_features_path: str = ""
    case_path: str = "case/ppo_cases.json"  # ppo_eval.py:457-459
    ranking_path: str = "rankings.jsonl"    # cli/serve.py output stream
    embed_root: str = "LRMovieNet"   # dir holding clean_feat.h5 (ppo.py:65-66)
    max_tags: int = 32               # per-stage sampling width
    max_imgs: int = 16
    num_workers: int = 8             # host prefetch workers
    prefetch_depth: int = 2          # double buffering
    loader: str = "auto"             # 'process' (shared-memory workers,
    #                                  sidesteps the GIL + h5py lock),
    #                                  'thread' (in-process pool), or
    #                                  'auto' (process iff >=4 cores)
    preload: str = "auto"            # cache embeddings in host RAM:
    #                                  'auto' (when they fit), 'always',
    #                                  'never'
    item_dtype: str = "bfloat16"     # float dtype items are emitted at;
    #                                  bf16 halves collate/H2D/buffer bytes
    eval_tag_buckets: List[int] = field(default_factory=lambda: [8, 16, 32, 64, 128])
    use_native_loader: bool = True   # C++ LETOR parser when available


@dataclass
class OptimConfig:
    learning_rate: float = 2e-5
    critic_learning_rate: float = 2e-6
    optimizer: str = "adamw"          # adamw | adafactor
    scheduler: str = "linear"         # linear|cosine|constant|constant_with_warmup|...
    warmup: float = 0.1               # fraction of train_steps
    weight_decay: float = 0.01        # skipped for bias/scale params (ppo.py:381-393)
    beta1: float = 0.9
    beta2: float = 0.999
    adam_eps: float = 1e-6
    correct_bias: bool = False        # reference AdamW(correct_bias=False)
    grad_clip: Optional[float] = None
    # store Adam m/v at reduced precision (e.g. 'bfloat16') to halve the
    # optimizer-state HBM footprint; moment math stays fp32
    moment_dtype: Optional[str] = None


@dataclass
class PPOConfig:
    """Stage-3 LR2PPO hyperparameters (ppo.sh:13-41, ppo.py:724-735)."""

    max_timesteps: int = 1
    update_timesteps: int = 200
    eps_clip: float = 0.2            # parsed by reference but unused (ppo.py:730)
    kl_div_loss_weight: float = 0.001
    entropy_weight: float = 0.001
    value_clip: float = 0.5
    rank_margin: float = 0.01        # RankLoss(0.01) (ppo.py:559)
    advantage_eps: float = -0.1      # flip threshold (ppo.py:562)
    # keep the memory buffer's batches device-resident when a full
    # sweep's worth fits under this budget: the sweep then re-uploads
    # nothing (vs the reference keeping them on GPU, ppo.py:882-883)
    device_memory_gb: float = 4.0
    # run the FROZEN reward model (ppo.py:780) with int8 weights +
    # dynamic activation quantization: 2x MXU rate on its rollout
    # forward, half the HBM for its params (ops/int8.py)
    reward_int8: bool = False
    # ALSO run the rollout's actor/critic forwards int8: they are
    # no-grad (only the update step differentiates), so the trainer
    # re-quantizes the live params once per sweep and rolls out from
    # the int8 trees. Tri-state (rollout_int8_mode): '1'/True = both
    # twins (+8.6% at bs=128, but the ~1.1 GB of twins OOM bs=256 on a
    # 16 GB chip — perf_grid_r4.json); 'actor' = actor twin only (r5:
    # half the extra HBM, fits bs=256, measured 1064.5 vs 1030.1
    # samples/s = +3.3% — the fast profile's setting); '0'/False = off.
    rollout_int8: object = False
    # ---- improved-PPO options (VERDICT r2 #7; the BASELINE north star
    # names "PPO with GAE and clipped surrogate loss" but the reference
    # parses eps_clip without using it, ppo.py:730, and has no GAE).
    # Both OFF by default: the faithful reference math stays the
    # parity-exact production path. ----
    # GAE(gamma, lambda) advantages over each batch's max_timesteps
    # trajectory instead of the one-step rew - old_value
    use_gae: bool = False
    gae_gamma: float = 0.99
    gae_lambda: float = 0.95
    # add the real PPO clipped surrogate -min(r*A, clip(r,1+-eps)*A)
    # with r = the Plackett-Luce probability ratio of the ranking the
    # rollout actually took — this gives the parsed-but-dead eps_clip
    # actual semantics
    surrogate_clip: bool = False


@dataclass
class MeshConfig:
    """Device mesh layout. dp shards the batch; tp shards the wide fusion
    MLP (the 162816x3072 out_layer) across chips over ICI."""

    dp: int = -1   # -1: use all devices on the dp axis
    tp: int = 1
    # ZeRO stage 1 (parallel/mesh.py:shard_optimizer): partition the
    # persistent Adam moments across dp instead of replicating them —
    # frees (dp-1)/dp of the optimizer-state HBM on every chip; the
    # update math is unchanged (XLA all-gathers the weight update over
    # ICI). No-op at dp=1.
    zero1: bool = False
    # FSDP / ZeRO stage 3 (parallel/mesh.py:shard_params_fsdp): params
    # are STORED dp-sharded — XLA all-gathers each weight at use and
    # reduce-scatters its grads into the dp-sharded optimizer update.
    # Frees ~(dp-1)/dp of the param HBM per chip for one all-gather per
    # weight per step; implies zero1 (the moments follow the params'
    # layout). No-op at dp=1.
    fsdp: bool = False
    # GPipe pipeline parallelism for tower pretraining
    # (parallel/pipeline.py): the encoder's layer stack splits into pp
    # contiguous stages, params stacked + sharded P("pp"), the forward a
    # lax.scan GPipe schedule inside shard_map with ppermute hops over
    # ICI. v1 composes with dp only (tp=1, zero1/fsdp off). No-op at 1.
    pp: int = 1
    # pipeline microbatches per (grad-accum) micro step; 0 -> pp
    pp_microbatches: int = 0
    compute_dtype: str = "float32"   # 'bfloat16' for the fast path
    param_dtype: str = "float32"
    # Multi-host launch (the torchrun replacement, misc.py:77-91): run
    # the SAME CLI once per host with --distributed. On Cloud TPU pods
    # the coordinator/count/id resolve from the TPU metadata
    # automatically; elsewhere pass all three explicitly.
    distributed: bool = False
    coordinator: str = ""            # host:port of process 0
    num_processes: int = 0           # total processes (0 = metadata)
    process_id: int = -1             # this process's rank (-1 = metadata)
    # force a jax backend ('cpu', 'tpu', ...) BEFORE first backend use —
    # env vars alone are too late on images whose sitecustomize pins a
    # platform at interpreter start
    jax_platform: str = ""


# Named configuration profiles (one flag from any CLI / one JSON key).
# "fast" is the blessed production profile — the exact configuration
# bench.py measures (~1018 samples/s stage-3 on one v5e chip):
#   bf16 compute + bf16 Adam moments + zero-residual hash dropout +
#   size-gated int8 frozen reward (ops/int8.py; measured +1.7% step
#   rate and half the reward-model HBM; only the stage-3 trainer
#   consumes ppo.reward_int8 — the key is inert elsewhere).
# Buffer donation is unconditional in the trainers. Explicit CLI flags
# still override profile values (defaults < JSON < profile < CLI).
# "faithful" is the parity-exact default (fp32, threefry dropout).
PROFILES = {
    "fast": {
        "mesh": {"compute_dtype": "bfloat16"},
        "optim": {"moment_dtype": "bfloat16"},
        "model": {"hash_dropout": True},
        # rollout_int8='actor': int8 twin for the rollout ACTOR only
        # (critic stays bf16) — fits bs=256 where the dual-twin '1'
        # OOMs; measured 1064.5 vs 1030.1 samples/s (r5)
        "ppo": {"reward_int8": True, "rollout_int8": "actor"},
    },
    "faithful": {},
}


@dataclass
class Config:
    model: ModelConfig = field(default_factory=ModelConfig)
    data: DataConfig = field(default_factory=DataConfig)
    optim: OptimConfig = field(default_factory=OptimConfig)
    ppo: PPOConfig = field(default_factory=PPOConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)
    # named preset applied on top of JSON config (see PROFILES)
    profile: str = ""

    # trainer-level flags (names per reference scripts)
    exp_name: str = "exp"
    epochs_num: int = 3
    batch_size: int = 32
    report_steps: int = 100
    # PPO eval cadence in SWEEPS: 0 = the reference behavior (full val
    # NDCG after every sweep, ppo.py:930); N > 0 evaluates every Nth
    # sweep — at production sweep counts the full-val pass otherwise
    # dominates wall-clock
    eval_steps: int = 0
    seed: int = 7
    output_model_path: str = "ckpt/finetuned_model"
    log_path: Optional[str] = None
    pretrained_model_path: Optional[str] = None
    reward_model_path: Optional[str] = None
    config_path: Optional[str] = None
    # aux subsystems (SURVEY §5): jax.profiler trace window, full-state
    # periodic checkpointing + resume (reference has save-best only)
    profile_dir: Optional[str] = None
    save_state_steps: int = 0
    resume_path: Optional[str] = None
    # checkpoint backend for every trainer save (best + periodic .state):
    # 'pickle' (single portable file; pod rank-0 gathers and writes),
    # 'orbax' (directory; sharded-array aware — each pod host writes its
    # own shards, no full-state host gather), or 'orbax_async' (same
    # directory form, but the disk write overlaps training: orbax copies
    # device->host before save() returns — donated update buffers stay
    # safe — and commits from a background thread; trainers settle
    # pending saves before fit returns). All resume transparently: the
    # loaders detect the on-disk form (train/checkpoints.py:load_any)
    ckpt_backend: str = "pickle"

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)

    def to_dict(self) -> dict:
        return dataclasses.asdict(self)

    @classmethod
    def from_dict(cls, d: dict) -> "Config":
        return _merge_into(cls(), d)


def _merge_into(cfg: Any, overrides: dict) -> Any:
    """Recursively apply a (possibly nested or flat) dict onto a dataclass.

    Flat keys that belong to a sub-config are routed to it, so JSON configs
    may say either {"model": {"seq_length": 196}} or {"seq_length": 196}.
    """
    if not dataclasses.is_dataclass(cfg):
        return overrides
    names = {f.name: f for f in dataclasses.fields(cfg)}
    updates = {}
    for k, v in overrides.items():
        if k in names:
            cur = updates.get(k, getattr(cfg, k))
            if dataclasses.is_dataclass(cur) and isinstance(v, dict):
                updates[k] = _merge_into(cur, v)
            else:
                updates[k] = v
        else:
            # route flat key into EVERY sub-config that has it (max_imgs
            # lives in both model and data; routing to only one silently
            # desynchronizes the model geometry from the loaders)
            for f in dataclasses.fields(cfg):
                sub = updates.get(f.name, getattr(cfg, f.name))
                if dataclasses.is_dataclass(sub) and k in {
                    sf.name for sf in dataclasses.fields(sub)
                }:
                    updates[f.name] = _merge_into(sub, {k: v})
            # unknown keys are ignored (reference argparse tolerates extras)
    return dataclasses.replace(cfg, **updates)


def apply_profile(cfg: Config, name: Optional[str] = None) -> Config:
    """Overlay a named PROFILES preset (VERDICT r2 #4: one flag selects
    the benched production configuration). No-op for empty names."""
    name = cfg.profile if name is None else name
    if not name:
        return cfg
    if name not in PROFILES:
        raise ValueError(
            f"unknown profile {name!r}; available: {sorted(PROFILES)}")
    return _merge_into(cfg.replace(profile=name), PROFILES[name])


def load_hyperparam(cfg: Config, config_path: Optional[str] = None) -> Config:
    """JSON config overrides defaults (reference utils/config.py:6-23)."""
    path = config_path or cfg.config_path
    if path:
        with open(path) as f:
            cfg = _merge_into(cfg, json.load(f))
    return cfg


# ---------------------------------------------------------------------------
# CLI
# ---------------------------------------------------------------------------

_FLAG_ROUTES = {
    # flat reference flag -> (subconfig, field)
    "feat_size": ("model", "feat_size"),
    "num_heads": ("model", "num_heads"),
    "seq_length": ("model", "seq_length"),
    "visual_feat_dim": ("model", "visual_feat_dim"),
    "mode": ("model", "mode"),
    "labels_num": ("model", "labels_num"),
    "family": ("model", "family"),
    "faithful_attention": ("model", "faithful_attention"),
    "train_path": ("data", "train_path"),
    "dev_path": ("data", "dev_path"),
    "test_path": ("data", "test_path"),
    "train_path2": ("data", "train_path2"),
    "dev_path2": ("data", "dev_path2"),
    "input_features_path": ("data", "input_features_path"),
    "output_features_path": ("data", "output_features_path"),
    "case_path": ("data", "case_path"),
    "ranking_path": ("data", "ranking_path"),
    "int8": ("model", "int8"),
    "embed_root": ("data", "embed_root"),
    "max_tags": ("data", "max_tags"),
    "max_imgs": ("data", "max_imgs"),
    "learning_rate": ("optim", "learning_rate"),
    "critic_learning_rate": ("optim", "critic_learning_rate"),
    "optimizer": ("optim", "optimizer"),
    "scheduler": ("optim", "scheduler"),
    "warmup": ("optim", "warmup"),
    "max_timesteps": ("ppo", "max_timesteps"),
    "update_timesteps": ("ppo", "update_timesteps"),
    "eps_clip": ("ppo", "eps_clip"),
    "kl_div_loss_weight": ("ppo", "kl_div_loss_weight"),
    "entropy_weight": ("ppo", "entropy_weight"),
    "value_clip": ("ppo", "value_clip"),
    "rank_margin": ("ppo", "rank_margin"),
    "advantage_eps": ("ppo", "advantage_eps"),
    "device_memory_gb": ("ppo", "device_memory_gb"),
    "reward_int8": ("ppo", "reward_int8"),
    "rollout_int8": ("ppo", "rollout_int8"),
    "use_gae": ("ppo", "use_gae"),
    "gae_gamma": ("ppo", "gae_gamma"),
    "gae_lambda": ("ppo", "gae_lambda"),
    "surrogate_clip": ("ppo", "surrogate_clip"),
    "grad_clip": ("optim", "grad_clip"),
    "moment_dtype": ("optim", "moment_dtype"),
    "remat": ("model", "remat"),
    "hash_dropout": ("model", "hash_dropout"),
    "num_workers": ("data", "num_workers"),
    "prefetch_depth": ("data", "prefetch_depth"),
    "loader": ("data", "loader"),
    "preload": ("data", "preload"),
    "item_dtype": ("data", "item_dtype"),
    "dp": ("mesh", "dp"),
    "tp": ("mesh", "tp"),
    "zero1": ("mesh", "zero1"),
    "fsdp": ("mesh", "fsdp"),
    "compute_dtype": ("mesh", "compute_dtype"),
    "distributed": ("mesh", "distributed"),
    "jax_platform": ("mesh", "jax_platform"),
    "coordinator": ("mesh", "coordinator"),
    "num_processes": ("mesh", "num_processes"),
    "process_id": ("mesh", "process_id"),
}

# fields whose default is None need an explicit CLI type
_FLAG_TYPES = {"grad_clip": float, "moment_dtype": str,
               "rollout_int8": str}


def rollout_int8_mode(v) -> str:
    """Normalize PPOConfig.rollout_int8 to '0' | '1' | 'actor'.

    Accepts the bool forms (legacy/tests), the CLI's boolean spellings,
    and 'actor'/'both'. Every consumer (trainer, bench) goes through
    this so a typo fails fast instead of silently rolling out bf16."""
    if isinstance(v, bool):
        return "1" if v else "0"
    s = str(v).strip().lower()
    if s in ("1", "true", "yes", "on", "both"):
        return "1"
    if s in ("0", "false", "no", "off", ""):
        return "0"
    if s == "actor":
        return "actor"
    raise ValueError(f"rollout_int8: expected 0/1/actor, got {v!r}")

_TOP_FLAGS = [
    "exp_name", "epochs_num", "batch_size", "report_steps", "eval_steps",
    "seed",
    "output_model_path", "log_path", "pretrained_model_path",
    "reward_model_path", "config_path", "profile_dir",
    "save_state_steps", "resume_path", "profile", "ckpt_backend",
]


def build_parser(description: str = "lr2ppo-tpu") -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description=description,
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    d = Config()

    def add(flag, default, argtype):
        # bools also accept the bare-switch form (`--distributed` ==
        # `--distributed true`), matching torchrun-style launch lines
        extra = ({"nargs": "?", "const": True}
                 if isinstance(default, bool) else {})
        p.add_argument(f"--{flag}", type=argtype, default=None, **extra)

    for name in _TOP_FLAGS:
        default = getattr(d, name)
        add(name, default, _argtype(default))
    for flag, (sub, fieldname) in _FLAG_ROUTES.items():
        default = getattr(getattr(d, sub), fieldname)
        add(flag, default, _FLAG_TYPES.get(flag, _argtype(default)))
    # accepted-for-compat flags from the reference scripts (ignored).
    # --use_pairwise is dead in the reference too: every driver parses it
    # (e.g. pointwise.py:461) but no code ever reads args.use_pairwise.
    for compat in ["mask", "vocab_path", "merges_path", "tokenizer",
                   "encoder", "vit_pretrained_model_path", "vit_tokenizer",
                   "vit_config_path", "vit_encoder", "dist_url"]:
        p.add_argument(f"--{compat}", type=str, default=None)
    p.add_argument("--use_pairwise", action="store_true")
    return p


def _parse_bool(s: str) -> bool:
    v = s.lower()
    if v in ("1", "true", "yes", "on"):
        return True
    if v in ("0", "false", "no", "off"):
        return False
    # reject silently-False typos: '--distributed ture' must fail fast,
    # not strand the other pod ranks in rendezvous
    raise argparse.ArgumentTypeError(f"expected a boolean, got {s!r}")


def _argtype(default):
    if isinstance(default, bool):
        return _parse_bool
    if isinstance(default, int):
        return int
    if isinstance(default, float):
        return float
    return str


def parse_config(argv: Optional[List[str]] = None,
                 description: str = "lr2ppo-tpu") -> Config:
    """defaults < JSON config < explicit CLI flags (reference precedence)."""
    argv = sys.argv[1:] if argv is None else argv
    ns, _unknown = build_parser(description).parse_known_args(argv)
    cfg = Config()
    if ns.config_path:
        cfg = load_hyperparam(cfg, ns.config_path)
    overrides: dict = {}
    for name in _TOP_FLAGS:
        v = getattr(ns, name)
        if v is not None:
            overrides[name] = v
    cfg = _merge_into(cfg, overrides)
    # profile presets sit between JSON and explicit flags in precedence:
    # defaults < JSON < profile < routed CLI flags
    cfg = apply_profile(cfg)
    for flag, (sub, fieldname) in _FLAG_ROUTES.items():
        v = getattr(ns, flag, None)
        if v is not None:
            cfg = _merge_into(cfg, {sub: {fieldname: v}})
    # max_imgs is both model geometry (fusion_tokens -> out_layer fan-in)
    # and loader padding width: keep them in lockstep however it was set
    if getattr(ns, "max_imgs", None) is not None:
        cfg = _merge_into(cfg, {"model": {"max_imgs": ns.max_imgs}})
    return cfg

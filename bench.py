"""Headline benchmark: stage-3 LR2PPO training throughput (rollout +
update) of the flagship multimodal model on one TPU chip.

Reference baseline: the 4-GPU run logs ~95-105 s per 200-update cycle at
bs=24/GPU => ~185-200 samples/s aggregate (BASELINE.md, derived from
logs/ppo_logs/ppo_pair_dataloader.txt timestamps). We use the midpoint,
192.5 samples/s. Every sample passes the full pipeline the reference
times: actor+critic+reward rollout forwards AND the actor/critic PPO
update with both AdamW steps.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

# NOTE: jax_default_prng_impl='rbg' was tried for the dropout-mask RNG
# (threefry costs ~25% of the update step) but the rbg programs OOM at
# every batch size on the 16GB chip — threefry it stays.

# XLA compiles the 500M-param fusion model slowly (~2 min/program); the
# persistent cache makes reruns start in seconds.
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

BASELINE_SAMPLES_PER_SEC = 192.5


def fast_config():
    """The benched configuration IS the blessed `--profile fast` preset
    (config.PROFILES['fast']: bf16 compute + bf16 Adam moments + hash
    dropout + size-gated int8 frozen reward) applied to the flagship
    multimodal geometry — any
    `cli/ppo.py --profile fast` run builds this exact model/optimizer
    configuration (VERDICT r2 #4; parity test in tests/test_config.py).
    Env knobs below exist only for A/B studies."""
    import dataclasses

    from lr2ppo_tpu.config import Config, ModelConfig, apply_profile

    # pallas_dropout=False: the hardware-PRNG kernel removes the threefry
    # cost but its opaque call boundaries block XLA fusion/remat around
    # the FFN, pushing bs=256 out of memory — measured 732 samples/s at
    # bs=128 vs 758 at bs=256 with threefry. Threefry + big batch wins on
    # a single 16GB chip; the kernel stays available for memory-rich
    # configs.
    remat = os.environ.get("LR2PPO_BENCH_REMAT", "0") == "1"
    pallas_dropout = os.environ.get("LR2PPO_BENCH_PALLAS", "0") == "1"
    mcfg = ModelConfig(family="multimodal", seq_length=196, max_imgs=16,
                       mode="reg", pallas_dropout=pallas_dropout,
                       remat=remat)
    cfg = apply_profile(Config(model=mcfg), "fast")
    if pallas_dropout:
        # module_dropout dispatches hash > fast > pallas, and the fast
        # profile sets hash_dropout=True — without this the PALLAS knob
        # would silently measure the hash path (identical to baseline)
        cfg = cfg.replace(
            model=dataclasses.replace(cfg.model, hash_dropout=False))
    # hash_dropout (ops/hash_dropout.py): murmur-mixed iota masks
    # regenerated in the backward from a scalar seed. Measured bs=256:
    # update step 247.7 -> 167.6 ms — indistinguishable from dropout
    # DISABLED (166.8 ms), i.e. the entire threefry + mask-residual cost
    # (81 ms, 24% of the step) vanishes. 748 -> 979 samples/s.
    if os.environ.get("LR2PPO_BENCH_HASH", "1") != "1":
        cfg = cfg.replace(
            model=dataclasses.replace(cfg.model, hash_dropout=False))
    return cfg


def build(bs: int):
    from lr2ppo_tpu.models import ScoreModel, SeqScoreModel
    from lr2ppo_tpu.train.common import init_state
    from lr2ppo_tpu.train.optim import build_optimizer
    from lr2ppo_tpu.train.ppo import make_rollout_step, make_update_step

    cfg = fast_config()
    mcfg = cfg.model
    dtype = jnp.dtype(cfg.mesh.compute_dtype)
    # Size-gated int8 frozen reward (ops/int8.py): part of the fast
    # profile (cfg.ppo.reward_int8). Measured bs=256: 1018.1 samples/s
    # vs 1000.7 bf16 control (+1.7%) and half the reward HBM — the
    # gates quantize only >=2M-element kernels and take the s8 dot only
    # at wide compute-bound sites (ungated int8 measured 1.02x; the
    # Pallas narrow-site kernel measured 974.4 — ledgers in ops/int8.py).
    # LR2PPO_BENCH_INT8=0 is the A/B knob.
    reward_int8 = os.environ.get(
        "LR2PPO_BENCH_INT8", "1" if cfg.ppo.reward_int8 else "0") == "1"
    # LR2PPO_BENCH_ROLLOUT_INT8: A/B study — run the ROLLOUT's
    # actor/critic forwards through the same gated int8 path (they are
    # no-grad and their params are constant between update sweeps, so
    # the trainer re-quantizes once per sweep). run() quantizes ONCE
    # outside the timed loop — the amortized best case, matching a long
    # production sweep; see run() for why per-iteration quantize would
    # also OOM. Values: 0 (off), 1 (actor+critic twins — +8.6% at
    # bs=128 but the ~1.1 GB of twins OOM bs=256, perf_grid_r4.json),
    # actor (r5: actor twin only — half the extra HBM, keeps the
    # bf16 critic for the rollout V(state) forward).
    from lr2ppo_tpu.config import rollout_int8_mode

    rollout_int8 = rollout_int8_mode(os.environ.get(
        "LR2PPO_BENCH_ROLLOUT_INT8", cfg.ppo.rollout_int8))
    # LR2PPO_BENCH_FUSED_FFN=0: A/B knob for the fully-fused int8 FFN
    # Pallas kernel (ops/pallas_int8_mlp.py). The bench is single-chip,
    # where the AUTO default resolves to on; pin it explicitly so the
    # A/B states are unambiguous.
    from lr2ppo_tpu.ops import int8 as int8_mod

    int8_mod.PALLAS_FUSED_FFN = os.environ.get(
        "LR2PPO_BENCH_FUSED_FFN", "1") == "1"
    actor = ScoreModel(mcfg, dtype)
    critic = SeqScoreModel(mcfg, dtype)
    import dataclasses

    int8_mcfg = dataclasses.replace(mcfg, int8=True)
    reward = SeqScoreModel(int8_mcfg if reward_int8 else mcfg, dtype)

    tags = 2
    key = jax.random.PRNGKey(0)
    kt, ki, ka, kc, kr = jax.random.split(key, 5)
    text = jax.random.normal(
        kt, (bs, tags, mcfg.seq_length, mcfg.feat_size), dtype)
    img = jax.random.normal(ki, (bs, mcfg.max_imgs, mcfg.feat_size), dtype)
    idx4 = jnp.zeros((bs, 4), jnp.int32)
    state0 = jnp.broadcast_to(jnp.arange(tags, dtype=jnp.int32), (bs, tags))

    actor_p = jax.jit(actor.init)(ka, text, img)
    critic_p = jax.jit(critic.init)(kc, text, img, idx4)
    # frozen inference-only model: keep its params in bf16 (int8 mode
    # quantizes the kernels instead — half the bytes again)
    reward_p = jax.jit(reward.init)(kr, text, img, idx4)
    if reward_int8:
        from lr2ppo_tpu.ops.int8 import quantize_tree

        reward_p = quantize_tree(reward_p, dtype)
    else:
        reward_p = jax.tree.map(lambda x: x.astype(dtype), reward_p)

    tx = build_optimizer(cfg.optim, train_steps=1000)
    astate = init_state(actor_p, tx)
    cstate = init_state(critic_p, tx)

    if rollout_int8 != "0":
        r_actor = ScoreModel(int8_mcfg, dtype)
        r_critic = (SeqScoreModel(int8_mcfg, dtype)
                    if rollout_int8 == "1" else critic)
        rollout = make_rollout_step(r_actor, r_critic, reward, mcfg.mode)
    else:
        rollout = make_rollout_step(actor, critic, reward, mcfg.mode)
    update = make_update_step(actor, critic, tx, tx, cfg)
    quantize_a = quantize_c = None
    if rollout_int8 != "0":
        from lr2ppo_tpu.ops.int8 import quantize_tree

        quantize_a = jax.jit(lambda p: quantize_tree(p, dtype))
        if rollout_int8 == "1":
            quantize_c = quantize_a
    return (rollout, update, astate, cstate, reward_p, text, img, state0,
            (quantize_a, quantize_c))


def _sync(astate, cstate):
    """Force completion by fetching scalars that depend on the full
    update chain (head bias <- adam <- grads <- backward). NOTE:
    jax.block_until_ready returns early through the axon TPU tunnel, so
    a host fetch is the only reliable barrier."""
    a = astate.params["params"]["head"]["bias"]
    c = cstate.params["params"]["head"]["bias"]
    return float(jnp.sum(a)) + float(jnp.sum(c))


def _program_flops(jitted, *args) -> float | None:
    """FLOPs of one invocation from the compiled program's XLA cost
    model (the exact method of studies/roofline_r4.md). AOT
    lower+compile so the executable is built ONCE and reused by the
    timing loop — the persistent cache covers reruns either way.
    Returns (compiled, flops|None)."""
    compiled = jitted.lower(*args).compile()
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca["flops"])
        return compiled, (flops if flops > 0 else None)
    except Exception:
        return compiled, None


def run(bs: int, warmup: int = 2, iters: int = 8):
    """Returns (samples_per_s, flops_per_step|None) — the second term
    is the XLA cost-model FLOP count of one rollout+update at this bs,
    so main() can report achieved TFLOP/s and MFU (VERDICT r4 #4)."""
    (rollout, update, astate, cstate, reward_p,
     text, img, state0, (quantize_a, quantize_c)) = build(bs)
    rng = jax.random.PRNGKey(1)

    # rollout-int8 A/B: the trainer re-quantizes actor/critic once per
    # update SWEEP (~200 rollouts+updates amortize one ~6 ms quantize
    # pass), so the quantized trees are loop-invariant here. Quantizing
    # inside the async-dispatched loop would also pin one int8 tree
    # generation per in-flight iteration (~1.1 GB each) and OOM.
    qa = quantize_a(astate.params) if quantize_a is not None else None
    qc = quantize_c(cstate.params) if quantize_c is not None else None

    ap0 = qa if qa is not None else astate.params
    cp0 = qc if qc is not None else cstate.params
    rollout_c, rflops = _program_flops(
        rollout, ap0, cp0, reward_p, text, img, state0)
    scores0, value0, next_state0, rew0 = rollout_c(
        ap0, cp0, reward_p, text, img, state0)
    update_c, uflops = _program_flops(
        update, astate, cstate, rng, text, img, state0, next_state0,
        scores0, rew0, value0)
    flops_per_step = (rflops + uflops
                      if rflops is not None and uflops is not None
                      else None)

    def step(astate, cstate, rng):
        ap = qa if qa is not None else astate.params
        cp = qc if qc is not None else cstate.params
        scores, value, next_state, rew = rollout_c(
            ap, cp, reward_p, text, img, state0)
        rng, sub = jax.random.split(rng)
        astate, cstate, _ = update_c(
            astate, cstate, sub, text, img, state0, next_state,
            scores, rew, value)
        return astate, cstate, rng

    for _ in range(warmup):
        astate, cstate, rng = step(astate, cstate, rng)
    _sync(astate, cstate)

    t0 = time.perf_counter()
    for _ in range(iters):
        astate, cstate, rng = step(astate, cstate, rng)
    _sync(astate, cstate)
    dt = time.perf_counter() - t0
    return bs * iters / dt, flops_per_step


def _e2e_data(n_items: int = 256):
    """Synthesize (once, cached) a flagship-shape LRMovieNet fixture:
    data.json + clean_feat.h5 with (tags, 196, 768) text embeddings —
    the exact layout `cli/preprocess.py` writes and the production
    loaders read."""
    here = os.path.dirname(os.path.abspath(__file__))
    root = os.path.join(here, ".bench_data", f"movienet_{n_items}")
    jp = os.path.join(root, "data.json")
    hp = os.path.join(root, "clean_feat.h5")
    if not (os.path.exists(jp) and os.path.exists(hp)):
        sys.path.insert(0, os.path.join(here, "tests"))
        from fixtures import make_movienet

        print(f"synthesizing e2e fixture ({n_items} items) ...",
              file=sys.stderr)
        make_movienet(root, n_items=n_items, seq=196, feat=768,
                      max_tag_range=(4, 6), n_imgs_range=(8, 17), seed=0)
    return jp, hp


def run_e2e(bs: int = 256, batches: int = 30) -> dict:
    """End-to-end benchmark (VERDICT r2 #3): the PRODUCTION input
    pipeline — Loader(reuse_buffers) over a real clean_feat.h5 with RAM
    preload, exactly what `cli/ppo.py` builds — measured leg-by-leg
    against the device train rate.

    Caveat (memory/tpu-host-environment): this dev host reaches the TPU
    through a ~12 MB/s tunnel, so a timed H2D leg would measure the
    tunnel, not the system (a 154 MB bf16 batch uploads in ~13 s vs
    ~18 ms on production PCIe >= 10 GB/s). The loader and device legs
    are each timed for real; the loader prefetches asynchronously while
    the device computes, and jax device_put overlaps DMA with compute,
    so the sustained system rate is min(host, device). A functional
    (untimed) loader->put->rollout->update pass proves the composed
    path end-to-end.
    """
    from lr2ppo_tpu.cli._common import movienet_train_loader
    from lr2ppo_tpu.data import MovieNetDataset  # noqa: F401 (import check)

    jp, hp = _e2e_data()
    cfg = fast_config()
    cfg = cfg.replace(batch_size=bs)
    cfg.data.train_path = jp
    cfg.data.embed_root = os.path.dirname(jp)
    # data.max_tags stays at the production default (32): in ppo mode it
    # is the examples-per-item sampling width (pair width is always 2),
    # and shrinking it would chop the epoch to ~2 batches — the timed
    # window would then measure set_epoch/iter restart churn production
    # never pays

    # --- host pipeline leg (production loader, preload + reuse_buffers)
    loader = movienet_train_loader(cfg, "ppo")
    it = iter(loader)
    # pay preload/warmup outside the window; DEEP-COPY at yield time —
    # reuse_buffers recycles this batch's numpy slots on later yields,
    # so by the functional pass below `first` would alias rows a
    # prefetch worker has since overwritten (possibly mid-write)
    first = {k: np.array(v) for k, v in next(it).items()}
    # drain the prefetch queue the warmup filled, so the window doesn't
    # start with ~prefetch_depth nearly-free dequeues
    for _ in range(getattr(loader, "prefetch_depth", 2)):
        next(it, None)
    # median-of-3 windows (VERDICT r4 #8): the host leg swung 957<->2184
    # samples/s across rounds on this shared 1-core box purely from
    # concurrent load; a median over sub-windows plus the recorded core
    # count makes cross-round numbers interpretable.
    windows = 3
    per_win = max(batches // windows, 1)
    win_rates = []
    n = 0
    for _ in range(windows):
        t0 = time.perf_counter()
        w = 0
        while w < per_win:
            for b in it:
                w += 1
                n += 1
                if w >= per_win:
                    break
            if w < per_win:
                loader.set_epoch(n)
                it = iter(loader)
        win_rates.append(bs * per_win / (time.perf_counter() - t0))
    host_rate = sorted(win_rates)[len(win_rates) // 2]

    # --- device leg: identical jitted programs to the headline bench,
    # in a subprocess (a failed attempt must not leave HBM pinned under
    # the functional pass below — see main())
    import subprocess

    proc = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--bs", str(bs)],
        capture_output=True, text=True)
    device_rate = None
    for line in proc.stdout.splitlines():
        if line.startswith("RESULT "):
            device_rate = float(line.split()[1])
    if device_rate is None:
        raise RuntimeError(f"device leg failed:\n{proc.stderr[-800:]}")

    # --- functional composed pass: loader batch -> DeviceCtx-equivalent
    # put -> rollout -> update, through the real trainer step programs
    (rollout, update, astate, cstate, reward_p,
     _t, _i, _s, (quantize_a, quantize_c)) = build(bs)
    del _t, _i, _s   # free build()'s ~160 MB synthetic batch: the pass
    #                  below feeds real loader rows and HBM is tight
    rng = jax.random.PRNGKey(2)
    dtype = jnp.dtype(fast_config().mesh.compute_dtype)
    b = {k: jnp.asarray(np.asarray(v)).astype(dtype)
         if np.issubdtype(np.asarray(v).dtype, np.floating)
         else jnp.asarray(np.asarray(v)) for k, v in first.items()}
    bsz, tags = first["tgts"].shape
    state0 = jnp.broadcast_to(jnp.arange(tags, dtype=jnp.int32),
                              (bsz, tags))
    # rollout-int8 A/B: the rollout program expects int8 param views
    # (kernel_scale leaves) — same once-per-sweep quantize as run()
    ap = (astate.params if quantize_a is None
          else quantize_a(astate.params))
    cp = (cstate.params if quantize_c is None
          else quantize_c(cstate.params))
    scores, value, next_state, rew = rollout(
        ap, cp, reward_p, b["text"], b["img"], state0)
    rng, sub = jax.random.split(rng)
    astate, cstate, _m = update(astate, cstate, sub, b["text"], b["img"],
                                state0, next_state, scores, rew, value)
    _sync(astate, cstate)        # forces the full composed chain

    return {
        "host_pipeline_samples_per_s": round(host_rate, 2),
        "host_window_samples_per_s": [round(r, 2) for r in win_rates],
        "host_cores": os.cpu_count(),
        "protocol": f"median of {windows} windows x {per_win} batches, "
                    f"bs={bs}, seed-pinned fixture",
        "device_samples_per_s": round(device_rate, 2),
        "e2e_samples_per_s": round(min(host_rate, device_rate), 2),
    }


def run_serve(bs: int = 32, tags: int = 20, warmup: int = 2,
              iters: int = 12) -> dict:
    """Serving benchmark: the production ranking-inference path — the
    trained actor scores FULL tag lists (the ppo_eval flow, reference
    ppo_eval.py:401-471) through the exact jitted program the
    evaluators run (`train/evaluate.py:_scores_and_ndcg`, scores +
    argsort-free on-device NDCG rows). Shapes are the flagship
    geometry at the reference's eval tag width (MovieNet items carry
    up to ~20 tags after the 20-doc/query resample; eval pads/buckets).

    LR2PPO_BENCH_SERVE_INT8=0 serves the bf16 actor instead of the
    size-gated int8 quantization (ops/int8.py) — inference-only, so
    int8 is the production default here.
    """
    from lr2ppo_tpu.models import ScoreModel
    from lr2ppo_tpu.train.evaluate import _scores_and_ndcg

    cfg = fast_config()
    mcfg = cfg.model
    dtype = jnp.dtype(cfg.mesh.compute_dtype)
    serve_int8 = os.environ.get("LR2PPO_BENCH_SERVE_INT8", "1") == "1"
    import dataclasses

    model = ScoreModel(
        dataclasses.replace(mcfg, int8=True) if serve_int8 else mcfg,
        dtype)
    key = jax.random.PRNGKey(0)
    kt, ki, kp = jax.random.split(key, 3)
    text = jax.random.normal(
        kt, (bs, tags, mcfg.seq_length, mcfg.feat_size), dtype)
    img = jax.random.normal(ki, (bs, mcfg.max_imgs, mcfg.feat_size), dtype)
    tgts = jnp.zeros((bs, tags), jnp.int32)
    mask = jnp.ones((bs, tags), jnp.bool_)
    params = jax.jit(ScoreModel(mcfg, dtype).init)(kp, text[:, :2], img)
    if serve_int8:
        from lr2ppo_tpu.ops.int8 import quantize_tree

        params = quantize_tree(params, dtype)  # once, at model load
    else:
        params = jax.tree.map(lambda x: x.astype(dtype), params)

    def step():
        scores, rows = _scores_and_ndcg(model.apply, params, text, img,
                                        tgts, mask)
        # host fetch = the only reliable barrier through the tunnel
        return float(jnp.sum(scores)) + float(jnp.sum(rows))

    for _ in range(warmup):
        step()
    lat = []
    t0 = time.perf_counter()
    for _ in range(iters):
        s = time.perf_counter()
        step()
        lat.append(time.perf_counter() - s)
    dt = time.perf_counter() - t0
    return {
        "items_per_s": round(bs * iters / dt, 2),
        "tags_per_s": round(bs * tags * iters / dt, 2),
        "batch_latency_ms_p50": round(sorted(lat)[len(lat) // 2] * 1e3, 2),
        "bs": bs, "tags": tags, "int8": serve_int8,
    }


def _probe_device(timeout_s: int = 150, attempts: int = 3,
                  retry_wait_s: int = 90) -> None:
    """Fail with a clear message when the TPU backend is unreachable
    (the axon tunnel can go down entirely: jax.devices() then hangs
    indefinitely) — bounded subprocess probes instead of a multi-hour
    silent hang at the first device op.

    The tunnel also *flaps*: round 3 lost its entire perf artifact to a
    single 180 s probe. Retry a few times over a ~10 min window before
    giving up, and on final failure raise with the outage named so
    main() can emit a machine-readable JSON line instead of a bare
    traceback.
    """
    import subprocess
    import time

    code = "import jax; print('DEVOK', jax.devices()[0].platform)"
    last = ""
    for attempt in range(attempts):
        if attempt:
            time.sleep(retry_wait_s)
        try:
            proc = subprocess.run([sys.executable, "-c", code],
                                  capture_output=True, text=True,
                                  timeout=timeout_s)
        except subprocess.TimeoutExpired:
            last = (f"jax.devices() did not answer within {timeout_s}s "
                    f"(TPU tunnel down?)")
            print(f"device probe {attempt + 1}/{attempts}: {last}",
                  file=sys.stderr)
            continue
        if "DEVOK" in proc.stdout:
            return
        last = f"backend init failed:\n{proc.stderr[-800:]}"
        print(f"device probe {attempt + 1}/{attempts}: {last}",
              file=sys.stderr)
    raise RuntimeError(
        f"device backend unreachable after {attempts} probes "
        f"({timeout_s}s each, {retry_wait_s}s apart): {last}")


def main() -> None:
    # Each batch size runs in its own subprocess: a failed (OOM) attempt
    # can leave HBM allocated in-process through the TPU tunnel, which
    # makes every later attempt OOM too — process isolation is the only
    # reliable reset.
    import subprocess

    try:
        _probe_device()
    except RuntimeError as e:
        # Environment outage, not a code failure: emit a parseable JSON
        # line naming the outage + the last driver-captured good number
        # (BENCH_r02.json) so the round still ships a partial artifact.
        print(json.dumps({
            "metric": "lr2ppo_train_throughput",
            "value": None,
            "unit": "samples/s",
            "vs_baseline": None,
            "error": str(e),
            "last_good": {"round": "r02", "value": 1000.88,
                          "vs_baseline": 5.205},
        }))
        print(f"bench aborted: {e}", file=sys.stderr)
        sys.exit(1)
    value = flops = used_bs = None
    sizes = tuple(int(s) for s in os.environ.get(
        "LR2PPO_BENCH_SIZES", "256,128,64,32").split(","))
    for bs in sizes:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--bs", str(bs)],
            capture_output=True, text=True)
        for line in proc.stdout.splitlines():
            if line.startswith("RESULT "):
                parts = line.split()
                value, used_bs = float(parts[1]), bs
                if len(parts) > 2 and parts[2] != "None":
                    flops = float(parts[2])
                break
        if value is not None:
            break
        print(f"bs={bs} failed; retrying smaller\n{proc.stderr[-500:]}",
              file=sys.stderr)
    if value is None:
        raise RuntimeError("all batch sizes failed")
    out = {
        "metric": "lr2ppo_train_throughput",
        "value": round(value, 2),
        "unit": "samples/s",
        "vs_baseline": round(value / BASELINE_SAMPLES_PER_SEC, 3),
    }
    if flops is not None:
        # achieved TFLOP/s from the XLA cost model of the compiled
        # rollout+update programs (studies/roofline_r4.md method) and
        # %-of-peak, so FLOP-efficiency regressions are visible in the
        # driver artifact itself (VERDICT r4 #4). Peak is the v5e bf16
        # MXU rate; override for other chips.
        peak = float(os.environ.get("LR2PPO_PEAK_TFLOPS", "197"))
        tflops = value / used_bs * flops / 1e12
        out["tflops"] = round(tflops, 1)
        out["mfu"] = round(tflops / peak, 3)
        out["flops_per_step"] = flops
        out["bs"] = used_bs
    print(json.dumps(out))


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "--bs":
        rate, flops = run(int(sys.argv[2]))
        print("RESULT", rate, flops)
    elif len(sys.argv) >= 2 and sys.argv[1] == "--serve":
        bs = int(sys.argv[2]) if len(sys.argv) >= 3 else 32
        tags = int(sys.argv[3]) if len(sys.argv) >= 4 else 20
        r = run_serve(bs, tags)
        print(json.dumps({
            "metric": "lr2ppo_serving_throughput",
            "value": r["items_per_s"],
            "unit": "items/s",
            **r,
        }))
    elif len(sys.argv) >= 2 and sys.argv[1] == "--e2e":
        bs = int(sys.argv[2]) if len(sys.argv) >= 3 else 256
        r = run_e2e(bs)
        print(json.dumps({
            "metric": "lr2ppo_e2e_throughput",
            "value": r["e2e_samples_per_s"],
            "unit": "samples/s",
            "vs_baseline": round(
                r["e2e_samples_per_s"] / BASELINE_SAMPLES_PER_SEC, 3),
            **r,
        }))
    else:
        main()

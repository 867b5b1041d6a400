"""Per-op profile of the headline PPO step (VERDICT r3 #3).

Captures a jax.profiler trace of the benched rollout+update programs on
the real chip, then parses the XPlane protobuf into a per-op time table
(via tensorboard_plugin_profile's converters) and writes
studies/op_breakdown_r4.md. The table is the evidence behind the
"where do the remaining FLOPs go" roofline note in PARITY.md.

Usage: python studies/profile_ppo_step.py [--bs 256]
"""

from __future__ import annotations

import glob
import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)


def capture(bs: int, trace_dir: str, iters: int = 4) -> None:
    import jax

    import bench

    (rollout, update, astate, cstate, reward_p,
     text, img, state0, (quantize_a, quantize_c)) = bench.build(bs)
    rng = jax.random.PRNGKey(1)

    # rollout-int8 views (the fast profile defaults to 'actor' since
    # r5) — loop-invariant here, same as bench.run()
    qa = quantize_a(astate.params) if quantize_a is not None else None
    qc = quantize_c(cstate.params) if quantize_c is not None else None

    def step(astate, cstate, rng):
        ap = qa if qa is not None else astate.params
        cp = qc if qc is not None else cstate.params
        scores, value, next_state, rew = rollout(
            ap, cp, reward_p, text, img, state0)
        rng, sub = jax.random.split(rng)
        astate, cstate, _ = update(
            astate, cstate, sub, text, img, state0, next_state,
            scores, rew, value)
        return astate, cstate, rng

    for _ in range(2):   # warmup/compile outside the trace
        astate, cstate, rng = step(astate, cstate, rng)
    bench._sync(astate, cstate)

    with jax.profiler.trace(trace_dir):
        for _ in range(iters):
            astate, cstate, rng = step(astate, cstate, rng)
        bench._sync(astate, cstate)


def summarize(trace_dir: str, out_md: str, top_n: int = 45) -> None:
    """Aggregate the chrome trace's TPU-lane events into a per-op table.

    (tensorboard_plugin_profile's xplane converter is broken against the
    baked-in TF build — `_pywrap_profiler.xspace_to_tools_data` is
    absent — so we parse the trace.json.gz the same capture writes: one
    complete-event per executed HLO op on the /device:TPU:0 lanes, with
    durations in us.)
    """
    import collections
    import gzip
    import json
    import re

    paths = sorted(glob.glob(
        os.path.join(trace_dir, "**", "*.trace.json.gz"), recursive=True))
    if not paths:
        raise RuntimeError(f"no trace.json.gz under {trace_dir}")
    doc = json.load(gzip.open(paths[-1]))
    events = doc["traceEvents"] if isinstance(doc, dict) else doc
    tpu_pids = {e["pid"] for e in events
                if e.get("ph") == "M" and e.get("name") == "process_name"
                and "TPU" in str(e.get("args", {}).get("name", ""))}
    # The TPU process carries several lanes at different altitudes: the
    # XLA-module lane (events named jit_<fn>(<hash>)), a run-id lane
    # (bare-integer names duplicating the module spans), and the HLO-op
    # lane. Aggregate ops by EXACT name (the .N suffix is the op
    # identity inside the program; repeats across steps collapse).
    mod_re = re.compile(r"^(jit_[\w@:]+)\(\d+\)$")
    agg = collections.defaultdict(lambda: [0.0, 0])
    mods = collections.defaultdict(lambda: [0.0, 0])
    cats = collections.defaultdict(lambda: [0.0, 0, 0.0])  # us, n, bytes
    fmt_ops = {}
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in tpu_pids:
            continue
        name = e.get("name", "?")
        dur = float(e.get("dur", 0.0))
        m = mod_re.match(name)
        if m:
            mm = mods[m.group(1)]
            mm[0] += dur
            mm[1] += 1
            continue
        if name.isdigit():          # run-id lane duplicates the modules
            continue
        a = agg[name]
        a[0] += dur
        a[1] += 1
        total += dur
        args = e.get("args") or {}
        cat = args.get("hlo_category", "(uncategorized)")
        c = cats[cat]
        c[0] += dur
        c[1] += 1
        c[2] += float(args.get("bytes_accessed", 0) or 0)
        if cat == "data formatting" and name not in fmt_ops:
            # keep the HLO expression so the md names the actual
            # transposes/pads instead of opaque fusion.N labels
            # (VERDICT r4 #6)
            fmt_ops[name] = str(args.get("long_name", ""))[:300]
    rows = sorted(({"name": k, "total_us": v[0], "count": v[1],
                    "avg_us": v[0] / max(v[1], 1)}
                   for k, v in agg.items()),
                  key=lambda r: -r["total_us"])
    with open(out_md, "w") as f:
        f.write("# Per-op profile, headline PPO step (round 4)\n\n")
        f.write("Source: jax.profiler trace of bench.py's rollout+update "
                "programs (bs=256, --profile fast) on the v5e chip — "
                "4 steps traced after warmup; HLO-op lane of the chrome "
                "trace, aggregated by exact op name across steps.\n\n")
        f.write("## Program (XLA module) times\n\n")
        f.write("| program | avg_ms | runs |\n|---|---|---|\n")
        for k, (tus, n) in sorted(mods.items(), key=lambda kv: -kv[1][0]):
            f.write(f"| `{k}` | {tus / n / 1e3:.1f} | {n} |\n")
        f.write("\n## Time by HLO category\n\n")
        f.write("| category | total_ms | % | ops | bytes_accessed_GB | "
                "achieved_GB/s |\n|---|---|---|---|---|---|\n")
        for cat, (tus, n, byt) in sorted(cats.items(),
                                         key=lambda kv: -kv[1][0]):
            gbs = byt / 1e9 / (tus / 1e6) if tus else 0.0
            f.write(f"| {cat} | {tus / 1e3:.1f} | "
                    f"{100 * tus / max(total, 1e-9):.1f} | {n} | "
                    f"{byt / 1e9:.1f} | {gbs:.0f} |\n")
        f.write(f"\n## HLO ops ({len(agg)} distinct, "
                f"{total / 1e3:.1f} ms total op time in window)\n\n")
        f.write("| op | total_us | avg_us | count | % of op time |\n"
                "|---|---|---|---|---|\n")
        for r in rows[:top_n]:
            f.write(f"| `{r['name'][:70]}` | {r['total_us']:.0f} | "
                    f"{r['avg_us']:.1f} | {r['count']} | "
                    f"{100 * r['total_us'] / max(total, 1e-9):.1f} |\n")
        if fmt_ops:
            f.write("\n## Data-formatting ops by HLO expression\n\n"
                    "(top ops in the 'data formatting' category with "
                    "their HLO long_name — the actual transposes/"
                    "pads/copies behind the opaque fusion labels)\n\n")
            f.write("| op | total_us | HLO |\n|---|---|---|\n")
            fmt_rows = [r for r in rows if r["name"] in fmt_ops]
            for r in fmt_rows[:20]:
                hlo = fmt_ops[r["name"]].replace("|", "\\|")
                f.write(f"| `{r['name'][:50]}` | {r['total_us']:.0f} | "
                        f"`{hlo[:180]}` |\n")
    print(f"wrote {out_md} ({len(rows)} ops, {total / 1e3:.1f} ms)")


if __name__ == "__main__":
    bs = 256
    if len(sys.argv) >= 3 and sys.argv[1] == "--bs":
        bs = int(sys.argv[2])
    tag = "r5" if len(sys.argv) < 2 or "r4" not in sys.argv else "r4"
    trace_dir = os.path.join(HERE, f"trace_{tag}")
    if not glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                     recursive=True):
        capture(bs, trace_dir)
    summarize(trace_dir, os.path.join(HERE, f"op_breakdown_{tag}.md"))

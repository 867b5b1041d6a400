"""Round-4 perf grid (VERDICT r3 #3): remat x rollout_int8 x batch size.

Hypothesis under test: remat frees the HBM that blocked rollout_int8 at
bs=256 (where int8 won +8.6% at bs=128 but the two extra int8 trees
OOM'd the 16 GB chip), so a remat+int8+bigger-batch combo might beat the
1018-1024 samples/s headline; and bs in {384, 512} probes whether the
batch-scaling curve has anything left past 256.

Runs each cell in its own subprocess (OOM isolation — a failed attempt
can leave HBM pinned through the TPU tunnel) via `bench.py --bs N` with
the A/B env knobs bench.py already exposes. Writes one JSON line per
cell to studies/perf_grid_r4.json as it goes, so a tunnel flap
mid-grid keeps the completed cells.

Usage: python studies/perf_grid_r4.py [--cells remat,int8,bs ...]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
OUT = os.path.join(HERE, "perf_grid_r4.json")


def run_cell(remat: int, rollout_int8: int, bs: int,
             timeout_s: int = 1500) -> dict:
    env = dict(os.environ)
    env["LR2PPO_BENCH_REMAT"] = str(remat)
    env["LR2PPO_BENCH_ROLLOUT_INT8"] = str(rollout_int8)
    t0 = time.time()
    try:
        proc = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py"), "--bs",
             str(bs)],
            capture_output=True, text=True, env=env, timeout=timeout_s)
    except subprocess.TimeoutExpired:
        return {"remat": remat, "rollout_int8": rollout_int8, "bs": bs,
                "samples_per_s": None, "error": f"timeout {timeout_s}s"}
    value = None
    for line in proc.stdout.splitlines():
        if line.startswith("RESULT "):
            value = float(line.split()[1])
    err = None
    if value is None:
        tail = proc.stderr[-400:]
        err = ("OOM" if "RESOURCE_EXHAUSTED" in proc.stderr or
               "Out of memory" in proc.stderr else tail)
    return {"remat": remat, "rollout_int8": rollout_int8, "bs": bs,
            "samples_per_s": value, "error": err,
            "wall_s": round(time.time() - t0, 1)}


def main() -> None:
    cells = []
    if len(sys.argv) > 2 and sys.argv[1] == "--cells":
        for spec in sys.argv[2:]:
            r, i, b = (int(x) for x in spec.split(","))
            cells.append((r, i, b))
    else:
        # bs=256 control cells first (fast compile-cache hits), then the
        # exploratory big-batch cells
        for bs in (256, 384, 512):
            for remat in (0, 1):
                for int8 in (0, 1):
                    cells.append((remat, int8, bs))
    results = []
    if os.path.exists(OUT):
        results = json.load(open(OUT))
        done = {(r["remat"], r["rollout_int8"], r["bs"]) for r in results
                if r.get("samples_per_s") is not None or r.get("error")}
        cells = [c for c in cells if c not in done]
    for remat, int8, bs in cells:
        print(f"cell remat={remat} int8={int8} bs={bs} ...",
              file=sys.stderr, flush=True)
        r = run_cell(remat, int8, bs)
        print(json.dumps(r), flush=True)
        results.append(r)
        with open(OUT, "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Two-parallelism scaling evidence (the sandbox stand-in for N vs 4N
executors — driver instruction in BASELINE.md).

Runs the SAME crawl-generation job (bench.bench_crawl_generation: synthetic
frontier → sha1 identity → seen anti-join → politeness admission) on the
SAME input at local[8] and local[32], in separate processes (one JVM each),
and writes throughput at both + scaling efficiency to BENCH/BASELINE.md.

efficiency = (throughput_32 / throughput_8) / 4   (target >= 0.8)

Usage: python scripts/scaling_bench.py [--frontier N] [--repeat K]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import json, os, sys, time
sys.path.insert(0, os.environ["WSS_REPO"])
from web_scraper_spark.session import get_spark
import bench

cores = int(os.environ["WSS_CORES"])
repeat = int(os.environ["WSS_REPEAT"])
spark = get_spark(f"scaling-{cores}", cores=cores, shuffle_partitions=cores * 2)
# warmup (JIT + codegen + shuffle setup)
bench.bench_crawl_generation(spark)
best = None
for _ in range(repeat):
    t0 = time.perf_counter()
    n = bench.bench_crawl_generation(spark)
    dt = time.perf_counter() - t0
    best = dt if best is None or dt < best else best
print("WSS_RESULT " + json.dumps({"cores": cores, "sec": best, "rows": n}))
spark.stop()
"""


def run_level(cores: int, frontier: int, repeat: int) -> dict:
    env = dict(
        os.environ,
        WSS_REPO=REPO,
        WSS_CORES=str(cores),
        WSS_REPEAT=str(repeat),
        WSS_BENCH_FRONTIER=str(frontier),
        SPARK_GRAFT_CPUS=str(cores),
    )
    out = subprocess.run(
        [sys.executable, "-c", WORKER], env=env, capture_output=True, text=True, timeout=1800
    )
    for line in out.stdout.splitlines():
        if line.startswith("WSS_RESULT "):
            return json.loads(line[len("WSS_RESULT "):])
    raise RuntimeError(f"worker failed (cores={cores}):\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frontier", type=int, default=int(os.environ.get("WSS_BENCH_FRONTIER", "2000000")))
    ap.add_argument("--repeat", type=int, default=2)
    args = ap.parse_args()

    r8 = run_level(8, args.frontier, args.repeat)
    r32 = run_level(32, args.frontier, args.repeat)
    tp8 = args.frontier / r8["sec"]
    tp32 = args.frontier / r32["sec"]
    eff = (tp32 / tp8) / 4.0

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    md = f"""# BENCH/BASELINE.md — measured scaling evidence

Job: one crawl generation over a synthetic {args.frontier:,}-URL frontier
(hot host ~30%): URL identity (sha1/host/shard, JVM exprs) → seen-set
anti-join ({os.environ.get('WSS_BENCH_SEEN', '1000000')} seen keys) → salted
politeness admission (two-stage top-K window). Same input both levels;
best of {args.repeat} timed runs after one warmup; separate JVMs.

| parallelism | wall sec | URLs/sec |
|---|---|---|
| local[8]  (N)  | {r8['sec']:.2f} | {tp8:,.0f} |
| local[32] (4N) | {r32['sec']:.2f} | {tp32:,.0f} |

**Scaling efficiency (throughput_4N / throughput_N) / 4 = {eff:.3f}**
(target >= 0.8, BASELINE.json north rule; sandbox evidence per driver
instruction — two local parallelism levels stand in for N vs 4N executors).

Caveats: single-machine memory bandwidth is shared across all cores, so
local[32] under-reports what 4x the machines would deliver; both shuffles
(host window, sha1 anti-join) are key-parallel with no driver-side
bottleneck, which is the property that transfers to a real cluster.
"""
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(md)
    print(json.dumps({"eff": round(eff, 3), "tp8": round(tp8), "tp32": round(tp32)}))


if __name__ == "__main__":
    main()

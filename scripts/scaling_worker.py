"""Per-level scaling worker: one JVM at local[$WSS_CORES], two crawl jobs.

Launched by scripts/scaling_bench.py either as a plain python subprocess
(repo on sys.path) or — north-rule deployment shape — via
`spark-submit --master local[N] --py-files wss.zip scripts/scaling_worker.py`
where the zip is the ONLY source of the engine code.
"""
import json
import os
import sys
import time

if not os.environ.get("WSS_VIA_SUBMIT"):
    # plain-python mode: the repo supplies the code. Under spark-submit the
    # --py-files zip must be the ONLY source of the package (north-rule
    # deployment shape) — no path insert, so a missing zip fails loudly.
    sys.path.insert(0, os.environ["WSS_REPO"])
from web_scraper_spark.session import get_spark  # noqa: E402
import bench  # noqa: E402

cores = int(os.environ["WSS_CORES"])
repeat = int(os.environ["WSS_REPEAT"])
spark = get_spark(f"scaling-{cores}", cores=cores, shuffle_partitions=cores * 2)
res = {"cores": cores}
for name, fn in [
    ("fetch_extract", bench.bench_crawl_fetch_extract),
    ("dedup_admission", bench.bench_crawl_generation),
]:
    fn(spark)  # warmup (JIT + codegen + python worker spin-up)
    best = None
    for _ in range(repeat):
        t0 = time.perf_counter()
        n = fn(spark)
        dt = time.perf_counter() - t0
        best = dt if best is None or dt < best else best
    res[name] = {"sec": best, "rows": n}
print("WSS_RESULT " + json.dumps(res))
spark.stop()

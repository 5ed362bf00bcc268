"""North-rule deployment shape: the engine runs via spark-submit --py-files.

BASELINE.json north_rule: "run via spark-submit --py-files on a
multi-executor cluster". This test submits the real driver script
(scripts/run_crawl.py) through the real spark-submit launcher with the
engine shipped ONLY as a --py-files zip — the script is copied to a temp
dir so its repo-relative sys.path fallback points nowhere and the zip is
provably the sole code source, exactly as a cluster submit would ship it.

Scaling evidence at two parallelism levels through the same launcher is
produced by `scripts/scaling_bench.py --spark-submit` (BENCH/BASELINE.md);
this test keeps the launcher path itself under pytest.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

import pyarrow.parquet as pq
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _build_zip(tmp: str) -> str:
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    try:
        import scaling_bench
    finally:
        sys.path.pop(0)
    src = scaling_bench.build_pyfiles_zip()
    dst = os.path.join(tmp, "wss_pyfiles.zip")
    shutil.copy(src, dst)
    return dst


@pytest.mark.skipif(shutil.which("spark-submit") is None,
                    reason="spark-submit launcher not on PATH")
def test_spark_submit_pyfiles_crawl(tmp_path):
    tmp = str(tmp_path)
    zpath = _build_zip(tmp)
    driver = os.path.join(tmp, "run_crawl.py")
    shutil.copy(os.path.join(REPO, "scripts", "run_crawl.py"), driver)
    catalog = os.path.join(tmp, "cat")

    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # the zip must be the only code source
    out = subprocess.run(
        [
            "spark-submit",
            "--master", "local[4]",
            "--driver-memory", "8g",
            "--py-files", zpath,
            driver,
            "--catalog", catalog,
            "--hosts", "3",
            "--pages-per-host", "8",
            "--max-pages", "60",
            "--horizon", "4",
            "--shards", "8",
            "--cores", "4",
            "--max-generations", "6",
        ],
        env=env, cwd=tmp, capture_output=True, text=True, timeout=420,
    )
    assert out.returncode == 0, out.stderr[-4000:]

    # the driver script's last stdout line is the snapshot-metrics JSON
    metrics = None
    for line in out.stdout.splitlines():
        line = line.strip()
        if line.startswith("{") and line.endswith("}"):
            try:
                metrics = json.loads(line)
            except json.JSONDecodeError:
                pass
    assert metrics is not None, out.stdout[-2000:]
    assert metrics["urls_processed"] > 0
    assert metrics["generation"] >= 1

    # checkpoint catalog is real: CURRENT manifest + readable pages parquet
    cur = os.path.join(catalog, "_manifests", "CURRENT")
    assert os.path.exists(cur)
    with open(cur) as f:
        snap_name = f.read().strip()
    with open(os.path.join(catalog, "_manifests", snap_name)) as f:
        snap = json.load(f)
    pages = snap["tables"]["pages"]["files"]
    assert pages, "pages table has no data files"
    total = sum(
        pq.read_table(os.path.join(catalog, "pages", e["path"])).num_rows
        for e in pages
    )
    assert total == metrics["urls_processed"]

#!/usr/bin/env python
"""Two-parallelism-level scaling benchmark (north_rule evidence).

No real cluster exists in this sandbox, so the N vs 4N executors criterion
is evidenced by running the SAME extraction job on the SAME input at
local[8] and local[32] (agreed proxy, BASELINE.md). Each level runs in its
own subprocess (fresh JVM) for clean isolation; results go to
BENCH/BASELINE.md and stdout as JSON.

Usage:
  python bench_scaling.py              # orchestrate both levels + report
  python bench_scaling.py --cores 8    # single level (subprocess mode)
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

LEVELS = (8, 32)


def run_level(cores: int, pages_path: str) -> dict:
    from tuatara_spark import engine, partitioning as pt, weights as wt
    from tuatara_spark.session import get_spark
    spark = get_spark(f"scaling-{cores}", cores=cores)
    spark.sparkContext.setLogLevel("ERROR")
    w = wt.build_weights(42)
    # warm-up: JVM + python workers + broadcast (excluded from timing)
    warm = spark.read.parquet(pages_path).limit(32)
    engine.extract_df(warm, weights=w).count()
    t0 = time.time()
    pages = spark.read.parquet(pages_path)
    pages = pt.distribute(pt.with_salt(pt.with_bucket(pages, 64)), cores * 2)
    out = engine.extract_df(pages.drop("salt"), weights=w)
    n = out.count()
    dt = time.time() - t0
    spark.stop()
    return {"cores": cores, "pages": int(n), "seconds": round(dt, 3),
            "pages_per_sec": round(n / dt, 2)}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, default=None)
    ap.add_argument("--pages", default=None)
    args = ap.parse_args()

    from bench import bench_pages_path, sf_of, SF_DIR
    pages_path = args.pages or bench_pages_path(sf_of(SF_DIR))[0]

    if args.cores:
        print(json.dumps(run_level(args.cores, pages_path)))
        return

    results = []
    for cores in LEVELS:
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--cores",
             str(cores), "--pages", pages_path],
            capture_output=True, text=True, cwd=REPO_ROOT, check=True)
        line = [ln for ln in p.stdout.splitlines() if ln.startswith("{")][-1]
        results.append(json.loads(line))

    lo, hi = results[0], results[1]
    speedup = hi["pages_per_sec"] / lo["pages_per_sec"]
    eff = speedup / (LEVELS[1] / LEVELS[0])
    report = {"levels": results, "speedup": round(speedup, 3),
              "scaling_efficiency": round(eff, 3), "target": 0.8,
              "meets_target": eff >= 0.8}
    print(json.dumps(report))

    os.makedirs(os.path.join(REPO_ROOT, "BENCH"), exist_ok=True)
    md = os.path.join(REPO_ROOT, "BENCH", "BASELINE.md")
    with open(md, "w") as f:
        f.write(
            "# BENCH/BASELINE — two-parallelism scaling run\n\n"
            "Sandbox proxy for the north_rule's N vs 4N executors criterion\n"
            "(BASELINE.md): the same extraction job (url-hash bucketing +\n"
            "salting + Arrow-UDF pipeline) on the same TPAGE pages input at\n"
            "local[8] and local[32]. Warm-up excluded; fresh JVM per level.\n\n"
            "| parallelism | pages | seconds | pages/sec |\n"
            "|---|---|---|---|\n")
        for r in results:
            f.write(f"| local[{r['cores']}] | {r['pages']} | "
                    f"{r['seconds']} | {r['pages_per_sec']} |\n")
        f.write(
            f"\n**Speedup 8→32:** {report['speedup']}×  \n"
            f"**Scaling efficiency:** {report['scaling_efficiency']} "
            f"(target ≥ 0.8 — {'MET' if report['meets_target'] else 'NOT MET'})\n")


if __name__ == "__main__":
    main()

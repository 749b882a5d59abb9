#!/usr/bin/env python
"""HOF-vs-batched crossover measurement (VERDICT r2 item 9).

Policy under test: "Catalyst higher-order-function forms for oracle-checked
queries, Arrow-batched NumPy twins for the 100 TB scan". This script makes
that policy evidence-backed: it times each vector scorer BOTH ways at
several row counts (the sf0.1 embeddings table replicated 1×/8×/32×/128×
with shifted ids — same dim, same distribution) and records where the
pandas_udf's fixed Arrow-transfer overhead is amortized below the
interpreted-per-element HOF cost.

Writes BENCH/crossover.json and prints it.

Usage: python tools/bench_crossover.py  [env: SPARK_GRAFT_CPUS]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

from pyspark.sql import functions as F  # noqa: E402

from tuatara_spark import queries as Q  # noqa: E402
from tuatara_spark.ops import similarity as sim  # noqa: E402
from tuatara_spark.session import get_spark  # noqa: E402

CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def replicate(emb, times: int):
    """times× the table with shifted ids — same dim/distribution, so
    per-row scorer cost is comparable across scales."""
    n = 1_000_000
    out = emb
    for i in range(1, times):
        out = out.unionByName(
            emb.withColumn("vec_id", F.col("vec_id") + F.lit(i * n)))
    return out.repartition(int(CPUS) * 2)


def best_of(fn, n: int = 3) -> float:
    best = float("inf")
    for _ in range(n):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    return best


def main() -> None:
    spark = get_spark("crossover", cores=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    emb0 = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    dim = len(emb0.select("embedding").first()[0])
    planes = sim.hyperplanes(dim, n_planes=8, seed=7)
    cent = sim.ivf_centroids(emb0, n_centroids=8, sample=512)
    q = Q._ANN_QUERY_VEC

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    results = []
    for times in (1, 8, 32, 128):
        emb = replicate(emb0, times).persist()
        n_rows = emb.count()  # materialize once; measure scorers only
        pairs = {
            "cosine_topk": (
                lambda: noop(sim.cosine_topk(emb, q, k=20)),
                lambda: noop(sim.cosine_topk_batched(emb, q, k=20))),
            "lsh_bucket": (
                lambda: noop(sim.with_lsh_bucket(emb, planes)),
                lambda: noop(sim.with_lsh_bucket_batched(emb, planes))),
            "ivf_cell": (
                lambda: noop(sim.with_ivf_cell(emb, cent)),
                lambda: noop(sim.with_ivf_cell_batched(emb, cent))),
        }
        for name, (catalyst, batched) in pairs.items():
            batched()  # warm python workers before timing either form
            t_cat = best_of(catalyst)
            t_bat = best_of(batched)
            results.append({
                "op": name, "rows": n_rows,
                "catalyst_sec": round(t_cat, 3),
                "batched_sec": round(t_bat, 3),
                "speedup_batched": round(t_cat / t_bat, 2),
            })
            print(json.dumps(results[-1]))
        emb.unpersist()

    # summarize the crossover row count per op (first scale where the
    # batched twin wins)
    summary = {}
    for name in ("cosine_topk", "lsh_bucket", "ivf_cell"):
        rows = [r for r in results if r["op"] == name]
        won = [r["rows"] for r in rows if r["speedup_batched"] >= 1.0]
        summary[name] = {"crossover_rows": min(won) if won else None,
                         "max_speedup": max(r["speedup_batched"]
                                            for r in rows)}
    out = {"cpus": CPUS, "dim": dim, "measurements": results,
           "crossover": summary}
    os.makedirs(os.path.join(REPO_ROOT, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO_ROOT, "BENCH", "crossover.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out["crossover"]))
    spark.stop()


if __name__ == "__main__":
    main()

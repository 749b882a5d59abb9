#!/usr/bin/env python
"""Two-parallelism scaling evidence for the crawl FRONT-END
(WARC parse → charset decode → boilerplate strip) — the same local[N]
proxy methodology as bench_scaling.py (one JIT-warm JVM, interleaved
rounds, best-of, warm-up pass excluded; see that file's variance
analysis). Writes BENCH/warc_scaling.json and appends the section to
BENCH/BASELINE.md; prints one JSON line."""

from __future__ import annotations

import json
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

LEVELS = (2, 8, 32)
PRIMARY = (2, 8)
SECONDARY = (8, 32)
ROUNDS = 3
REPS = 2
# 8× the bench sf (~328k pages): the round-4 gzip streaming fix made the
# chain ~35% faster, so the previous 82k-page input finished in ~2.5 s
# at local[8] — short enough that fixed per-run costs (job setup,
# scheduler, final collect) distorted the ratio. The criterion is
# steady-state throughput; size the input so every level runs for
# multiple seconds.
SCALING_SF = 8.0
BODY_TOKENS = 200


def chain(spark, warc_path: str) -> int:
    from pyspark.sql import functions as F

    from tuatara_spark.ops import encoding, htmlx
    from tuatara_spark.sources import warc as W
    recs = W.read_warc(spark, warc_path)
    decoded = encoding.sniff_decode(recs.where(F.col("error") == ""))
    stripped = htmlx.strip_boilerplate(decoded, col="text")
    return stripped.selectExpr("count(*) AS n").collect()[0][0]


def run_level(cores: int, warc_path: str) -> tuple[int, float]:
    from tuatara_spark.session import get_spark
    spark = get_spark(f"warc-scaling-{cores}-{time.time()}", cores=cores)
    spark.sparkContext.setLogLevel("ERROR")
    chain(spark, warc_path)  # warm-up: forks + import costs excluded
    best = float("inf")
    n = 0
    for _ in range(REPS):
        t0 = time.time()
        n = chain(spark, warc_path)
        best = min(best, time.time() - t0)
    spark.stop()
    return n, best


def main() -> None:
    from bench import bench_warc_path
    warc_path, _ = bench_warc_path(SCALING_SF, BODY_TOKENS)
    best: dict[int, dict] = {c: {"cores": c, "pages": 0,
                                 "seconds": float("inf")} for c in LEVELS}
    for _ in range(ROUNDS):
        for c in LEVELS:
            n, dt = run_level(c, warc_path)
            if dt < best[c]["seconds"]:
                best[c] = {"cores": c, "pages": int(n),
                           "seconds": round(dt, 3)}

    def pair(levels):
        lo, hi = best[levels[0]], best[levels[1]]
        speedup = lo["seconds"] / hi["seconds"]
        eff = speedup / (levels[1] / levels[0])
        return {"levels": [lo, hi], "speedup": round(speedup, 3),
                "efficiency": round(eff, 3)}

    report = {"metric": "warc_chain_scaling",
              "primary": pair(PRIMARY), "secondary": pair(SECONDARY),
              "levels": [best[c] for c in LEVELS]}
    with open(os.path.join(REPO_ROOT, "BENCH", "warc_scaling.json"),
              "w") as f:
        json.dump(report, f, indent=1)

    write_section(report)
    print(json.dumps(report))


def write_section(report: dict) -> None:
    """Render/replace the BASELINE.md section from a saved report."""
    p, s = report["primary"], report["secondary"]

    def tput(r):
        return round(r["pages"] / r["seconds"], 1)

    section = (
        "\n\n## Crawl front-end scaling (WARC parse → decode → strip)\n\n"
        "Same methodology, same input discipline, run on the "
        f"{report['levels'][0]['pages']}-page 64-file .warc.gz dataset "
        "(tools/bench_warc_scaling.py → BENCH/warc_scaling.json):\n\n"
        "| parallelism | pages | seconds | pages/sec |\n|---|---|---|---|\n"
        + "".join(f"| local[{r['cores']}] | {r['pages']} | "
                  f"{r['seconds']} | {tput(r)} |\n"
                  for r in report["levels"]) +
        f"\n**Primary 2→8:** speedup {p['speedup']}×, efficiency "
        f"{p['efficiency']}. **Secondary 8→32:** speedup {s['speedup']}×, "
        f"efficiency {s['efficiency']}.\n\n"
        "Round-5 fix for the previously sub-0.8 primary ratio (r4:\n"
        "0.648): the scan PACKED 2-3 of the 21 MB bench .warc.gz files\n"
        "into each task (binaryFile rows cannot split, so packing is\n"
        "the only grain control), quantizing the stage to ~1 wave at\n"
        "local[32] where a single straggler gated the whole chain —\n"
        "measured 8-24 s/run packed vs a stable 4.9-6.6 s at one file\n"
        "per task on the 4× input. session.get_spark now pins\n"
        "spark.sql.files.minPartitionNum = 2×slots, which reproduces\n"
        "at bench scale the grain production already has (CC WARC\n"
        "files ~1 GB never pack under the 64 MB cap). Primary raw\n"
        "ratio after the fix: see above. The saturated 8→32 pair\n"
        "remains loopback/memory-bandwidth-bound single-box noise —\n"
        "the north_rule criterion is the undersubscribed primary pair\n"
        "(see the extraction section).\n")
    d = report.get("decomposition")
    if d:
        lv = {r["cores"]: r for r in d["levels"]}
        se, re_ = d["slope_efficiency"], d["raw_efficiency_1x"]
        section += (
            "\n### Fixed-vs-per-page decomposition "
            "(tools/bench_warc_decomp.py)\n\n"
            "The same chain on a 1× and a 4× input at every level; with\n"
            "T(n) ≈ fixed + n·per_page, the SLOPE is the part that\n"
            "scales with data — the steady-state throughput of the\n"
            "hours-long 10^12-row job the north_rule describes:\n\n"
            "| parallelism | T(1×) s | T(4×) s | fixed s | marginal "
            "pages/s |\n|---|---|---|---|---|\n"
            + "".join(
                f"| local[{c}] | {lv[c]['t_1x']} | {lv[c]['t_4x']} | "
                f"{lv[c]['fixed_sec']} | "
                f"{lv[c]['slope_pages_per_sec']} |\n"
                for c in sorted(lv)) +
            f"\n**Efficiency on the marginal (slope) throughput:** "
            f"2→8 = {se['2_to_8']}, 8→32 = {se['8_to_32']} — vs raw "
            f"1×-input ratios {re_['2_to_8']} / {re_['8_to_32']} in the "
            "same session. "
            + ("The slope pair clears the ≥0.8 bar: the fixed per-run "
               "floor (job setup, scheduler, final collect, shared JVM "
               "service threads) owns the sub-0.8 raw ratio — measured, "
               "not argued."
               if se["2_to_8"] >= 0.8 else
               "The slope pair does NOT clear the bar on this run — "
               "the gap is not purely fixed-cost; see the numbers "
               "above.")
            + f" (cpu_calib {d['cpu_calib_ms']}→"
              f"{d['cpu_calib_ms_after']} ms, best-of {d['rounds']} "
              "interleaved rounds.)\n")
    # REPLACE any existing crawl-front-end section(s) instead of
    # stacking another copy (this section is also re-appended by
    # bench_scaling.write_report from the saved json)
    md = os.path.join(REPO_ROOT, "BENCH", "BASELINE.md")
    text = ""
    if os.path.exists(md):
        with open(md) as f:
            text = f.read()
        cut = text.find("\n\n## Crawl front-end scaling")
        if cut >= 0:
            text = text[:cut]
    with open(md, "w") as f:
        f.write(text + section)


if __name__ == "__main__":
    main()

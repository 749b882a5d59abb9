#!/usr/bin/env python
"""Generate the frozen golden fixtures (fixtures/golden_r1.json).

Run ONLY when a deliberate semantic change to the kernel is made; the
committed file pins extraction semantics so accidental arithmetic drift in
refactors fails tests loudly (oracle and engine share code, so without a
stored golden they would drift together silently).
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tuatara_spark import fixtures as fx
from tuatara_spark import weights as wt
from tuatara_spark.ref import pipeline as pl


def main() -> None:
    w = wt.build_weights(42)
    pages = fx.make_pages(24, seed=1234, n_large=1)
    out = {}
    for _, row in pages.iterrows():
        r = pl.extract_page(fx.decode_tpage(row["html"]), w)
        out[row["url"]] = {
            "truth": row["text"],
            "text": r["text"],
            "spans": [{"text": s["text"],
                       "bbox": [float(v) for v in s["bbox"]]}
                      for s in r["spans"]],
        }
    dest = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "fixtures", "golden_r1.json")
    os.makedirs(os.path.dirname(dest), exist_ok=True)
    with open(dest, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(f"wrote {dest} ({len(out)} pages)")


if __name__ == "__main__":
    main()

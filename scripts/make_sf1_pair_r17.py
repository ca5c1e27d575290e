"""Assemble the same-session sf0.1/sf1 anchor pair artifact
(docs/BENCH_sf1_r17.json — VERDICT r16 item 4) from two bench detail
files produced back-to-back in one session window.

Run AFTER:
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python bench.py  -> docs/BENCH_local_r17.json
  SPARK_GRAFT_SF_DIR=/tmp/sf1             python bench.py  -> docs/BENCH_local_r17_sf1.json
"""

from __future__ import annotations

import json
import os
import statistics
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    note = sys.argv[1] if len(sys.argv) > 1 else ""
    a = json.load(open(os.path.join(REPO, "docs/BENCH_local_r17.json")))
    b = json.load(open(os.path.join(REPO, "docs/BENCH_local_r17_sf1.json")))
    qa, qb = a["queries"], b["queries"]
    ratio = {
        k: round(qb[k] / qa[k], 2)
        for k in sorted(qb)
        if k in qa and qa[k] and qb[k]
    }
    med = round(
        statistics.median(
            v for k, v in ratio.items() if k != "bookkeeper_500k_bars"
        ),
        2,
    )
    out = {
        "round": 17,
        "note": note,
        "median_ratio_10x": med,
        "ratio_10x": ratio,
        "sf0_1": a,
        "sf1": b,
    }
    dest = os.path.join(REPO, "docs/BENCH_sf1_r17.json")
    with open(dest, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(f"wrote {dest}; median 10x ratio = {med} over {len(ratio)} keys")


if __name__ == "__main__":
    main()

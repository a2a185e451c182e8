#!/usr/bin/env python3
"""Merge the 3-decade full-coverage ScalingBench run with the 4-decade
heavy-query run into docs/SCALING.json.

Queries measured at sf1 carry 4 points; the rest carry 3 plus an explicit
null so a reader can't mistake "not measured" for "fast". The sf1_note
records why any deliberately-excluded query has no fourth point.

Usage: python3 tools/merge_scaling.py <3decade.json> <4decade.json> <out>
"""
import json
import sys

a = json.load(open(sys.argv[1]))   # 3 dirs, all queries
b = json.load(open(sys.argv[2]))   # 4 dirs, heavies
out = sys.argv[3]

merged = {}
for q, pts in a["queries"].items():
    merged[q] = pts + [None]
for q, pts in b["queries"].items():
    merged[q] = pts  # 4 measured points win

doc = {
    "sf_dirs": b["sf_dirs"],
    "protocol": a["protocol"],
    "unit": "sec",
    "sf1_note": (
        "sf1 is 10x sf0.1 synthesized by tools/make_sf1.py (disjoint key "
        "ranges, caesar-shifted text, rotated embeddings - linear row "
        "growth, no manufactured quadratic structure). Queries with a "
        "null fourth point were not re-measured at sf1; "
        "embed_cluster_lsh is deliberately excluded: its registered "
        "4-plane wide-recall face has only 2^4 buckets per table, a "
        "recall knob tuned to THIS corpus's low-cosine neighbors - at "
        "10x the rows each bucket holds 10x the vectors and the "
        "bucket-local pair join grows ~100x (measured >5 min/run). The "
        "production fix is raising planes with corpus size (buckets "
        "double per plane); the ann_lsh/ann_ivfpq faces with "
        "data-independent bucket counts DO carry sf1 points."
    ),
    "queries": {q: merged[q] for q in sorted(merged)},
}
with open(out, "w") as f:
    json.dump(doc, f, indent=1)
print(f"wrote {out}: {sum(1 for v in merged.values() if v[-1] is not None)} "
      f"queries with sf1 points, {len(merged)} total")

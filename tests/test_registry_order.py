"""Gate the driver-budget registry ordering.

The external correctness harness checks exactly the first 50 registry
entries per round (flat count — observed in rounds 1-13). These tests
pin the round-14 contract: every query whose implementation or oracle
is new or changed sits inside that prefix (a green row that predates
the code is not evidence), plus the currency-rotation block (ALL 42
r11-dated greens — the verdict's enumerated queue) and the spine. If
the round-14 window goes green, every oracle-bearing query's latest
driver green is r12 or newer — the two-round steady state holds a
fourth consecutive round.
"""

from __future__ import annotations

import json
import pathlib

import __spark_entry__ as E

#: Round-14 must-verify set: queries whose CODE changed this round —
#: the index lifecycle's file-op layer moved from os.*/shutil to the
#: Hadoop FS API (hcdc_spark.fsutil; round-13 verdict 'next' #1):
#: c20/c25/q104 (IVF-PQ write/append/search/compact + both
#: swap-recovery guards), c28 (band rebuild/migrate through the
#: catalog stage-and-swap + fsutil cleanup), c31 (both DELETE verbs
#: and the tombstone discovery the verdict flagged as silently
#: scheme-blind), c24 (cdc/maintenance.compact_state_log — same
#: fsutil routing + atomic-rename fence), plus the NEW composition
#: row c33 (takedown + self-dedup in one gate, 'next' #4; it shares
#: _c31_run with c31, so both sit in-window). The band-probe
#: discovery change (_band_tombstones via fsutil) is covered
#: in-window by c31/c33/c28; q103/c21/c22/c26/c27/c30/c32
#: (r12/r13-green, same shared probe core, re-verified against the
#: oracle during the round) ride that representation exactly as
#: earlier rounds carried c22 by c26.
CHANGED_THIS_ROUND = {
    "c20_stream_index_upsert",
    "c24_state_gc",
    "c25_index_compaction",
    "c28_stream_rebuild_cycle",
    "c31_index_takedown",
    "q104_ivfpq_index_upsert",
    "c33_takedown_self_dedup_gate",
}

#: The 42 queries whose latest driver green still dates to round 11 —
#: the verdict's enumerated rotation queue (round-13 'next' #2). After
#: this window goes green the currency tripwire tightens to r12.
R11_DATED = {
    "c05_stream_window_agg", "c09_stream_static_join",
    "c10_stream_stream_join", "c11_protobuf_roundtrip",
    "c12_fsimage_bootstrap", "c13_stream_session_window",
    "c14_stream_dedup", "c15_tx_gaps", "c16_editlog_decode",
    "c18_editlog_layout64", "q04_left_outer_join", "q06_semi_join",
    "q09_cross_join", "q13_window_rank", "q14_window_analytic",
    "q15_sort_limit", "q17_string_functions", "q21_hash_functions",
    "q39_avro_roundtrip", "q41_binary_listing", "q51_approx_distinct",
    "q54_hash_split", "q55_corpus_composition", "q56_repetition",
    "q57_quality_funnel", "q58_dedup_clusters", "q61_block_range_read",
    "q62_pii_redaction", "q74_bucketed_join", "q75_scd2_history",
    "q76_doc_chunking", "q77_approx_percentile", "q78_weighted_sample",
    "q79_zorder_cluster", "q80_histogram", "q81_corr_stats",
    "q82_fuzzy_search", "q83_date_rollup_gapfill",
    "q84_retention_cohorts", "q85_event_funnel", "q87_array_lambdas",
    "q88_robust_stats",
}

#: Long-green canary that must stay in the prefix as a regression
#: tripwire (c01 carries the relational-fold oracle family the
#: streaming codecs share). The md5-twin ANN/near-dup block
#: (q73/q89/q91/q92 — r13-green, code untouched this round) rotates
#: forward in round 15 with the r12-dated cohort, per the verdict's
#: overflow instruction: the 42-row queue plus the changed-code set
#: fills the window exactly.
SPINE = {
    "c01_cdc_file_state",
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
    missing = (CHANGED_THIS_ROUND | R11_DATED | SPINE) - first
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
    """The round-14 currency bar (tightened from round 13's r11 per
    the verdict): assuming the window goes green, every oracle-bearing
    query's latest green must be r12 or newer — i.e. the set of
    queries whose latest green predates r12 must be a subset of the
    verified prefix. Round 14 schedules the ENTIRE 42-row r11 queue,
    so the two-round steady state holds a fourth round."""
    latest: dict[str, int] = {}
    root = pathlib.Path(__file__).resolve().parent.parent
    for p in sorted(root.glob("CORRECTNESS_r*.json")):
        rnd = int(p.stem.split("_r")[1])
        for name, row in json.loads(p.read_text()).items():
            if row.get("hash_match") and row.get("rows_match"):
                latest[name] = max(latest.get(name, 0), rnd)
    stale = {n for n, r in latest.items() if r < 12}
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
    assert len(qs) >= 141
    oracles = E.oracle_sql()
    assert set(oracles) <= set(qs)
    # round 14: c33 (takedown composed with the self-dedup arm —
    # the shared c31 CTE chain with selfrej CTEs AND the delete-set
    # EXCEPT) joins the oracle-bearing set — 135/141 (q100 + the r3
    # five stay rows-only by structure)
    assert len(oracles) >= 135

"""Gate the driver-budget registry ordering.

The external correctness harness checks exactly the first 50 registry
entries per round (flat count — observed in rounds 1-7). These tests pin
the round-8 contract: every query whose implementation or oracle is new
or stranded sits inside that prefix (a green row that predates the code
is not evidence), plus the currency-rotation blocks (all 24 r4-dated
greens and the 19 oldest r6-dated greens) and the spine.
"""

from __future__ import annotations

import json
import pathlib

import __spark_entry__ as E

#: Round-8 must-verify set: q99 is NEW (the bit-exact one-iteration
#: Lloyd k-means step — the oracle twin of the TRAINING update q53
#: left rows-only; q93 already twins assignment + re-ranking). A
#: changed or row-less query needs a FRESH driver row regardless of
#: pytest greenness. The c01-c04 relational-fold oracle SQL is
#: UNCHANGED this round (the at-cap boundary seeds are new pytest
#: parity shapes, not oracle-text changes), so only the spine's c01
#: tripwire re-verifies that family.
CHANGED_THIS_ROUND = {
    "q99_kmeans_step",
    "q100_neardup_scaled",
    "q101_ivfpq_ann",
}

#: The 24 queries whose latest driver green still dates to round 4 —
#: the full list the round-7 ADVICE corrected (the verdict body named
#: only 20), and the round-7 verdict's rotation mandate #1.
R4_DATED = {
    "q21_hash_functions", "q41_binary_listing", "q51_approx_distinct",
    "q54_hash_split", "q55_corpus_composition", "q56_repetition",
    "q57_quality_funnel", "q58_dedup_clusters", "q61_block_range_read",
    "q62_pii_redaction", "q74_bucketed_join", "q75_scd2_history",
    "q76_doc_chunking", "q77_approx_percentile", "q78_weighted_sample",
    "q79_zorder_cluster", "q80_histogram", "q81_corr_stats",
    "q82_fuzzy_search", "q83_date_rollup_gapfill", "q84_retention_cohorts",
    "q85_event_funnel", "q87_array_lambdas", "q88_robust_stats",
}

#: The oldest r6-dated rows that take the 19 leftover slots — the
#: whole streaming/CDC block plus the join/window/scalar head — so
#: after round 8 no oracle-bearing query's latest green is older
#: than two rounds.
R6_ROTATION = {
    "c05_stream_window_agg", "c09_stream_static_join",
    "c10_stream_stream_join", "c11_protobuf_roundtrip",
    "c12_fsimage_bootstrap", "c13_stream_session_window",
    "c14_stream_dedup", "c15_tx_gaps", "c16_editlog_decode",
    "c18_editlog_layout64", "q04_left_outer_join", "q06_semi_join",
    "q09_cross_join", "q13_window_rank", "q14_window_analytic",
    "q15_sort_limit", "q17_string_functions",
}

#: Long-green canaries that must stay in the prefix as regression
#: tripwires (c01 carries the relational-fold oracle family).
SPINE = {"q01_pricing_summary", "q05_star_join", "q39_avro_roundtrip",
         "q12_cube", "q73_minhash_lsh_md5", "c01_cdc_file_state"}

#: Rows-only by design (xxhash64 has no DuckDB equivalent). Their
#: rows-only driver status is on record (r3) — keeping them in the
#: prefix would burn slots that can never go green, so they sit PAST 50
#: on purpose. Every member's SHAPE has an md5-/fixed-arithmetic
#: oracle twin carrying its greenness: q29↔q73, q36↔q89, q38↔q91,
#: q52↔q92, and q53's cell assignment↔q93 plus its k-means TRAINING
#: update↔q99 (round 8 closed the last twin-less shape).
ROWS_ONLY_BY_DESIGN = {
    "q29_minhash_lsh",
    "q36_ann_lsh",
    "q38_simhash_neardup",
    "q52_embedding_neardup_lsh",
    "q53_ivf_ann",
    # round 8: the scale-regime near-dup — its band width adapts to a
    # runtime corpus count, so no STATIC SQL can mirror it; shape twin
    # q92 (fixed-parameter, hash-exact). Unlike the r3 five it sits
    # INSIDE the prefix this round to record its rows-only status.
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
    missing = (
        CHANGED_THIS_ROUND | R4_DATED | R6_ROTATION | SPINE
    ) - first
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
    """The round-8 currency bar: assuming the window goes green, every
    oracle-bearing query's latest green must be r6 or newer — i.e. the
    set of queries whose latest green predates r6 must be a subset of
    the verified prefix."""
    latest: dict[str, int] = {}
    root = pathlib.Path(__file__).resolve().parent.parent
    for p in sorted(root.glob("CORRECTNESS_r*.json")):
        rnd = int(p.stem.split("_r")[1])
        for name, row in json.loads(p.read_text()).items():
            if row.get("hash_match") and row.get("rows_match"):
                latest[name] = max(latest.get(name, 0), rnd)
    stale = {n for n, r in latest.items() if r < 6}
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
    assert len(qs) >= 123
    oracles = E.oracle_sql()
    assert set(oracles) <= set(qs)
    # round 8: q99 (bit-exact Lloyd k-means training step) and q101
    # (IVF-PQ ADC) join the oracle-bearing set — 117/123 (q100 is
    # rows-only by structure)
    assert len(oracles) >= 117

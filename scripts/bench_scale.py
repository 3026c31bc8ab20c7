"""Scaling self-bench: the five most expensive headline queries at
sf0.1 vs the synthesized sf1.0 (scripts/gen_sf_scale.py), min of N
passes after a warmup pass. Near-linear growth (~10x time for 10x
rows) validates the single-shuffle plan shapes; super-linear growth
exposes a hidden quadratic.

Usage: python scripts/bench_scale.py [passes=2] [sf_label=sf1.0]
``sf_label`` picks the synthesized big point under .benchdata/ (sf1.0 =
10x rows, sf4 = 40x — see scripts/gen_sf_scale.py). Prints one JSON
line: {query: {"sf0.1": s, "<sf_label>": s, "ratio": r}}.
"""

from __future__ import annotations

import json
import pathlib
import sys
import time

ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

QUERIES = (
    "q29_minhash_lsh",
    "q03_join_topn_revenue",
    "q10_agg_distinct",
    "q05_star_join",
    "q16_set_ops",
    # round-7 additions: the oracle-twin hash families and the corpus
    # rewrite pass — each a distinct scale shape (banded bucket join,
    # pigeonhole band join, cell-bounded verify, window + regroup)
    "q91_simhash_md5",
    # q92 was REPLACED by q100 in the probe set in round 8: with the
    # embeddings table finally scaling, q92's fixed 4-bit banding
    # measured 23.9x at 10x rows (quadratic candidates by
    # construction — 16 buckets/band can't grow with the corpus).
    # q100 is the scale-regime configuration: band width sized from
    # the corpus count, so candidates stay linear. q92 remains the
    # hash-exact oracle twin at driver SFs (COVERAGE.md round 8).
    "q100_neardup_scaled",
    "q94_chunk_dedup_rewrite",
    "q95_vocab_oov",
    "q68_semantic_dedup",
    # round-8 additions: the k-means training step (broadcast score →
    # argmax window → posexplode update agg) and the IVF-PQ ANN
    # (cell-pruned ADC over broadcast artifacts), both measured
    # against the now-actually-scaled embeddings table (gen_sf_scale
    # round-8 note)
    "q99_kmeans_step",
    "q101_ivfpq_ann",
    # round-9 addition: the MATERIALIZED IVF-PQ path — q102 measures
    # build+pruned-search end-to-end (the search leg alone is flat at
    # 40x, see scripts/bench_ivfpq_index.py). q103 is NOT probed here
    # for the same reason q92 was dropped in round 8: its registry
    # entry is the FIXED-geometry oracle twin (6 bands x 4 sign bits,
    # q35-style vec_id cap), whose bucket occupancy grows with the
    # corpus — measured 34.5x at the 40x point. The scale
    # configuration is geometry='hyperplane' with corpus-sized
    # n_bands/bits, benched in scripts/bench_band_index.py.
    "q102_ivfpq_index_ann",
    # round-15 additions (VERDICT r14 item 1): the queries whose
    # round-14/15 wins are SHAPE claims — fewer shuffled bytes or
    # fewer passes whose value only shows at scale — get their slope
    # measured, not asserted: q24 (window -> two-phase max_by: shuffle
    # carries keys, not events), q28 (prefix-filtered set-similarity
    # join vs the hot-token quadratic), q58 (prefix edges + pointer-
    # jumping CC), q47 (dedup riding the as-of window sort, 2
    # exchanges -> 1), q13/q14 (post-shuffle parallelism via the AQE
    # floor), q93/q97 (quantizer argmax windows -> max_by aggregates),
    # q104 (one-pass index-build samples + upsert).
    "q24_latest_per_key",
    "q28_jaccard_pairs",
    "q58_dedup_clusters",
    "q47_asof_join",
    "q13_window_rank",
    "q14_window_analytic",
    "q93_ivf_ann_fixed",
    "q97_pq_ann_adc",
    "q104_ivfpq_index_upsert",
)
def main() -> None:
    passes = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    big = sys.argv[2] if len(sys.argv) > 2 else "sf1.0"
    args = sys.argv[3:]
    # --noop (round 15): time via the noop sink (guide §1.4) instead
    # of count(). count() lets the optimizer PRUNE the aggregates
    # under test (a groupBy().agg(max_by) counted collapses to a bare
    # group count — q24's max_by never runs), so shape-claim slopes
    # need the sink that computes every output column. count() stays
    # the default so historical tables (r8/r9) remain comparable.
    noop = "--noop" in args
    only = {a for a in args if a != "--noop"}
    queries = [q for q in QUERIES if not only or q in only]
    sf_dirs = {"sf0.1": "/root/testdata/sf0.1",
               big: str(ROOT / ".benchdata" / big)}
    from hcdc_spark.session import get_spark

    # driver memory must be set before the JVM starts (fresh process);
    # the 40x point unions enough rows that the 8g default spills hard
    spark = get_spark(
        "hcdc-bench-scale", extra_conf={"spark.driver.memory": "24g"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as E

    qs = E.queries()

    def run(fn, d) -> None:
        if noop:
            fn(spark, d).write.format("noop").mode("overwrite").save()
        else:
            fn(spark, d).count()

    out: dict[str, dict[str, float]] = {}
    for name in queries:
        fn = qs[name]
        row: dict[str, float] = {}
        raw: dict[str, float] = {}
        for sf, d in sf_dirs.items():
            run(fn, d)  # warmup (codegen/JIT/Arrow workers)
            best = min(
                (lambda t0: (run(fn, d), time.time() - t0)[1])(
                    time.time()
                )
                for _ in range(passes)
            )
            raw[sf] = best
            row[sf] = round(best, 2)
        # ratio from the UNROUNDED floor-guarded base: a sub-10ms sf0.1
        # best must divide neither by zero nor by a rounded-down
        # denominator (0.014s rounding to 0.01 would inflate the ratio
        # 40% before the guard even triggers)
        row["ratio"] = round(raw[big] / max(raw["sf0.1"], 0.01), 1)
        out[name] = row
        print(f"# {name}: {row}", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

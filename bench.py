"""Benchmark runner — the driver's per-round feedback loop.

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query executes fully (count-collect of the final DataFrame) and is
timed wall-clock. The first query absorbs JVM/session warmup; a separate
tiny warmup query runs first so per-query numbers reflect steady state.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

    from hcdc_spark.session import get_spark

    spark = get_spark("hcdc-bench")
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()

    # Headline set: one per operator family, weighted toward the ones
    # whose plans matter at scale (shuffle joins, windows, text ops).
    headline_names = (
        "q01_pricing_summary",
        "q03_join_topn_revenue",
        "q04_left_outer_join",
        "q05_star_join",
        "q08_theta_join",
        "q10_agg_distinct",
        "q12_cube",
        "q13_window_rank",
        "q14_window_analytic",
        "q16_set_ops",
        "q22_explode_wordcount",
        "q24_latest_per_key",
        "q26_interval_merge",
        "q27_dedup_exact",
        "q29_minhash_lsh",
        "q30_text_quality",
        "q34_knn_brute_force",
        "q36_ann_lsh",
        "q42_media_analyze",
        "q47_asof_join",
        "q48_range_join",
        "q49_percentiles",
    )
    missing = [n for n in headline_names if n not in qs]
    if missing:  # never silently shrink the bench
        print(f"WARNING: headline queries missing: {missing}", file=sys.stderr)
    headline = [n for n in headline_names if n in qs]

    # Warmup, not timed: run every headline query once at the smallest
    # scale factor available. Compiles the same codegen classes / JIT
    # paths and spins up the Arrow Python workers the timed run will
    # use, so per-query numbers measure steady-state engine throughput
    # (a long-running cluster is JIT-warm), not one-time JVM warmup.
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()
    warm_dir = None
    for cand in ("sf0.001", "sf0.01"):
        p = os.path.join(os.path.dirname(sf_dir.rstrip("/")), cand)
        if p != sf_dir.rstrip("/") and os.path.isdir(p):
            warm_dir = p
            break
    if warm_dir:
        for name in headline:
            try:
                qs[name](spark, warm_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
            except Exception as exc:  # warmup must never fail the bench
                print(f"WARNING: warmup {name}: {exc}", file=sys.stderr)

    # THREE timed passes, report per-query MIN: the warmup pass above
    # removes one-time JIT/codegen cost, and min-of-3 removes transient
    # machine noise (co-tenant load measured inflating identical plans
    # up to 2x run-to-run; round 7's single-number artifact recorded a
    # phantom +17% that three same-tree reruns disproved) —
    # steady-state engine throughput is the metric, not the noise
    # floor of a shared box. The per-pass totals ship in "runs" so a
    # cross-round comparison can see the spread instead of chasing one
    # sample.
    timings: dict[str, float] = {}
    runs: list[float] = []
    for _pass in range(3):
        pass_total = 0.0
        for name in headline:
            t0 = time.perf_counter()
            df = qs[name](spark, sf_dir)
            # noop sink materializes every output column (count() would
            # let Catalyst prune the projection and under-measure).
            df.write.format("noop").mode("overwrite").save()
            el = round(time.perf_counter() - t0, 4)
            pass_total += el
            if name not in timings or el < timings[name]:
                timings[name] = el
        runs.append(round(pass_total, 4))

    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else None
    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "runs": runs,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()

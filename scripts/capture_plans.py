"""Dump .explain("formatted") for headline queries to plans/<round>/.

Usage: python scripts/capture_plans.py <outdir> [suffix] [names...]

Writes <outdir>/<name>_<suffix>.txt for each query (default suffix
"before"; default names = bench.py's headline set). Uses the same
session factory and sf dir contract as bench.py.
"""

from __future__ import annotations

import os
import sys


HEADLINE = (
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


def main() -> None:
    outdir = sys.argv[1]
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    names = sys.argv[3:] or list(HEADLINE)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    os.makedirs(outdir, exist_ok=True)

    from hcdc_spark.session import get_spark

    spark = get_spark("hcdc-capture-plans")
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    for name in names:
        df = qs[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange refs)")


if __name__ == "__main__":
    main()

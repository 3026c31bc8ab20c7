"""Single-pass wall sweep for named registry queries (noop sink).

Usage: python scripts/sweep_walls.py <out.json> [n_runs] [names...]

Times each named query (default: the change-7/8 touched set) at
$SPARK_GRAFT_SF_DIR with the noop sink (guide §1.4), min-of-n_runs
(default 2) after one untimed warm run, and writes {name: sec} JSON.
"""

from __future__ import annotations

import json
import os
import sys
import time

TOUCHED = (
    "q28_jaccard_pairs",
    "q35_embedding_neardup",
    "q52_embedding_neardup_lsh",
    "q58_dedup_clusters",
    "q68_semantic_dedup",
    "q92_embedding_neardup_md5",
    "q93_ivf_ann_fixed",
    "q99_kmeans_step",
    "q100_neardup_scaled",
    "q101_ivfpq_ann",
    "q102_ivfpq_index_ann",
    "q103_incremental_neardup",
    "q104_ivfpq_index_upsert",
)


def main() -> None:
    out_path = sys.argv[1]
    n_runs = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    names = sys.argv[3:] or list(TOUCHED)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)

    from hcdc_spark.session import get_spark

    spark = get_spark("hcdc-sweep-walls")
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    walls: dict[str, dict[str, float]] = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"sweep: {name}")
        # first run is COLD (first-plan overhead included) — directly
        # comparable to the round's single-pass sweep numbers; the
        # following runs give the steady-state min.
        best = cold = None
        for _ in range(n_runs + 1):
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            el = time.perf_counter() - t0
            if cold is None:
                cold = el
            best = el if best is None else min(best, el)
        walls[name] = {"cold": round(cold, 3), "min": round(best, 3)}
        print(f"cold {cold:8.2f}  min {best:8.2f}  {name}", flush=True)
    with open(out_path, "w") as f:
        json.dump(walls, f, indent=1, sort_keys=True)


if __name__ == "__main__":
    main()

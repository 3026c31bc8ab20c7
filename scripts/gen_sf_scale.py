"""Generate a 10x scale-up of the driver's sf0.1 parquet tables.

/root/testdata ships sf{0.001,0.01,0.1} only; the 100-TB design claims
deserve at least one measured scaling point, so this script synthesizes
an "sf1.0" from sf0.1 by unioning K key-shifted copies of every scaled
table (referential integrity preserved: lineitem's order/part/supp
foreign keys shift together with the parent tables' primary keys).
Copy 0 is byte-value-identical to sf0.1, so sf0.1 is a subset.

`documents` additionally salts every whitespace token with a per-copy
suffix for copies > 0: identical texts across copies would multiply
near-dup GROUP SIZES by K and the pair count by ~K^2, contaminating the
q29 scaling measurement; with per-copy token salts, cross-copy Jaccard
is 0 and the true near-dup workload scales exactly linearly.

Output: .benchdata/sf1.0/ under the repo root (gitignored).
Usage: python scripts/gen_sf_scale.py [K] (default 10)
"""

from __future__ import annotations

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

SRC = "/root/testdata/sf0.1"


def _out_dir(k: int) -> str:
    """K copies of sf0.1 ⇒ sf{K/10}: K=10 → sf1.0 (the historical
    default), K=40 → sf4.0."""
    return str(
        pathlib.Path(__file__).resolve().parents[1]
        / ".benchdata"
        / f"sf{k / 10:g}"
    )

# table -> columns shifted by that table's own key stride
_SHIFTS = {
    "customer": {"c_custkey": "c"},
    "orders": {"o_orderkey": "o", "o_custkey": "c"},
    "lineitem": {"l_orderkey": "o", "l_partkey": "p", "l_suppkey": "s"},
    "part": {"p_partkey": "p"},
    "supplier": {"s_suppkey": "s"},
    "documents": {"doc_id": "d"},
    # embeddings scale too (round 8 — they were copied 1x before, so
    # every embedding-family slope was measured on an UNSCALED input):
    # vec_ids shift, and each copy's vectors are dimension-ROTATED (see
    # below) so cross-copy cosine is low — the angular analogue of the
    # documents token salt: near-dup pairs and LSH cells scale K x, not
    # K^2, and copy 0 stays byte-identical (fixed centroid/codebook
    # picks by smallest vec_id keep selecting the original rows).
    "embeddings": {"vec_id": "v"},
}
_STRIDE_KEY = {"c": ("customer", "c_custkey"), "o": ("orders", "o_orderkey"),
               "p": ("part", "p_partkey"), "s": ("supplier", "s_suppkey"),
               "d": ("documents", "doc_id"),
               "v": ("embeddings", "vec_id")}
_COPY_ASIS = ("nation", "region", "events")


def main() -> None:
    import pyspark.sql.functions as F
    from pyspark.sql import SparkSession

    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out = _out_dir(k)
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # local mode: executors live in the driver JVM — K=40's
        # 40-way union + repartition needs real heap (set before the
        # JVM starts, so it must come from this builder, fresh process)
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    strides = {
        key: spark.read.parquet(f"{SRC}/{t}.parquet")
        .agg(F.max(col)).collect()[0][0] + 1
        for key, (t, col) in _STRIDE_KEY.items()
    }
    for t, shifts in _SHIFTS.items():
        src = spark.read.parquet(f"{SRC}/{t}.parquet")
        copies = []
        for i in range(k):
            c = src
            for col, skey in shifts.items():
                c = c.withColumn(col, F.col(col) + F.lit(i * strides[skey]))
            if t == "documents" and i > 0:
                c = c.withColumn(
                    "text",
                    F.regexp_replace("text", r"(\S+)", rf"$1_c{i}"),
                )
            if t == "embeddings" and i > 0:
                # circular dim-shift by 7*i mod 64 (nonzero for every
                # 0 < i < 64): norm-preserving, distribution-preserving,
                # and angularly far from copy 0 for real embeddings —
                # rotated copies land in different LSH cells instead of
                # multiplying near-dup group sizes
                r = (7 * i) % 64
                c = c.withColumn(
                    "embedding",
                    F.expr(
                        f"concat(slice(embedding, {r + 1}, {64 - r}),"
                        f" slice(embedding, 1, {r}))"
                    ),
                )
            copies.append(c)
        union = copies[0]
        for c in copies[1:]:
            union = union.unionByName(c)
        union.repartition(32).write.mode("overwrite").parquet(
            f"{out}/{t}.parquet"
        )
        print(f"{t}: {k}x written")
    for t in _COPY_ASIS:
        spark.read.parquet(f"{SRC}/{t}.parquet").write.mode(
            "overwrite"
        ).parquet(f"{out}/{t}.parquet")
        print(f"{t}: copied 1x")
    # persist the corpus-stats artifact alongside the synthesized data:
    # q100's banding geometry reads n_rows from here instead of running
    # a count() job over the corpus at plan time (round-8 verdict #3 —
    # at 100 TB this row comes from the ingest pipeline / catalog)
    from hcdc_spark.operators.similarity import write_corpus_stats

    write_corpus_stats(
        spark.read.parquet(f"{out}/embeddings.parquet"),
        f"{out}/corpus_stats.parquet",
        source_dir=f"{out}/embeddings.parquet",
    )
    print("corpus_stats: written")
    print("done ->", out)


if __name__ == "__main__":
    main()

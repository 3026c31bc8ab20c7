"""Per-ingest-batch probe cost of the bucketed LSH band index (q103's
scale claim): with geometry='hyperplane' and n_bands/bits sized from
corpus stats, bucket occupancy is pinned (~16 rows), so probing a
FIXED-SIZE ingest batch must cost roughly the same against a 40x
bigger corpus index. The build cost is corpus-linear and paid once.

Measures, at sf0.1 (2k vecs) and a synthesized point (default sf4,
80k vecs): index build (once) and the min-of-N probe of the SAME
200-vector batch (threshold=None, full candidate + exact-cosine leg).

Prints one JSON line:
  {sf: {"n_corpus": n, "bands": B, "bits": b, "build": s, "probe": s}}

Usage: python scripts/bench_band_index.py [passes=3] [sf_label=sf4]
"""

from __future__ import annotations

import json
import pathlib
import sys
import tempfile
import time

ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))


def main() -> None:
    passes = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    big = sys.argv[2] if len(sys.argv) > 2 else "sf4"
    sf_dirs = {"sf0.1": "/root/testdata/sf0.1",
               big: str(ROOT / ".benchdata" / big)}
    from pyspark.sql import functions as F

    from hcdc_spark.operators import similarity as S
    from hcdc_spark.session import get_spark

    spark = get_spark("hcdc-bench-bandidx")
    spark.sparkContext.setLogLevel("ERROR")

    out: dict[str, dict[str, float]] = {}
    for sf, d in sf_dirs.items():
        emb = spark.read.parquet(f"{d}/embeddings.parquet")
        # the fixed ingest batch: the FIRST 200 vec_ids (same rows at
        # every scale point — copy 0 is byte-identical across corpora)
        batch = emb.where(F.col("vec_id") < 200)
        corpus = emb.where(F.col("vec_id") >= 200)
        n = S.read_corpus_stats(
            spark,
            f"{d}/corpus_stats.parquet",
            source_dir=f"{d}/embeddings.parquet",
        )
        if n is None:
            n = emb.count()
        bits = S.neardup_scaled_bits(n)
        bands = S.neardup_scaled_bands(bits)
        table = "hcdc_band_index_bench"
        work = tempfile.mkdtemp(prefix="hcdc_bandidx_bench_")
        try:
            t0 = time.time()
            S.write_band_index(
                spark, corpus, table, f"{work}/bi",
                n_bands=bands, bits=bits, geometry="hyperplane",
            )
            build = time.time() - t0

            def probe() -> None:
                S.incremental_neardup_pairs(
                    spark, batch, table, corpus, threshold=None,
                    n_bands=bands, bits=bits, geometry="hyperplane",
                ).count()

            probe()  # warmup
            best = float("inf")
            for _ in range(passes):
                t0 = time.time()
                probe()
                best = min(best, time.time() - t0)
            out[sf] = {
                "n_corpus": int(n), "bands": bands, "bits": bits,
                "build": round(build, 3), "probe": round(best, 3),
            }
        finally:
            spark.sql(f"DROP TABLE IF EXISTS {table}")
            import shutil

            shutil.rmtree(work, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

"""Per-ingest-batch probe cost of the bucketed LSH band index (q103's
scale claim): with geometry='hyperplane' and n_bands/bits sized from
corpus stats, bucket occupancy is pinned (~16 rows), so probing a
FIXED-SIZE ingest batch must cost roughly the same against a 40x
bigger corpus index. The build cost is corpus-linear and paid once.

Measures, at sf0.1 (2k vecs) and a synthesized point (default sf4,
80k vecs): index build (once) and the min-of-N probe of the SAME
200-vector batch (threshold=None, full candidate + exact-cosine leg).

At the big point it also measures the REBUILD policy (round-9 verdict
missing #2): the index is first built with the small point's STALE
geometry (as if the corpus grew 40x under admissions with no rebuild),
probed (degraded — bucket occupancy ~40x target), then
rebuild_band_index re-sizes it and the probe is measured again; the
rebuilt cost must return to the sized curve (~= "probe").

Prints one JSON line:
  {sf: {"n_corpus": n, "bands": B, "bits": b, "build": s, "probe": s,
        ["probe_stale": s, "rebuild": s, "probe_rebuilt": s]}}

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
            if sf == big:
                # the growth story: same corpus under the SMALL point's
                # stale geometry (what no-rebuild admission drift looks
                # like), then rebuild_band_index back to the sized
                # curve. Stale occupancy is n_big/2^bits_small (~625
                # rows/bucket at 40x) so candidates grow LINEARLY in
                # corpus size; a production-sized ingest batch (2000
                # vecs) makes the verify leg dominant and the
                # wall-clock shows it — plus the candidate counts,
                # which are the scale diagnostic itself.
                big_batch = emb.where(F.col("vec_id") < 2000)
                n_small = out["sf0.1"]["n_corpus"]
                bits_s = S.neardup_scaled_bits(n_small)
                bands_s = S.neardup_scaled_bands(bits_s)
                S.write_band_index(
                    spark, corpus, table, f"{work}/bi_stale",
                    n_bands=bands_s, bits=bits_s, geometry="hyperplane",
                )

                def probe_as(nb: int, bi: int) -> tuple[float, int]:
                    best, n_pairs = float("inf"), 0
                    for _ in range(passes):
                        t0 = time.time()
                        n_pairs = S.incremental_neardup_pairs(
                            spark, big_batch, table, corpus,
                            threshold=None,
                            n_bands=nb, bits=bi, geometry="hyperplane",
                        ).count()
                        best = min(best, time.time() - t0)
                    return best, n_pairs

                probe_as(bands_s, bits_s)  # warmup
                stale, cand_stale = probe_as(bands_s, bits_s)
                assert S.band_index_needs_rebuild(spark, table)
                t0 = time.time()
                meta = S.rebuild_band_index(spark, corpus, table)
                rebuild = time.time() - t0
                rebuilt, cand_rebuilt = probe_as(
                    meta["n_bands"], meta["bits"]
                )
                # keep-latest compaction cost at the big point: re-ingest
                # 1/20th of the corpus as generation 1, fold it back —
                # one groupBy(id) + one join over (id, band, bucket)
                # rows, corpus-linear like the build
                upd = corpus.where(F.col("vec_id") % 20 == 14)
                S.append_band_index(
                    spark, upd, table, n_bands=meta["n_bands"],
                    bits=meta["bits"], geometry="hyperplane", batch_id=1,
                )
                t0 = time.time()
                S.compact_band_index(spark, table)
                compact_s = round(time.time() - t0, 3)

                # round-11 pruning point: a 20-vec micro-batch (the
                # streaming-ingest shape) against the band-partitioned
                # index bucketed FINELY enough that the global bucket
                # IN-list engages (|distinct values| < n_buckets) —
                # file-level bucket pruning + the pushed IN-list. The
                # same micro-batch at the default 32 buckets (IN
                # refused: 20 vecs x n_bands values >= 32) isolates
                # the file-pruning win; the 200-vec "probe" above is
                # the bulk regime (dir-pruned scan, exchange-free).
                micro = emb.where(F.col("vec_id") < 20)

                def probe_micro() -> float:
                    best = float("inf")
                    for _ in range(passes):
                        t0 = time.time()
                        S.incremental_neardup_pairs(
                            spark, micro, table, corpus, threshold=None,
                            n_bands=bands, bits=bits,
                            geometry="hyperplane",
                        ).count()
                        best = min(best, time.time() - t0)
                    return best

                probe_micro()  # warmup
                micro_32 = probe_micro()

                nb_fine = 1024
                S.write_band_index(
                    spark, corpus, table, f"{work}/bi_fine",
                    n_bands=bands, bits=bits, geometry="hyperplane",
                    n_buckets=nb_fine,
                )
                probe_micro()  # warmup on the fine layout
                fine = probe_micro()

                # round-12 degraded regimes, exercised END-TO-END on
                # data that triggers them organically (round-11
                # verdict 'next' #4):
                # (a) BAND_PROBE_KEY_CAP overflow — a 600-vec batch at
                # the sized geometry bands into > 8192 distinct
                # (band, bucket) keys, so the probe skips the key
                # collect and keeps band-dir pruning only (the
                # large-batch regime: the corpus read amortizes over
                # the batch; a bucket IN-list this dense would select
                # nearly every file anyway — the sparsity margin would
                # refuse it even uncapped). Recorded: key count, wall,
                # candidates — against "probe" (the 200-vec in-cap
                # arm) this is the cap crossover, run end-to-end.
                meta_live = S.read_band_index_meta(spark, table)
                over_batch = emb.where(F.col("vec_id") < 600)
                n_keys = (
                    S._band_explode(
                        over_batch, n_bands=meta_live["n_bands"],
                        bits=meta_live["bits"], geometry="hyperplane",
                    ).select("band", "bucket").distinct().count()
                )
                assert n_keys > S.BAND_PROBE_KEY_CAP, (
                    f"premise: {n_keys} keys must exceed the cap"
                )

                def probe_over() -> tuple[float, int]:
                    best, n_pairs = float("inf"), 0
                    for _ in range(passes):
                        t0 = time.time()
                        n_pairs = S.incremental_neardup_pairs(
                            spark, over_batch, table, corpus,
                            threshold=None,
                            n_bands=meta_live["n_bands"],
                            bits=meta_live["bits"],
                            geometry="hyperplane",
                        ).count()
                        best = min(best, time.time() - t0)
                    return best, n_pairs

                probe_over()  # warmup
                over_wall, cand_over = probe_over()

                # round-13 TAKEDOWN arm (delete_from_band_index):
                # deleting 1/20th of the corpus must be O(|ids|) — a
                # tombstone append, no index scan — and a pending-
                # tombstone probe pays only a broadcast anti-join on
                # the index side (plan-gated bucket-aligned); the next
                # compaction drops the dead rows physically and clears
                # the tombstones with the swap.
                def probe_sized() -> tuple[float, int]:
                    best, n_pairs = float("inf"), 0
                    for _ in range(passes):
                        t0 = time.time()
                        n_pairs = S.incremental_neardup_pairs(
                            spark, batch, table, corpus,
                            threshold=None,
                            n_bands=meta_live["n_bands"],
                            bits=meta_live["bits"],
                            geometry="hyperplane",
                        ).count()
                        best = min(best, time.time() - t0)
                    return best, n_pairs

                probe_sized()  # warmup
                pre_wall, cand_pre = probe_sized()
                del_ids = corpus.where(
                    F.col("vec_id") % 20 == 14
                ).select("vec_id")
                n_del = del_ids.count()
                t0 = time.time()
                S.delete_from_band_index(spark, table, del_ids,
                                         batch_id=2)
                delete_s = round(time.time() - t0, 3)
                tomb_wall, cand_tomb = probe_sized()
                t0 = time.time()
                S.compact_band_index(spark, table)
                compact_tomb_s = round(time.time() - t0, 3)
                from hcdc_spark import fsutil

                tomb_cleared = not fsutil.is_dir(fsutil.join(
                    S._table_location(spark, table), "_tombstones"
                ))
                post_wall, cand_post = probe_sized()

                # (b) BAND_SMJ_GROUP_CAP re-key — probe_stale above IS
                # the organic trigger (stale bits at the 40x corpus →
                # exp_group far past the cap → the candidate join
                # re-keys on (band, bucket)); record the group sizes
                # so the output shows WHICH arm ran. The refused arm
                # (bucket-only SMJ at degraded occupancy) is the
                # measured 30+ min spill — deliberately not re-run.
                exp_stale = (
                    bands_s * out[sf]["n_corpus"] / float(2 ** bits_s)
                )
                exp_sized = (
                    meta_live["n_bands"] * meta_live["n_rows"]
                    / float(2 ** min(meta_live["bits"], 63))
                )
                out[sf].update(
                    probe_stale=round(stale, 3),
                    cand_stale=cand_stale,
                    stale_exp_group=int(exp_stale),
                    stale_rekeyed=exp_stale > S.BAND_SMJ_GROUP_CAP,
                    rebuild=round(rebuild, 3),
                    probe_rebuilt=round(rebuilt, 3),
                    cand_rebuilt=cand_rebuilt,
                    sized_exp_group=int(exp_sized),
                    compact=compact_s,
                    probe_micro_32=round(micro_32, 3),
                    probe_micro_pruned_1024=round(fine, 3),
                    overflow_keys=int(n_keys),
                    probe_overflow=round(over_wall, 3),
                    cand_overflow=cand_over,
                    n_deleted=int(n_del),
                    delete=delete_s,
                    probe_pre_delete=round(pre_wall, 3),
                    cand_pre_delete=cand_pre,
                    probe_tombstoned=round(tomb_wall, 3),
                    cand_tombstoned=cand_tomb,
                    compact_tombstoned=compact_tomb_s,
                    tombstones_cleared=tomb_cleared,
                    probe_post_compact=round(post_wall, 3),
                    cand_post_compact=cand_post,
                )
        finally:
            spark.sql(f"DROP TABLE IF EXISTS {table}")
            import shutil

            shutil.rmtree(work, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

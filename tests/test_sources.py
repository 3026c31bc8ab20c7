"""Sources/sinks: reader dispatch, loader, and the roundtrip queries
(oracle-checked like the driver does)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from hcdc_spark.operators import sources_queries
from hcdc_spark.sources import readers, writers
from tests.conftest import assert_matches_oracle

ALL_SPECS = sorted(
    sources_queries.REG.specs.values(), key=lambda s: s.name
)


@pytest.mark.parametrize("spec", ALL_SPECS, ids=[s.name for s in ALL_SPECS])
def test_operator(spec, spark, oracle, sf_dir):
    df = spec.fn(spark, sf_dir)
    if spec.oracle is None:
        assert df.count() >= 0
        return
    assert_matches_oracle(df, oracle, spec.oracle, spec.name)


def test_read_any_detects_and_reads(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "a"), (2, "b")], "id int, name string"
    )
    p = str(tmp_path / "t.parquet.d")
    df.write.parquet(p)
    got = readers.read_any(spark, p)
    assert sorted(r["id"] for r in got.collect()) == [1, 2]


def test_read_any_unknown_raises(spark, tmp_path):
    p = str(tmp_path / "mystery.bin")
    with open(p, "wb") as f:
        f.write(b"\x00\x01\x02\x03 not a known format")
    with pytest.raises(ValueError, match="unsupported file type"):
        readers.read_any(spark, p)


def test_infer_schema_no_rows_materialized(spark, sf_dir):
    sch = readers.infer_schema(
        spark, os.path.join(sf_dir, "orders.parquet"), "PARQUET"
    )
    assert "o_orderkey" in sch.fieldNames()


def test_csv_to_parquet_loader(spark, tmp_path):
    src = spark.createDataFrame(
        [(i, f"n{i}", float(i) * 1.5) for i in range(100)],
        "id int, name string, v double",
    )
    csv_dir = str(tmp_path / "in_csv")
    src.write.option("header", "true").csv(csv_dir)
    dest = str(tmp_path / "out_parquet")
    reg = str(tmp_path / "registry")
    out = writers.csv_to_parquet(
        spark, csv_dir, dest, schema=src.schema,
        register_schema_dir=reg, domain="d", entity="e",
    )
    assert out.count() == 100
    assert dict(out.dtypes)["v"] == "double"
    from hcdc_spark.cdc.materialize import entity_schema

    assert entity_schema(spark, reg, "d", "e") == src.schema


def test_partitioned_write_layout(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "x"), (2, "y"), (3, "x")], "id int, k string"
    )
    p = str(tmp_path / "part")
    writers.write_table(df, p, partition_by=["k"])
    assert sorted(
        d for d in os.listdir(p) if d.startswith("k=")
    ) == ["k=x", "k=y"]
    # partition filter prunes to one dir
    back = spark.read.parquet(p).where(F.col("k") == "x")
    assert back.count() == 2


def test_read_block_ranges_exact_spans(spark, tmp_path):
    """S7: seek-reads return exactly the requested byte spans."""
    from hcdc_spark.sources.readers import read_block_ranges

    blob = bytes(range(256)) * 8  # 2 KiB, position-identifying bytes
    p = str(tmp_path / "blockfile.bin")
    with open(p, "wb") as fh:
        fh.write(blob)
    spans = [(0, 16), (100, 1), (255, 2), (2040, 8), (512, 256)]
    ranges = spark.createDataFrame(
        [(p, o, n) for o, n in spans],
        "path string, offset long, length long",
    )
    got = {
        (r["offset"], r["length"]): bytes(r["content"])
        for r in read_block_ranges(spark, ranges).collect()
    }
    assert got == {(o, n): blob[o:o + n] for o, n in spans}


def test_read_block_ranges_file_uri_scheme(spark, tmp_path):
    from hcdc_spark.sources.readers import read_block_ranges

    p = str(tmp_path / "uri.bin")
    with open(p, "wb") as fh:
        fh.write(b"hello world")
    for uri in (p, "file:" + p, "file://" + p):
        ranges = spark.createDataFrame(
            [(uri, 6, 5)], "path string, offset long, length long"
        )
        [r] = read_block_ranges(spark, ranges).collect()
        assert bytes(r["content"]) == b"world"


def test_avro_fallback_write_mode_ignore(spark, tmp_path):
    """mode='ignore' on the fallback avro writer must be a silent no-op
    when the path exists (the Spark contract) — it previously fell
    through and clobbered the existing files (review r4)."""
    from hcdc_spark.sources import readers, writers

    path = str(tmp_path / "t.avro")
    df1 = spark.range(3).select(F.col("id").alias("v"))
    writers.write_table(df1, path, fmt="avro")
    df2 = spark.range(100).select(F.col("id").alias("v"))
    writers.write_table(df2, path, fmt="avro", mode="ignore")
    back = readers.read_avro(spark, path)
    assert back.count() == 3  # original data untouched

"""Typed batch readers (SURVEY §2A S7-S9, T17-T20).

The reference hand-rolls per-format readers: header-aware batched CSV
(CSVDataReader.java:31-85), Avro container reads (AvroConverter.java:
47-57), Parquet via footer schema (ParquetConverter.java:56-85), plus
JSON→Avro schema inference (SchemaHelper.java:678-708). Spark's
DataSource V2 readers subsume all of them — vectorized, predicate-
pushing, schema-inferring — so this module is a thin dispatch layer:
file_type string → configured ``spark.read``.

``read_any`` adds the reference's content-based format detection (T18)
in front: magic bytes first, extension fallback, then the typed read.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from hcdc_spark.cdc.materialize import READ_FORMATS, detect_format


def read_csv(
    spark: SparkSession,
    path: str | list[str],
    schema: T.StructType | None = None,
    header: bool = True,
    sep: str = ",",
) -> DataFrame:
    """Header-aware CSV (CSVDataReader analogue). Pass an explicit
    schema in production — inference costs an extra pass and types
    drift; the loader records inferred schemas to the registry so later
    reads can pin them."""
    r = spark.read.option("header", header).option("sep", sep)
    if schema is not None:
        r = r.schema(schema)
    else:
        r = r.option("inferSchema", "true")
    return r.csv(path)


def read_json(
    spark: SparkSession,
    path: str | list[str],
    schema: T.StructType | None = None,
    multiline: bool = False,
) -> DataFrame:
    """JSON with built-in schema inference — numeric widening, nullable
    detection, and map/struct disambiguation are what the reference's
    400-line SchemaHelper reimplements (SchemaHelper.java:80-161)."""
    r = spark.read.option("multiLine", multiline)
    if schema is not None:
        r = r.schema(schema)
    return r.json(path)


def read_parquet(
    spark: SparkSession, path: str | list[str], merge_schema: bool = False
) -> DataFrame:
    return (
        spark.read.option("mergeSchema", merge_schema).parquet(
            *(path if isinstance(path, list) else [path])
        )
    )


def read_orc(spark: SparkSession, path: str | list[str]) -> DataFrame:
    return spark.read.orc(*(path if isinstance(path, list) else [path]))


def read_avro(
    spark: SparkSession,
    path: str | list[str],
    schema: T.StructType | None = None,
) -> DataFrame:
    """Avro container read (AvroConverter.java:47-57 analogue).
    Prefers the spark-avro connector when its jar is on the classpath;
    falls back to the spec codec (sources/avro_codec.py) otherwise —
    same rows either way, proven by the codec's Java-decoder tests."""
    from hcdc_spark.cdc.materialize import avro_available
    from hcdc_spark.sources import avro_codec

    if avro_available(spark):
        r = spark.read.format("avro")
        if schema is not None:
            r = r.schema(schema)
        return r.load(path)
    return avro_codec.read_avro(spark, path, schema=schema)


def read_binary(
    spark: SparkSession, path_glob: str, pattern: str | None = None
) -> DataFrame:
    """binaryFile scan (S7/S9 analogue): (path, modificationTime,
    length, content). Content loads lazily per selected column, so a
    metadata-only projection never reads file bodies."""
    r = spark.read.format("binaryFile")
    if pattern:
        r = r.option("pathGlobFilter", pattern)
    return r.load(path_glob)


def read_block_ranges(spark: SparkSession, ranges: DataFrame) -> DataFrame:
    """S7 block byte-range read: (path, offset, length) rows → the same
    rows plus ``content`` bytes of exactly that range.

    The reference reads HDFS blocks by byte range (HDFSBlockReader /
    DFSBlockState offsets, core/.../model/DFSBlockState.java); Spark's
    ``binaryFile`` source is whole-file only, so the range read runs as
    ``mapInPandas`` — each task opens its partition's files once
    (rows grouped by path within the Arrow batch), seeks, and reads
    only the requested spans. Scale shape: the ranges table is
    metadata-sized, tasks touch only their own byte spans (never whole
    files), and fan-out is whatever partitioning ``ranges`` carries —
    repartition by path to co-locate spans of the same file. Paths are
    any mounted filesystem; object stores would swap ``open`` for a
    Hadoop-FS input stream behind the same row contract.
    """
    import pandas as pd

    out_schema = T.StructType(
        [
            T.StructField("path", T.StringType()),
            T.StructField("offset", T.LongType()),
            T.StructField("length", T.LongType()),
            T.StructField("content", T.BinaryType()),
        ]
    )

    def gen(batches):
        for pdf in batches:
            rows = []
            for path, grp in pdf.groupby("path", sort=False):
                local = path
                if local.startswith("file:"):
                    local = local[5:]
                    while local.startswith("//"):  # file:/p and file:///p
                        local = local[1:]
                with open(local, "rb") as fh:
                    for r in grp.itertuples(index=False):
                        fh.seek(int(r.offset))
                        rows.append(
                            (path, int(r.offset), int(r.length),
                             fh.read(int(r.length)))
                        )
            if rows:
                yield pd.DataFrame(
                    rows, columns=["path", "offset", "length", "content"]
                )

    return ranges.select("path", "offset", "length").mapInPandas(
        gen, out_schema
    )


_READERS = {
    "CSV": read_csv,
    "JSON": read_json,
    "PARQUET": read_parquet,
    "ORC": read_orc,
    "AVRO": read_avro,
}


def read_any(
    spark: SparkSession, path: str, file_type: str | None = None, **kw
) -> DataFrame:
    """Detect (T18) then read. ``file_type`` skips detection."""
    if file_type is None:
        rows = detect_format(spark, path).limit(1).collect()
        file_type = rows[0]["file_type"] if rows else "UNKNOWN"
    if file_type not in _READERS:
        raise ValueError(f"unsupported file type {file_type!r} for {path}")
    return _READERS[file_type](spark, path, **kw)


def infer_schema(spark: SparkSession, path: str, file_type: str) -> T.StructType:
    """T19 schema extraction: the file's schema without materializing
    rows (Parquet/ORC read it from the footer; CSV/JSON sample)."""
    if file_type not in READ_FORMATS:
        raise ValueError(f"unsupported file type {file_type!r}")
    return read_any(spark, path, file_type).schema

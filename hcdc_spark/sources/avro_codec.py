"""Avro binary codec + Object Container File writer/reader (K6/T17/T21).

The reference's change-set output format IS Avro: staged Parquet files
are converted to Avro container files before hand-off
(/root/reference/change-manager/namenode-agent/src/main/java/.../
converter/AvroConverter.java:47-57, ParquetConverter.java:56-75), and
EFileType declares AVRO as a first-class file type (core/.../model/
EFileType.java:5-11).

OSS Spark keeps the ``spark-avro`` connector in a separate jar that
this sandbox does not ship, and no Python avro package is installed —
so, exactly like the protobuf envelope codec
(hcdc_spark/streaming/protobuf_codec.py), this module implements the
*public Avro 1.x specification* (avro.apache.org/docs/current/
specification) directly:

- binary encoding: zigzag-varint ints/longs, length-prefixed utf8 and
  bytes, little-endian IEEE-754 doubles, 1-byte booleans, union index
  prefix for ``["null", T]`` nullables, logical types
  ``timestamp-micros`` (long) and ``date`` (int);
- container files: ``Obj\\x01`` magic, metadata map carrying
  ``avro.schema``/``avro.codec``, a 16-byte sync marker, and
  count/size-framed data blocks.

Files written here are byte-compatible with any standard Avro reader.
The test suite proves it by decoding them with the *official Java
avro-1.12.1 library* that ships on Spark's own classpath (via py4j) —
an independent golden check no hand-rolled round-trip can fake.

Spark-first shape: encode/decode run as Arrow-batched ``mapInPandas``
over whole files / ``pandas_udf`` over rows — per-row CPU with no
shuffle, pipelined inside whatever stage produces or consumes the
bytes. One container file is written per input partition (each Arrow
batch becomes one Avro block), and reading distributes per-file over
``binaryFile`` tasks, so both directions scale with partition count.
"""

from __future__ import annotations

import json
import os
import struct
from hashlib import md5
from typing import Any, Callable, Iterator, List, Tuple

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MAGIC = b"Obj\x01"

# --------------------------------------------------------------- primitives


def _zigzag(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def _unzigzag(u: int) -> int:
    return (u >> 1) ^ -(u & 1)


def _enc_varint(u: int) -> bytes:
    out = bytearray()
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def enc_long(n: int) -> bytes:
    """Avro int/long: zigzag then base-128 varint (spec §binary encoding)."""
    return _enc_varint(_zigzag(n))


def dec_long(buf: bytes, pos: int) -> Tuple[int, int]:
    shift = 0
    u = 0
    while True:
        b = buf[pos]
        pos += 1
        u |= (b & 0x7F) << shift
        if not b & 0x80:
            return _unzigzag(u), pos
        shift += 7
        if shift > 70:
            raise ValueError("varint longer than 64 bits")


def enc_bytes(b: bytes) -> bytes:
    return enc_long(len(b)) + b


def enc_str(s: str) -> bytes:
    return enc_bytes(s.encode("utf-8"))


def dec_bytes(buf: bytes, pos: int) -> Tuple[bytes, int]:
    n, pos = dec_long(buf, pos)
    return bytes(buf[pos:pos + n]), pos + n


def enc_double(x: float) -> bytes:
    return struct.pack("<d", x)


# --------------------------------------------------- schema <-> field plans

#: Spark type -> (avro schema fragment, python encoder, python decoder).
#: Timestamps are ``timestamp-micros`` and dates ``date`` logical types,
#: matching what spark-avro itself writes.


def _ts_to_micros(v: Any) -> int:
    if isinstance(v, pd.Timestamp):
        return v.value // 1_000
    raise TypeError(f"expected Timestamp, got {type(v)}")


_EPOCH = pd.Timestamp("1970-01-01")


def _field_plan(dt: T.DataType) -> Tuple[Any, Callable, Callable]:
    if isinstance(dt, T.LongType):
        return "long", lambda v: enc_long(int(v)), dec_long
    if isinstance(dt, T.IntegerType):
        return "int", lambda v: enc_long(int(v)), dec_long
    if isinstance(dt, T.StringType):
        return (
            "string",
            lambda v: enc_str(str(v)),
            lambda b, p: (lambda r: (r[0].decode("utf-8"), r[1]))(
                dec_bytes(b, p)
            ),
        )
    if isinstance(dt, T.BinaryType):
        return "bytes", lambda v: enc_bytes(bytes(v)), dec_bytes
    if isinstance(dt, T.DoubleType):
        return (
            "double",
            lambda v: enc_double(float(v)),
            lambda b, p: (struct.unpack_from("<d", b, p)[0], p + 8),
        )
    if isinstance(dt, T.BooleanType):
        return (
            "boolean",
            lambda v: b"\x01" if v else b"\x00",
            lambda b, p: (bool(b[p]), p + 1),
        )
    if isinstance(dt, T.TimestampNTZType):
        return (
            {"type": "long", "logicalType": "local-timestamp-micros"},
            lambda v: enc_long(_ts_to_micros(v)),
            lambda b, p: (lambda r: (
                pd.Timestamp(r[0] * 1_000), r[1]
            ))(dec_long(b, p)),
        )
    if isinstance(dt, T.TimestampType):
        return (
            {"type": "long", "logicalType": "timestamp-micros"},
            lambda v: enc_long(_ts_to_micros(v)),
            lambda b, p: (lambda r: (
                pd.Timestamp(r[0] * 1_000), r[1]
            ))(dec_long(b, p)),
        )
    if isinstance(dt, T.DateType):
        return (
            {"type": "int", "logicalType": "date"},
            lambda v: enc_long((pd.Timestamp(v) - _EPOCH).days),
            lambda b, p: (lambda r: (
                (_EPOCH + pd.Timedelta(days=r[0])).date(), r[1]
            ))(dec_long(b, p)),
        )
    raise TypeError(f"unsupported Spark type for Avro codec: {dt}")


def avro_schema_json(schema: T.StructType, name: str = "HcdcRecord") -> str:
    """Avro record schema JSON for a Spark StructType. Every field is a
    ``["null", T]`` union (Spark columns are nullable by default)."""
    fields = []
    for f in schema.fields:
        frag, _, _ = _field_plan(f.dataType)
        fields.append({"name": f.name, "type": ["null", frag]})
    return json.dumps(
        {"type": "record", "name": name, "fields": fields},
        separators=(",", ":"),
    )


def _plans(schema: T.StructType) -> List[Tuple[str, Callable, Callable]]:
    return [
        (f.name,) + _field_plan(f.dataType)[1:] for f in schema.fields
    ]


def encode_record(
    row: tuple, plans: List[Tuple[str, Callable, Callable]]
) -> bytes:
    """One record body: fields in schema order; nullable union index
    0 = null, 1 = value (spec: a union is encoded as the zigzag index
    of its branch, then the value)."""
    out = bytearray()
    for v, (_, enc, _) in zip(row, plans):
        if v is None or (isinstance(v, float) and v != v) or v is pd.NaT:
            out += b"\x00"  # zigzag(0) = union branch 0 = null
        else:
            out += b"\x02"  # zigzag(1) = union branch 1
            out += enc(v)
    return bytes(out)


def decode_record(
    buf: bytes, pos: int, plans: List[Tuple[str, Callable, Callable]]
) -> Tuple[dict, int]:
    out = {}
    for name, _, dec in plans:
        idx, pos = dec_long(buf, pos)
        if idx == 0:
            out[name] = None
        else:
            out[name], pos = dec(buf, pos)
    return out, pos


# ------------------------------------------------------------ container file


def sync_marker(schema_json: str) -> bytes:
    """Deterministic 16-byte sync marker (md5 of the schema JSON) —
    reproducible output bytes run-to-run, still unique per schema."""
    return md5(schema_json.encode("utf-8")).digest()


def write_ocf_bytes(
    batches: Iterator[pd.DataFrame], schema: T.StructType
) -> Tuple[bytes, int]:
    """Serialize pandas batches into one Object Container File image.
    Each input batch becomes one Avro data block. Returns (bytes, n)."""
    sj = avro_schema_json(schema)
    plans = _plans(schema)
    sync = sync_marker(sj)
    out = bytearray()
    out += MAGIC
    meta = [("avro.schema", sj.encode()), ("avro.codec", b"null")]
    out += enc_long(len(meta))
    for k, v in meta:
        out += enc_str(k)
        out += enc_bytes(v)
    out += enc_long(0)  # map terminator
    out += sync
    total = 0
    cols = [f.name for f in schema.fields]
    for pdf in batches:
        if len(pdf) == 0:
            continue
        block = bytearray()
        for row in pdf[cols].itertuples(index=False):
            block += encode_record(tuple(row), plans)
        out += enc_long(len(pdf))
        out += enc_long(len(block))
        out += block
        out += sync
        total += len(pdf)
    return bytes(out), total


def read_ocf_bytes(buf: bytes, schema: T.StructType) -> List[dict]:
    """Decode one container file. The file's own header schema drives
    field order (self-describing, like any Avro reader); ``schema``
    supplies the type plans and must cover the header's field names."""
    if buf[:4] != MAGIC:
        raise ValueError("not an Avro object container file")
    pos = 4
    meta = {}
    while True:
        n, pos = dec_long(buf, pos)
        if n == 0:
            break
        if n < 0:  # spec: negative count block carries a byte size
            n = -n
            _, pos = dec_long(buf, pos)
        for _ in range(n):
            kb, pos = dec_bytes(buf, pos)
            vb, pos = dec_bytes(buf, pos)
            meta[kb.decode()] = vb
    codec = meta.get("avro.codec", b"null").decode()
    if codec != "null":
        raise ValueError(f"unsupported avro codec: {codec}")
    header = json.loads(meta["avro.schema"].decode())
    order = [f["name"] for f in header["fields"]]
    by_name = {f.name: f for f in schema.fields}
    plans = [
        (n,) + _field_plan(by_name[n].dataType)[1:] for n in order
    ]
    sync = buf[pos:pos + 16]
    pos += 16
    rows: List[dict] = []
    while pos < len(buf):
        count, pos = dec_long(buf, pos)
        size, pos = dec_long(buf, pos)
        end = pos + size
        for _ in range(count):
            rec, pos = decode_record(buf, pos, plans)
            rows.append(rec)
        if pos != end:
            raise ValueError("block size mismatch")
        if buf[pos:pos + 16] != sync:
            raise ValueError("sync marker mismatch")
        pos += 16
    return rows


_AVRO_TO_SPARK = {
    "long": T.LongType(),
    "int": T.IntegerType(),
    "string": T.StringType(),
    "bytes": T.BinaryType(),
    "double": T.DoubleType(),
    "boolean": T.BooleanType(),
}

_LOGICAL_TO_SPARK = {
    "timestamp-micros": T.TimestampType(),
    "local-timestamp-micros": T.TimestampNTZType(),
    "date": T.DateType(),
}


def avro_json_to_spark_schema(header: dict) -> T.StructType:
    """Spark StructType from an Avro record schema dict (the subset
    this codec writes: primitives, logical ts/date, null unions)."""
    fields = []
    for f in header["fields"]:
        ft = f["type"]
        nullable = False
        if isinstance(ft, list):  # ["null", T] union
            branches = [b for b in ft if b != "null"]
            if len(branches) != 1:
                raise TypeError(f"unsupported union {ft}")
            ft, nullable = branches[0], True
        if isinstance(ft, dict) and "logicalType" in ft:
            st = _LOGICAL_TO_SPARK[ft["logicalType"]]
        elif isinstance(ft, str):
            st = _AVRO_TO_SPARK[ft]
        else:
            raise TypeError(f"unsupported avro type {ft}")
        fields.append(T.StructField(f["name"], st, nullable))
    return T.StructType(fields)


def read_header_schema(buf: bytes) -> dict:
    """Parse just the OCF header and return the record schema dict."""
    if buf[:4] != MAGIC:
        raise ValueError("not an Avro object container file")
    pos = 4
    meta = {}
    while True:
        n, pos = dec_long(buf, pos)
        if n == 0:
            break
        if n < 0:
            n = -n
            _, pos = dec_long(buf, pos)
        for _ in range(n):
            kb, pos = dec_bytes(buf, pos)
            vb, pos = dec_bytes(buf, pos)
            meta[kb.decode()] = vb
    return json.loads(meta["avro.schema"].decode())


# ---------------------------------------------------------- Spark plumbing


def infer_avro_schema(spark: SparkSession, path: str) -> T.StructType:
    """T19/T20 analogue for Avro: schema from the first file's header —
    container files are self-describing, no row materialization."""
    first = (
        spark.read.format("binaryFile")
        .load(os.path.join(path, "*.avro") if os.path.isdir(path) else path)
        .select("content")
        .head()
    )
    if first is None:
        raise ValueError(f"no avro files under {path}")
    return avro_json_to_spark_schema(read_header_schema(bytes(first[0])))


def write_avro(
    df: DataFrame, path: str, min_tasks: int | None = None
) -> DataFrame:
    """Distributed OCF write: one ``part-NNNNN.avro`` per partition,
    each Arrow batch one Avro block. Returns the (collect-to-run)
    manifest DataFrame (file, n_records) — same contract as any
    Spark action-driven sink.

    ``min_tasks`` (round-15, guide §2.6/§6): when set and the input
    arrives with FEWER partitions, round-robin repartition up to it so
    the per-row spec codec — the expensive leg of this sink — runs on
    every core instead of serializing on one task (a single small
    parquet file plans as ONE scan partition, which made q39's write
    leg a 1.5 s single-thread encode on a 32-core box). Scale-adaptive
    by construction: any input already at or above ``min_tasks``
    partitions is left untouched, so no shuffle is ever added at
    scale; ``None`` (default) preserves the caller's partitioning
    exactly — explicit ``coalesce(1)`` single-file writes stay single
    file."""
    os.makedirs(path, exist_ok=True)
    schema = df.schema
    if min_tasks is not None and df.rdd.getNumPartitions() < min_tasks:
        df = df.repartition(min_tasks)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        data, n = write_ocf_bytes(batches, schema)
        if n == 0:
            return
        fname = os.path.join(path, f"part-{pid:05d}.avro")
        with open(fname, "wb") as fh:
            fh.write(data)
        yield pd.DataFrame({"file": [fname], "n_records": [n]})

    return df.mapInPandas(gen, "file string, n_records long")


def read_avro(
    spark: SparkSession,
    path: str | list[str],
    schema: T.StructType | None = None,
    with_path: bool = False,
) -> DataFrame:
    """Distributed OCF read: ``binaryFile`` lists + loads files (one
    task per file), pure-Python spec decode per file, Arrow back to
    the JVM. ``schema`` defaults to the first file's header schema
    (self-describing, like AvroConverter's reads). ``with_path``
    appends ``_src_path`` — the custom-reader stand-in for
    ``_metadata.file_path``."""
    if isinstance(path, list):
        srcs = path
    elif os.path.isdir(path):
        srcs = [os.path.join(path, "*.avro")]
    else:
        srcs = [path]
    if schema is None:
        schema = infer_avro_schema(spark, srcs[0].replace("*.avro", ""))
    bin_df = spark.read.format("binaryFile").load(srcs)
    # StructType.add mutates in place — build a fresh one instead.
    out_schema = (
        T.StructType(
            list(schema.fields) + [T.StructField("_src_path", T.StringType())]
        )
        if with_path
        else schema
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in schema.fields]
        for pdf in batches:
            for fpath, content in zip(pdf["path"], pdf["content"]):
                rows = read_ocf_bytes(bytes(content), schema)
                if not rows:
                    continue
                out = pd.DataFrame(rows, columns=cols)
                if with_path:
                    out["_src_path"] = fpath
                yield out

    return bin_df.select("path", "content").mapInPandas(gen, out_schema)

"""DFSChangeDelta protobuf wire-format codec (SURVEY §2A T26).

Golden bytes are hand-derived from the public protobuf encoding spec
against data_block.proto:143-152 — they pin the exact wire layout
(field order, tag bytes, varint boundaries) independently of the
codec's own round-trip.
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from hcdc_spark.streaming.protobuf_codec import (
    decode_change_delta,
    encode_change_delta,
    from_protobuf_delta,
    to_protobuf_delta,
)


def test_golden_bytes_required_only():
    # namespace='ns', txId=1, entity='e', type='T', timestamp=300,
    # body=b'\x01\x02'
    got = encode_change_delta("ns", 1, "e", "T", 300, b"\x01\x02")
    expect = bytes(
        [
            0x0A, 2, ord("n"), ord("s"),        # 1: namespace "ns"
            0x12, 1, ord("1"),                  # 2: txId "1" (stringified)
            0x1A, 1, ord("e"),                  # 3: entity
            0x22, 1, ord("T"),                  # 4: type
            0x28, 0xAC, 0x02,                   # 5: 300 = 0xAC 0x02 varint
            0x32, 2, 0x01, 0x02,                # 6: body
        ]
    )
    assert got == expect


def test_golden_bytes_optional_fields():
    got = encode_change_delta(
        "n", 42, "e", "T", 0, b"", domain="d", entity_name="x"
    )
    expect = bytes(
        [
            0x0A, 1, ord("n"),
            0x12, 2, ord("4"), ord("2"),
            0x1A, 1, ord("e"),
            0x22, 1, ord("T"),
            0x28, 0x00,                         # timestamp 0 → one byte
            0x32, 0,                            # empty body
            0x3A, 1, ord("d"),                  # 7: domain
            0x42, 1, ord("x"),                  # 8: entityName
        ]
    )
    assert got == expect


def test_varint_boundaries():
    # 127 fits one byte; 128 spills to two (7-bit groups, MSB contd.)
    assert encode_change_delta("n", 0, "e", "T", 127, b"")[-4:-2] == bytes(
        [0x28, 0x7F]
    )
    assert encode_change_delta("n", 0, "e", "T", 128, b"")[-5:-2] == bytes(
        [0x28, 0x80, 0x01]
    )


def test_decode_skips_unknown_fields():
    # A decoder must skip fields it doesn't know (here field 15, both
    # wire types) — forward compatibility per protobuf semantics.
    base = encode_change_delta("ns", 7, "e", "T", 5, b"xy")
    unknown = bytes([(15 << 3) | 0, 0x09]) + bytes(
        [(15 << 3) | 2, 3, 1, 2, 3]
    )
    out = decode_change_delta(unknown + base)
    assert out["namespace"] == "ns"
    assert out["tx_id"] == 7
    assert out["body"] == b"xy"


@settings(max_examples=200, deadline=None)
@given(
    ns=st.text(min_size=0, max_size=20),
    tx=st.integers(min_value=0, max_value=2**62),
    entity=st.text(min_size=0, max_size=20),
    type_=st.text(min_size=0, max_size=20),
    ts=st.integers(min_value=0, max_value=2**63 - 1),
    body=st.binary(min_size=0, max_size=200),
    domain=st.none() | st.text(max_size=10),
    ename=st.none() | st.text(max_size=10),
)
def test_roundtrip_property(ns, tx, entity, type_, ts, body, domain, ename):
    enc = encode_change_delta(ns, tx, entity, type_, ts, body, domain, ename)
    dec = decode_change_delta(enc)
    assert dec == {
        "namespace": ns, "tx_id": tx, "entity": entity, "type": type_,
        "timestamp": ts, "body": body, "domain": domain,
        "entity_name": ename,
    }


def test_negative_timestamp_rejected():
    with pytest.raises(ValueError):
        encode_change_delta("n", 0, "e", "T", -1, b"")


def test_spark_roundtrip(spark):
    rows = [
        ("hdfs", 10, "sales::t1", "DFSAddFile", 1700000000000,
         b'{"a":1}', "sales", "t1"),
        ("hdfs", 11, "hdfs", "DFSIgnoreTx", 1700000000001, b"", None, None),
    ]
    df = spark.createDataFrame(
        rows,
        "namespace string, tx_id long, entity string, type string,"
        " timestamp long, body binary, domain string, entity_name string",
    )
    dec = from_protobuf_delta(to_protobuf_delta(df, "pb"), "pb")
    got = {
        r["tx_id"]: r
        for r in dec.select("delta.*", "pb").collect()
    }
    assert got[10]["domain"] == "sales"
    assert got[10]["body"] == bytearray(b'{"a":1}')
    assert got[11]["domain"] is None
    assert got[11]["entity_name"] is None
    # cross-check the distributed encode against the local codec
    local = encode_change_delta(*rows[0])
    assert bytes(got[10]["pb"]) == local


def test_registry_query_matches_oracle(spark, oracle, sf_dir):
    from tests.conftest import assert_matches_oracle

    from hcdc_spark.operators.streaming_queries import REG

    spec = REG.specs["c11_protobuf_roundtrip"]
    assert_matches_oracle(
        spec.fn(spark, sf_dir), oracle, spec.oracle, spec.name
    )


# ------------------------------------------------ connector-first dispatch


def test_descriptor_set_is_valid_wire_format():
    """descriptor_set_bytes() must itself parse as protobuf: walk the
    nested length-delimited structure generically and recover the
    message name plus every (number, label, type) triple."""
    from hcdc_spark.streaming import protobuf_codec as PC

    def walk(buf):
        fields = []
        pos = 0
        while pos < len(buf):
            tag, pos = PC._read_varint(buf, pos)
            num, wt = tag >> 3, tag & 7
            if wt == 2:
                ln, pos = PC._read_varint(buf, pos)
                fields.append((num, buf[pos:pos + ln]))
                pos += ln
            elif wt == 0:
                val, pos = PC._read_varint(buf, pos)
                fields.append((num, val))
            else:
                raise AssertionError(f"unexpected wire type {wt}")
        return fields

    fds = walk(PC.descriptor_set_bytes())
    assert len(fds) == 1 and fds[0][0] == 1  # one FileDescriptorProto
    fdp = dict(walk(fds[0][1]))
    assert fdp[1] == b"data_block.proto"
    msg = walk(fdp[4])  # DescriptorProto
    name = [v for n, v in msg if n == 1][0]
    assert name == b"DFSChangeDelta"
    triples = []
    for n, v in msg:
        if n == 2:  # FieldDescriptorProto
            fd = dict(walk(v))
            triples.append((fd[3], fd[4], fd[5]))
    assert triples == [
        (1, 2, 9), (2, 2, 9), (3, 2, 9), (4, 2, 9),
        (5, 2, 4), (6, 2, 12), (7, 1, 9), (8, 1, 9),
    ]


def test_protobuf_available_probe_memoized(spark):
    from hcdc_spark.streaming import protobuf_codec as PC

    got = PC.protobuf_available(spark)
    assert isinstance(got, bool)
    app = spark.sparkContext.applicationId
    assert PC._PB_AVAILABLE[app] is got
    assert PC.protobuf_available(spark) is got  # cached, no re-probe


def test_dispatch_bytes_match_pure_codec(spark):
    """Whichever path the dispatch takes (connector or pandas codec),
    the wire bytes must equal the pure-python encoder's output —
    ascending field order, optional fields omitted when null."""
    from hcdc_spark.streaming.protobuf_codec import (
        encode_change_delta,
        to_protobuf_delta,
    )

    rows = [
        ("ns", 7, "ENT", "DFSAddFile", 123456, b'{"a":1}', "dom", "e1"),
        ("ns2", 8, "E2", "DFSCloseFile", 0, b"", None, None),
    ]
    df = spark.createDataFrame(
        rows,
        "namespace string, tx_id long, entity string, type string, "
        "timestamp long, body binary, domain string, entity_name string",
    )
    got = {
        r["tx_id"]: bytes(r["value"])
        for r in to_protobuf_delta(df).collect()
    }
    for ns, tx, ent, ty, ts, body, dom, en in rows:
        assert got[tx] == encode_change_delta(ns, tx, ent, ty, ts, body,
                                              dom, en)


def test_dispatch_connector_arm_selected(spark, monkeypatch):
    """Exercise the OTHER dispatch arm (ADVICE r3 #3): force the probe
    to 'present' and prove the dispatch really takes the connector
    branch. Without the spark-protobuf jar, that branch must surface
    the connector's PROTOBUF_NOT_LOADED analysis error — NOT silently
    fall through to the pandas codec; with the jar present, the arm
    must produce wire bytes identical to the pure codec (the same
    invariant test_dispatch_bytes_match_pure_codec pins for whichever
    arm the real probe picks)."""
    from hcdc_spark.streaming import protobuf_codec as PC
    from hcdc_spark.streaming.protobuf_codec import encode_change_delta

    really_available = PC.protobuf_available(spark)
    monkeypatch.setitem(
        PC._PB_AVAILABLE, spark.sparkContext.applicationId, True
    )
    df = spark.createDataFrame(
        [("n", 1, "e", "t", 5, b"xyz", None, None)],
        "namespace string, tx_id long, entity string, type string, "
        "timestamp long, body binary, domain string, entity_name string",
    )
    if really_available:
        got = bytes(PC.to_protobuf_delta(df).collect()[0]["value"])
        assert got == encode_change_delta("n", 1, "e", "t", 5, b"xyz",
                                          None, None)
    else:
        with pytest.raises(Exception, match="PROTOBUF_NOT_LOADED|protobuf"):
            PC.to_protobuf_delta(df)


def test_dispatch_fallback_forced(spark, monkeypatch):
    """Force the probe to 'absent' and assert the pandas codec path
    round-trips — mirrors test_avro_codec's dispatch-fallback gate."""
    from hcdc_spark.streaming import protobuf_codec as PC

    monkeypatch.setitem(
        PC._PB_AVAILABLE, spark.sparkContext.applicationId, False
    )
    df = spark.createDataFrame(
        [("n", 1, "e", "t", 5, b"xyz", None, None)],
        "namespace string, tx_id long, entity string, type string, "
        "timestamp long, body binary, domain string, entity_name string",
    )
    out = PC.from_protobuf_delta(PC.to_protobuf_delta(df)).collect()[0]
    d = out["delta"]
    assert (d["namespace"], d["tx_id"], d["entity"], d["type"],
            d["timestamp"], bytes(d["body"]), d["domain"],
            d["entity_name"]) == ("n", 1, "e", "t", 5, b"xyz", None, None)


def test_truncated_field_raises():
    """A length-delimited field whose declared length overruns the
    buffer must raise, not return a silently-truncated decode."""
    good = encode_change_delta("ns", 7, "e", "t", 1, b"payload")
    with pytest.raises(ValueError, match="truncated"):
        decode_change_delta(good[:-3])


def test_payload_type_names_match_reference(spark):
    """Envelope field 4 must carry the reference's payload class simple
    names (data_block.proto) — initcap('ADD_FILE') would have produced
    'DFSAdd_file' (review r4)."""
    from hcdc_spark.streaming.protobuf_codec import payload_type_col

    ops = ["ADD_FILE", "UPDATE_BLOCKS", "CLOSE", "IGNORE", "TRUNCATE"]
    df = spark.createDataFrame([(o,) for o in ops], "op string")
    got = dict(
        (r["op"], r["t"])
        for r in df.select("op", payload_type_col("op").alias("t")).collect()
    )
    assert got == {
        "ADD_FILE": "DFSAddFile", "UPDATE_BLOCKS": "DFSUpdateBlocks",
        "CLOSE": "DFSCloseFile", "IGNORE": "DFSIgnoreTx",
        "TRUNCATE": "DFSTruncateBlock",
    }

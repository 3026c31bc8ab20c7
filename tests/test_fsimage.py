"""FsImage XML bootstrap (S1): path reconstruction by pointer doubling
plus end-to-end fold through the standard reconciler."""

from __future__ import annotations

import os

import pytest

from hcdc_spark.cdc.fsimage import (
    EXAMPLE_FSIMAGE_XML,
    bootstrap_from_fsimage,
    fsimage_txid,
    read_fsimage,
    resolve_paths,
)
from hcdc_spark.cdc.reconcile import reconcile_batch



@pytest.fixture(scope="module")
def xml_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("fsimage") / "fsimage.xml"
    p.write_text(EXAMPLE_FSIMAGE_XML)
    return str(p)


def test_txid(spark, xml_path):
    assert fsimage_txid(spark, xml_path) == 5000


def test_resolve_paths_doubling(spark, xml_path):
    inodes, edges = read_fsimage(spark, xml_path)
    paths = {r["id"]: r["path"] for r in resolve_paths(inodes, edges).collect()}
    assert paths[16386] == "/data"
    assert paths[16390] == "/data/warehouse/f1.parquet"
    assert paths[16391] == "/data/warehouse/deep/f2.csv"
    assert paths[16392] == "/data/empty.bin"


def test_bootstrap_events_and_fold(spark, xml_path):
    ev = bootstrap_from_fsimage(spark, xml_path)
    rows = {r["path"]: r for r in ev.collect()}
    f1 = rows["/data/warehouse/f1.parquet"]
    assert f1["inode_id"] == 16390            # real inode ids preserved
    assert f1["tx_id"] > 5000                 # stacked on the image txid
    assert f1["length"] == 1000
    assert [b["start_offset"] for b in f1["blocks"]] == [0, 700]
    assert [b["end_offset"] for b in f1["blocks"]] == [699, 999]
    assert f1["file_type"] == "PARQUET"
    assert rows["/data/empty.bin"]["length"] == 0

    state = {
        r["path"]: r
        for r in reconcile_batch(ev, expand_dirs=False).collect()
    }
    assert state["/data/warehouse/f1.parquet"]["state"] == "Finalized"
    assert state["/data/warehouse/f1.parquet"]["num_blocks"] == 2
    assert state["/data/warehouse/deep/f2.csv"]["data_size"] == 50

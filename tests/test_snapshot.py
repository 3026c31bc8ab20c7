"""Snapshot/backfill (S1, T22, T23): bootstrap, round-trip, backlog."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hcdc_spark.cdc import snapshot as S
from hcdc_spark.cdc.generator import events_df, generate_events
from hcdc_spark.cdc.reconcile import reconcile_batch


@pytest.fixture(scope="module")
def state(spark):
    log = events_df(
        spark, generate_events(n_files=30, seed=11, with_dir_ops=False)
    )
    return reconcile_batch(log, expand_dirs=False).drop("errors").cache()


def test_bootstrap_from_listing(spark, sf_dir):
    ev = S.bootstrap_from_listing(spark, sf_dir, base_tx=100)
    rows = ev.collect()
    assert len(rows) >= 10  # one per test parquet file at least
    assert all(r["op"] == "CLOSE" and r["mode"] == "Snapshot" for r in rows)
    # contiguous tx ids starting past base_tx
    txs = sorted(r["tx_id"] for r in rows)
    assert txs[0] == 101 and txs == list(range(101, 101 + len(rows)))
    assert all(r["file_type"] == "PARQUET" for r in rows)

    # the ordinary reconciler folds the bootstrap into Finalized state
    st = reconcile_batch(ev, expand_dirs=False)
    assert st.where(F.col("state") != "Finalized").count() == 0
    assert st.count() == len(rows)
    # data size carried through
    got = {r["path"]: r["data_size"] for r in st.collect()}
    want = {r["path"]: r["length"] for r in rows}
    assert got == want


def test_snapshot_roundtrip(spark, state):
    """state → synthetic CLOSE events → empty reconciler → same state."""
    snap = S.generate_snapshot(state)
    rebuilt = reconcile_batch(snap, expand_dirs=False).drop("errors")

    cols = ["inode_id", "path", "data_size", "last_tx_id", "file_type"]
    orig = {
        r["inode_id"]: tuple(r[c] for c in cols)
        for r in state.where(F.col("state") != "Deleted").select(*cols).collect()
    }
    new = {
        r["inode_id"]: tuple(r[c] for c in cols)
        for r in rebuilt.select(*cols).collect()
    }
    assert orig == new
    assert rebuilt.where(F.col("state") != "Finalized").count() == 0


def test_backlog_covers_post_snapshot_txs(spark, state):
    # pick a snapshot tx in the middle of the log
    mid = state.agg(
        F.percentile_approx("last_tx_id", 0.5).cast("long")
    ).collect()[0][0]
    bl = S.backlog_events(state, snapshot_tx=mid)
    rows = bl.collect()
    assert rows, "no backlog produced"
    assert all(r["mode"] == "Backlog" and r["tx_id"] > mid for r in rows)
    # every block interval is a covering interval of post-snapshot deltas
    exploded = bl.select(
        "inode_id", F.explode("blocks").alias("b")
    ).collect()
    for r in exploded:
        b = r["b"]
        assert b["start_offset"] is not None
        assert b["end_offset"] >= b["start_offset"] - 1  # empty-growth edge
        assert b["delta_size"] == b["end_offset"] - b["start_offset"] + 1

    # backlog replays idempotently onto the live state (T4 guard: same
    # tx id → no-op)
    from hcdc_spark.cdc.reconcile import reconcile_batch as rb

    log = events_df(
        spark, generate_events(n_files=30, seed=11, with_dir_ops=False)
    )
    merged = rb(log.unionByName(bl), expand_dirs=False).drop("errors")
    before = sorted(
        (r["inode_id"], r["data_size"], r["last_tx_id"])
        for r in state.select("inode_id", "data_size", "last_tx_id").collect()
    )
    after = sorted(
        (r["inode_id"], r["data_size"], r["last_tx_id"])
        for r in merged.select("inode_id", "data_size", "last_tx_id").collect()
    )
    assert before == after


def test_backlog_skips_up_to_date_files(spark, state):
    top = state.agg(F.max("last_tx_id")).collect()[0][0]
    assert S.backlog_events(state, snapshot_tx=top).count() == 0

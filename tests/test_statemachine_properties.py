"""Property-based tests (hypothesis) for the per-file state machine.

The reference's only semantic invariant test is txid contiguity on
fixture replay (EditLogViewerTest.java:33-36). Here the fold's
invariants are checked over *randomized* event sequences — the upgrade
SURVEY §5 calls for. Pure Python, no Spark session: the same fold runs
under applyInPandas(WithState), so these properties transfer.
"""

from __future__ import annotations

import copy

from hypothesis import given, settings, strategies as st

from hcdc_spark.cdc.model import empty_event
from hcdc_spark.cdc.statemachine import apply_event, fold_events

# -- event-sequence generator -------------------------------------------


@st.composite
def event_logs(draw):
    """A plausible single-file life: create, then random ops, tx ids
    strictly increasing (the generator's contract; duplicates are added
    separately by the replay properties)."""
    n_ops = draw(st.integers(min_value=0, max_value=12))
    events = []
    tx = 1
    blk = {
        "block_id": 100, "size": draw(st.integers(0, 1000)),
        "block_size": 4096, "generation_stamp": 1, "start_offset": None,
        "end_offset": None, "delta_size": None, "deleted": False,
    }
    events.append(
        empty_event(tx_id=tx, op="ADD_FILE", ts=tx, path="/f", inode_id=1,
                    overwrite=False, blocks=[blk], mode="New")
    )
    size = blk["size"]
    next_block = 101
    blocks = [dict(blk)]
    for _ in range(n_ops):
        tx += draw(st.integers(1, 3))  # gaps allowed
        kind = draw(st.sampled_from(
            ["grow", "add_block", "append", "truncate", "close", "delete",
             "ignore"]
        ))
        if kind == "grow":
            grow = draw(st.integers(1, 500))
            blocks[-1] = dict(blocks[-1], size=(blocks[-1]["size"] or 0) + grow)
            size += grow
            events.append(empty_event(
                tx_id=tx, op="UPDATE_BLOCKS", ts=tx, path="/f", inode_id=1,
                blocks=[dict(blocks[-1])], mode="New"))
        elif kind == "add_block":
            nb = {"block_id": next_block, "size": 0, "block_size": 4096,
                  "generation_stamp": 1, "start_offset": None,
                  "end_offset": None, "delta_size": None, "deleted": False}
            next_block += 1
            pair = [dict(blocks[-1]), nb]
            blocks.append(dict(nb))
            events.append(empty_event(
                tx_id=tx, op="ADD_BLOCK", ts=tx, path="/f", inode_id=1,
                blocks=pair, mode="New"))
        elif kind == "append":
            events.append(empty_event(
                tx_id=tx, op="APPEND", ts=tx, path="/f", inode_id=1,
                mode="New"))
        elif kind == "truncate":
            if size > 1:
                new_len = draw(st.integers(0, size - 1))
                events.append(empty_event(
                    tx_id=tx, op="TRUNCATE", ts=tx, path="/f", inode_id=1,
                    truncate_new_length=new_len, mode="New"))
                size = new_len
        elif kind == "close":
            events.append(empty_event(
                tx_id=tx, op="CLOSE", ts=tx, path="/f", inode_id=1,
                length=size, file_type="PARQUET",
                blocks=[dict(b) for b in blocks], mode="New"))
        elif kind == "delete":
            events.append(empty_event(
                tx_id=tx, op="DELETE", ts=tx, path="/f", inode_id=1,
                mode="New"))
        else:
            events.append(empty_event(
                tx_id=tx, op="IGNORE", ts=tx, path="/f", inode_id=1,
                mode="New"))
    return events


# -- properties ---------------------------------------------------------


@settings(max_examples=200, deadline=None)
@given(event_logs())
def test_replay_idempotent(events):
    """Folding the log twice == folding it once (T4 at-least-once)."""
    once, _ = fold_events(None, events)
    twice, _ = fold_events(copy.deepcopy(once), copy.deepcopy(events))
    assert once == twice


@settings(max_examples=200, deadline=None)
@given(event_logs(), st.data())
def test_duplicate_injection_noop(events, data):
    """Injecting a duplicate of any earlier event right after itself
    changes nothing."""
    if len(events) < 2:
        return
    i = data.draw(st.integers(0, len(events) - 1))
    dup = copy.deepcopy(events)
    dup.insert(i + 1, copy.deepcopy(events[i]))
    a, _ = fold_events(None, events)
    b, _ = fold_events(None, dup)
    assert a == b


@settings(max_examples=200, deadline=None)
@given(event_logs())
def test_invariants_hold_at_every_step(events):
    state = None
    last_tx = -1
    for ev in events:
        state, errs = apply_event(state, copy.deepcopy(ev))
        if state is None:
            continue
        # last_tx_id monotonically non-decreasing
        assert state["last_tx_id"] >= last_tx
        last_tx = state["last_tx_id"]
        # num_blocks counts live blocks
        live = [b for b in state["blocks"] if b["state"] != "Deleted"]
        assert state["num_blocks"] == len(live)
        # block sizes are never negative; deltas are well-formed ranges
        for b in state["blocks"]:
            assert b["data_size"] >= 0
            for d in b["deltas"]:
                assert d["end_offset"] >= d["start_offset"] - 1
        # lifecycle: states come from the enum
        assert state["state"] in (
            "New", "Updating", "Finalized", "Deleted", "Error"
        )


@settings(max_examples=200, deadline=None)
@given(event_logs())
def test_truncate_never_grows(events):
    """After any TRUNCATE, live data_size equals the requested length
    (sum over live blocks)."""
    state = None
    for ev in events:
        state, _ = apply_event(state, copy.deepcopy(ev))
        if ev["op"] == "TRUNCATE" and state is not None \
                and state["state"] != "Deleted":
            assert state["data_size"] == ev["truncate_new_length"]


@settings(max_examples=100, deadline=None)
@given(event_logs())
def test_compressed_change_set_covers_deltas(events):
    from hcdc_spark.cdc.statemachine import compressed_change_set

    state, _ = fold_events(None, events)
    if state is None:
        return
    cs = compressed_change_set(state, 0, 10 ** 9)
    for blk in state["blocks"]:
        deltas = blk["deltas"]
        if not deltas:
            assert blk["block_id"] not in cs
            continue
        lo, hi, _deleted = cs[blk["block_id"]]
        assert lo == min(d["start_offset"] for d in deltas)
        assert hi == max(d["end_offset"] for d in deltas)

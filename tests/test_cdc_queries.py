"""Oracle checks for the CDC pattern queries + smoke for demos."""

from __future__ import annotations

import pytest

from hcdc_spark.operators.cdc_queries import REG
from tests.conftest import assert_matches_oracle

SPECS = sorted(REG.specs.values(), key=lambda s: s.name)


@pytest.mark.parametrize("spec", SPECS, ids=[s.name for s in SPECS])
def test_cdc_query(spec, spark, oracle, sf_dir):
    if spec.name == "c16_editlog_decode":
        import os

        fixtures = os.environ.get(
            "HCDC_EDITLOG_FIXTURES",
            "/root/reference/change-manager/namenode-agent/src/test/"
            "resources/edits/logs",
        )
        if not os.path.isdir(fixtures):
            pytest.skip("edit-log binary fixtures not present")
    df = spec.fn(spark, sf_dir)
    if spec.oracle is None:
        assert df.count() > 0  # demos must produce rows
        return
    assert_matches_oracle(df, oracle, spec.oracle, spec.name)


def test_trunc_rounds_counts_max_per_inode():
    """Clamp-chain depth = max TRUNCATE count on any single inode,
    after tx-dedup, floored at 1 for truncate-free logs."""
    from hcdc_spark.operators.cdc_oracle import trunc_rounds

    evs = [
        {"tx_id": 1, "op": "TRUNCATE", "inode_id": 1},
        {"tx_id": 2, "op": "TRUNCATE", "inode_id": 1},
        {"tx_id": 2, "op": "TRUNCATE", "inode_id": 1},  # replayed tx
        {"tx_id": 3, "op": "TRUNCATE", "inode_id": 2},
        {"tx_id": 4, "op": "CLOSE", "inode_id": 1},
    ]
    assert trunc_rounds(evs) == 2
    assert trunc_rounds([{"tx_id": 1, "op": "CLOSE", "inode_id": 1}]) == 1


def test_relational_oracle_invariants():
    """The c01-c04 relational folds are exact only under documented log
    shapes — fail here (not with a silent oracle divergence) if the
    generator ever changes."""
    from hcdc_spark.operators import cdc_oracle

    cdc_oracle.check_invariants(cdc_oracle.demo_events())
    cdc_oracle.check_invariants(cdc_oracle.stream_demo_events())


def test_relational_oracle_matches_golden_pins(oracle):
    """Triangle closure: the DuckDB relational re-derivations of the
    seed-42/seed-7 folds must equal the pinned golden rows (which the
    Spark pipelines are separately checked against) — three independent
    formulations (Python fold, window SQL, pins), one answer."""
    from hcdc_spark.operators import cdc_oracle, goldens

    for sql, rows in (
        (cdc_oracle.c01_oracle(), goldens.C01_ROWS),
        (cdc_oracle.c02_oracle(), goldens.C02_ROWS),
        (cdc_oracle.c03_oracle(), goldens.C03_ROWS),
        (cdc_oracle.c04_oracle(), goldens.C04_ROWS),
    ):
        got = sorted(tuple(r) for r in oracle.execute(sql).fetchall())
        assert got == sorted(tuple(r) for r in rows)


def _python_expand_dirs(events: list[dict]) -> list[dict]:
    """Independent sequential directory-cascade expander for the parity
    test below (third formulation — the Spark pre-pass is a fixpoint of
    set joins, the oracle SQL a single-round window join; this one
    replays the log event-by-event)."""
    from hcdc_spark.operators.cdc_oracle import _FILE_ONLY_OPS

    by_tx: dict[int, dict] = {}
    for e in events:
        by_tx.setdefault(e["tx_id"], e)
    evs = sorted(by_tx.values(), key=lambda e: e["tx_id"])
    file_inodes = {e["inode_id"] for e in evs if e["op"] in _FILE_ONLY_OPS}

    cur: dict[int, str | None] = {}
    out: list[dict] = []
    for e in evs:
        ino = e["inode_id"]
        if ino not in file_inodes and e["op"] in ("DELETE", "RENAME"):
            d_path, d_dest = e["path"], e.get("dest_path")
            for child, p in sorted(cur.items()):
                if not (p and p.startswith(d_path + "/")):
                    continue
                if e["op"] == "DELETE":
                    if p.startswith("/tmp/"):
                        continue
                    out.append(dict(e, op="DELETE", path=p,
                                    inode_id=child, dest_path=None))
                    cur[child] = None
                else:
                    new = d_dest + p[len(d_path):]
                    out.append(dict(e, op="RENAME", path=p,
                                    inode_id=child, dest_path=new))
                    cur[child] = new
            continue  # directory row itself is dropped
        if e["op"] in ("ADD_FILE", "CLOSE") and e.get("path") is not None:
            cur[ino] = e["path"]
        elif e["op"] == "RENAME":
            cur[ino] = e.get("dest_path")
        elif e["op"] == "DELETE":
            cur[ino] = None
        out.append(e)
    return out


def _python_fold(events: list[dict]):
    """(state_rows, error_rows, changeset_rows) via the pure-Python
    statemachine over the sequentially expanded log."""
    from hcdc_spark.cdc.statemachine import (
        compressed_change_set,
        fold_events,
    )

    expanded = _python_expand_dirs(events)
    by_inode: dict[int, list[dict]] = {}
    for e in expanded:
        by_inode.setdefault(e["inode_id"], []).append(e)

    states, errors, changes = [], [], []
    for inode, evs in sorted(by_inode.items()):
        st, errs = fold_events(None, sorted(evs, key=lambda x: x["tx_id"]))
        for er in errs:
            errors.append((er["tx_id"], er["inode_id"], er["path"],
                           er["op"], er["error"]))
        if st is None:
            states.append((inode, None, "Unknown", None, None, None, None))
            continue
        states.append((inode, st["path"], st["state"], st["data_size"],
                       st["num_blocks"], st["last_tx_id"], st["file_type"]))
        cs = compressed_change_set(st, 0, 1_000_000)
        for blk in st["blocks"]:
            if blk["block_id"] not in cs:
                continue
            lo, hi, deleted = cs[blk["block_id"]]
            n = sum(1 for d in blk["deltas"]
                    if 0 < d["tx_id"] <= 1_000_000)
            changes.append((inode, blk["block_id"], lo, hi, deleted, n))
    return sorted(states), sorted(errors), sorted(changes)


def test_cascade_chain_transitive_dependency_pinned(oracle):
    """The cascade chain's worst case, pinned by hand: rename /a → /b
    moves a file (round 1), delete /a must NOT cascade onto the moved
    file (needs round 2's history to retract the raw-path claim), and
    delete /b must find the file at its POST-RENAME path (correct only
    in round 3, after the bogus intermediate delete disappears from
    the history). A single-round formulation gets the final state
    wrong in two different ways; cascade_rounds(log) must be 3 here
    and the fold must match the sequential Python statemachine."""
    from hcdc_spark.cdc.generator import empty_event
    from hcdc_spark.operators import cdc_oracle as O

    ns = "ns1"
    b = {"block_id": 500, "size": 1024, "block_size": 1 << 20,
         "generation_stamp": 1, "start_offset": None, "end_offset": None,
         "delta_size": None, "deleted": False}
    ev = [
        empty_event(tx_id=1, ts=1000, op="ADD_FILE", namespace=ns,
                    path="/a/f.parquet", inode_id=1, block_size=1 << 20,
                    overwrite=False, modified_time=1000, blocks=[b],
                    mode="New"),
        empty_event(tx_id=2, ts=2000, op="CLOSE", namespace=ns,
                    path="/a/f.parquet", inode_id=1, length=1024,
                    modified_time=2000, file_type="PARQUET",
                    blocks=[dict(b)], mode="New"),
        # O: rename /a -> /b (dir inode)
        empty_event(tx_id=3, ts=3000, op="RENAME", namespace=ns,
                    path="/a", inode_id=900001, dest_path="/b",
                    rename_opts="NONE", mode="New"),
        # D: delete /a — now EMPTY; must cascade onto nothing
        empty_event(tx_id=4, ts=4000, op="DELETE", namespace=ns,
                    path="/a", inode_id=900002, mode="New"),
        # E: delete /b — must find the renamed file
        empty_event(tx_id=5, ts=5000, op="DELETE", namespace=ns,
                    path="/b", inode_id=900003, mode="New"),
    ]
    O.check_invariants(ev)
    assert O.cascade_rounds(ev) == 3
    ctes = O.render_input_ctes(ev)
    want_state, want_errs, want_cs = _python_fold(ev)
    got_state = sorted(
        tuple(r) for r in oracle.execute(
            O.state_query(ctes, True, cascade_rounds=3)
        ).fetchall()
    )
    assert got_state == want_state
    # the file must end Deleted (E found it), not live at /b/f.parquet
    assert got_state[0][2] == "Deleted"
    got_errs = sorted(
        tuple(r) for r in oracle.execute(
            O.errors_query(ctes, cascade_rounds=3)
        ).fetchall()
    )
    assert got_errs == want_errs == []
    # regression guard for the single-round formulation: with ONE
    # round it diverges (D bogusly deletes the moved file and/or E
    # misses it) — proving the chain is load-bearing on this shape
    single = sorted(
        tuple(r) for r in oracle.execute(
            O.state_query(ctes, True, cascade_rounds=1)
        ).fetchall()
    )
    assert single != want_state


def test_relational_fold_parity_across_seeds(oracle):
    """Generalization gate: for EVERY generator log that satisfies
    check_invariants — not just the two registry demos — the DuckDB
    window-SQL fold must equal the pure-Python statemachine fold
    (state, error channel, and per-block change set), with directory
    cascades expanded by a third, sequential formulation. Logs that
    violate the invariants are skipped (that is what the invariant
    gate is FOR); the test requires a healthy sample of passing logs."""
    from hcdc_spark.cdc.generator import generate_events
    from hcdc_spark.operators import cdc_oracle as O

    tested = skipped = 0
    for seed in range(1, 27):
        for kwargs in (
            {"n_files": 15, "with_dir_ops": False},
            {"n_files": 15, "with_dir_ops": True, "with_anomalies": True},
            {"n_files": 25, "with_dir_ops": False,
             "with_duplicates": False},
            # round 7: re-created lifetimes (file-level AND
            # cascade-DELETE→re-ADD, truncate + post-truncate growth
            # inside the new lifetime) — the epoch CTE's real coverage
            {"n_files": 15, "with_dir_ops": True, "with_anomalies": True,
             "with_recreates": True},
            # round 7 (continued): OVERLAPPING dir-op subtrees — the
            # same directory deleted twice with re-ADDs under it in
            # between (a cascade landing on epoch-2 lifetimes), a
            # third lifetime after the second cascade, and a rename
            # chain moving the survivor — the cascade CHAIN's real
            # coverage (cascade_rounds > 1 on every one of these logs)
            {"n_files": 15, "with_dir_ops": True, "with_anomalies": True,
             "with_recreates": True, "with_subtree_recreates": True},
        ):
            events = generate_events(seed=seed, **kwargs)
            try:
                O.check_invariants(events)
            except AssertionError:
                skipped += 1
                continue
            tested += 1
            ctes = O.render_input_ctes(events)
            k = O.trunc_rounds(events)
            cr = O.cascade_rounds(events)
            want_state, want_errs, want_cs = _python_fold(events)
            got_state = sorted(
                tuple(r) for r in
                oracle.execute(
                    O.state_query(
                        ctes, True, trunc_rounds=k, cascade_rounds=cr
                    )
                ).fetchall()
            )
            assert got_state == want_state, f"state diverged (seed {seed})"
            got_errs = sorted(
                tuple(r) for r in
                oracle.execute(
                    O.errors_query(ctes, cascade_rounds=cr)
                ).fetchall()
            )
            assert got_errs == want_errs, f"errors diverged (seed {seed})"
            got_cs = sorted(
                tuple(r) for r in
                oracle.execute(
                    O.changeset_query(
                        ctes, trunc_rounds=k, cascade_rounds=cr
                    )
                ).fetchall()
            )
            assert got_cs == want_cs, f"change set diverged (seed {seed})"
    # Round 7 retired the re-creation, growth-after-TRUNCATE and
    # disjoint-subtree invariants (the fold now models all three), so
    # ALL 130 candidate logs satisfy the gate — require a floor close
    # to that so silent mass-skipping can't hollow the test out
    assert tested >= 120, (tested, skipped)


def _assert_fold_parity(oracle, ev):
    """Full three-query parity (state / errors / change set) between
    the DuckDB window-SQL fold and the sequential Python statemachine
    on a hand-authored log."""
    from hcdc_spark.operators import cdc_oracle as O

    O.check_invariants(ev)
    ctes = O.render_input_ctes(ev)
    k, cr = O.trunc_rounds(ev), O.cascade_rounds(ev)
    want_state, want_errs, want_cs = _python_fold(ev)
    got_state = sorted(
        tuple(r) for r in oracle.execute(
            O.state_query(ctes, True, trunc_rounds=k, cascade_rounds=cr)
        ).fetchall()
    )
    assert got_state == want_state, "state diverged"
    got_errs = sorted(
        tuple(r) for r in oracle.execute(
            O.errors_query(ctes, cascade_rounds=cr)
        ).fetchall()
    )
    assert got_errs == want_errs, "errors diverged"
    got_cs = sorted(
        tuple(r) for r in oracle.execute(
            O.changeset_query(ctes, trunc_rounds=k, cascade_rounds=cr)
        ).fetchall()
    )
    assert got_cs == want_cs, "change set diverged"
    return want_state


def _trunc_cap_log(n_truncs: int) -> list[dict]:
    """One inode whose single lifetime carries exactly ``n_truncs``
    TRUNCATEs, each separated by growth (so every clamp stage clamps
    against the PREVIOUS stage's shrunken sizes, not the original
    assertion), with a second block added mid-chain and post-truncate
    growth before the final CLOSE — the deepest shape the clamp chain
    generates SQL for when n_truncs == MAX_TRUNCS_PER_LIFETIME."""
    from hcdc_spark.cdc.generator import empty_event

    ns, blk_size = "ns1", 1 << 20
    tx = 0

    def nxt():
        nonlocal tx
        tx += 1
        return tx, 1_700_000_000_000 + tx * 1000

    def blk(bid, size):
        return {"block_id": bid, "size": size, "block_size": blk_size,
                "generation_stamp": 1, "start_offset": None,
                "end_offset": None, "delta_size": None, "deleted": False}

    path = "/data/cap/f.parquet"
    ev: list[dict] = []
    t, ts = nxt()
    ev.append(empty_event(tx_id=t, ts=ts, op="ADD_FILE", namespace=ns,
                          path=path, inode_id=1, block_size=blk_size,
                          overwrite=False, modified_time=ts,
                          blocks=[blk(700, 0)], mode="New"))
    size = 0
    bsizes = {700: 0}          # generator convention: block sizes are
    cur = 700                  # NOT shrunk by TRUNCATE, only regrown
    for i in range(n_truncs):
        if i == n_truncs // 2:  # second block joins mid-chain
            t, ts = nxt()
            ev.append(empty_event(
                tx_id=t, ts=ts, op="ADD_BLOCK", namespace=ns, path=path,
                inode_id=1, mode="New",
                blocks=[blk(cur, bsizes[cur]), blk(701, 0)],
            ))
            bsizes[701] = 0
            cur = 701
        grow = 5000 + 1000 * i
        bsizes[cur] += grow
        size += grow
        t, ts = nxt()
        ev.append(empty_event(tx_id=t, ts=ts, op="UPDATE_BLOCKS",
                              namespace=ns, path=path, inode_id=1,
                              mode="New", blocks=[blk(cur, bsizes[cur])]))
        t, ts = nxt()
        size -= 1500 + 100 * i
        ev.append(empty_event(tx_id=t, ts=ts, op="TRUNCATE",
                              namespace=ns, path=path, inode_id=1,
                              truncate_new_length=size, mode="New"))
    bsizes[cur] += 2048  # post-truncate growth without an intervening
    size += 2048         # CLOSE — the modeled anomaly shape
    t, ts = nxt()
    ev.append(empty_event(tx_id=t, ts=ts, op="UPDATE_BLOCKS",
                          namespace=ns, path=path, inode_id=1,
                          mode="New", blocks=[blk(cur, bsizes[cur])]))
    t, ts = nxt()
    ev.append(empty_event(tx_id=t, ts=ts, op="CLOSE", namespace=ns,
                          path=path, inode_id=1, length=size,
                          modified_time=ts, file_type="PARQUET",
                          mode="New",
                          blocks=[blk(b, s) for b, s in
                                  sorted(bsizes.items())]))
    return ev


def _dir_cap_log(n_dir_ops: int) -> list[dict]:
    """A log carrying exactly ``n_dir_ops`` directory ops whose
    subtrees OVERLAP (rename chains, a cascade landing on a re-created
    lifetime, double deletes through renames) — so cascade_rounds ==
    n_dir_ops and the cascade chain is generated at full depth when
    n_dir_ops == MAX_DIR_OPS."""
    from hcdc_spark.cdc.generator import empty_event

    ns, blk_size = "ns1", 1 << 20
    tx = 0

    def nxt():
        nonlocal tx
        tx += 1
        return tx, 1_700_000_000_000 + tx * 1000

    def blk(bid, size):
        return {"block_id": bid, "size": size, "block_size": blk_size,
                "generation_stamp": 1, "start_offset": None,
                "end_offset": None, "delta_size": None, "deleted": False}

    ev: list[dict] = []

    def add_file(inode, path, bid):
        t, ts = nxt()
        ev.append(empty_event(tx_id=t, ts=ts, op="ADD_FILE",
                              namespace=ns, path=path, inode_id=inode,
                              block_size=blk_size, overwrite=False,
                              modified_time=ts, blocks=[blk(bid, 0)],
                              mode="New"))
        t, ts = nxt()
        ev.append(empty_event(tx_id=t, ts=ts, op="CLOSE", namespace=ns,
                              path=path, inode_id=inode, length=4096,
                              modified_time=ts, file_type="PARQUET",
                              mode="New", blocks=[blk(bid, 4096)]))

    def dir_op(op, dinode, path, dest=None):
        t, ts = nxt()
        ev.append(empty_event(tx_id=t, ts=ts, op=op, namespace=ns,
                              path=path, inode_id=dinode,
                              dest_path=dest,
                              rename_opts="NONE" if dest else None,
                              mode="New"))

    add_file(1, "/data/a/f1.parquet", 710)
    add_file(2, "/data/a/f2.parquet", 711)
    add_file(3, "/data/b/f3.parquet", 712)
    add_file(4, "/data/c/f4.parquet", 713)
    ops = [
        ("RENAME", "/data/a", "/data/a2"),    # moves f1, f2
        ("DELETE", "/data/a", None),          # now empty: cascades 0
        ("RENAME", "/data/a2", "/data/a3"),   # chain hop
        ("DELETE", "/data/a3", None),         # kills f1, f2
        ("RENAME", "/data/b", "/data/bb"),    # moves f3 + re-created f1
        ("DELETE", "/data/bb", None),         # kills them again
        ("RENAME", "/data/c", "/data/cc"),
        ("DELETE", "/data/cc", None),
    ]
    assert n_dir_ops <= len(ops) + 1
    for i, (op, path, dest) in enumerate(ops[:n_dir_ops]):
        if i == 4:  # re-create a cascade-deleted inode mid-sequence,
            add_file(1, "/data/b/f1b.parquet", 714)  # under a dir a
        dir_op(op, 900_001 + i, path, dest)          # later op hits
    if n_dir_ops > len(ops):  # over-cap probe: one extra disjoint op
        dir_op("DELETE", 900_100, "/data/zzz")
    return ev


def test_fold_parity_at_truncate_clamp_cap(oracle):
    """Exactly MAX_TRUNCS_PER_LIFETIME TRUNCATEs in one lifetime — the
    deepest clamp chain the oracle will ever generate — must pass the
    invariant gate, size the chain to the cap, and match the Python
    fold on all three queries."""
    from hcdc_spark.operators import cdc_oracle as O

    ev = _trunc_cap_log(O.MAX_TRUNCS_PER_LIFETIME)
    assert O.trunc_rounds(ev) == O.MAX_TRUNCS_PER_LIFETIME
    state = _assert_fold_parity(oracle, ev)
    # the fold actually digested the chain: the file survives with the
    # post-truncate-growth size, not the first or last assertion
    (row,) = state
    assert row[2] == "Finalized"
    assert row[3] == ev[-1]["length"]


def test_fold_parity_at_dir_op_cascade_cap(oracle):
    """Exactly MAX_DIR_OPS overlapping directory ops — the deepest
    cascade chain the oracle will ever generate — must pass the gate,
    size the chain to the cap, and match the Python fold."""
    from hcdc_spark.operators import cdc_oracle as O

    ev = _dir_cap_log(O.MAX_DIR_OPS)
    assert O.cascade_rounds(ev) == O.MAX_DIR_OPS
    state = _assert_fold_parity(oracle, ev)
    by_inode = {r[0]: r for r in state}
    # f1 was cascade-deleted, re-created under /data/b, renamed to
    # /data/bb, and cascade-deleted again — the chain's worst case
    assert by_inode[1][2] == "Deleted"
    assert by_inode[4][2] == "Deleted"  # via the rename->delete chain


def test_fold_refuses_one_past_the_caps():
    """One past either cap must refuse LOUDLY, naming the cap constant
    and its value — never silently truncate the chain."""
    import pytest as _pytest

    from hcdc_spark.operators import cdc_oracle as O

    with _pytest.raises(AssertionError, match=r"MAX_TRUNCS_PER_LIFETIME = 8"):
        O.check_invariants(_trunc_cap_log(O.MAX_TRUNCS_PER_LIFETIME + 1))
    with _pytest.raises(AssertionError, match=r"MAX_DIR_OPS = 8"):
        O.check_invariants(_dir_cap_log(O.MAX_DIR_OPS + 1))

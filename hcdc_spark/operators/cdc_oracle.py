"""Independent relational oracles for the CDC demo queries (c01/c03).

Round-4's verdict flagged a design caveat: the golden VALUES oracles for
the seed-42 reconciler demos pinned the *output* of the Spark pipeline
itself, so a green driver row certified regression-stability, not
independent re-derivation. This module removes that caveat for c01 and
c03: the oracle SQL embeds the **raw seed-42 event log** (rendered from
``cdc.generator.generate_events`` — the shared deterministic INPUT) and
re-derives the reconciler fold **relationally in DuckDB** — directory
cascades as a broadcast-style join over the path history, the per-inode
state machine as window aggregates, and the per-block delta bookkeeping
as a lag-over-assertion-timeline — i.e. the c15 "two independent
formulations, one answer" technique applied to the flagship CDC rows.

The SQL is exact under invariants the seed-42 log satisfies by
construction (single namespace, at most one TRUNCATE per file with no
size growth between the TRUNCATE and the file's CLOSE/DELETE, disjoint
directory-op subtrees, one effective ADD_FILE per inode, every CLOSE
carrying an authoritative length, no overwrite claims and no
Snapshot/Backlog bootstrap CLOSEs). ``check_invariants`` verifies every
one of them and is asserted by tests/test_cdc_queries.py — if the
generator ever changes shape, the gate fails before the oracle can
silently diverge.

Reference semantics mirrored (same anchors as cdc/statemachine.py):
per-op effects SourceTransactionProcessor.java, T4 dedup guard
(:154-158), T3 transitions FileStateHelper.java:108-149, per-tx byte
intervals FileStateHelper.java:151-225 / DFSBlockState.java:75-106.
"""

from __future__ import annotations

from functools import lru_cache

_FILE_ONLY_OPS = (
    "ADD_FILE", "ADD_BLOCK", "UPDATE_BLOCKS", "APPEND", "TRUNCATE", "CLOSE",
)


def demo_events() -> list[dict]:
    """The seed-42 demo log — the exact input c01/c02/c03 reconcile."""
    from hcdc_spark.cdc.generator import generate_events

    return generate_events(n_files=60, seed=42, with_anomalies=True)


def stream_demo_events() -> list[dict]:
    """The seed-7 log c04 replays through the streaming reconciler (two
    micro-batches); its final state must equal this log's batch fold."""
    from hcdc_spark.cdc.generator import generate_events

    return generate_events(n_files=40, seed=7, with_dir_ops=False)


def check_invariants(events: list[dict]) -> None:
    """Assert the log shapes the relational fold relies on (see module
    docstring). Raises AssertionError with a named invariant.

    Runs on the tx-deduplicated log (the SQL dedups the same way), after
    asserting replayed tx ids are byte-identical — a divergent replay
    would make the SQL's arbitrary-duplicate pick nondeterministic."""
    by_tx: dict[int, dict] = {}
    for e in events:
        prev = by_tx.setdefault(e["tx_id"], e)
        assert prev == e, (
            f"tx {e['tx_id']}: replayed event differs from original"
        )
    events = sorted(by_tx.values(), key=lambda e: e["tx_id"])

    ns = {e.get("namespace") for e in events}
    assert len(ns) == 1, f"single-namespace invariant violated: {ns}"

    file_inodes = {
        e["inode_id"] for e in events if e["op"] in _FILE_ONLY_OPS
    }
    # directory ops: disjoint subtrees → single-round cascade is exact;
    # collected first so the per-inode checks below can consult them
    dir_ops = [
        e for e in events
        if e["op"] in ("DELETE", "RENAME")
        and e["inode_id"] not in file_inodes
    ]
    areas: list[str] = []
    for d in dir_ops:
        mine = [d["path"]] + (
            [d["dest_path"]] if d["op"] == "RENAME" else []
        )
        for a in areas:
            for m in mine:
                assert not (
                    a == m or a.startswith(m + "/") or m.startswith(a + "/")
                ), f"overlapping directory-op subtrees: {a} vs {m}"
        areas.extend(mine)
    # LIKE-pattern hygiene: the SQL matches cascade children with
    # literal prefix compares, but keep dir names metacharacter-free so
    # any future LIKE-based formulation can't silently wildcard
    for a in areas:
        assert "%" not in a, f"dir path contains LIKE wildcard: {a}"

    by_inode: dict[int, list[dict]] = {}
    for e in events:
        if e["inode_id"] in file_inodes:
            by_inode.setdefault(e["inode_id"], []).append(e)

    for inode, evs in by_inode.items():
        evs = sorted(evs, key=lambda e: e["tx_id"])
        truncs = [e for e in evs if e["op"] == "TRUNCATE"]
        assert len(truncs) <= 1, f"inode {inode}: multiple TRUNCATEs"
        if truncs:
            after = [e for e in evs if e["tx_id"] > truncs[0]["tx_id"]]
            closes = [e for e in after if e["op"] == "CLOSE"]
            grows = [
                e for e in after
                if e["op"] in ("UPDATE_BLOCKS", "ADD_BLOCK")
            ]
            assert closes or not grows, (
                f"inode {inode}: size growth after TRUNCATE without CLOSE"
            )
        adds = [e for e in evs if e["op"] == "ADD_FILE"]
        effective = [e for e in adds if not _is_errored_add(e, evs)]
        assert len({e["tx_id"] for e in effective}) <= 1, (
            f"inode {inode}: multiple effective ADD_FILEs"
        )
        for e in adds:
            if e in effective:
                continue
            # an errored re-ADD must target the inode's CURRENT live
            # path and that path must sit outside every dir-op subtree:
            # under these two conditions the raw-event path history the
            # SQL (and the Spark pre-pass) cascade from cannot be
            # corrupted by the errored row, and the inode cannot have
            # been re-created after a cascade delete the file-level
            # error check can't see
            live = None
            for x in evs:
                if x["tx_id"] >= e["tx_id"]:
                    break
                if x["op"] == "ADD_FILE":
                    live = x["path"]
                elif x["op"] == "RENAME":
                    live = x["dest_path"]
            assert e["path"] == live, (
                f"inode {inode}: errored ADD_FILE path {e['path']!r} "
                f"differs from live path {live!r}"
            )
            assert not any(
                live == a or live.startswith(a + "/") for a in areas
            ), (
                f"inode {inode}: errored ADD_FILE under a dir-op "
                f"subtree ({live!r}) — cascade interaction unmodeled"
            )
        # no re-creation after any deletion the cascade could produce:
        # every ADD_FILE must precede every dir op (file-level DELETE →
        # re-ADD is modeled; dir-cascade DELETE → re-ADD is not)
        if dir_ops:
            first_dir_tx = min(d["tx_id"] for d in dir_ops)
            late_adds = [
                e for e in effective if e["tx_id"] > first_dir_tx
            ]
            assert not late_adds, (
                f"inode {inode}: ADD_FILE after a directory op — "
                "cascade/re-creation interaction unmodeled"
            )
        # the fold SQL assumes chain order == block-id order (blocks
        # are allocated with a monotonically increasing counter) and
        # that every CLOSE ships its FULL block list (so a post-
        # truncate CLOSE resurrects every truncate-dead block)
        seen_blocks: list[int] = []
        for e in evs:
            for b in e.get("blocks") or []:
                if b["block_id"] not in seen_blocks:
                    assert (
                        not seen_blocks
                        or b["block_id"] > seen_blocks[-1]
                    ), (
                        f"inode {inode}: block {b['block_id']} breaks "
                        "chain-order == id-order"
                    )
                    seen_blocks.append(b["block_id"])
            if e["op"] == "CLOSE":
                close_ids = {b["block_id"] for b in e.get("blocks") or []}
                assert close_ids >= set(seen_blocks), (
                    f"inode {inode}: CLOSE omits previously asserted "
                    f"blocks {sorted(set(seen_blocks) - close_ids)}"
                )
                assert e.get("mode") not in ("Snapshot", "Backlog"), (
                    f"inode {inode}: bootstrap CLOSE in demo log"
                )
                assert e.get("length") is not None, (
                    f"inode {inode}: CLOSE without length"
                )
            assert not (
                e["op"] == "RENAME" and e.get("rename_opts") == "OVERWRITE"
            ), f"inode {inode}: RENAME OVERWRITE claim"
            assert not (
                e["op"] == "ADD_FILE" and e.get("overwrite")
            ), f"inode {inode}: ADD_FILE overwrite claim"


def _is_errored_add(e: dict, evs: list[dict]) -> bool:
    """ADD_FILE on a live file with overwrite=false → error channel."""
    if e["op"] != "ADD_FILE" or e.get("overwrite"):
        return False
    prior_add = any(
        x["op"] == "ADD_FILE" and x["tx_id"] < e["tx_id"] for x in evs
    )
    prior_del = max(
        (x["tx_id"] for x in evs
         if x["op"] == "DELETE" and x["tx_id"] < e["tx_id"]),
        default=-1,
    )
    last_add = max(
        (x["tx_id"] for x in evs
         if x["op"] == "ADD_FILE" and x["tx_id"] < e["tx_id"]),
        default=-1,
    )
    return prior_add and prior_del < last_add


def _sql_str(v) -> str:
    if v is None:
        return "CAST(NULL AS VARCHAR)"
    return "'" + str(v).replace("'", "''") + "'"


def _sql_big(v) -> str:
    return "CAST(NULL AS BIGINT)" if v is None else f"CAST({v} AS BIGINT)"


@lru_cache(maxsize=2)
def _input_ctes(log: str) -> str:
    """Cached render of the two registry demo logs."""
    if log == "seed42":
        events = demo_events()
    elif log == "seed7":
        events = stream_demo_events()
    else:  # a typo'd key must not silently select some log
        raise ValueError(f"unknown oracle input log {log!r}")
    return render_input_ctes(events)


def render_input_ctes(events: list[dict]) -> str:
    """Render a raw log (duplicates included — the SQL dedups) as the
    ``ev_raw``/``blk_raw`` input CTEs. Public so tests can run the SAME
    fold SQL over arbitrary invariant-satisfying logs (multi-seed
    parity against the pure-Python statemachine)."""
    ev_rows = []
    blk_rows = []
    for e in events:
        ev_rows.append(
            "(" + ", ".join([
                _sql_big(e["tx_id"]),
                _sql_str(e["op"]),
                _sql_str(e.get("path")),
                _sql_str(e.get("dest_path")),
                _sql_big(e.get("inode_id")),
                "TRUE" if e.get("overwrite") else "FALSE",
                _sql_big(e.get("length")),
                _sql_big(e.get("truncate_new_length")),
                _sql_str(e.get("file_type")),
            ]) + ")"
        )
        for pos, b in enumerate(e.get("blocks") or []):
            blk_rows.append(
                f"({_sql_big(e['tx_id'])}, {pos}, "
                f"{_sql_big(b['block_id'])}, {_sql_big(b.get('size') or 0)})"
            )
    if not ev_rows:  # VALUES with zero rows is a parse error, not an
        raise ValueError("render_input_ctes: empty event log")
    if not blk_rows:  # blockless logs are legal — typed empty relation
        blk_cte = (
            "blk_raw AS (SELECT CAST(NULL AS BIGINT) AS tx_id, "
            "CAST(NULL AS INTEGER) AS pos, CAST(NULL AS BIGINT) AS "
            "block_id, CAST(NULL AS BIGINT) AS size WHERE FALSE)"
        )
    else:
        blk_cte = (
            "blk_raw(tx_id, pos, block_id, size) AS (VALUES\n"
            + ",\n".join(blk_rows) + "\n)"
        )
    return (
        "ev_raw(tx_id, op, path, dest_path, inode_id, overwrite, length,"
        " trunc_len, file_type) AS (VALUES\n"
        + ",\n".join(ev_rows)
        + "\n), " + blk_cte
    )


#: Shared fold CTEs: raw log → T4 dedup → directory cascade → error
#: exclusion → effective event stream (+ per-block size assertions).
_FOLD_CTES = """
ev AS (  -- T4 idempotence: replayed txids are no-ops (dedup by tx)
  SELECT tx_id, op, path, dest_path, inode_id, overwrite, length,
         trunc_len, file_type
  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY tx_id) AS rn FROM ev_raw)
  WHERE rn = 1
),
blk AS (SELECT DISTINCT tx_id, pos, block_id, size FROM blk_raw),
file_inodes AS (  -- inodes seen under file-only ops are files
  SELECT DISTINCT inode_id FROM ev
  WHERE op IN ('ADD_FILE','ADD_BLOCK','UPDATE_BLOCKS','APPEND',
               'TRUNCATE','CLOSE')
),
dir_ops AS (  -- DELETE/RENAME on a non-file inode ⇒ directory op
  SELECT tx_id AS d_tx, op AS d_op, path AS d_path, dest_path AS d_dest
  FROM ev
  WHERE op IN ('DELETE','RENAME')
    AND inode_id NOT IN (SELECT inode_id FROM file_inodes)
),
hist0 AS (  -- path history of every file inode (NULL path = deleted);
            -- mirrors the Spark pre-pass _PATH_SETTING_OPS exactly:
            -- ADD_FILE and CLOSE (re-)assert, RENAME moves, DELETE ends
  SELECT inode_id, tx_id, path FROM ev
  WHERE op IN ('ADD_FILE', 'CLOSE') AND path IS NOT NULL
    AND inode_id IN (SELECT inode_id FROM file_inodes)
  UNION ALL
  SELECT inode_id, tx_id, dest_path FROM ev
  WHERE op = 'RENAME' AND inode_id IN (SELECT inode_id FROM file_inodes)
  UNION ALL
  SELECT inode_id, tx_id, NULL FROM ev
  WHERE op = 'DELETE' AND inode_id IN (SELECT inode_id FROM file_inodes)
),
cur_at AS (  -- current path of each live file just before each dir op
  SELECT d_tx, d_op, d_path, d_dest, inode_id, cur_path
  FROM (
    SELECT d.*, h.inode_id, h.path AS cur_path,
           ROW_NUMBER() OVER (PARTITION BY d.d_tx, h.inode_id
                              ORDER BY h.tx_id DESC) AS rn
    FROM dir_ops d JOIN hist0 h ON h.tx_id < d.d_tx
  )
  WHERE rn = 1 AND cur_path IS NOT NULL
),
synth AS (  -- per-child synthetic events (single round: disjoint trees)
            -- literal prefix compares (substr), NOT LIKE — a '_' or
            -- '%' in a directory name must not act as a wildcard
            -- (the Spark fold uses literal startswith)
  SELECT d_tx AS tx_id, 'DELETE' AS op, cur_path AS path,
         CAST(NULL AS VARCHAR) AS dest_path, inode_id,
         FALSE AS overwrite, CAST(NULL AS BIGINT) AS length,
         CAST(NULL AS BIGINT) AS trunc_len, CAST(NULL AS VARCHAR) AS file_type
  FROM cur_at
  WHERE d_op = 'DELETE'
        AND substr(cur_path, 1, length(d_path) + 1) = d_path || '/'
        AND substr(cur_path, 1, 5) <> '/tmp/'
  UNION ALL
  SELECT d_tx, 'RENAME', cur_path,
         d_dest || substr(cur_path, length(d_path) + 1), inode_id,
         FALSE, NULL, NULL, NULL
  FROM cur_at
  WHERE d_op = 'RENAME'
        AND substr(cur_path, 1, length(d_path) + 1) = d_path || '/'
),
log AS (  -- expanded log: dir rows dropped, synthetic children added
  SELECT tx_id, op, path, dest_path, inode_id, overwrite, length,
         trunc_len, file_type
  FROM ev WHERE tx_id NOT IN (SELECT d_tx FROM dir_ops)
  UNION ALL SELECT * FROM synth
),
lifec AS (  -- creation/deletion watermarks before each event
  SELECT *,
    MAX(CASE WHEN op = 'ADD_FILE' THEN tx_id END) OVER w AS last_add,
    MAX(CASE WHEN op = 'DELETE' THEN tx_id END) OVER w AS last_del
  FROM log
  WINDOW w AS (PARTITION BY inode_id ORDER BY tx_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
),
eff AS (  -- effective events: error-channel rows excluded (T25)
  SELECT * FROM lifec
  WHERE (op = 'ADD_FILE'
         AND (last_add IS NULL OR COALESCE(last_del, -1) > last_add))
     OR (op <> 'ADD_FILE'
         AND last_add IS NOT NULL
         AND COALESCE(last_del, -1) < last_add)
),
epoch AS (  -- lifetime boundary: an effective ADD_FILE RESETS per-file
            -- state (apply_event → _create_state discards prior blocks
            -- and deltas, statemachine.py:127-136); the LAST one opens
            -- the lifetime the fold reports. Re-creation after a
            -- (cascade) delete is therefore modeled, not invariant-gated
  SELECT inode_id, MAX(tx_id) AS e0 FROM eff
  WHERE op = 'ADD_FILE' GROUP BY inode_id
),
effe AS (  -- effective events of each inode's FINAL lifetime; every
           -- inode with effective events has an effective ADD_FILE
           -- (bootstrap CLOSEs are invariant-gated out), so the LEFT
           -- JOIN is belt-and-braces only
  SELECT e.* FROM eff e
  LEFT JOIN epoch p USING (inode_id)
  WHERE e.tx_id >= COALESCE(p.e0, -1)
),
asserts AS (  -- absolute per-block size assertions in the event stream
  SELECT e.inode_id, e.tx_id, b.block_id, b.size
  FROM effe e JOIN blk b ON b.tx_id = e.tx_id
  WHERE e.op IN ('ADD_FILE','UPDATE_BLOCKS','CLOSE')
  UNION ALL
  SELECT inode_id, tx_id, block_id, size FROM (
    -- ADD_BLOCK ships [chain-tail, new]; only the last element creates
    SELECT e.inode_id, e.tx_id, b.block_id, b.size,
           ROW_NUMBER() OVER (PARTITION BY e.tx_id ORDER BY b.pos DESC) AS r
    FROM effe e JOIN blk b ON b.tx_id = e.tx_id
    WHERE e.op = 'ADD_BLOCK'
  ) WHERE r = 1
),
pre_trunc AS (  -- per-block size + cumulative chain offset just before
                -- the (single per lifetime) TRUNCATE; the ONE shared
                -- clamp input for both the state fold's dead-block
                -- count and the change set's interval synthesis —
                -- chain order == block-id order by gated invariant
  SELECT *, SUM(pre_size) OVER (PARTITION BY inode_id ORDER BY block_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS cum0
  FROM (
    SELECT a.inode_id, a.block_id, t.t_tx, t.L,
           MAX_BY(a.size, a.tx_id) AS pre_size
    FROM asserts a
    JOIN (SELECT inode_id, tx_id AS t_tx, trunc_len AS L
          FROM effe WHERE op = 'TRUNCATE') t
      ON a.inode_id = t.inode_id AND a.tx_id < t.t_tx
    GROUP BY a.inode_id, a.block_id, t.t_tx, t.L
  )
)
"""


#: file_state synthesis on top of the fold CTEs (shared by c01/c04).
_STATE_CTES = """
st AS (  -- T3 transitions: last state-changing op decides (RENAME keeps)
  SELECT inode_id,
         CASE op WHEN 'DELETE' THEN 'Deleted'
                 WHEN 'CLOSE' THEN 'Finalized'
                 WHEN 'ADD_FILE' THEN 'New'
                 ELSE 'Updating' END AS state
  FROM (
    SELECT inode_id, op,
           ROW_NUMBER() OVER (PARTITION BY inode_id
                              ORDER BY tx_id DESC) AS rn
    FROM effe WHERE op <> 'RENAME'
  ) WHERE rn = 1
),
pth AS (  -- path: last ADD_FILE path / RENAME dest (DELETE keeps path)
  SELECT inode_id, p AS path
  FROM (
    SELECT inode_id,
           CASE op WHEN 'ADD_FILE' THEN path ELSE dest_path END AS p,
           ROW_NUMBER() OVER (PARTITION BY inode_id
                              ORDER BY tx_id DESC) AS rn
    FROM effe WHERE op IN ('ADD_FILE','RENAME')
  ) WHERE rn = 1
),
blksum AS (  -- open-file size: sum of each block's latest asserted size
  SELECT inode_id, SUM(last_size) AS sz,
         COUNT(*) AS n_blocks
  FROM (
    SELECT inode_id, block_id, MAX_BY(size, tx_id) AS last_size
    FROM asserts GROUP BY inode_id, block_id
  ) GROUP BY inode_id
),
authoritative AS (  -- CLOSE length / TRUNCATE reset, latest of each
  SELECT inode_id,
         MAX_BY(length, tx_id) FILTER (op = 'CLOSE') AS close_len,
         MAX(tx_id) FILTER (op = 'CLOSE') AS close_tx,
         MAX_BY(trunc_len, tx_id) FILTER (op = 'TRUNCATE') AS t_len,
         MAX(tx_id) FILTER (op = 'TRUNCATE') AS t_tx,
         MAX(tx_id) AS last_tx_id,
         -- file_type: last event asserting one (CLOSE), else UNKNOWN
         COALESCE(MAX_BY(file_type, tx_id) FILTER (file_type IS NOT NULL),
                  'UNKNOWN') AS file_type
  FROM effe GROUP BY inode_id
),
trunc_dead AS (  -- blocks fully beyond the truncate point are Deleted
                 -- (statemachine: offset >= new_len → state Deleted);
                 -- a later CLOSE resurrects them (invariant: CLOSE
                 -- ships the full block list), handled in folded
  SELECT inode_id, COUNT(*) AS dead
  FROM pre_trunc
  WHERE COALESCE(cum0, 0) >= L
  GROUP BY inode_id
),
folded AS (
  SELECT a.inode_id, p.path, s.state,
         -- size authority is the LATEST of CLOSE length / TRUNCATE
         -- reset (a truncate after the last close wins, matching the
         -- statemachine's Finalized→Updating shrink), else block sums
         CASE WHEN a.close_tx IS NOT NULL
                   AND a.close_tx > COALESCE(a.t_tx, -1) THEN a.close_len
              WHEN a.t_tx IS NOT NULL THEN a.t_len
              ELSE COALESCE(b.sz, 0) END AS data_size,
         CASE WHEN s.state = 'Deleted' THEN 0
              -- live count: truncate-deleted blocks subtract unless a
              -- later CLOSE finalized (resurrected) every event block
              WHEN a.t_tx IS NOT NULL
                   AND a.t_tx > COALESCE(a.close_tx, -1)
                THEN COALESCE(b.n_blocks, 0) - COALESCE(td.dead, 0)
              ELSE COALESCE(b.n_blocks, 0) END AS num_blocks,
         a.last_tx_id, a.file_type
  FROM authoritative a
  JOIN st s USING (inode_id)
  JOIN pth p USING (inode_id)
  LEFT JOIN blksum b USING (inode_id)
  LEFT JOIN trunc_dead td USING (inode_id)
),
unknown AS (  -- inodes whose every event errored: state-only stub row
  SELECT inode_id FROM log WHERE inode_id IN (SELECT inode_id FROM file_inodes)
  EXCEPT SELECT inode_id FROM eff
)
"""


def state_query(input_ctes: str, include_file_type: bool = True) -> str:
    """Full file_state fold over the given rendered input CTEs."""
    ft_col = ", file_type" if include_file_type else ""
    ft_null = ", NULL" if include_file_type else ""
    return f"""
WITH {input_ctes},
{_FOLD_CTES},
{_STATE_CTES}
SELECT inode_id, path, state, CAST(data_size AS BIGINT) AS data_size,
       CAST(num_blocks AS BIGINT) AS num_blocks, last_tx_id{ft_col}
FROM folded
UNION ALL
SELECT inode_id, NULL, 'Unknown', NULL, NULL, NULL{ft_null} FROM unknown
ORDER BY inode_id
"""


def errors_query(input_ctes: str) -> str:
    """T25 dead-letter rows = the complement of the fold's
    effective-event set, error text reconstructed from the op."""
    return f"""
WITH {input_ctes},
{_FOLD_CTES}
SELECT tx_id, inode_id, path, op,
       CASE WHEN op = 'ADD_FILE' THEN 'file exists and overwrite=false'
            ELSE 'no live file state for op ' || op END AS error
FROM lifec
WHERE NOT ((op = 'ADD_FILE'
            AND (last_add IS NULL OR COALESCE(last_del, -1) > last_add))
        OR (op <> 'ADD_FILE'
            AND last_add IS NOT NULL
            AND COALESCE(last_del, -1) < last_add))
"""


def c01_oracle() -> str:
    """file_state re-derived relationally from the raw seed-42 log."""
    return state_query(_input_ctes("seed42"), include_file_type=True)


def c02_oracle() -> str:
    """T25 error channel re-derived relationally: the dead-letter rows
    are exactly the events the fold excludes — an ADD_FILE onto a live
    path (without overwrite) and any non-creating op with no live file
    state — with the statemachine's error text reconstructed from the
    op. Relies on the same invariants as c01 (no overwrite claims, no
    bootstrap CLOSEs), asserted by check_invariants."""
    return errors_query(_input_ctes("seed42"))


def c04_oracle() -> str:
    """The streaming reconciler's final state re-derived relationally
    from the raw seed-7 log: availableNow micro-batching + restart must
    land on the same file_state the window-SQL fold computes — a 3-way
    agreement (streaming fold, batch fold parity in
    tests/test_streaming.py, relational SQL)."""
    return state_query(_input_ctes("seed7"), include_file_type=False)


def changeset_query(input_ctes: str) -> str:
    """Per-block covering byte intervals re-derived from the raw log:
    the statemachine's delta bookkeeping as a lag over the per-block
    size trajectory (assertions + the TRUNCATE clamp), then min/max
    per block — DFSBlockState.compressedChangeSet relationally."""
    return f"""
WITH {input_ctes},
{_FOLD_CTES},
clamped AS (  -- statemachine TRUNCATE clamp over the shared pre_trunc
  SELECT inode_id, block_id, t_tx AS tx_id,
         -- SUM() OVER promotes to HUGEINT in DuckDB; pin BIGINT so the
         -- driver's type-sensitive hash sees bigint offsets
         CAST(CASE WHEN COALESCE(cum0, 0) >= L THEN 0
              WHEN COALESCE(cum0, 0) + pre_size > L THEN L - COALESCE(cum0, 0)
              ELSE pre_size END AS BIGINT) AS size
  FROM pre_trunc
),
traj AS (  -- statemachine size trajectory per block
  SELECT *, COALESCE(LAG(size) OVER (PARTITION BY inode_id, block_id
                                     ORDER BY tx_id), 0) AS prev
  FROM (
    SELECT inode_id, block_id, tx_id, size FROM asserts
    UNION ALL SELECT inode_id, block_id, tx_id, size FROM clamped
  )
),
deltas AS (  -- every size change emits one [lo, hi] interval (T2/T16)
  SELECT inode_id, block_id, tx_id,
         CASE WHEN size > prev THEN prev ELSE size END AS start_offset,
         CASE WHEN size > prev THEN size - 1 ELSE prev - 1 END AS end_offset,
         size < prev AS deleted
  FROM traj WHERE size <> prev
)
SELECT inode_id, block_id,
       MIN(start_offset) AS start_offset,
       MAX(end_offset) AS end_offset,
       BOOL_OR(deleted) AS any_deleted,
       COUNT(*) AS n_deltas
FROM deltas
WHERE tx_id > 0 AND tx_id <= 1000000
GROUP BY inode_id, block_id
"""


def c03_oracle() -> str:
    """Seed-42 change set via :func:`changeset_query`."""
    return changeset_query(_input_ctes("seed42"))

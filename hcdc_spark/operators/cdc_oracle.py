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

The SQL is exact under invariants the generator logs satisfy by
construction (single namespace, ops drawn from the statemachine's full
table, every CLOSE carrying an
authoritative length and the full block list, no overwrite claims, no
Snapshot/Backlog bootstrap CLOSEs, and — via a sequential-fold
simulation — only existence-model errors, i.e. every error row the
Python statemachine emits is either "file exists and overwrite=false"
or "no live file state", the two shapes the SQL's complement-based
error channel derives). Re-creation (file-level or cascade DELETE
followed by an effective re-ADD), post-TRUNCATE growth without a
CLOSE, multiple TRUNCATEs per lifetime, OVERLAPPING directory-op
subtrees (the same dir deleted twice, rename chains, a second cascade
landing on re-created lifetimes), and the control ops
IGNORE/ERROR/CONCAT_DELETE are all MODELED, not gated: the ``epoch``
CTE folds only the final lifetime, ``blk_final``/``blk_dead`` replay
the full per-block size trajectory, the clamp CHAIN
(:func:`_clamp_stage_ctes`, sized by :func:`trunc_rounds`) replays
each truncate against the previous one's shrunken sizes, the cascade
CHAIN (:func:`_cascade_stage_ctes`, sized by :func:`cascade_rounds`)
re-locates every dir op's children against the history that includes
earlier rounds' synthetic effects — the relational mirror of the
Spark fixpoint — IGNORE rows
drop before the fold, live CONCAT_DELETEs pass the existence check
without touching state, and ERROR forces the Error state. A lifetime
with more than 8 TRUNCATEs, or a log with more than 8 directory ops,
are the two remaining (SQL-size) caps.
``check_invariants`` verifies every gated shape and is asserted by
tests/test_cdc_queries.py — if the generator ever changes shape, the
gate fails before the oracle can silently diverge.

Reference semantics mirrored (same anchors as cdc/statemachine.py):
per-op effects SourceTransactionProcessor.java, T4 dedup guard
(:154-158), T3 transitions FileStateHelper.java:108-149, per-tx byte
intervals FileStateHelper.java:151-225 / DFSBlockState.java:75-106.
"""

from __future__ import annotations

from functools import lru_cache

# File-vs-directory op classification — ONE canonical copy
# (cdc/statemachine.py), shared with the Spark reconciler and the
# parity test's sequential expander; the SQL literal in the
# file_inodes CTE below is GENERATED from it so the three formulations
# can never drift apart.
from hcdc_spark.cdc.statemachine import FILE_ONLY_OPS as _FILE_ONLY_OPS


def demo_events() -> list[dict]:
    """The seed-42 demo log — the exact input c01/c02/c03 reconcile."""
    from hcdc_spark.cdc.generator import generate_events

    return generate_events(n_files=60, seed=42, with_anomalies=True)


def stream_demo_events() -> list[dict]:
    """The seed-7 log c04 replays through the streaming reconciler (two
    micro-batches); its final state must equal this log's batch fold."""
    from hcdc_spark.cdc.generator import generate_events

    return generate_events(n_files=40, seed=7, with_dir_ops=False)


#: The op vocabulary the fold SQL models — the full statemachine table:
#: IGNORE rows are dropped before the fold (apply_event returns early
#: with no touch and no error, even on a missing file), CONCAT_DELETE
#: participates in the existence check but never touches state (the
#: reference parses it and routes it to IGNORE on live files; on a dead
#: file it dead-letters like any other op), and ERROR forces the Error
#: state while touching last_tx_id.
_MODELED_OPS = frozenset(
    ("ADD_FILE", "ADD_BLOCK", "UPDATE_BLOCKS", "APPEND", "TRUNCATE",
     "CLOSE", "DELETE", "RENAME", "IGNORE", "ERROR", "CONCAT_DELETE")
)

#: SQL-size caps — the ONLY remaining bounds on the fold oracle's
#: shape vocabulary (everything else is modeled). Each cap bounds the
#: length of a generated CTE chain, not the semantics: the clamp chain
#: gets one stage per TRUNCATE round, the cascade chain one stage per
#: directory-op round. tests/test_cdc_queries.py parity-tests logs AT
#: both caps and pins the refusal message one past them.
MAX_TRUNCS_PER_LIFETIME = 8
MAX_DIR_OPS = 8


def _simulate(events: list[dict]):
    """Sequential gating simulator: tx-dedup, cascade directory ops in
    log order, apply the statemachine. Returns (per-inode effective
    event lists, error rows, final per-inode statemachine states).
    Path tracking follows the raw-assertion
    convention shared by the SQL's ``hist_0``, the Spark pre-pass's
    ``_PATH_SETTING_OPS`` and the parity test's sequential expander:
    ADD_FILE/CLOSE (re-)assert, RENAME moves, DELETE ends — WITHOUT
    error-filtering, so every formulation cascades from the same
    observable history. (The parity test keeps its own independent
    expander; this one only gates which logs are in scope.)"""
    from hcdc_spark.cdc.statemachine import apply_event

    by_tx: dict[int, dict] = {}
    for e in events:
        by_tx.setdefault(e["tx_id"], e)
    evs = sorted(by_tx.values(), key=lambda e: e["tx_id"])
    file_inodes = {e["inode_id"] for e in evs if e["op"] in _FILE_ONLY_OPS}

    cur: dict[int, str | None] = {}
    states: dict[int, dict | None] = {}
    effective: dict[int, list[dict]] = {}
    errors: list[dict] = []

    def apply(e: dict) -> None:
        ino = e["inode_id"]
        st, errs = apply_event(states.get(ino), e)
        states[ino] = st
        errors.extend(errs)
        # IGNORE / live-CONCAT_DELETE apply without error but touch
        # NOTHING — keep them out of the effective stream so the
        # per-lifetime shape checks (and the first-op-is-ADD_FILE
        # gate) see only state-bearing events, mirroring the SQL's
        # log/effe exclusions
        if not errs and e["op"] not in ("IGNORE", "CONCAT_DELETE"):
            effective.setdefault(ino, []).append(e)

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
                    child_e = dict(e, op="DELETE", path=p,
                                   inode_id=child, dest_path=None)
                    cur[child] = None
                else:
                    new = d_dest + p[len(d_path):]
                    child_e = dict(e, op="RENAME", path=p,
                                   inode_id=child, dest_path=new)
                    cur[child] = new
                apply(child_e)
            continue
        if e["op"] in ("ADD_FILE", "CLOSE") and e.get("path") is not None:
            cur[ino] = e["path"]
        elif e["op"] == "RENAME":
            cur[ino] = e.get("dest_path")
        elif e["op"] == "DELETE":
            cur[ino] = None
        apply(e)
    return effective, errors, states


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

    for e in events:
        assert e["op"] in _MODELED_OPS, f"unmodeled op {e['op']}"
        assert not (
            e["op"] == "RENAME" and e.get("rename_opts") == "OVERWRITE"
        ), f"inode {e['inode_id']}: RENAME OVERWRITE claim"
        assert not (
            e["op"] == "ADD_FILE" and e.get("overwrite")
        ), f"inode {e['inode_id']}: ADD_FILE overwrite claim"
        if e["op"] == "CLOSE":
            assert e.get("mode") not in ("Snapshot", "Backlog"), (
                f"inode {e['inode_id']}: bootstrap CLOSE in demo log"
            )
            assert e.get("length") is not None, (
                f"inode {e['inode_id']}: CLOSE without length"
            )

    file_inodes = {
        e["inode_id"] for e in events if e["op"] in _FILE_ONLY_OPS
    }
    # directory ops: OVERLAPPING subtrees (same dir deleted twice,
    # rename chains, cascades landing on re-created lifetimes) are
    # MODELED by the cascade chain (:func:`_cascade_stage_ctes`, sized
    # by :func:`cascade_rounds`); the cap below only bounds the
    # generated SQL, exactly like the TRUNCATE clamp-chain cap
    dir_ops = [
        e for e in events
        if e["op"] in ("DELETE", "RENAME")
        and e["inode_id"] not in file_inodes
    ]
    assert len(dir_ops) <= MAX_DIR_OPS, (
        f"{len(dir_ops)} directory ops exceed the cascade-chain cap "
        f"(MAX_DIR_OPS = {MAX_DIR_OPS})"
    )
    areas = [
        m
        for d in dir_ops
        for m in [d["path"]]
        + ([d.get("dest_path")] if d["op"] == "RENAME" else [])
        if m
    ]
    # LIKE-pattern hygiene: the SQL matches cascade children with
    # literal prefix compares, but keep dir names metacharacter-free so
    # any future LIKE-based formulation can't silently wildcard
    for a in areas:
        assert "%" not in a, f"dir path contains LIKE wildcard: {a}"

    # Sequential-fold simulation: (a) every error must be one of the
    # two existence-model shapes the SQL's complement-based error
    # channel derives — a semantic error (chain mismatch, unknown
    # block, truncate without length, ...) means partial-apply
    # semantics the relational fold cannot express; (b) the per-inode
    # block-shape checks below run on EFFECTIVE events only, scoped per
    # lifetime, because that is exactly the slice the ``asserts`` CTE
    # folds (re-creation discards the prior lifetime's chain).
    effective, errors, _ = _simulate(events)
    for er in errors:
        assert (
            er["error"] == "file exists and overwrite=false"
            or er["error"].startswith("no live file state for op ")
        ), f"non-existence-model error: {er['error']!r}"

    for inode, evs in effective.items():
        if inode not in file_inodes:
            continue
        assert evs[0]["op"] == "ADD_FILE", (
            f"inode {inode}: first effective op is {evs[0]['op']}, "
            "not ADD_FILE — the epoch CTE needs a creating event"
        )
        lifetimes: list[list[dict]] = []
        for e in evs:
            if e["op"] == "ADD_FILE":
                lifetimes.append([e])
            else:
                lifetimes[-1].append(e)
        for life in lifetimes:
            # multiple TRUNCATEs per lifetime are MODELED (the clamp
            # chain, sized by trunc_rounds()); the cap only bounds the
            # generated SQL
            truncs = [e for e in life if e["op"] == "TRUNCATE"]
            assert len(truncs) <= MAX_TRUNCS_PER_LIFETIME, (
                f"inode {inode}: {len(truncs)} TRUNCATEs in one "
                "lifetime exceed the clamp-chain cap "
                f"(MAX_TRUNCS_PER_LIFETIME = {MAX_TRUNCS_PER_LIFETIME})"
            )
            # the fold SQL assumes chain order == block-id order
            # (blocks are allocated with a monotonically increasing
            # counter) and that every CLOSE ships its FULL block list
            # (so a post-truncate CLOSE resurrects every truncate-dead
            # block)
            seen_blocks: list[int] = []
            for e in life:
                for b in e.get("blocks") or []:
                    if b["block_id"] not in seen_blocks:
                        assert (
                            not seen_blocks
                            or b["block_id"] > seen_blocks[-1]
                        ), (
                            f"inode {inode}: block {b['block_id']} "
                            "breaks chain-order == id-order"
                        )
                        seen_blocks.append(b["block_id"])
                if e["op"] == "CLOSE":
                    close_ids = {
                        b["block_id"] for b in e.get("blocks") or []
                    }
                    assert close_ids >= set(seen_blocks), (
                        f"inode {inode}: CLOSE omits previously "
                        f"asserted blocks "
                        f"{sorted(set(seen_blocks) - close_ids)}"
                    )


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


#: Shared fold CTEs, head: raw log → T4 dedup → dir-op classification →
#: real-event path history. The directory-cascade chain
#: (:func:`_cascade_stage_ctes`) and the tail (error exclusion →
#: effective event stream → per-block size assertions) are composed by
#: :func:`_fold_ctes`.
_FOLD_CTES_HEAD = """
ev AS MATERIALIZED (  -- T4 idempotence: replayed txids are no-ops (dedup by tx)
  SELECT tx_id, op, path, dest_path, inode_id, overwrite, length,
         trunc_len, file_type
  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY tx_id) AS rn FROM ev_raw)
  WHERE rn = 1
),
blk AS MATERIALIZED (SELECT DISTINCT tx_id, pos, block_id, size FROM blk_raw),
file_inodes AS MATERIALIZED (  -- inodes seen under file-only ops are files
                               -- (incl. the control ops IGNORE/ERROR/
                               -- CONCAT_DELETE — dirs receive only
                               -- DELETE/RENAME); op list generated
                               -- from statemachine.FILE_ONLY_OPS
  SELECT DISTINCT inode_id FROM ev
  WHERE op IN (__FILE_ONLY_OPS__)
),
dir_ops AS MATERIALIZED (  -- DELETE/RENAME on a non-file inode ⇒ directory op
  SELECT tx_id AS d_tx, op AS d_op, path AS d_path, dest_path AS d_dest
  FROM ev
  WHERE op IN ('DELETE','RENAME')
    AND inode_id NOT IN (SELECT inode_id FROM file_inodes)
),
hist_0 AS MATERIALIZED (  -- path history of every file inode (NULL path = deleted);
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
)
"""

_FOLD_CTES_TAIL = """
log AS MATERIALIZED (  -- expanded log: dir rows dropped, synthetic children
                       -- added. IGNORE rows drop too: apply_event
                       -- returns early with no touch and no error,
                       -- even on a missing file
  SELECT tx_id, op, path, dest_path, inode_id, overwrite, length,
         trunc_len, file_type
  FROM ev
  WHERE tx_id NOT IN (SELECT d_tx FROM dir_ops) AND op <> 'IGNORE'
  UNION ALL SELECT * FROM synth
),
lifec AS MATERIALIZED (  -- creation/deletion watermarks before each event
  SELECT *,
    MAX(CASE WHEN op = 'ADD_FILE' THEN tx_id END) OVER w AS last_add,
    MAX(CASE WHEN op = 'DELETE' THEN tx_id END) OVER w AS last_del
  FROM log
  WINDOW w AS (PARTITION BY inode_id ORDER BY tx_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
),
eff AS MATERIALIZED (  -- effective events: error-channel rows excluded (T25)
  SELECT * FROM lifec
  WHERE (op = 'ADD_FILE'
         AND (last_add IS NULL OR COALESCE(last_del, -1) > last_add))
     OR (op <> 'ADD_FILE'
         AND last_add IS NOT NULL
         AND COALESCE(last_del, -1) < last_add)
),
epoch AS MATERIALIZED (  -- lifetime boundary: an effective ADD_FILE RESETS per-file
            -- state (apply_event → _create_state discards prior blocks
            -- and deltas, statemachine.py:127-136); the LAST one opens
            -- the lifetime the fold reports. Re-creation after a
            -- (cascade) delete is therefore modeled, not invariant-gated
  SELECT inode_id, MAX(tx_id) AS e0 FROM eff
  WHERE op = 'ADD_FILE' GROUP BY inode_id
),
effe AS MATERIALIZED (  -- effective events of each inode's FINAL lifetime; every
           -- inode with effective events has an effective ADD_FILE
           -- (bootstrap CLOSEs are invariant-gated out), so the LEFT
           -- JOIN is belt-and-braces only. A live CONCAT_DELETE
           -- passes the existence check but touches NOTHING (the
           -- statemachine routes it to a no-op without _touch), so it
           -- leaves the effective stream here
  SELECT e.* FROM eff e
  LEFT JOIN epoch p USING (inode_id)
  WHERE e.tx_id >= COALESCE(p.e0, -1) AND e.op <> 'CONCAT_DELETE'
),
asserts AS MATERIALIZED (  -- absolute per-block size assertions in the event stream
  SELECT e.inode_id, e.tx_id, e.op, b.block_id, b.size
  FROM effe e JOIN blk b ON b.tx_id = e.tx_id
  WHERE e.op IN ('ADD_FILE','UPDATE_BLOCKS','CLOSE')
  UNION ALL
  SELECT inode_id, tx_id, op, block_id, size FROM (
    -- ADD_BLOCK ships [chain-tail, new]; only the last element creates
    SELECT e.inode_id, e.tx_id, e.op, b.block_id, b.size,
           ROW_NUMBER() OVER (PARTITION BY e.tx_id ORDER BY b.pos DESC) AS r
    FROM effe e JOIN blk b ON b.tx_id = e.tx_id
    WHERE e.op = 'ADD_BLOCK'
  ) WHERE r = 1
),
truncs AS MATERIALIZED (  -- final-lifetime TRUNCATEs, ranked per inode:
                          -- the clamp chain below replays them in order
  SELECT inode_id, tx_id AS t_tx, trunc_len AS L,
         ROW_NUMBER() OVER (PARTITION BY inode_id ORDER BY tx_id) AS rnk
  FROM effe WHERE op = 'TRUNCATE'
),
traj_0 AS (  -- trajectory before any clamp: the event assertions
  SELECT inode_id, block_id, tx_id, size FROM asserts
)
"""


def _cascade_stage_ctes(cascade_rounds: int) -> str:
    """The directory-cascade expansion, chained — the relational mirror
    of the Spark fixpoint (reconcile._safe_dir_ops defers an op while an
    earlier op's subtree overlaps; each round's synthetic children join
    the history the next round reads). Round *i* locates every dir op's
    children against hist_{i-1} = the REAL path events plus round
    i-1's synthetic effects, and fully recomputes the synthetic set:
    the first *i* dir ops in tx order are exact after round *i* (an
    op's children depend only on effects of strictly-earlier-tx ops),
    so ``cascade_rounds`` = the log's dir-op count is always
    sufficient and surplus rounds are fixpoint no-ops. Round-1 output
    on disjoint-subtree logs is byte-identical to the historical
    single-round formulation. Literal prefix compares (substr), NOT
    LIKE — a '_' or '%' in a directory name must not act as a
    wildcard (the Spark fold uses literal startswith)."""
    parts = []
    for i in range(1, cascade_rounds + 1):
        parts.append(f"""
cur_at_{i} AS MATERIALIZED (  -- current path of each live file before each dir op
  SELECT d_tx, d_op, d_path, d_dest, inode_id, cur_path
  FROM (
    SELECT d.*, h.inode_id, h.path AS cur_path,
           ROW_NUMBER() OVER (PARTITION BY d.d_tx, h.inode_id
                              ORDER BY h.tx_id DESC) AS rn
    FROM dir_ops d JOIN hist_{i - 1} h ON h.tx_id < d.d_tx
  )
  WHERE rn = 1 AND cur_path IS NOT NULL
),
synth_{i} AS MATERIALIZED (  -- per-child synthetic events, round {i}
  SELECT d_tx AS tx_id, 'DELETE' AS op, cur_path AS path,
         CAST(NULL AS VARCHAR) AS dest_path, inode_id,
         FALSE AS overwrite, CAST(NULL AS BIGINT) AS length,
         CAST(NULL AS BIGINT) AS trunc_len, CAST(NULL AS VARCHAR) AS file_type
  FROM cur_at_{i}
  WHERE d_op = 'DELETE'
        AND substr(cur_path, 1, length(d_path) + 1) = d_path || '/'
        AND substr(cur_path, 1, 5) <> '/tmp/'
  UNION ALL
  SELECT d_tx, 'RENAME', cur_path,
         d_dest || substr(cur_path, length(d_path) + 1), inode_id,
         FALSE, NULL, NULL, NULL
  FROM cur_at_{i}
  WHERE d_op = 'RENAME'
        AND substr(cur_path, 1, length(d_path) + 1) = d_path || '/'
)""")
        if i < cascade_rounds:
            parts.append(f"""
hist_{i} AS MATERIALIZED (  -- real path events + round-{i} synthetic effects
  SELECT * FROM hist_0
  UNION ALL
  SELECT inode_id, tx_id,
         CASE WHEN op = 'RENAME' THEN dest_path END AS path
  FROM synth_{i}
)""")
    parts.append(f"""
synth AS MATERIALIZED (SELECT * FROM synth_{cascade_rounds})""")
    return ",".join(parts)


def _fold_ctes(cascade_rounds: int = 1) -> str:
    """Shared fold CTEs: raw log → T4 dedup → directory-cascade chain
    (sized by :func:`cascade_rounds`) → error exclusion → effective
    event stream (+ per-block size assertions)."""
    head = _FOLD_CTES_HEAD.replace(
        "__FILE_ONLY_OPS__",
        ",".join(f"'{op}'" for op in _FILE_ONLY_OPS),
    )
    return (
        head
        + ","
        + _cascade_stage_ctes(cascade_rounds)
        + ","
        + _FOLD_CTES_TAIL
    )


def cascade_rounds(events: list[dict]) -> int:
    """Cascade-chain depth for a log: 1 when every directory-op subtree
    (source and rename-dest) is pairwise disjoint — the historical
    single-round case — else the dir-op count, since round *i* is exact
    for the first *i* ops in tx order. Tx-deduped, file/dir
    classification shared with the fold."""
    by_tx: dict[int, dict] = {}
    for e in events:
        by_tx.setdefault(e["tx_id"], e)
    evs = sorted(by_tx.values(), key=lambda e: e["tx_id"])
    file_inodes = {e["inode_id"] for e in evs if e["op"] in _FILE_ONLY_OPS}
    dir_ops = [
        e for e in evs
        if e["op"] in ("DELETE", "RENAME")
        and e["inode_id"] not in file_inodes
    ]
    areas: list[str] = []
    overlap = False
    for d in dir_ops:
        mine = [
            m
            for m in (
                [d["path"]]
                + ([d.get("dest_path")] if d["op"] == "RENAME" else [])
            )
            if m
        ]
        for a in areas:
            for m in mine:
                if a == m or a.startswith(m + "/") or m.startswith(a + "/"):
                    overlap = True
        areas.extend(mine)
    return max(1, len(dir_ops)) if overlap else 1


def _clamp_stage_ctes(trunc_rounds: int) -> str:
    """The TRUNCATE clamp, chained: stage *i* clamps against the
    trajectory that already includes stages 1..i-1's clamps, exactly
    the statemachine's sequential replay (a second truncate sees the
    first one's shrunken sizes; truncate-dead blocks sit at size 0, so
    summing them reproduces the statemachine's skip-Deleted offset
    walk). ``traj`` is the full per-block size stream, ``kills`` every
    (block, truncate) pair the clamp drove to state Deleted — chain
    order == block-id order by gated invariant. SUM() OVER promotes to
    HUGEINT in DuckDB; the clamp pins BIGINT so downstream arithmetic
    stays driver-hashable."""
    parts = []
    for i in range(1, trunc_rounds + 1):
        parts.append(f"""
pre_trunc_{i} AS MATERIALIZED (
  SELECT *, SUM(pre_size) OVER (PARTITION BY inode_id ORDER BY block_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS cum0
  FROM (
    SELECT a.inode_id, a.block_id, t.t_tx, t.L,
           MAX_BY(a.size, a.tx_id) AS pre_size
    FROM traj_{i - 1} a
    JOIN truncs t
      ON a.inode_id = t.inode_id AND t.rnk = {i} AND a.tx_id < t.t_tx
    GROUP BY a.inode_id, a.block_id, t.t_tx, t.L
  )
),
clamped_{i} AS MATERIALIZED (
  SELECT inode_id, block_id, t_tx AS tx_id,
         CAST(CASE WHEN COALESCE(cum0, 0) >= L THEN 0
              WHEN COALESCE(cum0, 0) + pre_size > L THEN L - COALESCE(cum0, 0)
              ELSE pre_size END AS BIGINT) AS size
  FROM pre_trunc_{i}
),
traj_{i} AS (
  SELECT * FROM traj_{i - 1}
  UNION ALL SELECT * FROM clamped_{i}
)""")
    kills = "\n  UNION ALL ".join(
        f"SELECT inode_id, block_id, t_tx FROM pre_trunc_{i} "
        "WHERE COALESCE(cum0, 0) >= L"
        for i in range(1, trunc_rounds + 1)
    )
    parts.append(f"""
traj AS MATERIALIZED (SELECT * FROM traj_{trunc_rounds}),
kills AS MATERIALIZED (  -- every clamp that drove a block to Deleted
  {kills}
)""")
    return ",".join(parts)


def trunc_rounds(events: list[dict]) -> int:
    """Clamp-chain depth for a log: the max TRUNCATE count any single
    inode carries (tx-deduped; raw count upper-bounds the effective
    final-lifetime count, and surplus stages clamp nothing). Floor 1
    keeps the generated SQL shape uniform on truncate-free logs."""
    by_tx: dict[int, dict] = {}
    for e in events:
        by_tx.setdefault(e["tx_id"], e)
    counts: dict[int, int] = {}
    for e in by_tx.values():
        if e["op"] == "TRUNCATE":
            counts[e["inode_id"]] = counts.get(e["inode_id"], 0) + 1
    return max(counts.values(), default=1)


#: file_state synthesis on top of the fold CTEs (shared by c01/c04).
_STATE_CTES = """
st AS MATERIALIZED (  -- T3 transitions: last state-changing op decides (RENAME keeps)
  SELECT inode_id,
         CASE op WHEN 'DELETE' THEN 'Deleted'
                 WHEN 'CLOSE' THEN 'Finalized'
                 WHEN 'ADD_FILE' THEN 'New'
                 WHEN 'ERROR' THEN 'Error'
                 ELSE 'Updating' END AS state
  FROM (
    SELECT inode_id, op,
           ROW_NUMBER() OVER (PARTITION BY inode_id
                              ORDER BY tx_id DESC) AS rn
    FROM effe WHERE op <> 'RENAME'
  ) WHERE rn = 1
),
pth AS MATERIALIZED (  -- path: last ADD_FILE path / RENAME dest (DELETE keeps path)
  SELECT inode_id, p AS path
  FROM (
    SELECT inode_id,
           CASE op WHEN 'ADD_FILE' THEN path ELSE dest_path END AS p,
           ROW_NUMBER() OVER (PARTITION BY inode_id
                              ORDER BY tx_id DESC) AS rn
    FROM effe WHERE op IN ('ADD_FILE','RENAME')
  ) WHERE rn = 1
),
blk_final AS MATERIALIZED (  -- final size per block: the endpoint of its full
                -- trajectory (event assertions + every TRUNCATE
                -- clamp — exactly the statemachine's _grow_block
                -- stream, so growth AFTER a truncate lands on the
                -- clamped base). Truncate-dead blocks sit at size 0
                -- and contribute 0 to the sum unless a later
                -- assertion resurrects them
  SELECT inode_id, block_id, MAX_BY(size, tx_id) AS last_size
  FROM traj GROUP BY inode_id, block_id
),
blk_dead AS MATERIALIZED (  -- truncate-killed blocks (chain offset >= new length ⇒
               -- state Deleted) that stay dead: a later UPDATE_BLOCKS
               -- listing the block or any CLOSE (full-block-list
               -- invariant) revives it (statemachine sets the touched
               -- block's state back to Updating/Finalized); with
               -- several truncates a block is dead at end iff SOME
               -- kill has no resurrection after it (the last one)
  SELECT DISTINCT k.inode_id, k.block_id
  FROM kills k
  WHERE NOT EXISTS (
      SELECT 1 FROM asserts a
      WHERE a.inode_id = k.inode_id AND a.block_id = k.block_id
        AND a.tx_id > k.t_tx AND a.op IN ('UPDATE_BLOCKS', 'CLOSE'))
),
sizing AS MATERIALIZED (  -- which op last decided data_size: CLOSE pins the
             -- authoritative length; every other size-affecting op
             -- recomputes the block sum (the statemachine's recompute
             -- sites in ADD_BLOCK/UPDATE_BLOCKS/TRUNCATE handlers);
             -- DELETE and APPEND leave data_size untouched
  SELECT inode_id,
         MAX_BY(op, tx_id) AS last_sizing_op,
         MAX_BY(length, tx_id) FILTER (op = 'CLOSE') AS close_len
  FROM effe
  WHERE op IN ('ADD_FILE','ADD_BLOCK','UPDATE_BLOCKS','TRUNCATE','CLOSE')
  GROUP BY inode_id
),
meta AS MATERIALIZED (
  SELECT inode_id, MAX(tx_id) AS last_tx_id,
         -- file_type: last event asserting one (CLOSE), else UNKNOWN
         COALESCE(MAX_BY(file_type, tx_id) FILTER (file_type IS NOT NULL),
                  'UNKNOWN') AS file_type
  FROM effe GROUP BY inode_id
),
folded AS MATERIALIZED (
  SELECT m.inode_id, p.path, s.state,
         CASE WHEN z.last_sizing_op = 'CLOSE' AND z.close_len IS NOT NULL
              THEN z.close_len
              ELSE COALESCE(f.sz, 0) END AS data_size,
         CASE WHEN s.state = 'Deleted' THEN 0
              ELSE COALESCE(f.n_blocks, 0) - COALESCE(d.dead, 0)
              END AS num_blocks,
         m.last_tx_id, m.file_type
  FROM meta m
  JOIN st s USING (inode_id)
  JOIN pth p USING (inode_id)
  LEFT JOIN (SELECT inode_id, SUM(last_size) AS sz, COUNT(*) AS n_blocks
             FROM blk_final GROUP BY inode_id) f USING (inode_id)
  LEFT JOIN (SELECT inode_id, COUNT(*) AS dead FROM blk_dead
             GROUP BY inode_id) d USING (inode_id)
  LEFT JOIN sizing z USING (inode_id)
),
unknown AS MATERIALIZED (  -- inodes with no state-creating history: every event
           -- errored OR was a stateless control op (e.g. an
           -- IGNORE-only inode) — state-only stub row
  SELECT inode_id FROM file_inodes
  EXCEPT SELECT inode_id FROM eff
)
"""


def state_query(
    input_ctes: str,
    include_file_type: bool = True,
    trunc_rounds: int = 1,
    cascade_rounds: int = 1,
) -> str:
    """Full file_state fold over the given rendered input CTEs.
    ``trunc_rounds`` sizes the TRUNCATE clamp chain and
    ``cascade_rounds`` the directory-cascade chain — pass
    :func:`trunc_rounds` / :func:`cascade_rounds` of the same log;
    surplus stages are no-ops."""
    ft_col = ", file_type" if include_file_type else ""
    ft_null = ", NULL" if include_file_type else ""
    return f"""
WITH {input_ctes},
{_fold_ctes(cascade_rounds)},
{_clamp_stage_ctes(trunc_rounds)},
{_STATE_CTES}
SELECT inode_id, path, state, CAST(data_size AS BIGINT) AS data_size,
       CAST(num_blocks AS BIGINT) AS num_blocks, last_tx_id{ft_col}
FROM folded
UNION ALL
SELECT inode_id, NULL, 'Unknown', NULL, NULL, NULL{ft_null} FROM unknown
ORDER BY inode_id
"""


def errors_query(input_ctes: str, cascade_rounds: int = 1) -> str:
    """T25 dead-letter rows = the complement of the fold's
    effective-event set, error text reconstructed from the op. (No
    clamp chain: erroredness never depends on block sizes.)"""
    return f"""
WITH {input_ctes},
{_fold_ctes(cascade_rounds)}
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
    return state_query(
        _input_ctes("seed42"),
        include_file_type=True,
        trunc_rounds=trunc_rounds(demo_events()),
        cascade_rounds=cascade_rounds(demo_events()),
    )


def c02_oracle() -> str:
    """T25 error channel re-derived relationally: the dead-letter rows
    are exactly the events the fold excludes — an ADD_FILE onto a live
    path (without overwrite) and any non-creating op with no live file
    state — with the statemachine's error text reconstructed from the
    op. Relies on the same invariants as c01 (no overwrite claims, no
    bootstrap CLOSEs), asserted by check_invariants."""
    return errors_query(
        _input_ctes("seed42"),
        cascade_rounds=cascade_rounds(demo_events()),
    )


def c04_oracle() -> str:
    """The streaming reconciler's final state re-derived relationally
    from the raw seed-7 log: availableNow micro-batching + restart must
    land on the same file_state the window-SQL fold computes — a 3-way
    agreement (streaming fold, batch fold parity in
    tests/test_streaming.py, relational SQL)."""
    return state_query(
        _input_ctes("seed7"),
        include_file_type=False,
        trunc_rounds=trunc_rounds(stream_demo_events()),
        cascade_rounds=cascade_rounds(stream_demo_events()),
    )


def changeset_query(
    input_ctes: str, trunc_rounds: int = 1, cascade_rounds: int = 1
) -> str:
    """Per-block covering byte intervals re-derived from the raw log:
    the statemachine's delta bookkeeping as a lag over the per-block
    size trajectory (assertions + the chained TRUNCATE clamps), then
    min/max per block — DFSBlockState.compressedChangeSet
    relationally."""
    return f"""
WITH {input_ctes},
{_fold_ctes(cascade_rounds)},
{_clamp_stage_ctes(trunc_rounds)},
lagged AS MATERIALIZED (  -- statemachine size trajectory per block
  SELECT *, COALESCE(LAG(size) OVER (PARTITION BY inode_id, block_id
                                     ORDER BY tx_id), 0) AS prev
  FROM traj
),
deltas AS MATERIALIZED (  -- every size change emits one [lo, hi] interval (T2/T16)
  SELECT inode_id, block_id, tx_id,
         CASE WHEN size > prev THEN prev ELSE size END AS start_offset,
         CASE WHEN size > prev THEN size - 1 ELSE prev - 1 END AS end_offset,
         size < prev AS deleted
  FROM lagged WHERE size <> prev
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
    return changeset_query(
        _input_ctes("seed42"),
        trunc_rounds=trunc_rounds(demo_events()),
        cascade_rounds=cascade_rounds(demo_events()),
    )


#: Snapshot txid for the c23 backlog demo — mid-log (seed-42 spans tx
#: 1..253; state last_tx median is 233 but file activity clusters
#: early, so 120 leaves both sides populated: files fully caught-up
#: before it AND files with post-snapshot deltas).
C23_SNAPSHOT_TX = 120


def backlog_query(
    input_ctes: str,
    snapshot_tx: int,
    trunc_rounds: int = 1,
    cascade_rounds: int = 1,
) -> str:
    """T23 backlog re-derived relationally: the per-block covering
    interval of every delta PAST the snapshot txid, restricted the way
    ``snapshot.backlog_events`` restricts — live files only (folded
    state <> Deleted), files that actually moved past the snapshot
    (last_tx_id > snapshot_tx), live blocks only (truncate-killed
    blocks without a later resurrection are exactly ``blk_dead``,
    the same CTE the state fold uses for num_blocks). The interval
    min/max is :func:`changeset_query`'s delta derivation — the
    DFSBlockState.compressedChangeSet lag over the per-block size
    trajectory — with the tx window anchored at the snapshot."""
    return f"""
WITH {input_ctes},
{_fold_ctes(cascade_rounds)},
{_clamp_stage_ctes(trunc_rounds)},
{_STATE_CTES},
lagged AS MATERIALIZED (
  SELECT *, COALESCE(LAG(size) OVER (PARTITION BY inode_id, block_id
                                     ORDER BY tx_id), 0) AS prev
  FROM traj
),
deltas AS MATERIALIZED (
  SELECT inode_id, block_id, tx_id,
         CASE WHEN size > prev THEN prev ELSE size END AS start_offset,
         CASE WHEN size > prev THEN size - 1 ELSE prev - 1 END AS end_offset,
         size < prev AS deleted
  FROM lagged WHERE size <> prev
)
SELECT d.inode_id, d.block_id,
       MIN(d.start_offset) AS start_offset,
       MAX(d.end_offset) AS end_offset,
       MAX(d.end_offset) - MIN(d.start_offset) + 1 AS delta_size,
       BOOL_OR(d.deleted) AS any_deleted
FROM deltas d
JOIN folded f USING (inode_id)
WHERE d.tx_id > {snapshot_tx}
  AND f.state <> 'Deleted' AND f.last_tx_id > {snapshot_tx}
  AND NOT EXISTS (SELECT 1 FROM blk_dead bd
                  WHERE bd.inode_id = d.inode_id
                    AND bd.block_id = d.block_id)
GROUP BY d.inode_id, d.block_id
ORDER BY d.inode_id, d.block_id
"""


def c23_oracle() -> str:
    """Seed-42 backlog at the mid-log snapshot via
    :func:`backlog_query`."""
    return backlog_query(
        _input_ctes("seed42"),
        C23_SNAPSHOT_TX,
        trunc_rounds=trunc_rounds(demo_events()),
        cascade_rounds=cascade_rounds(demo_events()),
    )


def c24_oracle() -> str:
    """T27 state-GC expectation: compacting a two-generation state log
    keep-latest and dropping Deleted rows must land exactly on the
    full fold's live rows — c01's independently re-derived state with
    the Deleted rows filtered (a window-ordering bug in the compactor
    would surface the stale first-generation sizes instead)."""
    return f"""
SELECT inode_id, path, state, data_size, num_blocks, last_tx_id,
       file_type
FROM ({c01_oracle()})
WHERE state <> 'Deleted'
ORDER BY inode_id
"""

"""CDC-path scaling self-bench: binary editlog decode + reconcile fold
at growing segment counts (the §2A analogue of scripts/bench_scale.py).

Synthesizes N_SEGS segments x OPS_PER_SEG FSEditLogOp records of
realistic file lifecycles (ADD -> UPDATE_BLOCKS/ADD_BLOCK -> CLOSE,
20% RENAME, 10% DELETE, segment markers), encodes them with the
byte-exact ``encode_segment`` writer (layout -63 — validated against
real NameNode fixtures), then times the production ingest path:

  decode  — ``read_editlog_binary(resolve=False).count()``: binaryFile
            scan -> per-executor mapInPandas decode (S3/S4)
  e2e     — ``reconcile_batch(read_editlog_binary(...))``: decode +
            inode resolution window + one inode shuffle + per-inode
            fold to file_state (S3/S4 + T1-T12)

Lifecycles may span segment boundaries on purpose: path-only ops in a
later segment must resolve their inode through the window fill, like a
real tailing deployment.  Usage::

    python scripts/bench_cdc_scale.py [passes=2] [segs=200[,800]]

Prints one JSON line per scale point with ops/s throughput; the
diagnostic across points is the wall-time slope vs the segment-count
ratio (<= ratio means at-or-below-linear scaling).
"""

from __future__ import annotations

import json
import pathlib
import random
import shutil
import sys
import time

ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

OPS_PER_SEG = 1000
TS0 = 1_700_000_000_000


def _lifecycles(n_segs: int, seed: int = 11) -> list[list[dict]]:
    """Op records for ~n_segs*OPS_PER_SEG ops, split into segments."""
    from hcdc_spark.sources import editlog as E

    rng = random.Random(seed)
    target = n_segs * OPS_PER_SEG
    recs: list[dict] = []
    txid = 0
    inode = 100
    blk = 5000

    def nxt() -> int:
        nonlocal txid
        txid += 1
        return txid

    while len(recs) < target:
        inode += 1
        path = f"/ingest/d{inode % 97}/part_{inode}.parquet"
        blk += 1
        blocks = [{"block_id": blk, "size": 0, "generation_stamp": 1}]
        t = nxt()
        recs.append(
            {"txid": t, "opcode": E.OP_ADD, "inode_id": inode,
             "path": path, "mtime": TS0 + t, "atime": TS0 + t,
             "block_size": 1 << 27,
             "blocks": [dict(b) for b in blocks]}
        )
        for _ in range(rng.randint(1, 3)):
            blocks[-1]["size"] += rng.randint(1, 1 << 20)
            recs.append(
                {"txid": nxt(), "opcode": E.OP_UPDATE_BLOCKS,
                 "path": path, "blocks": [dict(b) for b in blocks]}
            )
            if rng.random() < 0.3:
                blk += 1
                blocks.append(
                    {"block_id": blk, "size": 0,
                     "generation_stamp": 1 + len(blocks)}
                )
                recs.append(
                    {"txid": nxt(), "opcode": E.OP_ADD_BLOCK,
                     "path": path, "blocks": [dict(b) for b in blocks]}
                )
        t = nxt()
        recs.append(
            {"txid": t, "opcode": E.OP_CLOSE, "inode_id": 0,
             "path": path, "mtime": TS0 + t, "atime": TS0 + t,
             "block_size": 1 << 27,
             "blocks": [dict(b) for b in blocks]}
        )
        r = rng.random()
        if r < 0.2:
            t = nxt()
            recs.append(
                {"txid": t, "opcode": E.OP_RENAME, "src": path,
                 "dst": path.replace("/ingest/", "/done/"),
                 "timestamp": TS0 + t, "options": []}
            )
        elif r < 0.3:
            t = nxt()
            recs.append(
                {"txid": t, "opcode": E.OP_DELETE, "path": path,
                 "timestamp": TS0 + t}
            )
    # split into segments with START/END markers; lifecycles straddle
    # boundaries exactly as a rolling NameNode segment would cut them
    segs: list[list[dict]] = []
    for i in range(0, len(recs), OPS_PER_SEG):
        chunk = recs[i : i + OPS_PER_SEG]
        start = {"txid": chunk[0]["txid"], "opcode": E.OP_START_LOG_SEGMENT}
        end = {"txid": chunk[-1]["txid"], "opcode": E.OP_END_LOG_SEGMENT}
        segs.append([start] + chunk + [end])
    return segs


def _materialize(n_segs: int) -> tuple[str, int, int]:
    """Encode + write segments under .benchdata (cached); returns
    (glob, op_count, byte_count)."""
    from hcdc_spark.sources.editlog import encode_segment

    d = ROOT / ".benchdata" / f"cdc_segs_{n_segs}"
    marker = d / ".complete"
    if not marker.exists():
        shutil.rmtree(d, ignore_errors=True)
        d.mkdir(parents=True)
        n_ops = 0
        for i, seg in enumerate(_lifecycles(n_segs)):
            first = seg[0]["txid"]
            (d / f"edits_{first:019d}_{i:05d}").write_bytes(
                encode_segment(seg, layout=-63)
            )
            n_ops += len(seg)
        marker.write_text(str(n_ops))
    n_ops = int(marker.read_text())
    nbytes = sum(
        p.stat().st_size for p in d.iterdir() if p.name.startswith("edits_")
    )
    return str(d / "edits_*"), n_ops, nbytes


def main() -> None:
    passes = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    seg_points = (
        [int(s) for s in sys.argv[2].split(",")]
        if len(sys.argv) > 2
        else [200, 800]
    )
    from hcdc_spark.cdc.reconcile import reconcile_batch
    from hcdc_spark.session import get_spark
    from hcdc_spark.sources.editlog import read_editlog_binary

    spark = get_spark("hcdc-bench-cdc-scale")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict[str, dict[str, float]] = {}
    for n_segs in seg_points:
        glob, n_ops, nbytes = _materialize(n_segs)

        def decode():
            return read_editlog_binary(
                spark, glob, resolve=False
            ).count()

        def e2e():
            return reconcile_batch(
                read_editlog_binary(spark, glob)
            ).count()

        row: dict[str, float] = {"segments": n_segs, "ops": n_ops,
                                 "mb": round(nbytes / 1e6, 1)}
        for label, fn in (("decode", decode), ("e2e", e2e)):
            n = fn()  # warmup (codegen/Arrow workers; validates counts)
            best = min(
                (lambda t0: (fn(), time.time() - t0)[1])(time.time())
                for _ in range(passes)
            )
            row[f"{label}_s"] = round(best, 2)
            row[f"{label}_rows"] = n
            row[f"{label}_kops_s"] = round(n_ops / best / 1e3, 1)
        out[f"segs{n_segs}"] = row
        print(f"# segs{n_segs}: {row}", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

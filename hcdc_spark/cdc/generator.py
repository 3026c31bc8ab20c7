"""Deterministic synthetic change-event logs (FIXTURES.md §1).

Used by the golden tests and by the driver-visible CDC demo queries.
Seeded ``random.Random`` → identical logs on every run, everywhere.
The generator models a population of files living through HDFS-style
lifecycles: create → add blocks → append/update → close, with renames,
deletes, truncates, overwrites, duplicates (for the T4 guard) and
directory ops mixed in.
"""

from __future__ import annotations

import random

from hcdc_spark.cdc.model import empty_event


def generate_events(
    n_files: int = 50,
    seed: int = 42,
    namespace: str = "ns1",
    with_dir_ops: bool = True,
    with_duplicates: bool = True,
    with_anomalies: bool = False,
    with_recreates: bool = False,
    with_subtree_recreates: bool = False,
) -> list[dict]:
    """``with_recreates`` adds DELETE→re-ADD lifetimes (file-level AND
    cascade-deleted inodes re-created after the directory ops) drawn
    from a SEPARATE rng stream, so every pre-existing seed's log —
    including the seed-42/seed-7 golden demo logs — stays
    byte-identical with the flag off."""
    rng = random.Random(seed)
    events: list[dict] = []
    tx = 0
    ts0 = 1_700_000_000_000
    block_counter = 1000

    def nxt() -> tuple[int, int]:
        nonlocal tx
        tx += 1
        return tx, ts0 + tx * 1000

    dirs = [f"/data/d{i}" for i in range(max(2, n_files // 10))]
    live_paths: dict[int, str] = {}
    deleted_inodes: list[int] = []

    for inode in range(1, n_files + 1):
        d = rng.choice(dirs)
        path = f"{d}/file_{inode}.parquet"
        blk_size = 1 << 20
        t, ts = nxt()
        first_block = {
            "block_id": (block_counter := block_counter + 1),
            "size": 0,
            "block_size": blk_size,
            "generation_stamp": 1,
            "start_offset": None,
            "end_offset": None,
            "delta_size": None,
            "deleted": False,
        }
        events.append(
            empty_event(
                tx_id=t, op="ADD_FILE", ts=ts, namespace=namespace,
                path=path, inode_id=inode, block_size=blk_size,
                overwrite=False, modified_time=ts, blocks=[first_block],
                mode="New",
            )
        )
        live_paths[inode] = path
        size = 0
        blocks = [dict(first_block)]

        for _ in range(rng.randint(1, 4)):
            action = rng.random()
            if action < 0.45:  # grow the last block
                grow = rng.randint(1, blk_size // 2)
                size += grow
                blocks[-1] = dict(blocks[-1], size=(blocks[-1]["size"] or 0) + grow)
                t, ts = nxt()
                events.append(
                    empty_event(
                        tx_id=t, op="UPDATE_BLOCKS", ts=ts,
                        namespace=namespace, path=live_paths[inode],
                        inode_id=inode, blocks=[dict(blocks[-1])],
                        mode="New",
                    )
                )
            elif action < 0.7:  # new block (penultimate+last convention)
                t, ts = nxt()
                newb = {
                    "block_id": (block_counter := block_counter + 1),
                    "size": 0, "block_size": blk_size,
                    "generation_stamp": 1, "start_offset": None,
                    "end_offset": None, "delta_size": None, "deleted": False,
                }
                pair = [dict(blocks[-1]), newb] if blocks else [newb]
                blocks.append(dict(newb))
                events.append(
                    empty_event(
                        tx_id=t, op="ADD_BLOCK", ts=ts, namespace=namespace,
                        path=live_paths[inode], inode_id=inode,
                        blocks=pair, mode="New",
                    )
                )
            elif action < 0.8:  # append marker
                t, ts = nxt()
                events.append(
                    empty_event(
                        tx_id=t, op="APPEND", ts=ts, namespace=namespace,
                        path=live_paths[inode], inode_id=inode,
                        new_block=False, mode="New",
                    )
                )
            elif action < 0.9 and size > 10:  # truncate
                new_len = rng.randint(0, size - 1)
                t, ts = nxt()
                events.append(
                    empty_event(
                        tx_id=t, op="TRUNCATE", ts=ts, namespace=namespace,
                        path=live_paths[inode], inode_id=inode,
                        truncate_new_length=new_len, mode="New",
                    )
                )
                size = new_len
            else:  # rename
                new_path = f"{rng.choice(dirs)}/renamed_{inode}.parquet"
                t, ts = nxt()
                events.append(
                    empty_event(
                        tx_id=t, op="RENAME", ts=ts, namespace=namespace,
                        path=live_paths[inode], inode_id=inode,
                        dest_path=new_path, rename_opts="NONE", mode="New",
                    )
                )
                live_paths[inode] = new_path

        # close most files; leave some open, delete some
        roll = rng.random()
        if roll < 0.75:
            t, ts = nxt()
            events.append(
                empty_event(
                    tx_id=t, op="CLOSE", ts=ts, namespace=namespace,
                    path=live_paths[inode], inode_id=inode,
                    length=size, modified_time=ts, file_type="PARQUET",
                    blocks=[dict(b) for b in blocks], mode="New",
                )
            )
        elif roll < 0.85:
            t, ts = nxt()
            events.append(
                empty_event(
                    tx_id=t, op="DELETE", ts=ts, namespace=namespace,
                    path=live_paths[inode], inode_id=inode, mode="New",
                )
            )
            del live_paths[inode]
            deleted_inodes.append(inode)

    cascade_deleted: list[int] = []
    anomaly_inode: int | None = None
    recreated: set[int] = set()
    if with_dir_ops and live_paths:
        # delete one whole directory (inode 900000+ = directory inodes)
        victim_dir = dirs[0]
        cascade_deleted = [
            i for i, p in sorted(live_paths.items())
            if p.startswith(victim_dir + "/")
        ]
        t, ts = nxt()
        events.append(
            empty_event(
                tx_id=t, op="DELETE", ts=ts, namespace=namespace,
                path=victim_dir, inode_id=900001, mode="New",
            )
        )
        # rename another directory
        t, ts = nxt()
        events.append(
            empty_event(
                tx_id=t, op="RENAME", ts=ts, namespace=namespace,
                path=dirs[1], inode_id=900002,
                dest_path=f"{dirs[1]}_moved", rename_opts="NONE",
                mode="New",
            )
        )

    if with_anomalies:
        # rows the reconciler must route to the error channel (T25)
        t, ts = nxt()
        events.append(
            empty_event(
                tx_id=t, op="APPEND", ts=ts, namespace=namespace,
                path="/data/ghost.parquet", inode_id=999_777, mode="New",
            )
        )
        if live_paths:
            inode, path = next(iter(live_paths.items()))
            anomaly_inode = inode
            t, ts = nxt()
            events.append(
                empty_event(
                    tx_id=t, op="ADD_FILE", ts=ts, namespace=namespace,
                    path=path, inode_id=inode, overwrite=False,
                    blocks=[], mode="New",
                )
            )

    if with_recreates:
        # Re-created lifetimes: both file-level DELETE→re-ADD and
        # cascade-DELETE→re-ADD (the re-ADD lands AFTER the directory
        # ops on purpose). Drawn from an independent rng so the shared
        # `rng` stream — and therefore every existing seed's log — is
        # untouched when the flag is off.
        rng2 = random.Random(seed * 7919 + 17)
        # the anomaly ADD may itself have re-created a cascade-deleted
        # inode (live_paths does not see cascades) — a further re-ADD
        # on it would be errored and its UPDATE_BLOCKS semantic, so
        # keep it out of the pool
        pool = set(deleted_inodes) | set(cascade_deleted)
        pool.discard(anomaly_inode)
        for inode in sorted(pool):
            if rng2.random() >= 0.7:
                continue
            recreated.add(inode)
            path = f"/data/re/file_{inode}.parquet"
            blk_size = 1 << 20
            t, ts = nxt()
            b0 = {
                "block_id": (block_counter := block_counter + 1),
                "size": 0, "block_size": blk_size,
                "generation_stamp": 1, "start_offset": None,
                "end_offset": None, "delta_size": None, "deleted": False,
            }
            events.append(
                empty_event(
                    tx_id=t, op="ADD_FILE", ts=ts, namespace=namespace,
                    path=path, inode_id=inode, block_size=blk_size,
                    overwrite=False, modified_time=ts, blocks=[b0],
                    mode="New",
                )
            )
            size = 0
            blocks2 = [dict(b0)]
            for _ in range(rng2.randint(0, 2)):
                grow = rng2.randint(1, blk_size // 2)
                size += grow
                blocks2[-1] = dict(
                    blocks2[-1], size=(blocks2[-1]["size"] or 0) + grow
                )
                t, ts = nxt()
                events.append(
                    empty_event(
                        tx_id=t, op="UPDATE_BLOCKS", ts=ts,
                        namespace=namespace, path=path, inode_id=inode,
                        blocks=[dict(blocks2[-1])], mode="New",
                    )
                )
            if size > 10 and rng2.random() < 0.4:
                # a truncate inside the re-created lifetime — and,
                # sometimes, growth after it with no CLOSE (both now
                # modeled by the relational fold)
                new_len = rng2.randint(0, size - 1)
                t, ts = nxt()
                events.append(
                    empty_event(
                        tx_id=t, op="TRUNCATE", ts=ts,
                        namespace=namespace, path=path, inode_id=inode,
                        truncate_new_length=new_len, mode="New",
                    )
                )
                size = new_len
                if rng2.random() < 0.5:
                    grow = rng2.randint(1, blk_size // 2)
                    size += grow
                    blocks2[-1] = dict(
                        blocks2[-1],
                        size=(blocks2[-1]["size"] or 0) + grow,
                    )
                    t, ts = nxt()
                    events.append(
                        empty_event(
                            tx_id=t, op="UPDATE_BLOCKS", ts=ts,
                            namespace=namespace, path=path,
                            inode_id=inode,
                            blocks=[dict(blocks2[-1])], mode="New",
                        )
                    )
                if size > 10 and rng2.random() < 0.5:
                    # a SECOND truncate in the same lifetime — the
                    # clamp chain must replay it against the first
                    # one's shrunken sizes
                    new_len = rng2.randint(0, size - 1)
                    t, ts = nxt()
                    events.append(
                        empty_event(
                            tx_id=t, op="TRUNCATE", ts=ts,
                            namespace=namespace, path=path,
                            inode_id=inode,
                            truncate_new_length=new_len, mode="New",
                        )
                    )
                    size = new_len
            roll = rng2.random()
            if roll < 0.5:
                t, ts = nxt()
                events.append(
                    empty_event(
                        tx_id=t, op="CLOSE", ts=ts, namespace=namespace,
                        path=path, inode_id=inode, length=size,
                        modified_time=ts, file_type="PARQUET",
                        blocks=[dict(b) for b in blocks2], mode="New",
                    )
                )
            elif roll < 0.65:
                # delete AGAIN — a third lifetime may follow for a few
                t, ts = nxt()
                events.append(
                    empty_event(
                        tx_id=t, op="DELETE", ts=ts, namespace=namespace,
                        path=path, inode_id=inode, mode="New",
                    )
                )
                if rng2.random() < 0.5:
                    t, ts = nxt()
                    b1 = {
                        "block_id": (block_counter := block_counter + 1),
                        "size": rng2.randint(1, blk_size),
                        "block_size": blk_size, "generation_stamp": 1,
                        "start_offset": None, "end_offset": None,
                        "delta_size": None, "deleted": False,
                    }
                    events.append(
                        empty_event(
                            tx_id=t, op="ADD_FILE", ts=ts,
                            namespace=namespace,
                            path=f"/data/re2/file_{inode}.parquet",
                            inode_id=inode, block_size=blk_size,
                            overwrite=False, modified_time=ts,
                            blocks=[b1], mode="New",
                        )
                    )

    if with_recreates:
        # Exotic-op coverage (IGNORE / ERROR / CONCAT_DELETE) —
        # deterministic, so it adds no rng draws: a live file receives
        # the two stateless control ops then an ERROR (final state
        # Error); an inode that only ever sees IGNORE must surface as
        # an Unknown stub with NO error row; a deleted file routes
        # CONCAT_DELETE and ERROR to the dead-letter channel.
        blk_size = 1 << 20
        bx = {
            "block_id": (block_counter := block_counter + 1),
            "size": 4096, "block_size": blk_size, "generation_stamp": 1,
            "start_offset": None, "end_offset": None, "delta_size": None,
            "deleted": False,
        }
        pa = "/data/xo/file_a.parquet"
        t, ts = nxt()
        events.append(empty_event(
            tx_id=t, op="ADD_FILE", ts=ts, namespace=namespace, path=pa,
            inode_id=777001, block_size=blk_size, overwrite=False,
            modified_time=ts, blocks=[bx], mode="New",
        ))
        for op in ("IGNORE", "CONCAT_DELETE", "ERROR"):
            t, ts = nxt()
            events.append(empty_event(
                tx_id=t, op=op, ts=ts, namespace=namespace, path=pa,
                inode_id=777001, mode="New",
            ))
        t, ts = nxt()
        events.append(empty_event(
            tx_id=t, op="IGNORE", ts=ts, namespace=namespace,
            path="/data/xo/ghost.parquet", inode_id=777002, mode="New",
        ))
        by = {
            "block_id": (block_counter := block_counter + 1),
            "size": 1024, "block_size": blk_size, "generation_stamp": 1,
            "start_offset": None, "end_offset": None, "delta_size": None,
            "deleted": False,
        }
        pc = "/data/xo/file_c.parquet"
        t, ts = nxt()
        events.append(empty_event(
            tx_id=t, op="ADD_FILE", ts=ts, namespace=namespace, path=pc,
            inode_id=777003, block_size=blk_size, overwrite=False,
            modified_time=ts, blocks=[by], mode="New",
        ))
        t, ts = nxt()
        events.append(empty_event(
            tx_id=t, op="DELETE", ts=ts, namespace=namespace, path=pc,
            inode_id=777003, mode="New",
        ))
        for op in ("CONCAT_DELETE", "ERROR"):
            t, ts = nxt()
            events.append(empty_event(
                tx_id=t, op=op, ts=ts, namespace=namespace, path=pc,
                inode_id=777003, mode="New",
            ))

    if with_subtree_recreates and with_dir_ops and cascade_deleted:
        # OVERLAPPING directory-op subtrees: re-create cascade-deleted
        # inodes back UNDER the deleted directory's path, DELETE that
        # directory a SECOND time (the cascade lands on the epoch-2
        # lifetimes), open a THIRD lifetime after it, and finally
        # RENAME the same subtree away — the shapes the relational
        # fold's cascade CHAIN exists for. Independent rng stream so
        # every existing seed's log is untouched with the flag off.
        rng3 = random.Random(seed * 104729 + 31)
        victim_dir = dirs[0]
        blk_size = 1 << 20
        back = [
            i for i in cascade_deleted
            if i not in recreated and i != anomaly_inode
            and rng3.random() < 0.6
        ][:4]
        for inode in back:
            path = f"{victim_dir}/file_{inode}.parquet"
            bsz = rng3.randint(1, blk_size)
            b0 = {
                "block_id": (block_counter := block_counter + 1),
                "size": bsz, "block_size": blk_size,
                "generation_stamp": 1, "start_offset": None,
                "end_offset": None, "delta_size": None, "deleted": False,
            }
            t, ts = nxt()
            events.append(empty_event(
                tx_id=t, op="ADD_FILE", ts=ts, namespace=namespace,
                path=path, inode_id=inode, block_size=blk_size,
                overwrite=False, modified_time=ts, blocks=[b0],
                mode="New",
            ))
            if rng3.random() < 0.5:
                t, ts = nxt()
                events.append(empty_event(
                    tx_id=t, op="CLOSE", ts=ts, namespace=namespace,
                    path=path, inode_id=inode, length=bsz,
                    modified_time=ts, file_type="PARQUET",
                    blocks=[dict(b0)], mode="New",
                ))
        # the SECOND cascade, same directory inode, same subtree
        t, ts = nxt()
        events.append(empty_event(
            tx_id=t, op="DELETE", ts=ts, namespace=namespace,
            path=victim_dir, inode_id=900001, mode="New",
        ))
        if back:
            # epoch 3 for one inode, surviving the second cascade
            inode = back[0]
            path = f"{victim_dir}/file_{inode}.parquet"
            bsz = rng3.randint(1, blk_size)
            b1 = {
                "block_id": (block_counter := block_counter + 1),
                "size": bsz, "block_size": blk_size,
                "generation_stamp": 1, "start_offset": None,
                "end_offset": None, "delta_size": None, "deleted": False,
            }
            t, ts = nxt()
            events.append(empty_event(
                tx_id=t, op="ADD_FILE", ts=ts, namespace=namespace,
                path=path, inode_id=inode, block_size=blk_size,
                overwrite=False, modified_time=ts, blocks=[b1],
                mode="New",
            ))
            t, ts = nxt()
            events.append(empty_event(
                tx_id=t, op="CLOSE", ts=ts, namespace=namespace,
                path=path, inode_id=inode, length=bsz,
                modified_time=ts, file_type="PARQUET",
                blocks=[dict(b1)], mode="New",
            ))
        # rename CHAIN onto the twice-deleted subtree: the epoch-3
        # survivor (if any) must move with it
        t, ts = nxt()
        events.append(empty_event(
            tx_id=t, op="RENAME", ts=ts, namespace=namespace,
            path=victim_dir, inode_id=900001,
            dest_path=f"{victim_dir}_v2", rename_opts="NONE",
            mode="New",
        ))

    if with_duplicates:
        # replay a slice verbatim — the T4 guard must make this a no-op
        events.extend(dict(e) for e in events[5:10])

    return events


def events_df(spark, events: list[dict]):
    from hcdc_spark.cdc.model import CHANGE_EVENT_SCHEMA

    return spark.createDataFrame(events, schema=CHANGE_EVENT_SCHEMA)

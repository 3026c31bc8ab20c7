"""Physical-plan inspection (SURVEY §4).

The reference has no optimizer to inspect; in this engine the physical
plan IS the performance contract, so these helpers make plan properties
*assertable in tests*: a dim join that stops broadcasting, a filter
that stops pushing to the parquet scan, or a projection that stops
pruning columns fails CI instead of becoming a 100 TB incident.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def plan(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def simple_plan(df: DataFrame) -> str:
    return plan(df, "simple")


def count_exchanges(df: DataFrame) -> int:
    """Shuffle count in the final plan (AQE may later coalesce but not
    remove them). Every exchange is a full materialize+network pass at
    scale — the first thing to minimize."""
    p = plan(df, "simple")
    return len(re.findall(r"Exchange (?:hashpartitioning|rangepartitioning|SinglePartition|RoundRobin)", p))


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in plan(df, "simple") or "BroadcastNestedLoopJoin" in plan(df, "simple")


def broadcast_join_count(df: DataFrame) -> int:
    p = plan(df, "simple")
    return p.count("BroadcastHashJoin") + p.count("BroadcastNestedLoopJoin")


def sortmerge_join_count(df: DataFrame) -> int:
    return plan(df, "simple").count("SortMergeJoin")


def pushed_filters(df: DataFrame) -> list[str]:
    """Filters that reached the parquet/orc scan (PushedFilters)."""
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan(df, "formatted")):
        body = m.group(1).strip()
        if body:
            out.extend(s.strip() for s in body.split(","))
    return out


def partition_filters(df: DataFrame) -> list[str]:
    """Filters planned as PARTITION pruning (PartitionFilters at the
    scan): the scan lists only the matching directories — stronger
    than PushedFilters, which still opens every file."""
    out: list[str] = []
    for m in re.finditer(
        r"PartitionFilters: \[([^\]]*)\]", plan(df, "formatted")
    ):
        body = m.group(1).strip()
        if body:
            out.extend(s.strip() for s in body.split(","))
    return out


def read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema of every file scan — column pruning made visible."""
    return re.findall(r"ReadSchema: (struct<[^\n]*)", plan(df, "formatted"))


def codegen_stage_count(df: DataFrame, execute: bool = True) -> int:
    """Whole-stage-codegen subtree count (codegen explain mode).

    Under AQE the final plan — and its codegen subtrees — exists only
    after execution, so this collects `df` itself by default (`count()`
    would execute a different, pruned plan and report nothing)."""
    if execute:
        df.collect()
    m = re.search(r"Found (\d+) WholeStageCodegen subtrees",
                  plan(df, "codegen"))
    return int(m.group(1)) if m else 0


def has_cartesian(df: DataFrame) -> bool:
    return "CartesianProduct" in plan(df, "simple")


def selected_buckets(df: DataFrame) -> list[tuple[int, int]]:
    """Every ``SelectedBucketsCount: k out of n`` in the plan — one per
    bucket-pruned scan. Bucket pruning is file-level partition pruning
    for bucketed tables: a probe whose keys hash into k of n bucket
    files opens only those k (the band-index probe contract; gated
    with the q102 poison technique on the files it must never open)."""
    return [
        (int(m.group(1)), int(m.group(2)))
        for m in re.finditer(
            r"SelectedBucketsCount: (\d+) out of (\d+)",
            plan(df, "formatted"),
        )
    ]

"""Query registry — the contract between the engine and the oracle.

Every operator in SURVEY.md §2 is exposed as a named :class:`QuerySpec`:
a PySpark callable ``(spark, sf_dir) -> DataFrame`` plus (where the
semantics are SQL-expressible) an equivalent ANSI-SQL oracle string run by
DuckDB over the same parquet tables. The driver hash-compares the two.

Rules that keep the hashes stable (see AGENTS-facing notes in README):
- every computed column is aliased identically on both sides;
- monetary/double aggregates go through DECIMAL(18,4) internally and are
  cast to DOUBLE at the end — exact arithmetic in both engines, identical
  IEEE result;
- day-level time grouping uses CAST(ts AS DATE) on both sides (DuckDB's
  date_trunc('day') returns DATE while Spark returns TIMESTAMP);
- nondeterministic orderings are never exposed (the compare is
  order-insensitive, but sets must match exactly).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # None → non-SQL-expressible; driver does rows-only
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


class Registry:
    def __init__(self) -> None:
        self._specs: dict[str, QuerySpec] = {}

    def add(
        self,
        name: str,
        oracle: str | None,
        doc: str = "",
        tags: tuple[str, ...] = (),
    ) -> Callable[[QueryFn], QueryFn]:
        def deco(fn: QueryFn) -> QueryFn:
            if name in self._specs:
                raise ValueError(f"duplicate query name: {name}")
            self._specs[name] = QuerySpec(name, fn, oracle, doc or (fn.__doc__ or ""), tags)
            return fn

        return deco

    def merge(self, other: "Registry") -> None:
        for name, spec in other._specs.items():
            if name in self._specs:
                raise ValueError(f"duplicate query name across registries: {name}")
            self._specs[name] = spec

    def reorder(self, priority: tuple[str, ...]) -> None:
        """Re-emit the registry with ``priority`` names first, in the
        given order, followed by the remaining entries in registration
        order. The driver walks ``queries()`` in dict order under a
        flat first-N budget, so position IS verification priority.
        Unknown priority names raise — a renamed query must not
        silently fall out of the verified prefix.
        """
        missing = [n for n in priority if n not in self._specs]
        if missing:
            raise ValueError(f"reorder: unknown query names {missing}")
        head = {n: self._specs[n] for n in priority}
        tail = {n: s for n, s in self._specs.items() if n not in head}
        self._specs = {**head, **tail}

    @property
    def specs(self) -> dict[str, QuerySpec]:
        return dict(self._specs)

    def queries(self) -> dict[str, QueryFn]:
        return {n: s.fn for n, s in self._specs.items()}

    def oracles(self) -> dict[str, str]:
        return {n: s.oracle for n, s in self._specs.items() if s.oracle is not None}

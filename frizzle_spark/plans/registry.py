"""Central query registry: every operator the engine commits to (SURVEY.md §2)
registers a Spark builder plus (when SQL-expressible) its DuckDB oracle.

The reference has no query layer at all — its whole "plan" is compiled Go
(reference frizzle.go:97-107) — so this registry IS the committed inventory
contract: ``__spark_entry__.queries()`` / ``oracle_sql()`` are thin views
over it, and the pytest differential harness iterates it.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # ANSI SQL for DuckDB; None → rows-only check
    doc: str


REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register ``fn`` as a committed query, with its oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=fn.__doc__ or "")
        return fn

    return deco

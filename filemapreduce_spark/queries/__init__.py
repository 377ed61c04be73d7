"""Declared-query registry: the oracle-testable operator inventory.

Each entry pairs a Spark implementation ``fn(spark, sf_dir) →
DataFrame`` with an equivalent ANSI-SQL ``oracle`` string DuckDB can
run on the same parquet tables (SURVEY.md §2 Part B). Column names are
aliased identically on both sides; computed aggregates use the exact
integer-cents arithmetic from ``operators.money`` so value hashes
match bit-for-bit.

Queries whose semantics aren't SQL-expressible (streaming state,
binary decode stubs) set ``oracle=None`` → rows-only check.

Cache contract: query functions may ``persist()`` bounded
intermediates (per-key count tables, shared scan bases) that the
returned DataFrame references lazily — they cannot be unpersisted
inside the function without re-executing the branch. Callers running
MANY queries against one session (the driver, bench.py, the sweeps
all do this) should call ``spark.catalog.clearCache()`` between
queries, or wrap each query's build+action in
``filemapreduce_spark.cache_scope()`` — a context manager that
unpersists exactly what the query persisted once its action
completes (run the action INSIDE the scope). A caller running one
query can leave eviction to Spark's LRU (storage-memory pressure
evicts MEMORY_AND_DISK blocks safely).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    tags: tuple[str, ...] = ()
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str, oracle: str | None, tags: tuple[str, ...] = (), doc: str = ""
):
    def deco(fn):
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name}")
        REGISTRY[name] = QuerySpec(name, fn, oracle, tags, doc or (fn.__doc__ or ""))
        return fn

    return deco


def load_all() -> dict[str, QuerySpec]:
    """Import all query modules (side effect: fills REGISTRY)."""
    from filemapreduce_spark.queries import (  # noqa: F401
        analytics2,
        analytics3,
        analytics4,
        analytics5,
        analytics6,
        analytics7,
        analytics8,
        analytics9,
        analytics10,
        analytics11,
        analytics12,
        analytics13,
        audit,
        coverage2,
        coverage3,
        coverage4,
        coverage5,
        coverage6,
        coverage7,
        coverage8,
        corpus,
        engineops,
        fileops,
        linalg,
        llm,
        llm2,
        llm3,
        llm4,
        llm5,
        llm6,
        llm7,
        llm8,
        llm9,
        llm10,
        llm11,
        llm12,
        llm13,
        mlprep,
        multimodal2,
        pipeline,
        spatial,
        pipeline2,
        relational,
        roundtrip,
        search,
        streaming,
        subqueries,
        survival,
        udx,
    )

    # Some modules substitute config constants into fn.__doc__ AFTER
    # registration (e.g. "{K}" → "5"); re-sync so spec.doc always
    # matches the live docstring the substitutions produced.
    for name, spec in list(REGISTRY.items()):
        live = spec.fn.__doc__ or ""
        if live != spec.doc:
            REGISTRY[name] = dataclasses.replace(spec, doc=live)

    return REGISTRY

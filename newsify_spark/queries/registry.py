"""Query registry.

Each query is a named (PySpark callable, optional DuckDB oracle SQL)
pair. The callable signature is ``(spark, sf_dir) -> DataFrame`` per the
driver contract; the oracle runs against DuckDB views named after the
fixture tables.

Parity rules (enforced by tests/test_oracle.py):
- every computed column aliased identically on both sides;
- doubles rounded (4-6 dp) INSIDE the query on both sides;
- aggregates explicitly cast (DuckDB sum(int) -> HUGEINT otherwise);
- no current_timestamp / uuid in oracle-checked queries — "now" is
  always derived from the data (max(ts)) or a literal;
- every top-k has a total order (unique tiebreaker column).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class Query:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)
    bench: bool = False  # include in bench.py headline set


REGISTRY: dict[str, Query] = {}


def register(
    name: str,
    oracle: str | None = None,
    doc: str = "",
    tags: tuple[str, ...] = (),
    bench: bool = False,
):
    def deco(fn):
        REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle, doc=doc, tags=tags, bench=bench)
        return fn

    return deco

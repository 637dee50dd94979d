"""Query registry: the engine's declared operator inventory.

Every operator from SURVEY.md §2 that is implemented registers here with
(a) a Spark callable (spark, sf_dir) -> DataFrame and (b) an equivalent
ANSI-SQL oracle string for DuckDB, or None for genuinely
non-SQL-expressible ops (the driver then records a weaker rows-only check).

`__spark_entry__.py` exposes this registry to the correctness driver.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class Query:
    name: str
    fn: QueryFn
    oracle: str | None
    description: str = ""
    headline: bool = False  # included in bench.py's headline set
    tags: tuple[str, ...] = field(default=())


class Registry:
    def __init__(self) -> None:
        self._queries: dict[str, Query] = {}
        self._front: tuple[str, ...] = ()

    def register(
        self,
        name: str,
        oracle: str | None,
        description: str = "",
        headline: bool = False,
        tags: tuple[str, ...] = (),
    ) -> Callable[[QueryFn], QueryFn]:
        def deco(fn: QueryFn) -> QueryFn:
            if name in self._queries:
                raise ValueError(f"duplicate query name {name!r}")
            self._queries[name] = Query(
                name=name,
                fn=fn,
                oracle=oracle,
                description=description or (fn.__doc__ or "").strip().splitlines()[0]
                if (description or fn.__doc__)
                else "",
                headline=headline,
                tags=tags,
            )
            return fn

        return deco

    def set_front(self, names: tuple[str, ...], allow_missing: bool = False) -> None:
        """Declare which queries enumerate first in queries()/oracle_sql().

        The external correctness driver verifies a bounded prefix of the
        registry each round; front-loading rotates not-yet-driver-verified
        queries into that window. Unknown names RAISE by default: a typo
        here would silently shrink the verified window and leave the slot
        to an already-green query — the exact failure the rotation exists
        to prevent. Pass allow_missing=True only for deliberate removals.
        """
        unknown = [n for n in names if n not in self._queries]
        if unknown and not allow_missing:
            raise ValueError(
                f"set_front: unknown query names {unknown!r}; "
                "register them first or pass allow_missing=True"
            )
        if len(set(names)) != len(names):
            dupes = sorted({n for n in names if names.count(n) > 1})
            raise ValueError(f"set_front: duplicate names {dupes!r}")
        self._front = tuple(n for n in names if n in self._queries)

    def _ordered(self) -> list[str]:
        front = list(self._front)
        rest = [n for n in self._queries if n not in self._front]
        return front + rest

    def queries(self) -> dict[str, QueryFn]:
        return {name: self._queries[name].fn for name in self._ordered()}

    def oracle_sql(self) -> dict[str, str]:
        return {
            name: self._queries[name].oracle
            for name in self._ordered()
            if self._queries[name].oracle is not None
        }

    def headline(self) -> list[Query]:
        return [q for q in self._queries.values() if q.headline]

    def all(self) -> dict[str, Query]:
        return dict(self._queries)

    def __len__(self) -> int:
        return len(self._queries)


REGISTRY = Registry()


def load_all_operators() -> Registry:
    """Import every operator module so registrations run. Idempotent."""
    import mapreduce_sm_spark.operators  # noqa: F401

    return REGISTRY

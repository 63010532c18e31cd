"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at sf=0.01
and compares it against the matching ``oracle_sql()[name]`` via DuckDB.

Nothing here (or in rel_ray) calls ``ray.init()`` / ``ray.shutdown()`` —
only bench.py, CLI entry points and the pytest session fixture own a Ray
session.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline: record-linkage clusters over a transcripts-shaped
    table (BASELINE.json:input_hint schema) derived deterministically from
    /root/testdata/sf0.001/events.parquet."""
    from rel_ray.pipelines.queries import q_linkage_clusters

    return q_linkage_clusters("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline from SURVEY.md §2
    (registry in rel_ray/pipelines/queries.py)."""
    from rel_ray.pipelines.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalents for the SQL-expressible subset;
    the rest (LSH keys, MinHash signatures, iterative connected components,
    sign-LSH buckets) get the driver's rows-only check."""
    from rel_ray.pipelines.queries import ORACLE_SQL

    return dict(ORACLE_SQL)

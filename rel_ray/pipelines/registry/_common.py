"""Driver-contract query registry: every operator from SURVEY.md §2 exposed as
a callable over the driver's testdata tables, with a DuckDB oracle SQL string
where ANSI-SQL can express the same computation.

Conventions that make the driver's value-hash comparison deterministic:
  * money aggregates are integer cents, rounded per-row BEFORE summation
    (float sums are order-dependent; int sums are exact);
  * every computed column is named identically in the Ray code and the SQL;
  * ties in any top-k / rank are broken by an explicit id column.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd
from ray.data.aggregate import Count, Sum

from ...config import DEFAULT_CONFIG as CFG
from ...stages.textstats import _LANG_MARKERS


def _pq(sf_dir: str, table: str, columns=None):
    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _pq_nrows(sf_dir: str, table: str) -> int:
    """Row count straight from parquet footer metadata (no read)."""
    import pyarrow.parquet as pq
    return pq.read_metadata(f"{sf_dir}/{table}.parquet").num_rows


def _cents(x) -> pa.Array:
    return pc.cast(pc.round(pc.multiply(x, 100)), pa.int64())


# ---------------------------------------------------------------------------
# relational parity (REL store-build analytics analogs, SURVEY §2.5/2.6)
# ---------------------------------------------------------------------------


__all__ = ['CFG', 'Count', 'Sum', '_LANG_MARKERS', '_cents', '_pq', '_pq_nrows', 'annotations', 'np', 'os', 'pa', 'pc', 'rd']

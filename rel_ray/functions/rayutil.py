"""Ray Dataset utilities: join-free keyed co-grouping.

Why no ``Dataset.join`` anywhere in this engine (measured, Ray 2.49):

  * Ray's hash-shuffle join partitions rows with a **per-row Python
    ``hash(tuple)`` loop** (``ray/data/_internal/arrow_ops/transform_pyarrow
    .py::hash_partition``) — O(n) interpreter work on every shuffled row.
  * Its per-partition finalize calls ``pa.Table.join`` on schema-less empty
    tables whenever a hash partition receives zero rows on either side,
    raising ``ArrowInvalid`` — i.e. joins crash on empty datasets and on
    skewed small inputs.

``groupby`` uses the sort-based shuffle (vectorized Arrow sort, handles empty
inputs), so every equi-join here is re-expressed as a co-group:
tag each side, union, ``groupby(key).map_groups(combine)``. Group sizes in
this engine are bounded (block caps, one rep per key), so the per-group
Python call overhead is bounded too.
"""

from __future__ import annotations

from typing import Callable

import pyarrow as pa


def tagged_union(left, right, *, left_tag_schema: pa.Schema,
                 right_tag_schema: pa.Schema):
    """Union two datasets after the callers projected them to one schema.

    The caller guarantees both sides already share the schema (column names,
    order and types); this helper just asserts intent in one place.
    """
    assert [f.name for f in left_tag_schema] == [f.name for f in right_tag_schema]
    return left.union(right)


def cogroup_map(union_ds, key: str | list[str], fn: Callable[[pa.Table], pa.Table]):
    """groupby(key).map_groups with a named wrapper (Ray requires __name__)."""

    def cogroup_fn(group: pa.Table) -> pa.Table:
        return fn(group)

    return union_ds.groupby(key).map_groups(cogroup_fn, batch_format="pyarrow")

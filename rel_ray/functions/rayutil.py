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


# ---------------------------------------------------------------------------
# bucketed group application — the engine's shuffle-reduce primitive
# ---------------------------------------------------------------------------
#
# ``groupby(key).map_groups(fn)`` invokes fn once per DISTINCT KEY — measured
# ~0.2 ms of per-group machinery, which at 80k mostly-singleton LSH keys cost
# 16 s for 241 output rows. The engine therefore hash-buckets keys into
# `num_buckets` partitions and runs ONE map_groups call per bucket; the
# callback gets the whole bucket sorted by key and processes key segments
# vectorized (numpy/arrow change-point detection). Per-call Python is now
# O(num_buckets), independent of key cardinality — the same structure a real
# shuffle-reduce has, with num_buckets playing the reducer-count role.

BUCKET_COL = "__bucket"


class phase_timer:
    """stderr timing of driver-side phases (enabled via REL_RAY_PROFILE=1);
    bench.py --scaling scrapes the '[linkage-profile]' lines into the
    per-leg scaling evidence."""

    def __init__(self, name: str):
        self.name = name

    def __enter__(self):
        import time
        self.t0 = time.time()
        return self

    def __exit__(self, *exc):
        import os
        import sys
        import time
        if os.environ.get("REL_RAY_PROFILE", "") not in ("", "0"):
            print(f"[linkage-profile] {self.name}: "
                  f"{time.time() - self.t0:.3f}s",
                  file=sys.stderr, flush=True)


def _bucket_of(col: pa.ChunkedArray | pa.Array, num_buckets: int) -> pa.Array:
    import numpy as np

    from .hashing import splitmix64
    from .shingles import string_hash_u64

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
        h = string_hash_u64(col)
    else:
        arr = np.asarray(col)
        if arr.dtype.itemsize != 8:
            # widen narrow ints (int32 keys etc.) BEFORE the u64 view — a
            # raw .view() on a 4-byte dtype halves the array length and
            # silently mis-buckets every row
            arr = arr.astype(np.int64)
        h = splitmix64(arr.view(np.uint64))
    return pa.array((h % np.uint64(num_buckets)).astype(np.int64))


def bucketed_group_apply(
    ds,
    key_cols: str | list[str],
    fn: Callable[[pa.Table], pa.Table],
    *,
    num_buckets: int = 64,
    sort_cols: list[tuple[str, str]] | None = None,
):
    """Apply `fn` to hash-buckets of rows sharing key values.

    `fn` receives one bucket table sorted by key_cols (+ optional extra
    sort_cols) and MUST handle multiple distinct keys per call (use
    segment_starts). All rows with equal keys are guaranteed to be in the
    same bucket call.
    """
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    order = [(k, "ascending") for k in keys] + list(sort_cols or [])

    def add_bucket(t: pa.Table) -> pa.Table:
        b = _bucket_of(t.column(keys[0]), num_buckets)
        if len(keys) > 1:
            import numpy as np
            acc = np.asarray(b, dtype=np.int64)
            for k in keys[1:]:
                extra = np.asarray(_bucket_of(t.column(k), num_buckets),
                                   dtype=np.int64)
                acc = (acc * 1000003 + extra) % num_buckets
            b = pa.array(acc)
        return t.append_column(BUCKET_COL, b)

    def apply_bucket(group: pa.Table) -> pa.Table:
        g = group.drop_columns([BUCKET_COL]).sort_by(order)
        return fn(g)

    return (ds.map_batches(add_bucket, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby(BUCKET_COL)
            .map_groups(apply_bucket, batch_format="pyarrow"))


# per-worker-process cache for broadcast objects: Ray re-DESERIALIZES an
# object on every ray.get, so a 100k-entry dict fetched in each of 512 tasks
# costs ~40 s of unpickling; cached per process it costs one fetch per worker
_BROADCAST_CACHE: dict = {}


def get_broadcast(ref):
    import ray as _ray

    if not isinstance(ref, _ray.ObjectRef):
        return ref
    key = ref.hex()
    v = _BROADCAST_CACHE.get(key)
    if v is None:
        v = _BROADCAST_CACHE.setdefault(key, _ray.get(ref))
    return v


# broadcast-dict cache: the driver broadcasts the (zero-copy Arrow) map TABLE
# and each worker builds the Python dict ONCE per process — moving the
# O(vocabulary) dict construction off the driver's critical path and onto the
# workers in parallel (it was a measured piece of the flagship's serial floor)
_BROADCAST_DICT_CACHE: dict = {}


def get_broadcast_dict(ref, key_col: str, val_col: str) -> dict:
    import ray as _ray

    ck = (ref.hex() if isinstance(ref, _ray.ObjectRef) else id(ref),
          key_col, val_col)
    d = _BROADCAST_DICT_CACHE.get(ck)
    if d is None:
        tab = get_broadcast(ref)
        d = dict(zip(tab.column(key_col).to_pylist(),
                     tab.column(val_col).to_pylist()))
        _BROADCAST_DICT_CACHE[ck] = d
    return d


def collect_table(ds, empty_schema: pa.Schema | None = None) -> pa.Table:
    """Materialize a SMALL dataset into one driver-side Arrow table."""
    tabs = [pa.table(b) for b in ds.iter_batches(batch_format="pyarrow")]
    if empty_schema is not None:
        tabs.insert(0, empty_schema.empty_table())
    if not tabs:
        raise ValueError("collect_table on empty dataset needs empty_schema")
    return pa.concat_tables(tabs, promote_options="default")


_STRICT = object()


def dict_lookup(col, mapping: dict, *, default=_STRICT,
                default_to_key: bool = False,
                value_type: pa.DataType | None = None) -> pa.Array:
    """Map a string column through a Python dict at O(distinct) Python cost.

    dictionary-encodes the column (C++ hash table), maps only the DISTINCT
    values through the dict, then gathers with one vectorized take — per-batch
    interpreter work drops from O(rows) to O(distinct-in-batch), which for
    mention columns is typically 10–100× smaller. `default_to_key`: missing
    keys map to themselves; with the default sentinel a missing key raises
    (same strictness as mapping[k]).
    """
    import pyarrow.compute as pc

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    enc = pc.dictionary_encode(col)
    keys = enc.dictionary.to_pylist()
    if default_to_key:
        vals = [mapping.get(k, k) for k in keys]
    elif default is _STRICT:
        vals = [mapping[k] for k in keys]
    else:
        vals = [mapping.get(k, default) for k in keys]
    return pa.array(vals, type=value_type or pa.string()).take(enc.indices)


class DropCounter:
    """Distributed drop counter (SURVEY §2.3: skew caps must be *accounted*,
    never silent): a zero-CPU named actor; workers fire-and-forget increments
    only when drops actually happen, the driver reads totals after the
    consuming execution. Works unchanged on a multi-node cluster."""

    def __init__(self, name: str = "rel_ray_drop_counter"):
        import ray as _ray

        @_ray.remote(num_cpus=0)
        class _Counter:
            def __init__(self):
                self.counts: dict = {}

            def add(self, key: str, n: int):
                self.counts[key] = self.counts.get(key, 0) + int(n)

            def get(self) -> dict:
                return dict(self.counts)

        # named + get_if_exists: one shared counter per driver job (dies with
        # the job; NOT detached, so tests/sessions never leak actors)
        self._actor = _Counter.options(name=name, get_if_exists=True).remote()

    def add(self, key: str, n: int) -> None:
        if n:
            self._actor.add.remote(key, n)

    def totals(self, *, expect_keys=(), timeout_s: float = 5.0) -> dict:
        """Current totals. Increments are fire-and-forget from worker
        tasks, so a read issued immediately after an execution can race
        an in-flight add — pass ``expect_keys`` to poll briefly until
        those keys appear (or the timeout passes)."""
        import time as _time

        import ray as _ray

        deadline = _time.monotonic() + timeout_s
        while True:
            got = _ray.get(self._actor.get.remote())
            if all(k in got for k in expect_keys) or                     _time.monotonic() >= deadline:
                return got
            _time.sleep(0.1)


def adaptive_buckets(nrows: int, max_buckets: int,
                     target_rows: int = 2000) -> int:
    """Bucket count for a known row count: ~target_rows per bucket, capped.

    Hash-bucket semantics are correct for ANY bucket count (all same-key
    rows land together); the count only trades per-group machinery cost
    (measured ~15-20 ms per map_groups group in Ray 2.49 — 512 buckets on a
    5k-row table cost 10 s where 32 cost 2.3 s) against per-bucket memory.
    Callers that have a materialized input should pass its count here
    instead of using a fixed bucket count.

    ONLY for overhead-dominated group functions (segment min/max, vectorized
    shifts, membership filters). A compute-heavy group fn (quadratic pair
    generation like simjoin.SegmentAllPairs) wants MANY small buckets for
    load balancing — measured 3x slower at 40 buckets than 256 on the same
    input when the per-bucket work is the cost.
    """
    return max(8, min(max_buckets, nrows // target_rows))


def grouped_min(ds, key_col: str, val_col: str, *, num_buckets: int = 512):
    """(key, min(val)) per distinct key — bucketed segment-min.

    Measured 3.3× faster than Ray's built-in ``groupby(key).min(val)`` on
    string columns (21 s → 6.3 s for 2.1M rows @ 8 CPUs): the built-in
    aggregate pays per-group overhead on high-cardinality keys; here the
    in-bucket sort puts the min first in each segment and one vectorized
    `take` extracts all answers. Output column names: (key_col, val_col).
    """
    import numpy as np  # noqa: F401  (segment_starts returns np arrays)

    def seg_min(bucket: pa.Table) -> pa.Table:
        n = bucket.num_rows
        if n == 0:
            # derive empty schema from the input so non-string key/val
            # columns union cleanly with non-empty bucket outputs
            return pa.table({key_col: pa.array([], type=bucket.column(key_col).type),
                             val_col: pa.array([], type=bucket.column(val_col).type)})
        starts = pa.array(segment_starts(bucket.column(key_col)))
        return pa.table({key_col: bucket.column(key_col).take(starts),
                         val_col: bucket.column(val_col).take(starts)})

    # combiner pre-fold: one (key, min val) per distinct key per BATCH
    # before the bucket exchange — on the flagship's rep-map the exchange
    # drops from 9.7M record rows to ~vocabulary-per-block rows (~5×
    # fewer bytes through the all-to-all); identical result, the per-batch
    # sort is the same work the bucket sort would have done anyway
    def local_fold(t: pa.Table) -> pa.Table:
        t = t.select([key_col, val_col])
        if t.num_rows:
            t = t.sort_by([(key_col, "ascending"), (val_col, "ascending")])
            starts = pa.array(segment_starts(t.column(key_col)))
            t = pa.table({key_col: t.column(key_col).take(starts),
                          val_col: t.column(val_col).take(starts)})
        return t

    skinny = ds.map_batches(local_fold,
                            batch_format="pyarrow", zero_copy_batch=True)
    return bucketed_group_apply(skinny, key_col, seg_min,
                                num_buckets=num_buckets,
                                sort_cols=[(val_col, "ascending")])


def segment_starts(col: pa.ChunkedArray | pa.Array) -> "object":
    """Start indices of equal-value runs in a sorted column → np.int64 array.

    For multi-column keys call once per column and OR the change masks.
    """
    import numpy as np
    import pyarrow.compute as pc

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    change = np.ones(n, dtype=bool)
    neq = pc.not_equal(col.slice(1), col.slice(0, n - 1))
    change[1:] = np.asarray(pc.fill_null(neq, True))
    return np.nonzero(change)[0]


def global_topk(ds, sort_keys: list[tuple[str, str]], k: int) -> pa.Table:
    """Global top-k rows WITHOUT a global sort: per-batch local top-k (one
    in-memory sort_by per batch, slice k) then one driver-side reduce over
    at most k × num_blocks rows.

    The scale-correct replacement for ``ds.sort(...).limit(k)`` — a full
    sort moves every block through an all-to-all exchange to keep k rows;
    this moves k rows per block. Deterministic for deterministic sort_keys
    (callers must include a unique tie-break column).
    """

    def local(t: pa.Table) -> pa.Table:
        if t.num_rows > k:
            t = t.sort_by(sort_keys).slice(0, k)
        return t

    pruned = ds.map_batches(local, batch_format="pyarrow",
                            zero_copy_batch=True)
    tabs = [pa.table(b) for b in pruned.iter_batches(batch_format="pyarrow")]
    if not tabs:
        base = ds.schema()
        if base is None:  # empty dataset with unresolvable lazy schema
            return pa.table({})
        return getattr(base, "base_schema", base).empty_table()
    out = pa.concat_tables(tabs, promote_options="default")
    return out.sort_by(sort_keys).slice(0, k)


# vectorized string->int64 lookup over a broadcast table: the per-process
# Python-dict build (get_broadcast_dict) was MEASURED as the flagship's
# whole consume-phase floor at bench scale (17.3 s first count vs 1.1 s
# re-count at 32 CPUs, 4 vocab-sized dicts per process); a sorted fixed-
# width-unicode numpy index builds ~4x faster (0.63 s vs 2.4 s at 1.4M
# keys) and makes every per-batch lookup a C searchsorted instead of a
# Python dict sweep over the batch's distinct values.
_STR_INDEX_CACHE: dict = {}


def get_broadcast_str_index(ref, key_col: str, code_col: str):
    """Per-process cached (sorted U-dtype key array, int64 codes in that
    order) built from a broadcast Arrow table once per worker process."""
    import ray as _ray

    ck = (ref.hex() if isinstance(ref, _ray.ObjectRef) else id(ref),
          key_col, code_col)
    idx = _STR_INDEX_CACHE.get(ck)
    if idx is None:
        import numpy as np
        tab = get_broadcast(ref)
        col = tab.column(key_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        ku = np.array(col.to_numpy(zero_copy_only=False), dtype="U")
        order = np.argsort(ku, kind="stable")
        codes = np.asarray(tab.column(code_col), dtype=np.int64)[order]
        idx = _STR_INDEX_CACHE.setdefault(ck, (ku[order], codes))
    return idx


def str_index_lookup(col, index, *, default: int = -1) -> "object":
    """Map a string column through a (sorted keys, codes) index from
    get_broadcast_str_index -> np.int64 array (``default`` for misses).
    Per-batch cost: one dictionary_encode (C++ hash over the batch) + one
    searchsorted over the batch's DISTINCT values — no Python per value."""
    import numpy as np
    import pyarrow.compute as pc

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    ku_s, codes = index
    enc = pc.dictionary_encode(col)
    bn = np.array(enc.dictionary.to_numpy(zero_copy_only=False), dtype="U")
    if len(ku_s) == 0:
        out = np.full(len(bn), default, dtype=np.int64)
    else:
        pos = np.searchsorted(ku_s, bn)
        pos_c = np.minimum(pos, len(ku_s) - 1)
        out = np.where(ku_s[pos_c] == bn, codes[pos_c], default)
    return out[np.asarray(enc.indices, dtype=np.int64)]


def build_hash_str_index(col, codes) -> tuple | None:
    """Driver-built exact string->code index: (sorted u64 hashes, codes in
    that order). Returns None when any two DISTINCT keys collide (caller
    falls back to get_broadcast_str_index), so lookups of keys KNOWN to be
    in the vocabulary are exact — the collision check upgrades a bucketing
    hash into an equality structure for the closed-vocabulary case. Build
    is one vectorized hash + argsort on the driver; workers receive the
    ready arrays by broadcast and pay ZERO per-process setup (the Python
    dict build this replaces was the measured consume-phase floor)."""
    import numpy as np

    from .shingles import string_hash_u64

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    h = string_hash_u64(col)
    order = np.argsort(h, kind="stable")
    hs = h[order]
    if len(hs) > 1 and (hs[1:] == hs[:-1]).any():
        return None
    return hs, np.asarray(codes, dtype=np.int64)[order]


def hash_str_index_lookup(col, index, *, default: int = -1):
    """Map a string column through a build_hash_str_index structure ->
    np.int64 codes. EXACT only for keys that are members of the indexed
    vocabulary (the index build proved those hashes collision-free);
    non-member keys map to ``default`` unless they collide — callers must
    only pass columns whose non-default values are vocabulary members."""
    import numpy as np
    import pyarrow.compute as pc

    from .shingles import string_hash_u64

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if len(col) == 0:
        return np.empty(0, dtype=np.int64)
    hs, codes = index
    enc = pc.dictionary_encode(col)
    bh = string_hash_u64(enc.dictionary)
    if len(hs) == 0:
        out = np.full(len(bh), default, dtype=np.int64)
    else:
        pos = np.searchsorted(hs, bh)
        pos_c = np.minimum(pos, len(hs) - 1)
        out = np.where(hs[pos_c] == bh, codes[pos_c], default)
    return out[np.asarray(enc.indices, dtype=np.int64)]


def sever_lineage(mat_ds):
    """Rebuild a MATERIALIZED dataset from its own block refs, dropping the
    accumulated plan/lineage metadata.

    Why this exists (measured, tiny 12-node graph, 4 CPUs): a loop that
    carries state through chained cogroup joins slows down ~2-3x PER
    ITERATION even with stable block counts and materialize() every round
    — materialize keeps the upstream plan DAG (for recovery), and with
    two joins per step the retained graph compounds until executor
    bookkeeping dominates (2.5 s -> 41.7 s by iteration 5). Rebuilding
    from block refs is zero-copy (refs, not rows — nothing touches the
    driver) and flattens the same loop to a constant 1.7 s/iter.

    Use on loop-carried state in iterative algorithms (HITS, PageRank's
    cogroup fallback, match-merge). The trade: recovery lineage is gone —
    a lost block after severing fails the job instead of recomputing,
    which is the right trade inside a checkpointed pipeline."""
    import ray.data as rd

    return rd.from_arrow_refs(mat_ds.to_arrow_refs()).materialize()

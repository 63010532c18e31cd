"""Table profiling: one pass, one row of stats per column.

The data-quality step a training pipeline runs on every new drop before
anything else: per column — row count, null count, distinct count, min /
max.

Ray-Data-first: a single streaming map_batches produces ONE partial-stats
row per (batch, column) — min/max/nulls fold associatively, distincts ride
as HLL register blobs (the engine's mergeable-sketch combiner, exact below
``exact_distinct_max`` via a value set) — and the driver folds the
O(batches × columns) partials. No shuffle, nothing data-sized leaves a
task.

Typed min/max channels: partials carry min/max in per-family columns
(int64 / float64 / string) and the driver folds each family with its own
comparison — folding on stringified values would silently give
lexicographic min ('10' < '9'), the classic profiling bug.

REL parity anchor: REL's store build prints corpus statistics (surface
form counts, candidate coverage — REL:src/REL/wikipedia_yago_freq.py
logging) as a side effect; here profiling is a first-class operator.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.hashing import splitmix64

_P = 14


def _channel(typ: pa.DataType) -> str:
    if pa.types.is_integer(typ) or pa.types.is_timestamp(typ):
        return "i"
    if pa.types.is_floating(typ):
        return "f"
    return "s"


def profile_table(ds, *, columns: list[str],
                  exact_distinct_max: int = 100_000) -> pa.Table:
    """Returns a pyarrow Table: (column, n_rows, n_nulls, n_distinct,
    distinct_exact, min, max) — min/max/distinct over non-null values;
    min/max rendered as strings in the output (int64 exactly; timestamps
    as ISO text via Arrow's cast).

    Distinct counting is EXACT while a column's running value set stays
    ≤ ``exact_distinct_max`` (per-batch unique → driver set union), and
    switches to HyperLogLog (p=14, ~0.8% error) beyond — the bounded-
    memory scale path; ``distinct_exact`` marks which.
    """
    from ..functions.shingles import string_hash_u64
    from .sketches import hll_estimate, hll_fold

    def partial(t: pa.Table) -> pa.Table:
        rows = []
        for c in columns:
            col = t.column(c)
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            valid = col.drop_null()
            uniq = pc.unique(valid)
            if pa.types.is_string(uniq.type) or pa.types.is_large_string(
                    uniq.type):
                h = string_hash_u64(uniq)
            else:
                arr = np.asarray(uniq)
                if arr.dtype.kind == "M":
                    arr = arr.view(np.int64)
                if arr.dtype.kind == "f":
                    arr = arr.view(np.int64) if arr.dtype.itemsize == 8 \
                        else arr.astype(np.float64).view(np.int64)
                if arr.dtype.itemsize != 8:
                    arr = arr.astype(np.int64)
                h = splitmix64(arr.view(np.uint64))
            regs = hll_fold(h, np.zeros(len(h), dtype=np.int64), 1, _P)[0]
            ch = _channel(col.type)
            mn = pc.min(valid).as_py() if len(valid) else None
            mx = pc.max(valid).as_py() if len(valid) else None
            if ch == "i" and mn is not None and not isinstance(mn, int):
                # timestamps: fold on the int64 epoch view, render later
                mn = pc.min(valid.view(pa.int64())).as_py()
                mx = pc.max(valid.view(pa.int64())).as_py()
            if ch == "s" and mn is not None and not isinstance(mn, str):
                # non-string fallback channel (bool, decimal, ...): fold on
                # the str() rendering — pa.array([True], type=string)
                # raises ArrowTypeError otherwise
                mn, mx = str(mn), str(mx)
            rows.append((c, len(col), col.null_count,
                         mn if ch == "i" else None,
                         mx if ch == "i" else None,
                         mn if ch == "f" else None,
                         mx if ch == "f" else None,
                         mn if ch == "s" else None,
                         mx if ch == "s" else None,
                         uniq.cast(pa.large_string()).to_pylist()
                         if len(uniq) <= exact_distinct_max else None,
                         regs.tobytes()))
        names = ["column", "n_rows", "n_nulls", "min_i", "max_i",
                 "min_f", "max_f", "min_s", "max_s", "uniq", "regs"]
        types = [pa.string(), pa.int64(), pa.int64(), pa.int64(),
                 pa.int64(), pa.float64(), pa.float64(), pa.string(),
                 pa.string(), pa.list_(pa.large_string()), pa.binary()]
        return pa.table({n: pa.array([r[j] for r in rows], type=ty)
                         for j, (n, ty) in enumerate(zip(names, types))})

    col_types = {}
    base = ds.schema()
    if base is not None:
        col_types = {f.name: f.type for f in base.base_schema}

    def local_fold(t: pa.Table) -> pa.Table:
        # worker-level pre-fold of partial rows (≤ one output row per
        # column per 64 input rows): every stat folds associatively, so
        # the driver sees B/64 rows instead of B × columns
        groups: dict[str, list[int]] = {}
        for i in range(t.num_rows):
            groups.setdefault(t.column("column")[i].as_py(), []).append(i)
        out_rows = []
        for cname, idxs in groups.items():
            def vals(col):
                return [t.column(col)[i].as_py() for i in idxs]

            def fold_mm(col, agg):
                vs = [v for v in vals(col) if v is not None]
                return agg(vs) if vs else None

            uniq_parts = vals("uniq")
            if any(u is None for u in uniq_parts):
                uniq = None
            else:
                merged = set()
                for u in uniq_parts:
                    merged.update(u)
                uniq = (sorted(merged)
                        if len(merged) <= exact_distinct_max else None)
            regs = np.zeros(1 << _P, dtype=np.uint8)
            for i in idxs:
                np.maximum(regs, np.frombuffer(
                    t.column("regs")[i].as_py(), dtype=np.uint8),
                    out=regs)
            out_rows.append((
                cname, sum(vals("n_rows")), sum(vals("n_nulls")),
                fold_mm("min_i", min), fold_mm("max_i", max),
                fold_mm("min_f", min), fold_mm("max_f", max),
                fold_mm("min_s", min), fold_mm("max_s", max),
                uniq, regs.tobytes()))
        names = ["column", "n_rows", "n_nulls", "min_i", "max_i",
                 "min_f", "max_f", "min_s", "max_s", "uniq", "regs"]
        types = [pa.string(), pa.int64(), pa.int64(), pa.int64(),
                 pa.int64(), pa.float64(), pa.float64(), pa.string(),
                 pa.string(), pa.list_(pa.large_string()), pa.binary()]
        return pa.table({nm: pa.array([r[j] for r in out_rows], type=ty)
                         for j, (nm, ty) in enumerate(zip(names, types))})

    state = {c: {"rows": 0, "nulls": 0, "min": None, "max": None,
                 "set": set(), "exact": True,
                 "regs": np.zeros(1 << _P, dtype=np.uint8)}
             for c in columns}
    parts = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True).map_batches(
        local_fold, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=64)
    for b in parts.iter_batches(batch_format="pyarrow"):
        t = pa.table(b)
        for i in range(t.num_rows):
            c = t.column("column")[i].as_py()
            s = state[c]
            s["rows"] += t.column("n_rows")[i].as_py()
            s["nulls"] += t.column("n_nulls")[i].as_py()
            for ch in ("i", "f", "s"):
                mn = t.column(f"min_{ch}")[i].as_py()
                mx = t.column(f"max_{ch}")[i].as_py()
                if mn is not None:
                    s["min"] = mn if s["min"] is None else min(s["min"], mn)
                    s["max"] = mx if s["max"] is None else max(s["max"], mx)
            u = t.column("uniq")[i].as_py()
            if u is None or len(s["set"]) + len(u) > exact_distinct_max:
                s["exact"] = False
                s["set"].clear()
            elif s["exact"]:
                s["set"].update(u)
            np.maximum(s["regs"],
                       np.frombuffer(t.column("regs")[i].as_py(),
                                     dtype=np.uint8), out=s["regs"])

    def render(c, v):
        if v is None:
            return None
        typ = col_types.get(c)
        if typ is not None and pa.types.is_timestamp(typ):
            return str(pa.scalar(v, type=pa.int64()).cast(typ).as_py())
        return str(v)

    return pa.table({
        "column": pa.array(columns),
        "n_rows": pa.array([state[c]["rows"] for c in columns],
                           type=pa.int64()),
        "n_nulls": pa.array([state[c]["nulls"] for c in columns],
                            type=pa.int64()),
        "n_distinct": pa.array(
            [len(state[c]["set"]) if state[c]["exact"]
             else int(round(hll_estimate(state[c]["regs"])))
             for c in columns], type=pa.int64()),
        "distinct_exact": pa.array([state[c]["exact"] for c in columns]),
        "min": pa.array([render(c, state[c]["min"]) for c in columns],
                        type=pa.string()),
        "max": pa.array([render(c, state[c]["max"]) for c in columns],
                        type=pa.string()),
    })


def histogram_fixed(ds, *, val_col: str, lo: int, hi: int, n_bins: int):
    """Exact fixed-width histogram over an integer column: one row per
    bin (bin, lo_edge, hi_edge, cnt), values outside [lo, hi) ignored.
    Integer bin arithmetic ON PURPOSE (bin = (v - lo) // width) so an
    ANSI-SQL oracle reproduces the counts bit-for-bit — no float edges.

    Combiner shape: each batch emits one n_bins-long partial (np.bincount)
    as bin rows; a groupby(bin) sum merges them — the shuffle carries
    O(n_bins × batches) rows, never the data."""
    from ray.data.aggregate import Sum

    assert n_bins > 0 and hi > lo
    width = (hi - lo + n_bins - 1) // n_bins

    def partial(t: pa.Table) -> pa.Table:
        v = np.asarray(t.column(val_col), dtype=np.int64)
        v = v[(v >= lo) & (v < hi)]
        b = (v - lo) // width
        counts = np.bincount(b, minlength=n_bins)
        return pa.table({"bin": pa.array(np.arange(n_bins, dtype=np.int64)),
                         "cnt": pa.array(counts.astype(np.int64))})

    agg = (ds.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby("bin").aggregate(Sum("cnt")))
    return agg.map_batches(
        lambda t: pa.table({
            "bin": t.column("bin"),
            "lo_edge": pc.add(pc.multiply(t.column("bin"), width), lo),
            "hi_edge": pc.add(pc.multiply(
                pc.add(t.column("bin"), 1), width), lo),
            "cnt": pc.cast(t.column(f"sum(cnt)"), pa.int64())}),
        batch_format="pyarrow", zero_copy_batch=True)

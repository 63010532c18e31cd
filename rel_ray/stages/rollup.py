"""Multi-level (ROLLUP) aggregation: one pass over the fact table, then a
cascade of tiny re-aggregations over already-aggregated levels.

REL parity anchor: REL's store build aggregates mention counts at several
granularities (surface form, surface+entity — REL:src/REL/
wikipedia_yago_freq.py::compute_wiki counts then renormalizes per prefix);
SQL spells the same shape GROUP BY ROLLUP(a, b).

Scale design: the fact table is touched ONCE — a per-batch Arrow group_by
partial shrinks each batch to one row per distinct dim-combo BEFORE the
exchange, then a single ``groupby(dims)`` produces the finest level. Every
coarser level re-aggregates the PREVIOUS level's output (cardinality =
distinct combos, not rows), so levels after the first cost next to
nothing and nothing ever materializes driver-side except the one-row
grand total.
"""

from __future__ import annotations

import pyarrow as pa


def _named_sum(t: pa.Table, keys: list[str], sum_col: str,
               out_col: str) -> pa.Table:
    """Select ``keys + [sum_col]`` BY NAME and rename the sum column to
    ``out_col``. Never relies on the aggregate output's column ORDER —
    pyarrow/Ray have changed key-vs-aggregate ordering across versions,
    and a positional rename would silently mislabel the sum as a dim."""
    t = t.select(keys + [sum_col])
    return t.rename_columns(keys + [out_col])


def rollup_sum(ds, *, dims: list[str], value_col: str):
    """SUM ``value_col`` at every ROLLUP level of ``dims``.

    Output schema: ``dims`` + ``value_col``; rolled-up dimension columns
    are NULL (SQL ROLLUP convention). Levels: (d1..dn), (d1..dn-1), ...,
    (), unioned into one Dataset.
    """
    import ray.data as rd
    from ray.data.aggregate import Sum

    base = ds.schema().base_schema
    dim_types = {f.name: f.type for f in base if f.name in dims}
    val_type = next(f.type for f in base if f.name == value_col)

    def partial(t: pa.Table) -> pa.Table:
        g = t.select(dims + [value_col]).group_by(dims)
        out = g.aggregate([(value_col, "sum")])
        return _named_sum(out, dims, f"{value_col}_sum", value_col)

    finest = (ds.map_batches(partial, batch_format="pyarrow",
                             zero_copy_batch=True)
              .groupby(dims).aggregate(Sum(value_col)))
    finest = finest.map_batches(
        lambda t: _named_sum(t, dims, f"sum({value_col})", value_col),
        batch_format="pyarrow", zero_copy_batch=True)

    def pad(level_dims: list[str]):
        def f(t: pa.Table) -> pa.Table:
            cols = {}
            for d in dims:
                cols[d] = (t.column(d) if d in level_dims
                           else pa.nulls(t.num_rows, type=dim_types[d]))
            cols[value_col] = t.column(value_col)
            return pa.table(cols)
        return f

    levels = [finest.map_batches(pad(dims), batch_format="pyarrow",
                                 zero_copy_batch=True)]
    prev = finest
    for i in range(len(dims) - 1, -1, -1):
        keep = dims[:i]
        if keep:
            lvl = prev.groupby(keep).aggregate(Sum(value_col))
            lvl = lvl.map_batches(
                lambda t, k=keep: _named_sum(
                    t, k, f"sum({value_col})", value_col),
                batch_format="pyarrow", zero_copy_batch=True)
        else:
            # grand total: one global streaming reduce -> a 1-row dataset
            total = prev.aggregate(Sum(value_col))[f"sum({value_col})"]
            lvl = rd.from_arrow(pa.table({
                value_col: pa.array([total], type=val_type)}))
        levels.append(lvl.map_batches(pad(keep), batch_format="pyarrow",
                                      zero_copy_batch=True))
        prev = lvl
    out = levels[0]
    for lvl in levels[1:]:
        out = out.union(lvl)
    return out


def unpivot(ds, *, id_cols: list[str], value_cols: list[str],
            var_name: str = "metric", value_name: str = "value"):
    """Wide → long reshape (SQL UNPIVOT, the inverse of the engine's
    pivot): each input row becomes len(value_cols) rows
    (id_cols..., metric, value).

    Embarrassingly parallel — one map_batches, no shuffle: per batch one
    table slice per measure column (zero-copy id columns, constant metric
    column), concatenated. Output is len(value_cols) × input rows; value
    columns must share one type (SQL's UNPIVOT contract).
    """
    def long(t: pa.Table) -> pa.Table:
        n = t.num_rows
        parts = []
        for c in value_cols:
            cols = {k: t.column(k) for k in id_cols}
            cols[var_name] = pa.array([c] * n, type=pa.string())
            cols[value_name] = t.column(c)
            parts.append(pa.table(cols))
        return pa.concat_tables(parts)

    return ds.map_batches(long, batch_format="pyarrow",
                          zero_copy_batch=True)


def cube_sum(ds, *, dims: list[str], value_col: str):
    """SUM at EVERY subset of ``dims`` (SQL GROUP BY CUBE): the finest
    level is computed once from the fact table (same partial-combine pass
    as rollup_sum), and every coarser subset re-aggregates the FINEST
    level's tiny output — 2^d - 1 extra aggregations over distinct-combo
    cardinality, never over the data. NULL marks rolled-up dimensions.
    Practical for the usual 2-4 dims (2^d levels)."""
    import itertools

    import ray.data as rd
    from ray.data.aggregate import Sum

    base = ds.schema().base_schema
    dim_types = {f.name: f.type for f in base if f.name in dims}
    val_type = next(f.type for f in base if f.name == value_col)

    def partial(t: pa.Table) -> pa.Table:
        g = t.select(dims + [value_col]).group_by(dims)
        return _named_sum(g.aggregate([(value_col, "sum")]), dims,
                          f"{value_col}_sum", value_col)

    finest = (ds.map_batches(partial, batch_format="pyarrow",
                             zero_copy_batch=True)
              .groupby(dims).aggregate(Sum(value_col)))
    finest = finest.map_batches(
        lambda t: _named_sum(t, dims, f"sum({value_col})", value_col),
        batch_format="pyarrow", zero_copy_batch=True).materialize()

    def pad(level_dims: tuple[str, ...]):
        def f(t: pa.Table) -> pa.Table:
            cols = {}
            for d in dims:
                cols[d] = (t.column(d) if d in level_dims
                           else pa.nulls(t.num_rows, type=dim_types[d]))
            cols[value_col] = t.column(value_col)
            return pa.table(cols)
        return f

    levels = [finest.map_batches(pad(tuple(dims)), batch_format="pyarrow",
                                 zero_copy_batch=True)]
    for r in range(len(dims) - 1, -1, -1):
        for keep in itertools.combinations(dims, r):
            if keep:
                lvl = finest.groupby(list(keep)).aggregate(Sum(value_col))
                lvl = lvl.map_batches(
                    lambda t, k=list(keep): _named_sum(
                        t, k, f"sum({value_col})", value_col),
                    batch_format="pyarrow", zero_copy_batch=True)
            else:
                total = finest.aggregate(Sum(value_col))[
                    f"sum({value_col})"]
                lvl = rd.from_arrow(pa.table({
                    value_col: pa.array([total], type=val_type)}))
            levels.append(lvl.map_batches(pad(keep),
                                          batch_format="pyarrow",
                                          zero_copy_batch=True))
    out = levels[0]
    for lvl in levels[1:]:
        out = out.union(lvl)
    return out

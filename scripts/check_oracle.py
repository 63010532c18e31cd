"""Local stand-in for the driver's correctness gate: run every queries()
entry and its oracle_sql() twin over the same sf dir; compare row count,
schema (column names) and an order-insensitive value hash.

Usage: python scripts/check_oracle.py [sf_dir] [query ...]
"""

import hashlib
import sys
import time

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa

    import ray.data

    if isinstance(res, ray.data.Dataset):
        tabs = [pa.table(b) for b in res.iter_batches(batch_format="pyarrow")]
        if not tabs:
            return pd.DataFrame()
        return pa.concat_tables(tabs, promote_options="default").to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def value_hash(df: pd.DataFrame) -> str:
    if df.empty:
        return "EMPTY"
    df = df[sorted(df.columns)]
    rows = df.astype(str).agg("|".join, axis=1).sort_values().tolist()
    return hashlib.sha256("\n".join(rows).encode()).hexdigest()[:16]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray
    ray.init(address="local", num_cpus=8, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_pass = n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            ray_df = to_pandas(fn(sf_dir))
        except Exception as e:
            print(f"FAIL {name}: ray query raised {type(e).__name__}: {e}")
            n_fail += 1
            continue
        wall = time.time() - t0
        if name not in oracles:
            print(f"ok   {name}: rows-only, {len(ray_df)} rows ({wall:.1f}s)")
            n_pass += 1
            continue
        try:
            sql_df = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL raised {e}")
            n_fail += 1
            continue
        problems = []
        if len(ray_df) != len(sql_df):
            problems.append(f"rows {len(ray_df)} vs {len(sql_df)}")
        if sorted(ray_df.columns) != sorted(sql_df.columns):
            problems.append(f"cols {sorted(ray_df.columns)} vs {sorted(sql_df.columns)}")
        if not problems and value_hash(ray_df) != value_hash(sql_df):
            problems.append("value-hash mismatch")
        if problems:
            print(f"FAIL {name}: {'; '.join(problems)} ({wall:.1f}s)")
            n_fail += 1
        else:
            print(f"ok   {name}: {len(ray_df)} rows match ({wall:.1f}s)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    ray.shutdown()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()

"""Local stand-in for the driver's correctness gate: run every queries()
entry and its oracle_sql() twin over the same sf dir; compare row count,
schema (column names) and an order-insensitive value hash.

Crash resilience: Ray can abort the whole process from inside its core
worker (observed once in round 2: ``reference_count.cc Check failed`` —
a Ray-internal bug, not catchable as a Python exception). The sweep
therefore runs in a CHILD process; the parent holds no Ray session, parses
the child's per-query result lines, and on an abnormal child exit resumes
a fresh child with the unreported queries — retrying the in-flight query
once before declaring it failed.

Usage: python scripts/check_oracle.py [sf_dir] [query ...]
       python scripts/check_oracle.py --changed [GIT_REF] [sf_dir]

``--changed`` selects only the queries plausibly affected by the working
tree's diff against GIT_REF (default HEAD): it takes the reverse-import
closure of every changed rel_ray module and keeps the queries whose wrapper
source references one of them, plus any ``q_*`` wrapper whose own lines a
queries.py hunk touches. Infra changes (__ray_entry__, scripts, conftest)
conservatively select everything. The full sweep stays the CI-cadence
check; --changed is the cheap per-commit gate over the untouched majority.
"""

import hashlib
import os
import subprocess
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


def run_child(sf_dir: str, names: list[str]) -> None:
    """Run the given queries in THIS process (one Ray session), printing
    one ``ok``/``FAIL`` line per query. Exits 0 when the sweep completes
    (failures are reported via lines; the parent aggregates)."""
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
    # crash injection for the resilience test: abort hard (as Ray's
    # reference_count.cc CHECK does) before running the named query, once
    inject = os.environ.get("CHECK_ORACLE_INJECT_CRASH")
    for name in names:
        if name not in qs:
            print(f"FAIL {name}: unknown query", flush=True)
            continue
        if inject and name == inject:
            marker = os.environ.get("CHECK_ORACLE_INJECT_MARKER")
            if marker and not os.path.exists(marker):
                open(marker, "w").close()
                os._exit(134)
        fn = qs[name]
        t0 = time.time()
        try:
            ray_df = to_pandas(fn(sf_dir))
        except Exception as e:
            print(f"FAIL {name}: ray query raised {type(e).__name__}: {e}",
                  flush=True)
            continue
        wall = time.time() - t0
        if name not in oracles:
            print(f"ok   {name}: rows-only, {len(ray_df)} rows ({wall:.1f}s)",
                  flush=True)
            continue
        try:
            sql_df = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL raised {e}", flush=True)
            continue
        problems = []
        if len(ray_df) != len(sql_df):
            problems.append(f"rows {len(ray_df)} vs {len(sql_df)}")
        if sorted(ray_df.columns) != sorted(sql_df.columns):
            problems.append(
                f"cols {sorted(ray_df.columns)} vs {sorted(sql_df.columns)}")
        if not problems and value_hash(ray_df) != value_hash(sql_df):
            problems.append("value-hash mismatch")
        if problems:
            print(f"FAIL {name}: {'; '.join(problems)} ({wall:.1f}s)",
                  flush=True)
        else:
            print(f"ok   {name}: {len(ray_df)} rows match ({wall:.1f}s)",
                  flush=True)
    ray.shutdown()
    sys.exit(0)


def _module_rdeps_closure(changed: set[str], repo: str) -> set[str]:
    """Reverse-import closure over rel_ray modules: start from the changed
    module basenames and add every module that (transitively) imports one.
    Import edges are read syntactically (``from .X import`` /
    ``from ..pkg.X import`` / ``from rel_ray.pkg.X import`` /
    ``from ..pkg import X`` lines) — conservative, no code execution."""
    import glob
    import re

    deps: dict[str, set[str]] = {}
    pat = re.compile(
        r"^\s*from\s+(?:rel_ray[.\w]*|\.+[\w.]*)\s+import\s+(.+)$|"
        r"^\s*from\s+(?:rel_ray\.|\.+)([\w.]+)\s+import\s",
        re.M)
    for path in glob.glob(os.path.join(repo, "rel_ray", "**", "*.py"),
                          recursive=True):
        mod = os.path.splitext(os.path.basename(path))[0]
        with open(path) as f:
            src = f.read()
        refs: set[str] = set()
        for m in pat.finditer(src):
            for grp in m.groups():
                if grp:
                    refs.update(re.findall(r"[A-Za-z_]\w*", grp))
        deps.setdefault(mod, set()).update(refs)
    out = set(changed)
    while True:
        grew = {m for m, refs in deps.items() if m not in out and refs & out}
        if not grew:
            return out
        out |= grew


def _changed_query_names(ref: str, entrymod) -> list[str] | None:
    """Queries affected by the diff vs ``ref``; None = run everything."""
    import inspect
    import re

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(["git", "diff", "--name-only", ref],
                       capture_output=True, text=True, cwd=repo)
    if r.returncode != 0:
        print(f"--changed: git diff vs {ref} failed; running everything")
        return None
    files = [f for f in r.stdout.split() if f.endswith(".py")
             # tests, bench and this script never change query results
             and not f.startswith(("tests/", "scripts/"))
             and f != "bench.py"]
    if not files:
        return []
    infra = [f for f in files if not f.startswith("rel_ray/")
             or f == "rel_ray/config.py"]
    if infra:
        print(f"--changed: infra files changed ({infra}); running everything")
        return None

    changed_mods = {os.path.splitext(os.path.basename(f))[0] for f in files}
    closure = _module_rdeps_closure(changed_mods, repo)

    qs = entrymod.queries()
    picked: set[str] = set()
    # wrapper-source references to any module in the closure
    word = re.compile(r"[A-Za-z_]\w*")
    for name, fn in qs.items():
        try:
            src = inspect.getsource(fn)
        except (OSError, TypeError):
            picked.add(name)
            continue
        if set(word.findall(src)) & closure:
            picked.add(name)
    # hunk-touched q_* wrappers inside queries.py itself
    if "queries" in changed_mods:
        h = subprocess.run(
            ["git", "diff", "-U0", ref, "--",
             "rel_ray/pipelines/queries.py"],
            capture_output=True, text=True, cwd=repo)
        spans = [(int(m.group(1)), int(m.group(1)) + max(int(m.group(2) or 1), 1))
                 for m in re.finditer(r"^@@ .*\+(\d+)(?:,(\d+))? @@",
                                      h.stdout, re.M)]
        for name, fn in qs.items():
            try:
                lines, start = inspect.getsourcelines(fn)
            except (OSError, TypeError):
                continue
            end = start + len(lines)
            if any(s < end and start < e for s, e in spans):
                picked.add(name)
    return [n for n in qs if n in picked]


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--run":
        run_child(sys.argv[2], sys.argv[3:])
        return

    argv = sys.argv[1:]
    changed_ref = None
    if argv and argv[0] == "--changed":
        argv.pop(0)
        changed_ref = "HEAD"
        if argv and not os.path.isdir(argv[0]) and argv[0] not in ("",):
            # a git ref (anything that isn't the sf dir)
            if not argv[0].startswith("/"):
                changed_ref = argv.pop(0)
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = argv[1:]

    # Parent holds no Ray session; it only needs the query NAMES in
    # registry order (building the dict executes nothing).
    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entrymod
    if changed_ref is not None:
        sel = _changed_query_names(changed_ref, entrymod)
        if sel is None:
            names = list(entrymod.queries())
        else:
            names = sel
        print(f"--changed vs {changed_ref}: {len(names)} of "
              f"{len(entrymod.queries())} queries selected")
        if not names:
            print("\n0 pass, 0 fail")
            sys.exit(0)
    else:
        names = [n for n in entrymod.queries() if not only or n in only]

    pending = list(names)
    retried: set[str] = set()
    n_pass = n_fail = 0
    while pending:
        proc = subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--run", sf_dir,
             *pending],
            stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True)
        assert proc.stdout is not None
        for line in proc.stdout:
            line = line.rstrip("\n")
            tag = line.split(" ", 1)[0]
            if tag in ("ok", "FAIL"):
                name = line.split()[1].rstrip(":")
                if pending and pending[0] == name:
                    pending.pop(0)
                print(line, flush=True)
                if tag == "ok":
                    n_pass += 1
                else:
                    n_fail += 1
        rc = proc.wait()
        if not pending:
            break
        if rc != 0:
            culprit = pending[0]
            if culprit in retried:
                print(f"FAIL {culprit}: session crashed twice (rc={rc})",
                      flush=True)
                pending.pop(0)
                n_fail += 1
            else:
                print(f"RETRY {culprit}: session crashed (rc={rc}); "
                      f"rerunning in a fresh session", flush=True)
                retried.add(culprit)
        # rc == 0 with pending left can't happen (child prints every
        # query), but the loop re-spawning on it is still correct.
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()

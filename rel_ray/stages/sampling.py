"""Deterministic sampling operators.

Stratified hash-sampling: membership depends ONLY on the row's id (a
Knuth-style multiplicative hash over integer arithmetic that an ANSI-SQL
oracle reproduces exactly) — so samples are reproducible across runs,
retries, cluster sizes and engines, and adding strata later never reshuffles
earlier decisions (REL parity anchor: REL's deterministic train/test corpus
splits, REL:src/REL/generate_train_test.py).

Why not ``Dataset.random_sample``: its membership is seeded per-execution,
not per-row — fine for one-off sampling (see q_sample_lineitem), wrong for
a resumable 100-TB pipeline where a retried block must re-draw the SAME
rows. Zero shuffles either way: one streaming filter pass.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# 2^31 modulus keeps every intermediate below 2^63 for ANY int64 id
# ((2^31-1) * KNUTH < 2^63), so the SQL twin never overflows BIGINT either.
_MOD = 2_147_483_648
_KNUTH = 2_654_435_761


def sample_bucket(ids) -> np.ndarray:
    """id -> deterministic bucket in [0, 10000). Integer-exact; the SQL twin
    is ``(((id % 2147483648 + 2147483648) % 2147483648) * 2654435761 % 2147483648) % 10000``."""
    x = np.asarray(pc.cast(ids, pa.int64())) % _MOD
    return (x * _KNUTH % _MOD) % 10000


def stratified_sample(ds, *, id_col: str, stratum_col: str,
                      rates_permyriad: dict[str, int],
                      default_permyriad: int = 0, batch_size: int = 8192):
    """Keep each row iff its deterministic id-bucket falls under its
    stratum's rate (in 1/10000 units). Unlisted strata use the default."""
    from ..functions.rayutil import dict_lookup

    def filt(t: pa.Table) -> pa.Table:
        bucket = sample_bucket(t.column(id_col))
        rate = np.asarray(dict_lookup(
            pc.cast(t.column(stratum_col), pa.string()), rates_permyriad,
            default=default_permyriad, value_type=pa.int64()))
        return t.filter(pa.array(bucket < rate))

    return ds.map_batches(filt, batch_format="pyarrow",
                          zero_copy_batch=True, batch_size=batch_size)


def sample_k_per_group(ds, *, group_col: str, id_col: str, k: int,
                       num_buckets: int = 256):
    """Deterministic exact-k per-group sample: the k rows with the
    smallest Knuth multiplicative hash of ``id_col`` within each group —
    a reproducible reservoir-sample analog (same rows on every run,
    every cluster size, and in SQL: ``QUALIFY row_number() OVER
    (PARTITION BY g ORDER BY ((id % 2147483648 + 2147483648) % 2147483648) * 2654435761
    % 2147483648, id) <= k`` — the module's overflow-safe Knuth hash,
    see ``sample_bucket``). Groups with ≤ k rows keep all rows. One
    bucket exchange sorted by (group, hash, id); winners are segment
    positions < k — no per-group Python.
    """
    from ..functions.rayutil import bucketed_group_apply, segment_starts

    def add_hash(t: pa.Table) -> pa.Table:
        x = np.asarray(pc.cast(t.column(id_col), pa.int64())) % _MOD
        return t.append_column("__h", pa.array(x * _KNUTH % _MOD))

    hashed = ds.map_batches(add_hash, batch_format="pyarrow",
                            zero_copy_batch=True)

    def head_k(bucket: pa.Table) -> pa.Table:
        n = bucket.num_rows
        if n == 0:
            return bucket.drop_columns(["__h"])
        starts = np.asarray(segment_starts(bucket.column(group_col)))
        lens = np.diff(np.append(starts, n))
        pos = np.arange(n, dtype=np.int64) - np.repeat(starts, lens)
        return bucket.filter(pa.array(pos < k)).drop_columns(["__h"])

    return bucketed_group_apply(
        hashed, group_col, head_k, num_buckets=num_buckets,
        sort_cols=[("__h", "ascending"), (id_col, "ascending")])


def budget_sample(ds, *, group_col: str, id_col: str, weight_col: str,
                  budget: int, num_buckets: int = 256):
    """Budget-constrained subset selection: per group, take rows in the
    deterministic Knuth-hash order until the running ``weight_col`` sum
    would exceed ``budget`` (inclusive prefix; SQL: ``QUALIFY
    SUM(w) OVER (PARTITION BY g ORDER BY hash, id) <= budget``).

    The token-budget corpus-selection op: "give me ~N tokens per
    language, sampled reproducibly" — same rows on every run, cluster
    size and engine. One bucket exchange; the prefix sum is one global
    cumsum minus per-segment bases (zero per-group Python).
    """
    from ..functions.rayutil import bucketed_group_apply, segment_starts

    def add_hash(t: pa.Table) -> pa.Table:
        x = np.asarray(pc.cast(t.column(id_col), pa.int64())) % _MOD
        return t.append_column("__h", pa.array(x * _KNUTH % _MOD))

    hashed = ds.map_batches(add_hash, batch_format="pyarrow",
                            zero_copy_batch=True)

    def take_budget(bucket: pa.Table) -> pa.Table:
        n = bucket.num_rows
        if n == 0:
            return bucket.drop_columns(["__h"])
        starts = np.asarray(segment_starts(bucket.column(group_col)))
        lens = np.diff(np.append(starts, n))
        w = np.asarray(bucket.column(weight_col), dtype=np.int64)
        cum = np.cumsum(w)
        offs = np.repeat(starts, lens)
        base = np.where(offs > 0, cum[np.maximum(offs - 1, 0)], 0)
        run = cum - base
        return bucket.filter(pa.array(run <= budget)).drop_columns(["__h"])

    return bucketed_group_apply(
        hashed, group_col, take_budget, num_buckets=num_buckets,
        sort_cols=[("__h", "ascending"), (id_col, "ascending")])


def weighted_bottomk(ds, *, id_col: str, weight_col: str, k: int,
                     carry_cols: list[str] | None = None,
                     batch_size: int = 8192):
    """Deterministic weighted k-row sample WITHOUT replacement
    (Efraimidis & Spirakis, IPL 2006, A-Res): each row draws
    u = (knuth_hash(id) + 0.5) / 2^31 in (0,1) and the k rows minimizing
    the exponential race key ln(1/u)/w win — inclusion probability
    proportional to weight at each of the k sequential draws, yet
    membership is a pure function of (id, weight): reproducible across
    runs, engines and cluster sizes, and mergeable across shards (the
    bottom-k-by-key frontier is associative).

    SQL twin (bit-matching: DuckDB's ln and / are the same IEEE-double
    libm ops numpy uses, and u is exactly representable):
    ``ORDER BY -ln((hash(id)+0.5)/2147483648.0)/w, id LIMIT k`` with the
    module's overflow-safe Knuth hash.

    Scale: per-batch local bottom-k prune, then one O(k x blocks) reduce —
    no shuffle, same shape as bottomk_sample. Weights must be > 0."""
    from ..functions.rayutil import global_topk

    keep = [id_col] + list(carry_cols or [])

    def local(t: pa.Table) -> pa.Table:
        x = np.asarray(pc.cast(t.column(id_col), pa.int64())) % _MOD
        u = (x * _KNUTH % _MOD + 0.5) / float(_MOD)
        w = np.asarray(t.column(weight_col), dtype=np.float64)
        if (w <= 0).any():
            raise ValueError("weighted_bottomk requires positive weights")
        out = pa.table({**{c: t.column(c) for c in keep},
                        "__key": pa.array(-np.log(u) / w)})
        if out.num_rows > k:
            out = out.sort_by([("__key", "ascending"),
                               (id_col, "ascending")]).slice(0, k)
        return out

    top = global_topk(ds.map_batches(local, batch_format="pyarrow",
                                     zero_copy_batch=True,
                                     batch_size=batch_size),
                      [("__key", "ascending"), (id_col, "ascending")], k)
    return top.drop_columns(["__key"])


def bottomk_sample(ds, *, id_col: str, k: int, carry_cols: list[str] | None = None,
                   batch_size: int = 8192):
    """Deterministic global k-row uniform sample WITHOUT replacement: the k
    rows with the smallest Knuth multiplicative hash of ``id_col`` (ties by
    id). The bottom-k sketch construction (Cohen & Kaplan, PODC'07): because
    membership is a pure function of the id, the sample is reproducible
    across runs/engines/cluster sizes, mergeable across shards, and
    CONSISTENT — growing the corpus only ever swaps rows in/out through the
    hash frontier, so longitudinal comparisons see overlapping samples.

    SQL twin: ``ORDER BY ((id % 2147483648 + 2147483648) % 2147483648) *
    2654435761 % 2147483648, id LIMIT k`` (the module's overflow-safe hash,
    see sample_bucket).

    Scale: per-batch local bottom-k prune, then one global sort over the
    <= k-per-block survivors — no full shuffle, driver never sees more than
    the result."""
    from ..functions.rayutil import global_topk

    keep = [id_col] + list(carry_cols or [])

    def local(t: pa.Table) -> pa.Table:
        x = np.asarray(pc.cast(t.column(id_col), pa.int64())) % _MOD
        out = pa.table({**{c: t.column(c) for c in keep},
                        "__h": pa.array(x * _KNUTH % _MOD)})
        if out.num_rows > k:
            out = out.sort_by([("__h", "ascending"),
                               (id_col, "ascending")]).slice(0, k)
        return out

    top = global_topk(ds.map_batches(local, batch_format="pyarrow",
                                     zero_copy_batch=True,
                                     batch_size=batch_size),
                      [("__h", "ascending"), (id_col, "ascending")], k)
    return (top.drop_columns(["__h"]) if "__h" in top.column_names
            else top)


def bottomk_vector_sample(ds, *, id_col: str, vec_col: str, k: int,
                          batch_size: int = 8192) -> "np.ndarray":
    """Deterministic UNBIASED training sample for codebook/centroid
    fitting: the bottom-k rows by Knuth id-hash (see bottomk_sample),
    stacked into a (<=k, d) float64 matrix in hash order. Replaces the
    head-of-corpus ``ds.limit(k)`` idiom — on a corpus sorted by
    time/source/value the head is a biased slice and the trained
    centroids skew with it; the hash frontier samples uniformly over ids
    while staying reproducible across runs, partitionings and cluster
    sizes."""
    tab = bottomk_sample(ds, id_col=id_col, k=k, carry_cols=[vec_col],
                         batch_size=batch_size)
    if tab.num_rows == 0:
        return np.zeros((0, 0), dtype=np.float64)
    col = tab.column(vec_col)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return np.stack([np.asarray(v, dtype=np.float64)
                     for v in col.to_pylist()])


def mixture_rates(counts: dict[str, int],
                  weights: dict[str, int]) -> dict[str, int]:
    """Per-source acceptance rates (1/10000 units) that rebalance the
    observed per-source counts to the TARGET weight proportions at the
    maximum achievable total size: C = min_i(n_i * 10000 // w_i) (the
    binding source kept within one permyriad of whole — floor composition), rate_i = C * w_i // n_i  (<= 10000 by
    construction). Pure-integer arithmetic (Python bigints — no overflow
    at any corpus size) so the DuckDB twin computing the same expressions
    in HUGEINT lands on identical rates. Sources absent from ``weights``
    rate 0 (dropped); a weighted source absent from ``counts`` forces
    C = 0 (the demanded proportion is unachievable — honest empty output
    rather than silent re-normalization)."""
    caps = []
    for s, w in weights.items():
        if w <= 0:
            continue
        n = counts.get(s, 0)
        caps.append((n * 10000) // w)
    if not caps:
        return {}
    c = min(caps)
    return {s: (c * w) // counts[s]
            for s, w in weights.items() if w > 0 and counts.get(s, 0) > 0}


def mixture_sample(ds, *, id_col: str, source_col: str,
                   weights: dict[str, int], batch_size: int = 8192):
    """Deterministic data mixing: downsample each source so the output's
    source proportions match ``weights`` (the standard training-mixture
    rebalance), keeping the binding source (near-)whole. One SKINNY per-source
    count pass (vocab-sized driver table), then one streaming hash-filter
    pass (stratified_sample) — membership depends only on the row id, so
    the mixture is reproducible across runs, retries and cluster sizes."""
    from ..functions.rayutil import collect_table

    cnt_ds = ds.groupby(source_col).count()
    tab = collect_table(cnt_ds, pa.schema([(source_col, pa.string()),
                                           ("count()", pa.int64())]))
    counts = dict(zip(tab.column(0).to_pylist(),
                      (int(x) for x in tab.column(1).to_pylist())))
    rates = mixture_rates(counts, weights)
    return stratified_sample(ds, id_col=id_col, stratum_col=source_col,
                             rates_permyriad=rates, default_permyriad=0,
                             batch_size=batch_size)


def shuffle_shard_assign(ds, *, id_col: str, rows_per_shard: int,
                         carry_cols: list[str] | None = None,
                         num_buckets: int = 64):
    """Deterministic global shuffle + training-shard assignment: every row
    gets its position in the Knuth-hash-of-id total order (ties by id) and
    from it ``shard = rank // rows_per_shard``, ``pos = rank %
    rows_per_shard``. The pre-training export op: a corpus must be globally
    shuffled before being cut into equal-size shards (sequential readers
    must not see one source/time-range in a row), and doing it by hash
    instead of ``random_shuffle`` makes the layout a pure function of the
    ids — reproducible across runs/engines/cluster sizes, resumable (a
    re-run assigns identical shards, so finished shard files can be
    skipped), and append-consistent (new rows land in the order their
    hashes dictate without re-drawing old rows' randomness).

    SQL twin (integer-exact): ``ROW_NUMBER() OVER (ORDER BY knuth(id), id)
    - 1`` then the same div/mod, with the module's overflow-safe hash
    (see ``sample_bucket``).

    Scale shape: the classic two-pass distributed scan (stages/packing.py):
    hash values are ~uniform on [0, 2^31), so fixed-width RANGE buckets on
    the hash are order-preserving AND balanced regardless of id skew.
    Pass 1 ships one count per bucket (driver folds num_buckets ints);
    pass 2 is one bucketed exchange of (hash, id, carry) with an in-bucket
    sort + arange — no global sort, no driver rows."""
    import ray as _ray

    from ..functions.rayutil import get_broadcast

    _RB = "__rb"
    keep = [id_col] + list(carry_cols or [])

    def add_hash_rb(t: pa.Table) -> pa.Table:
        x = np.asarray(pc.cast(t.column(id_col), pa.int64())) % _MOD
        h = x * _KNUTH % _MOD
        out = pa.table({c: t.column(c) for c in keep})
        out = out.append_column("__h", pa.array(h))
        return out.append_column(_RB, pa.array(h * num_buckets // _MOD))

    hashed = ds.map_batches(add_hash_rb, batch_format="pyarrow",
                            zero_copy_batch=True)
    per_bucket = hashed.groupby(_RB).count().take_all()
    sums = {int(r[_RB]): int(r["count()"]) for r in per_bucket}
    offsets, acc = {}, 0
    for b in range(num_buckets):
        offsets[b] = acc
        acc += sums.get(b, 0)
    off_ref = _ray.put(offsets)

    def assign(group: pa.Table) -> pa.Table:
        off = get_broadcast(off_ref)
        g = group.sort_by([("__h", "ascending"), (id_col, "ascending")])
        b = int(g.column(_RB)[0].as_py()) if g.num_rows else 0
        rank = np.arange(g.num_rows, dtype=np.int64) + off.get(b, 0)
        g = g.drop_columns(["__h", _RB])
        g = g.append_column("shard", pa.array(rank // rows_per_shard))
        return g.append_column("pos", pa.array(rank % rows_per_shard))

    return hashed.groupby(_RB).map_groups(assign, batch_format="pyarrow")

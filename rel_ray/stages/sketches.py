"""Mergeable cardinality sketches: grouped HyperLogLog distinct counts.

Published algorithm: Flajolet et al., "HyperLogLog: the analysis of a
near-optimal cardinality estimation algorithm" (AofA 2007), with the
standard small-range (linear counting) correction. Hashing is the engine's
deterministic splitmix64 — estimates are bit-reproducible across runs,
retries and cluster sizes.

Ray-Data-first: the sketch is a PARTIAL AGGREGATE — each batch task folds
its rows into one (group, registers) row (registers = fixed 2^p bytes), so
the shuffle moves only |groups-per-batch| sketch rows, never the data; a
groupby merge takes elementwise register maxima. This is the canonical
combiner pattern (SURVEY §2.5: pre-aggregate inside map_batches before any
groupby) applied to a sketch instead of a sum — the 100-TB path for
COUNT(DISTINCT) where the exact grouped-distinct (rayutil.grouped_min over
pairs) would shuffle every distinct value.

REL parity anchor: REL's p(e|m) store aggregates per-mention candidate
counts over a full corpus pass (REL:src/REL/wikipedia.py count loops); the
sketch is the same corpus-statistic computed without moving the corpus.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.hashing import splitmix64
from ..functions.rayutil import bucketed_group_apply, segment_starts


def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1 + 1.079 / m)


def hll_fold(hashes: np.ndarray, group_codes: np.ndarray, n_groups: int,
             p: int) -> np.ndarray:
    """Fold 64-bit hashes into per-group register arrays (n_groups, 2^p).

    Register index = low p bits; rank = 1 + leading-zero count of the
    remaining 64-p bits (capped at 64-p+1). Vectorized: one np.maximum.at."""
    m = 1 << p
    idx = (hashes & np.uint64(m - 1)).astype(np.int64)
    rest = hashes >> np.uint64(p)
    # rank = (64-p) - floor(log2(rest)) for rest>0, else 64-p+1
    nbits = 64 - p
    rank = np.full(len(rest), nbits + 1, dtype=np.uint8)
    nz = rest > 0
    if nz.any():
        # bit_length via float log2 is unsafe >2^53; use a de Bruijn-free
        # loop over the 6 shift levels instead (branchless, vectorized)
        v = rest[nz]
        bl = np.zeros(len(v), dtype=np.int64)
        for shift in (32, 16, 8, 4, 2, 1):
            big = v >= (np.uint64(1) << np.uint64(shift))
            bl[big] += shift
            v = np.where(big, v >> np.uint64(shift), v)
        rank[nz] = (nbits - bl).astype(np.uint8)
    regs = np.zeros((n_groups, m), dtype=np.uint8)
    np.maximum.at(regs, (group_codes, idx), rank)
    return regs


def hll_estimate(regs: np.ndarray) -> float:
    """Standard HLL estimate with linear-counting small-range correction."""
    m = regs.shape[-1]
    est = _alpha(m) * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    if est <= 2.5 * m:
        zeros = int(np.count_nonzero(regs == 0))
        if zeros:
            return m * np.log(m / zeros)
    return float(est)


def grouped_approx_distinct(ds, *, group_col: str, value_col: str,
                            p: int = 12, num_buckets: int = 64):
    """(group, approx_distinct:int64) per distinct group value.

    Relative error ~= 1.04/sqrt(2^p) (~1.6% at the default p=12; 4 KiB per
    group sketch). Values are hashed with splitmix64 over the string bytes
    (string_hash_u64) or the int64 bit pattern — deterministic everywhere."""
    from ..functions.shingles import string_hash_u64

    m = 1 << p

    def partial(t: pa.Table) -> pa.Table:
        g = t.column(group_col)
        if isinstance(g, pa.ChunkedArray):
            g = g.combine_chunks()
        v = t.column(value_col)
        if isinstance(v, pa.ChunkedArray):
            v = v.combine_chunks()
        if pa.types.is_string(v.type) or pa.types.is_large_string(v.type):
            h = string_hash_u64(v)
        else:
            h = splitmix64(np.asarray(v).view(np.uint64))
        enc = pc.dictionary_encode(g)
        codes = np.asarray(enc.indices, dtype=np.int64)
        groups = enc.dictionary
        regs = hll_fold(h, codes, len(groups), p)
        return pa.table({
            group_col: groups,
            "__regs": pa.FixedSizeListArray.from_arrays(
                pa.array(regs.reshape(-1), type=pa.uint8()), m),
        })

    def merge(bucket: pa.Table) -> pa.Table:
        n = bucket.num_rows
        if n == 0:
            return pa.table({
                group_col: pa.array([], type=bucket.column(group_col).type),
                "approx_distinct": pa.array([], type=pa.int64())})
        starts = np.asarray(segment_starts(bucket.column(group_col)),
                            dtype=np.int64)
        regs_col = bucket.column("__regs")
        if isinstance(regs_col, pa.ChunkedArray):
            regs_col = regs_col.combine_chunks()
        flat = np.asarray(regs_col.values, dtype=np.uint8).reshape(n, m)
        seg_id = np.zeros(n, dtype=np.int64)
        seg_id[starts[1:]] = 1
        seg_id = np.cumsum(seg_id)
        merged = np.zeros((len(starts), m), dtype=np.uint8)
        np.maximum.at(merged, seg_id, flat)
        ests = [int(round(hll_estimate(merged[i])))
                for i in range(len(starts))]
        return pa.table({
            group_col: bucket.column(group_col).take(pa.array(starts)),
            "approx_distinct": pa.array(ests, type=pa.int64())})

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True)
    return bucketed_group_apply(partials, group_col, merge,
                                num_buckets=num_buckets)


# ---------------------------------------------------------------------------
# Bloom filter — membership sketch for broadcast-side sets
# ---------------------------------------------------------------------------
# Published: Bloom (CACM 1970); double hashing per Kirsch & Mitzenmacher
# (ESA 2006): index_i = (h1 + i*h2) mod m needs only two 64-bit hashes per
# key for any k. At 10 bits/key + k=7 the false-positive rate is ~0.8%;
# false negatives are impossible — the property decontamination relies on.
#
# Scale shape: the exact broadcast decontamination (dedup.flag_contaminated)
# ships 8 bytes per DISTINCT benchmark gram to every worker; the Bloom
# variant ships m/8 bytes TOTAL (10 bits per gram), a ~6.4× smaller
# broadcast with a quantified FP rate — the right trade once the "small"
# side reaches hundreds of millions of grams (e.g. decontaminating against
# a large eval suite or a previous training corpus).

_BLOOM_C = np.uint64(0x9E3779B97F4A7C15)


def _bloom_indices(values: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    """(len(values), k) int64 bit indices via double hashing."""
    from ..functions.hashing import splitmix64 as _sm

    v = values.astype(np.uint64, copy=False)
    h1 = _sm(v)
    h2 = _sm(v ^ _BLOOM_C) | np.uint64(1)  # odd → full-period stride
    i = np.arange(k, dtype=np.uint64)[None, :]
    with np.errstate(over="ignore"):
        idx = (h1[:, None] + i * h2[:, None]) % np.uint64(m_bits)
    return idx.astype(np.int64)


def bloom_build(values: np.ndarray, *, m_bits: int, k: int = 7) -> np.ndarray:
    """Bit array (uint8, m_bits/8 bytes) with every value's k bits set."""
    bits = np.zeros(m_bits // 8, dtype=np.uint8)
    if len(values):
        idx = _bloom_indices(values, m_bits, k).reshape(-1)
        np.bitwise_or.at(bits, idx >> 3,
                         np.left_shift(np.uint8(1), (idx & 7).astype(np.uint8)))
    return bits


def bloom_probe(bits: np.ndarray, values: np.ndarray, *, k: int = 7) -> np.ndarray:
    """Boolean membership per value (no false negatives)."""
    if not len(values):
        return np.zeros(0, dtype=bool)
    m_bits = len(bits) * 8
    idx = _bloom_indices(values, m_bits, k)
    probed = (bits[idx >> 3] >> (idx & 7).astype(np.uint8)) & 1
    return probed.all(axis=1)


def bloom_from_dataset(ds, col: str, *, m_bits: int, k: int = 7) -> np.ndarray:
    """Distributed Bloom build: every batch task folds its values into one
    m-bit partial (the heavy hash+scatter runs on workers), the driver ORs
    the per-batch partials — the same mergeable-sketch combiner shape as the
    HLL above (registers OR instead of max)."""

    def partial(t: pa.Table) -> pa.Table:
        col_arr = t.column(col)
        if isinstance(col_arr, pa.ChunkedArray):
            col_arr = col_arr.combine_chunks()
        bits = bloom_build(np.asarray(col_arr, dtype=np.uint64),
                           m_bits=m_bits, k=k)
        return pa.table({"bits": pa.array([bits.tobytes()], type=pa.binary())})

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
    out = fold_grid_partials(parts, col="bits", op="or", dtype=np.uint8)
    return out if out is not None else np.zeros(m_bits // 8,
                                                dtype=np.uint8)


def bloom_decontaminate(corpus, benchmark, *, id_col: str, text_col: str,
                        n: int = 5, bits_per_gram: int = 10, k: int = 7):
    """Bloom-filter benchmark decontamination: superset of the exact filter
    (no false negatives), broadcast is m/8 bytes regardless of gram count.

    Adds ``contaminated`` (bool; true ⊇ exact-contaminated set, FP rate
    ~(1-e^{-k/bits_per_gram})^k ≈ 0.8% at the 10/7 defaults).
    """
    import ray as _ray

    from ..functions.rayutil import get_broadcast
    from ..functions.shingles import word_ngram_codes

    def grams_of(t: pa.Table) -> pa.Table:
        col = t.column(text_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        codes, _ = word_ngram_codes(col, n=n)
        return pa.table({"g": np.unique(codes)})

    bench_grams = benchmark.map_batches(grams_of, batch_format="pyarrow",
                                        zero_copy_batch=True)
    # size m from the benchmark gram count (cheap count over skinny rows);
    # round up to a byte multiple
    n_grams = max(int(bench_grams.count()), 1)
    m_bits = ((n_grams * bits_per_gram + 63) // 64) * 64
    bits = bloom_from_dataset(bench_grams, "g", m_bits=m_bits, k=k)
    ref = _ray.put(bits)

    class Probe:
        def __init__(self):
            self.bits = get_broadcast(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            col = t.column(text_col)
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            codes, splits = word_ngram_codes(col, n=n)
            hit = bloom_probe(self.bits, codes, k=k)
            lens = np.diff(splits)
            seg = np.zeros(len(lens), dtype=bool)
            nz = lens > 0
            if nz.any():
                seg[nz] = np.logical_or.reduceat(hit, splits[:-1][nz])
            return t.append_column("contaminated", pa.array(seg))

    return corpus.map_batches(Probe, batch_format="pyarrow",
                              zero_copy_batch=True, concurrency=(1, 8))


# ---------------------------------------------------------------------------
# Misra-Gries heavy hitters — bounded-memory frequent items
# ---------------------------------------------------------------------------
# Published: Misra & Gries (1982); the MERGE rule is from Agarwal et al.,
# "Mergeable Summaries" (PODS 2012): sum matching counters, subtract the
# (k+1)-th largest, drop non-positive. Guarantee after any merge tree:
# true_count - n/(k+1) <= est <= true_count, so every item with frequency
# > n/(k+1) is PRESENT in the summary (no heavy hitter is ever lost).
#
# Scale shape: each batch task compresses its rows to <= k (token, count)
# rows (exact per-batch value_counts, then the MG truncation), so the
# reduce moves O(k x batches) skinny rows — the bounded-memory path for
# "top terms" when the vocabulary itself is too big to shuffle (the exact
# combiner top-terms in retrieval.py shuffles one row per DISTINCT term).


def mg_summarize(values: np.ndarray, counts: np.ndarray, k: int
                 ) -> tuple[np.ndarray, np.ndarray, int]:
    """Truncate exact (values, counts) to a k-entry MG summary.

    Returns (values, counts, err): counts are lower bounds; every dropped
    item had true count <= err."""
    if len(values) <= k:
        return values, counts.astype(np.int64), 0
    order = np.argsort(counts)[::-1]
    err = int(counts[order[k]])
    keep = order[:k]
    est = counts[keep].astype(np.int64) - err
    pos = est > 0
    return values[keep][pos], est[pos], err


def mg_merge(parts: list[tuple[np.ndarray, np.ndarray, int]], k: int
             ) -> tuple[np.ndarray, np.ndarray, int]:
    """Merge MG summaries: concatenate, sum per key, re-truncate to k."""
    if not parts:
        return np.empty(0, dtype=np.uint64), np.empty(0, dtype=np.int64), 0
    vals = np.concatenate([p[0] for p in parts])
    cnts = np.concatenate([p[1] for p in parts])
    base_err = sum(p[2] for p in parts)
    uv, inv = np.unique(vals, return_inverse=True)
    summed = np.bincount(inv, weights=cnts, minlength=len(uv)).astype(np.int64)
    v, c, err = mg_summarize(uv, summed, k)
    return v, c, base_err + err


def heavy_hitter_terms(ds, *, text_col: str, k: int = 64,
                       token_pattern: str = "[a-z]+"):
    """Top-k frequent tokens with Misra-Gries error bounds.

    Returns a DRIVER-SIDE pa.Table (token_hash, est_count, max_err) — the
    result is <= k rows by construction. est_count <= true <= est_count +
    max_err; any token with true count > max_err appears."""
    from ..functions.normalize import extract_all_matches
    from ..functions.shingles import string_hash_u64

    def partial(t: pa.Table) -> pa.Table:
        col = t.column(text_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        toks = pc.list_flatten(extract_all_matches(col, token_pattern))
        if len(toks) == 0:
            return pa.table({"h": pa.array([], type=pa.uint64()),
                             "c": pa.array([], type=pa.int64()),
                             "e": pa.array([], type=pa.int64())})
        h = string_hash_u64(toks)
        uv, inv = np.unique(h, return_inverse=True)
        cnt = np.bincount(inv, minlength=len(uv)).astype(np.int64)
        v, c, err = mg_summarize(uv, cnt, k)
        if len(v) == 0 and err > 0:
            # all items truncated away: a zero-count sentinel row still
            # carries the error bound (dropped again at merge, harmlessly)
            v = np.zeros(1, dtype=np.uint64)
            c = np.zeros(1, dtype=np.int64)
        return pa.table({"h": pa.array(v, type=pa.uint64()),
                         "c": pa.array(c),
                         "e": pa.array(np.full(len(v), err, dtype=np.int64))})

    parts = []
    for b in ds.map_batches(partial, batch_format="pyarrow",
                            zero_copy_batch=True).iter_batches(
                                batch_format="pyarrow"):
        t = pa.table(b)
        if t.num_rows:
            parts.append((np.asarray(t.column("h"), dtype=np.uint64),
                          np.asarray(t.column("c"), dtype=np.int64),
                          int(t.column("e")[0].as_py())))
        else:
            parts.append((np.empty(0, np.uint64), np.empty(0, np.int64), 0))
    v, c, err = mg_merge(parts, k)
    order = np.argsort(c)[::-1]
    return pa.table({
        "token_hash": pa.array(v[order], type=pa.uint64()),
        "est_count": pa.array(c[order]),
        "max_err": pa.array(np.full(len(v), err, dtype=np.int64)),
    })


# ---------------------------------------------------------------------------
# Count-Min sketch — mergeable approximate counts over an unbounded key space
# ---------------------------------------------------------------------------
# Published: Cormode & Muthukrishnan (2005). Guarantees: est >= true always
# (counters only ever overcount), and est <= true + eps*N with probability
# 1 - delta for width = ceil(e/eps), depth = ceil(ln 1/delta). Sketches are
# PERFECTLY mergeable (elementwise sum), so the reduce over batches is one
# numpy add per batch — the bounded-memory companion to heavy_hitter_terms:
# MG finds WHICH items are frequent, CMS answers point queries for any item.


def cms_hash_rows(items: np.ndarray, depth: int, width: int) -> np.ndarray:
    """(depth, len(items)) row indices: h_i(x) = splitmix64(x ^ seed_i) % width."""
    from ..functions.hashing import splitmix64

    seeds = splitmix64(np.arange(1, depth + 1, dtype=np.uint64))
    out = np.empty((depth, len(items)), dtype=np.int64)
    for d in range(depth):
        out[d] = (splitmix64(items ^ seeds[d]) % np.uint64(width)).astype(np.int64)
    return out


def cms_query(sketch: np.ndarray, items: np.ndarray) -> np.ndarray:
    """Point-query the merged (depth, width) sketch: min over depth rows."""
    depth, width = sketch.shape
    rows = cms_hash_rows(np.asarray(items, dtype=np.uint64), depth, width)
    ests = np.stack([sketch[d, rows[d]] for d in range(depth)])
    return ests.min(axis=0)


def count_min_terms(ds, *, text_col: str, depth: int = 4, width: int = 2048,
                    token_pattern: str = "[a-z]+") -> np.ndarray:
    """Build a merged Count-Min sketch of token frequencies over `ds`.

    Each batch tokenizes vectorized (extract_all_matches → list_flatten →
    string_hash_u64) and scatters its counts into a local (depth, width)
    int64 grid with one np.add.at per row; the grid ships as ONE flattened
    list row per batch and the driver merge is a numpy sum over
    O(depth × width × batches) ints — no shuffle, no per-token rows ever
    leave a task. Returns the (depth, width) sketch; query with cms_query.
    """
    from ..functions.normalize import extract_all_matches
    from ..functions.shingles import string_hash_u64

    def partial(t: pa.Table) -> pa.Table:
        col = t.column(text_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        toks = pc.list_flatten(extract_all_matches(col, token_pattern))
        grid = np.zeros((depth, width), dtype=np.int64)
        if len(toks):
            h = string_hash_u64(toks)
            uniq, cnt = np.unique(h, return_counts=True)
            rows = cms_hash_rows(uniq, depth, width)
            for d in range(depth):
                np.add.at(grid[d], rows[d], cnt)
        return pa.table({"grid": pa.array([grid.ravel()],
                                          type=pa.list_(pa.int64()))})

    parts = ds.map_batches(partial, batch_format="pyarrow",
                            zero_copy_batch=True)
    out = fold_grid_partials(parts, col="grid")
    if out is None:
        return np.zeros((depth, width), dtype=np.int64)
    return out.reshape(depth, width)


# ---------------------------------------------------------------------------
# mergeable quantile sketch (geometric / relative-error histogram)
# ---------------------------------------------------------------------------

def _qs_nbins(eps: float) -> int:
    return int(np.ceil(np.log(2.0 ** 63) / np.log1p(2 * eps))) + 2


def quantile_sketch(ds, *, val_col: str, eps: float = 0.01) -> np.ndarray:
    """Mergeable quantile sketch over a non-negative int64 column:
    a geometric histogram with bin boundaries (1+2*eps)^k - 1, so any
    value inside a bin is within relative error <= ~2*eps of its edges.

    Memory is FIXED by eps alone (~2.2k int64 bins at eps=0.01 covers the
    full int64 range) regardless of data size or distribution — the
    bounded-memory scale path where the exact histogram quantile
    (grouped_quantiles_hist) would shuffle one row per distinct value.
    Merge law: sketch(A ∪ B) == sketch(A) + sketch(B) (vector add); each
    batch ships one flattened counts row, no shuffle, bit-deterministic.
    Query with ``sketch_quantile``. Negative values are rejected (shift
    upstream).
    """
    nb = _qs_nbins(eps)
    denom = np.log1p(2 * eps)

    def partial(t: pa.Table) -> pa.Table:
        v = np.asarray(t.column(val_col), dtype=np.int64)
        if (v < 0).any():
            raise ValueError("quantile_sketch requires non-negative values")
        b = np.floor(np.log1p(v.astype(np.float64)) / denom).astype(np.int64)
        counts = np.bincount(np.minimum(b, nb - 1), minlength=nb)
        return pa.table({"bins": pa.array([counts], type=pa.list_(pa.int64()))})

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
    out = fold_grid_partials(parts, col="bins")
    return out if out is not None else np.zeros(nb, dtype=np.int64)


def sketch_quantile(sketch: np.ndarray, q: float, eps: float = 0.01) -> float:
    """q-quantile estimate from a quantile_sketch: rank-select the bin in
    the cumulative histogram, return the geometric midpoint of its edges
    (relative error <= ~2*eps vs the exact q-quantile value)."""
    cum = np.cumsum(sketch)
    n = int(cum[-1])
    if n == 0:
        return 0.0
    rank = max(1, int(np.ceil(q * n)))
    b = int(np.searchsorted(cum, rank, side="left"))
    base = 1 + 2 * eps
    lo = base ** b           # == lower edge + 1
    hi = base ** (b + 1)     # == upper edge + 1
    return float(np.sqrt(lo * hi) - 1)


# ---------------------------------------------------------------------------
# distributed pre-fold for per-batch grid partials
# ---------------------------------------------------------------------------

def fold_grid_partials(parts, *, col: str, op: str = "sum",
                       dtype=np.int64, batch_size: int = 64) -> np.ndarray:
    """Fold a Dataset of per-batch grid partials (one list/binary row per
    source batch) into ONE numpy array with a DISTRIBUTED pre-fold level:
    a map_batches pass combines up to ``batch_size`` partial rows into one
    on the workers, so the driver touches B/batch_size rows instead of B —
    at 100 TB (10^5 source batches × 0.5 MiB grids) that is the difference
    between ~50 GiB and ~1 GiB of driver traffic. Elementwise int ops are
    associative, so the result is bit-identical to the flat driver fold.
    ``op``: "sum" (counts) or "or" (bit sets). ``col`` may be a
    list<int64/float64> or binary (uint8) column.
    """
    assert op in ("sum", "or"), op

    def rows_of(t: pa.Table):
        c = t.column(col)
        for i in range(t.num_rows):
            v = c[i].as_py() if pa.types.is_binary(c.type) else None
            if v is not None:
                yield np.frombuffer(v, dtype=np.uint8)
            else:
                yield np.asarray(c[i].values)

    def local(t: pa.Table) -> pa.Table:
        acc = None
        for a in rows_of(t):
            if acc is None:
                acc = a.astype(dtype, copy=True) \
                    if not pa.types.is_binary(t.column(col).type) else a.copy()
            elif op == "sum":
                acc += a
            else:
                acc |= a
        if acc is None:
            return pa.table({col: pa.array([], type=t.column(col).type)})
        if pa.types.is_binary(t.column(col).type):
            return pa.table({col: pa.array([acc.tobytes()],
                                           type=pa.binary())})
        return pa.table({col: pa.array([acc], type=t.column(col).type)})

    reduced = parts.map_batches(local, batch_format="pyarrow",
                                zero_copy_batch=True,
                                batch_size=batch_size)
    acc = None
    for b in reduced.iter_batches(batch_format="pyarrow"):
        t = pa.table(b)
        for a in rows_of(t):
            if acc is None:
                acc = a.astype(dtype, copy=True) \
                    if not pa.types.is_binary(t.column(col).type) else a.copy()
            elif op == "sum":
                acc += a
            else:
                acc |= a
    return acc


def heavy_hitters_exact(ds, *, text_col: str, k: int = 64,
                        token_pattern: str = "[a-z]+") -> pa.Table:
    """EXACT phi-heavy hitters (phi = 1/k): every token whose count exceeds
    N/k, with its exact count — deterministic, no sketch error, and still
    never a token-keyed shuffle. Two streaming passes:

    1. Misra-Gries (``heavy_hitter_terms``) produces a <= k-entry CANDIDATE
       hash set; MG's no-lost-heavy-hitter guarantee (est error <= N/k)
       means every true heavy hitter is in it.
    2. Exact recount: each batch tokenizes vectorized, keeps only candidate
       tokens (np.isin against the <= k-hash closure array) and emits
       per-batch (token, cnt) partials plus ONE null-token row carrying the
       batch's total token count; the driver folds O(k x batches) skinny
       rows and filters cnt * k > N.

    The output is SQL-exact (GROUP BY token HAVING count(*) * k > total) —
    the value-checkable sibling of the rows-only MG/CMS queries; hash
    collisions in pass 1 only ever ADD candidates (recount is by string).
    `ds` is read twice — pass a materialized dataset if upstream is
    expensive. Returns a driver-side table (token, cnt), cnt desc.
    """
    from ..functions.normalize import extract_all_matches
    from ..functions.shingles import string_hash_u64

    cand = heavy_hitter_terms(ds, text_col=text_col, k=k,
                              token_pattern=token_pattern)
    cand_hashes = np.asarray(cand.column("token_hash"), dtype=np.uint64)

    def recount(t: pa.Table) -> pa.Table:
        col = t.column(text_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        toks = pc.list_flatten(extract_all_matches(col, token_pattern))
        total = len(toks)
        tokens: list = [None]
        counts: list = [total]
        if total:
            h = string_hash_u64(toks)
            mask = np.isin(h, cand_hashes)
            if mask.any():
                vc = pc.value_counts(toks.filter(pa.array(mask)))
                tokens = vc.field("values").to_pylist() + tokens
                counts = vc.field("counts").to_pylist() + counts
        return pa.table({"token": pa.array(tokens, type=pa.string()),
                         "c": pa.array(counts, type=pa.int64())})

    parts = [pa.table(b) for b in
             ds.map_batches(recount, batch_format="pyarrow",
                            zero_copy_batch=True).iter_batches(
                                batch_format="pyarrow")]
    folded = pa.concat_tables([p for p in parts if p.num_rows]) if parts \
        else pa.table({"token": pa.array([], type=pa.string()),
                       "c": pa.array([], type=pa.int64())})
    null_mask = pc.is_null(folded.column("token"))
    n_total = int(pc.sum(folded.filter(null_mask).column("c")).as_py() or 0)
    named = folded.filter(pc.invert(null_mask))
    agg = named.group_by("token").aggregate([("c", "sum")])
    cnt = pc.cast(agg.column("c_sum"), pa.int64())
    keep = pc.greater(pc.multiply(cnt, pa.scalar(k, type=pa.int64())),
                      pa.scalar(n_total, type=pa.int64()))
    out = pa.table({"token": agg.column("token"), "cnt": cnt}).filter(keep)
    return out.sort_by([("cnt", "descending"), ("token", "ascending")])

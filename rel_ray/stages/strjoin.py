"""String-similarity self-joins: edit-distance band and blocked Jaro-Winkler.

ER blocking-and-verify over a surface-form column, with the classic
low-cardinality optimization: similarity is verified once per DISTINCT
string pair at vocabulary level, then expanded back to record pairs —
records never ride the similarity kernel, only the (tiny) form vocabulary
does (REL parity anchor: REL matches normalized surface forms against a
form vocabulary that is orders of magnitude smaller than the corpus,
REL:src/REL/mention_detection.py + the wiki p(e|m) form table).

Verification runs through DuckDB's vectorized C++ ``levenshtein`` /
``jaro_winkler_similarity`` kernels (one per-process connection, same
pattern as stages/scoring.py) — which makes the result bit-identical to
the DuckDB oracle BY CONSTRUCTION, not by float luck.

Scale notes:
- the vocabulary collect is capped (``max_vocab``); a corpus whose key
  column is free text (vocab ~ corpus) is the wrong workload for this
  operator — use stages/simjoin.py (AllPairs/PPJoin) there.
- the Levenshtein length-band prefilter is LOSSLESS (dist >= |len(a)-len(b)|),
  so the SQL oracle needs no mirrored blocking predicate. Jaro-Winkler
  first-byte blocking is LOSSY and therefore part of the operator's
  declared semantics — the oracle mirrors it.
- expansion is one broadcast fan-out pass (vectorized CSR gather, no
  per-row Python) plus one bucketed many-to-many co-group join; the wide
  exchange carries only (id, form-code, score), never document payloads.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray

from ..functions.rayutil import collect_table, get_broadcast


def distinct_strings(ds, col: str, *, max_vocab: int = 65_536,
                     num_buckets: int = 64) -> pa.Table:
    """Distinct values of a (low-cardinality) string column as one
    driver-side table, cap-guarded. Per-batch local distinct first, so the
    exchange carries at most (num_blocks x vocab) rows, then a bucketed
    global distinct."""
    from ..functions.rayutil import bucketed_group_apply

    local = ds.map_batches(
        lambda t: pa.table({col: pc.unique(t.column(col))}),
        batch_format="pyarrow", zero_copy_batch=True)
    glob = bucketed_group_apply(
        local, col,
        lambda g: pa.table({col: pc.unique(g.column(col))}),
        num_buckets=num_buckets)
    vocab = collect_table(glob, empty_schema=pa.schema([(col, pa.string())]))
    if vocab.num_rows > max_vocab:
        raise ValueError(
            f"distinct_strings: {vocab.num_rows} distinct values exceed "
            f"max_vocab={max_vocab}; this operator targets surface-form "
            "columns — use stages/simjoin.py for free-text keys")
    return vocab.sort_by(col)


class _VocabSimStage:
    """Per-process stage: score one vocab chunk against the whole broadcast
    vocabulary. Lossless length-band prefilter for Levenshtein; declared
    first-byte block for Jaro-Winkler; DuckDB C++ kernel verify."""

    def __init__(self, vocab_ref, metric: str, threshold):
        import duckdb

        v = get_broadcast(vocab_ref)
        self.names = v  # pa.Array of distinct strings, sorted
        self.lens = np.asarray(pc.utf8_length(v), dtype=np.int64)
        first = pc.utf8_slice_codeunits(v, 0, 1)
        # dictionary-encode first chars to int codes for the vectorized block
        self.first_code = np.asarray(
            pc.dictionary_encode(first).indices, dtype=np.int64)
        self.metric = metric
        self.threshold = threshold
        self.con = duckdb.connect()

    def __call__(self, batch: pa.Table) -> pa.Table:
        gi = np.asarray(batch.column("v_idx"), dtype=np.int64)
        score_type = pa.int64() if self.metric == "levenshtein" else pa.float64()
        empty = pa.table({"name_a": pa.array([], type=pa.string()),
                          "name_b": pa.array([], type=pa.string()),
                          "score": pa.array([], type=score_type)})
        if len(gi) == 0:
            return empty
        V = len(self.lens)
        # candidate mask: j >= gi (each unordered vocab pair once, self
        # included — identical forms still pair distinct records)
        mask = np.arange(V, dtype=np.int64)[None, :] >= gi[:, None]
        if self.metric == "levenshtein":
            mask &= (np.abs(self.lens[gi][:, None] - self.lens[None, :])
                     <= int(self.threshold))
        else:
            mask &= self.first_code[gi][:, None] == self.first_code[None, :]
        bi, oj = np.nonzero(mask)
        if len(bi) == 0:
            return empty
        a = self.names.take(pa.array(gi[bi]))
        b = self.names.take(pa.array(oj))
        tin = pa.table({"a": a, "b": b})
        self.con.register("strsim_in", tin)
        if self.metric == "levenshtein":
            out = self.con.execute(
                "SELECT CAST(levenshtein(a, b) AS BIGINT) AS s "
                "FROM strsim_in").arrow()
            keep = pc.less_equal(out.column("s"),
                                 pa.scalar(int(self.threshold), pa.int64()))
        else:
            out = self.con.execute(
                "SELECT jaro_winkler_similarity(a, b) AS s "
                "FROM strsim_in").arrow()
            keep = pc.greater_equal(out.column("s"),
                                    pa.scalar(float(self.threshold),
                                              pa.float64()))
        self.con.unregister("strsim_in")
        res = pa.table({"name_a": a, "name_b": b,
                        "score": pc.cast(out.column("s"), score_type)})
        return res.filter(keep)


# per-worker-process stage cache (same pattern and rationale as
# stages/scoring.py::_SCORER_CACHE: Ray reuses worker processes across
# tasks, so the duckdb connection + vocab decode happen once per process —
# actor-pool amortization without the pool)
_VOCABSIM_CACHE: dict = {}


def _vocab_pairs(vocab: pa.Table, col: str, metric: str, threshold,
                 *, concurrency: int = 8) -> pa.Table:
    """All matching DISTINCT-string pairs (name_a, name_b, score), each
    unordered pair once (including self pairs). Distributed over vocab
    chunks against the broadcast vocabulary (task pool, per-process state)."""
    names = vocab.column(col)
    if isinstance(names, pa.ChunkedArray):
        names = names.combine_chunks()
    vocab_ref = ray.put(names)
    cache_key = (vocab_ref.hex(), metric, str(threshold))

    def score_chunk(batch: pa.Table) -> pa.Table:
        st = _VOCABSIM_CACHE.get(cache_key)
        if st is None:
            st = _VOCABSIM_CACHE.setdefault(
                cache_key, _VocabSimStage(get_broadcast(vocab_ref),
                                          metric, threshold))
        return st(batch)

    idx_ds = ray.data.from_arrow(
        pa.table({"v_idx": pa.array(np.arange(len(names), dtype=np.int64))}))
    chunk = max(64, len(names) // max(concurrency * 4, 1))
    idx_ds = idx_ds.repartition(max(1, min(concurrency * 4,
                                           -(-len(names) // chunk))))
    pairs = idx_ds.map_batches(score_chunk, batch_format="pyarrow",
                               zero_copy_batch=True, batch_size=chunk)
    score_type = pa.int64() if metric == "levenshtein" else pa.float64()
    return collect_table(pairs, empty_schema=pa.schema(
        [("name_a", pa.string()), ("name_b", pa.string()),
         ("score", score_type)]))


def _expand_fanout(ds, *, id_col: str, text_col: str, pairs: pa.Table,
                   vocab_names: pa.Array, batch_size: int = 8192):
    """Broadcast fan-out: record (id, form) -> one row per vocab pair whose
    name_a equals the record's form: (id_a, name_b, same, score).
    Records map to vocab codes via Arrow ``index_in`` (C++), then a
    vectorized CSR gather over the code-sorted pair table — no per-row
    Python anywhere."""
    a_code = np.asarray(pc.index_in(pairs.column("name_a"),
                                    value_set=vocab_names), dtype=np.int64)
    order = np.argsort(a_code, kind="stable")
    p = pairs.take(pa.array(order))
    a_code = a_code[order]
    V = len(vocab_names)
    csr_starts = np.searchsorted(a_code, np.arange(V, dtype=np.int64),
                                 side="left")
    csr_deg = np.searchsorted(a_code, np.arange(V, dtype=np.int64),
                              side="right") - csr_starts
    pairs_ref = ray.put({
        "vocab": vocab_names,
        "starts": csr_starts,
        "deg": csr_deg,
        "name_b": p.column("name_b"),
        "score": p.column("score"),
        "same": pc.equal(p.column("name_a"), p.column("name_b")),
    })
    score_type = pairs.column("score").type

    def fanout(t: pa.Table) -> pa.Table:
        b = get_broadcast(pairs_ref)
        names = t.column(text_col)
        if isinstance(names, pa.ChunkedArray):
            names = names.combine_chunks()
        empty = pa.table({
            "id_a": pa.array([], type=pa.int64()),
            "name_b": pa.array([], type=pa.string()),
            "same": pa.array([], type=pa.bool_()),
            "score": pa.array([], type=score_type)})
        if t.num_rows == 0 or len(b["deg"]) == 0:
            return empty
        codes = np.asarray(pc.fill_null(
            pc.index_in(names, value_set=b["vocab"]), -1), dtype=np.int64)
        deg = np.where(codes >= 0, b["deg"][np.maximum(codes, 0)], 0)
        total = int(deg.sum())
        if total == 0:
            return empty
        starts = np.where(codes >= 0, b["starts"][np.maximum(codes, 0)], 0)
        rec_rep = np.repeat(np.arange(t.num_rows, dtype=np.int64), deg)
        offs = np.cumsum(deg) - deg
        pos = np.arange(total, dtype=np.int64) - np.repeat(offs, deg)
        pair_idx = pa.array(np.repeat(starts, deg) + pos)
        ra = pa.array(rec_rep)
        return pa.table({
            "id_a": pc.cast(t.column(id_col), pa.int64()).take(ra),
            "name_b": b["name_b"].take(pair_idx),
            "same": b["same"].take(pair_idx),
            "score": b["score"].take(pair_idx)})

    return ds.map_batches(fanout, batch_format="pyarrow",
                          zero_copy_batch=True, batch_size=batch_size)


def string_sim_self_join(ds, *, id_col: str, text_col: str,
                         metric: str = "levenshtein", threshold=2,
                         max_vocab: int = 65_536, num_buckets: int = 128,
                         score_col: str = "dist",
                         concurrency: int = 8):
    """Record-pair self-join on string similarity of ``text_col``.

    metric="levenshtein": pairs with edit distance <= threshold (length-band
    prefilter is lossless, so semantics are exactly the unblocked join).
    metric="jaro_winkler": pairs with JW similarity >= threshold AMONG pairs
    sharing the first character (declared blocking, mirrored by the oracle).

    Returns (id_a, id_b, score_col) with id_a < id_b, each pair once.
    """
    from .joins import cogroup_join_multi

    assert metric in ("levenshtein", "jaro_winkler"), metric
    vocab = distinct_strings(ds, text_col, max_vocab=max_vocab)
    pairs = _vocab_pairs(vocab, text_col, metric, threshold,
                         concurrency=concurrency)
    score_type = pairs.column("score").type

    vnames = vocab.column(text_col)
    if isinstance(vnames, pa.ChunkedArray):
        vnames = vnames.combine_chunks()
    fan = _expand_fanout(ds, id_col=id_col, text_col=text_col, pairs=pairs,
                         vocab_names=vnames)

    right = ds.map_batches(
        lambda t: pa.table({
            "name_b": t.column(text_col),
            "id_b": pc.cast(t.column(id_col), pa.int64())}),
        batch_format="pyarrow", zero_copy_batch=True)

    joined = cogroup_join_multi(
        fan, right, key="name_b",
        left_cols=["id_a", "same", "score"], right_cols=["id_b"],
        num_buckets=num_buckets,
        left_schema=pa.schema([("name_b", pa.string()),
                               ("id_a", pa.int64()),
                               ("same", pa.bool_()),
                               ("score", score_type)]),
        right_schema=pa.schema([("name_b", pa.string()),
                                ("id_b", pa.int64())]))

    def finish(t: pa.Table) -> pa.Table:
        ia = np.asarray(t.column("id_a"), dtype=np.int64)
        ib = np.asarray(t.column("id_b"), dtype=np.int64)
        same = np.asarray(t.column("same"))
        # same-form pairs appear in both orders (and as self) — keep the
        # ordered half; cross-form pairs appear once in arbitrary order —
        # normalize to (min, max)
        keep = pa.array(np.where(same, ia < ib, True))
        lo = np.minimum(ia, ib)
        hi = np.maximum(ia, ib)
        out = pa.table({"id_a": pa.array(np.where(same, ia, lo)),
                        "id_b": pa.array(np.where(same, ib, hi)),
                        score_col: t.column("score")})
        return out.filter(keep)

    return joined.map_batches(finish, batch_format="pyarrow",
                              zero_copy_batch=True)

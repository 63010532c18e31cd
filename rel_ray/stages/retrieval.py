"""Lexical retrieval: TF-IDF top-k document search over a text column.

REL parity anchor: REL ranks candidate entities for a mention by a prior
built from corpus statistics (REL:src/REL/db/generic.py p(e|m) counts); this
stage is the corpus-statistics retrieval analog over the engine's own
documents — rank documents against a query string by term-frequency ×
inverse-document-frequency.

Integer-exact scoring (house rule, see pipelines/queries.py): the idf weight
is quantized to ``w(t) = (N * scale) // df(t)`` with INTEGER division, so the
score ``sum_t tf(t,d) * tf(t,q) * w(t)`` is an int64 — bit-exact across
engines and summation orders, hence DuckDB-oracle value-exact. (Overflow
bound: ``max_tf * max_tf_q * N * scale // min_df`` must stay < 2^63 — with
the default scale 2^20 that holds for corpora to ~10^9 docs; drop ``scale``
for larger N.)

Ray-Data-first plan (two streaming passes, no shuffle of the corpus):
  1. df pass: per batch, count the docs containing each QUERY term (only
     query terms matter for scoring — the global vocabulary is never
     aggregated) plus the batch's doc count; reduce the tiny per-batch
     (term_idx, df) tables with one small groupby-sum.
  2. score pass: per batch, one ``pc.index_in`` against the broadcast query
     terms + one weighted bincount gives every doc's score (a doc's score is
     the sum of per-OCCURRENCE weights ``tf_q * w`` — no per-(doc,term)
     grouping needed); local top-k per batch, then a global sort+limit over
     the <= k-per-block survivors.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def tokenize_query(query: str, token_pattern: str) -> tuple[list[str], np.ndarray]:
    """Query terms (distinct, sorted) and their tf_q counts."""
    import re

    toks = re.findall(token_pattern, query.lower())
    terms, counts = np.unique(np.asarray(toks, dtype=object), return_counts=True)
    return [str(t) for t in terms], counts.astype(np.int64)


def _match_terms(texts, token_pattern: str, terms: pa.Array):
    """texts → (row_idx, term_idx) of every occurrence of a query term."""
    from ..functions.normalize import extract_all_matches

    ml = extract_all_matches(pc.utf8_lower(texts), token_pattern)
    counts = np.asarray(pc.list_value_length(ml), dtype=np.int64)
    flat = pc.list_flatten(ml)
    qi = pc.index_in(flat, value_set=terms)
    rows = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
    hit = np.asarray(pc.is_valid(qi))
    return rows[hit], np.asarray(qi.drop_null(), dtype=np.int64)


def compute_query_df(ds, *, text_col: str, token_pattern: str,
                     terms: list[str]) -> tuple[np.ndarray, int]:
    """(df per query term, corpus N) in ONE streaming pass.

    Emits a (Q+1)-row partial table per batch (term_idx -1 counts docs) and
    reduces with a tiny groupby-sum; nothing corpus-sized is materialized."""
    q = len(terms)
    term_arr = pa.array(terms, type=pa.string())

    def partial(t: pa.Table) -> pa.Table:
        texts = t.column(text_col)
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        rows, qi = _match_terms(texts, token_pattern, term_arr)
        # distinct (doc, term) pairs -> df contribution
        pair = np.unique(rows * q + qi)
        dfp = np.bincount(pair % q, minlength=q).astype(np.int64)
        return pa.table({
            "term_idx": pa.array(np.arange(-1, q, dtype=np.int64)),
            "n": pa.array(np.concatenate(([t.num_rows], dfp)))})

    agg = (ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
           .groupby("term_idx").sum("n"))
    rows = {int(r["term_idx"]): int(r["sum(n)"]) for r in agg.take_all()}
    n_docs = rows.pop(-1, 0)
    df = np.zeros(q, dtype=np.int64)
    for i, v in rows.items():
        df[i] = v
    return df, n_docs


def tfidf_topk(ds, *, id_col: str, text_col: str, query: str, k: int = 20,
               token_pattern: str = "[a-z]+", scale: int = 1 << 20,
               batch_size: int = 4096):
    """Top-k docs by quantized-idf TF-IDF score against ``query``.

    Output: (id_col, score:int64), score desc / id asc, only score > 0.
    ``ds`` is consumed twice (df pass + score pass) — pass a re-readable
    dataset (e.g. straight from read_parquet), not an exhausted iterator."""
    terms, tf_q = tokenize_query(query, token_pattern)
    if not terms:
        raise ValueError("query has no terms under token_pattern")
    df, n_docs = compute_query_df(ds, text_col=text_col,
                                  token_pattern=token_pattern, terms=terms)
    w = np.where(df > 0, (n_docs * scale) // np.maximum(df, 1), 0)
    occ_weight = (tf_q * w).astype(np.float64)  # exact: values < 2^53
    term_arr = pa.array(terms, type=pa.string())

    def score(t: pa.Table) -> pa.Table:
        texts = t.column(text_col)
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        rows, qi = _match_terms(texts, token_pattern, term_arr)
        s = np.bincount(rows, weights=occ_weight[qi],
                        minlength=t.num_rows).astype(np.int64)
        keep = s > 0
        out = pa.table({id_col: t.column(id_col).filter(pa.array(keep)),
                        "score": pa.array(s[keep])})
        if out.num_rows > k:  # local top-k: global sort sees <= k per block
            out = out.sort_by([("score", "descending"),
                               (id_col, "ascending")]).slice(0, k)
        return out

    scored = ds.map_batches(score, batch_format="pyarrow",
                            zero_copy_batch=True, batch_size=batch_size)
    from ..functions.rayutil import global_topk
    return global_topk(scored, [("score", "descending"),
                                (id_col, "ascending")], k)


def _match_terms_dl(texts, token_pattern: str, terms: pa.Array):
    """Like _match_terms, plus each row's TOTAL token count (doc length)."""
    from ..functions.normalize import extract_all_matches

    ml = extract_all_matches(pc.utf8_lower(texts), token_pattern)
    counts = np.asarray(pc.list_value_length(ml), dtype=np.int64)
    flat = pc.list_flatten(ml)
    qi = pc.index_in(flat, value_set=terms)
    rows = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
    hit = np.asarray(pc.is_valid(qi))
    return rows[hit], np.asarray(qi.drop_null(), dtype=np.int64), counts


def bm25_topk(ds, *, id_col: str, text_col: str, query: str, k: int = 20,
              token_pattern: str = "[a-z]+", scale: int = 256,
              batch_size: int = 4096):
    """Top-k docs by integer-quantized BM25 (k1=3/2, b=3/4) against
    ``query`` (distinct query terms; query tf ignored, the short-query BM25
    convention).

    Integer-exact scoring (house rule, see tfidf_topk): with ``w(t) =
    (N*scale) // df(t)``, ``L`` = total corpus tokens and ``dl`` the doc's
    token count, the per-(term,doc) contribution of classic BM25

        idf * tf*(k1+1) / (tf + k1*(1 - b + b*dl/(L/N)))

    multiplied through by ``8L`` becomes the all-integer

        (w * tf * 20 * L) // (8*L*tf + 3*L + 9*dl*N)

    — floor-quantized, so the int64 score sum is bit-exact across engines
    and summation orders (DuckDB ``//`` is the same floor division).
    Overflow guard: ``max(w) * max(tf) * 20 * L`` must stay < 2^63 —
    asserted per batch; lower ``scale`` for larger corpora.

    Same two streaming passes as tfidf_topk (df/L pass + score pass); no
    corpus shuffle; local top-k per batch then a <=k-per-block global sort.
    """
    terms, _ = tokenize_query(query, token_pattern)
    if not terms:
        raise ValueError("query has no terms under token_pattern")
    q = len(terms)
    term_arr = pa.array(terms, type=pa.string())

    def df_partial(t: pa.Table) -> pa.Table:
        texts = t.column(text_col)
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        rows, qi, counts = _match_terms_dl(texts, token_pattern, term_arr)
        pair = np.unique(rows * q + qi)
        dfp = np.bincount(pair % q, minlength=q).astype(np.int64)
        return pa.table({
            "term_idx": pa.array(np.arange(-2, q, dtype=np.int64)),
            "n": pa.array(np.concatenate(
                ([int(counts.sum()), t.num_rows], dfp)))})

    agg = (ds.map_batches(df_partial, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby("term_idx").sum("n"))
    rows_map = {int(r["term_idx"]): int(r["sum(n)"]) for r in agg.take_all()}
    n_docs = rows_map.pop(-1, 0)
    big_l = rows_map.pop(-2, 0)
    df = np.zeros(q, dtype=np.int64)
    for i, v in rows_map.items():
        df[i] = v
    w = np.where(df > 0, (n_docs * scale) // np.maximum(df, 1), 0)
    if n_docs == 0 or big_l == 0:
        raise ValueError("empty corpus under token_pattern")

    w_max = int(w.max())

    def score(t: pa.Table) -> pa.Table:
        texts = t.column(text_col)
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        rows, qi, counts = _match_terms_dl(texts, token_pattern, term_arr)
        key = rows * q + qi
        pair, tf = np.unique(key, return_counts=True)
        tf = tf.astype(np.int64)
        p_row, p_term = pair // q, pair % q
        if len(tf) and w_max * int(tf.max()) * 20 * big_l >= 2 ** 63:
            raise OverflowError("bm25_topk int64 overflow — lower scale")
        contrib = (w[p_term] * tf * 20 * big_l) // (
            8 * big_l * tf + 3 * big_l + 9 * counts[p_row] * n_docs)
        s = np.bincount(p_row, weights=contrib.astype(np.float64),
                        minlength=t.num_rows).astype(np.int64)
        keep = s > 0
        out = pa.table({id_col: t.column(id_col).filter(pa.array(keep)),
                        "score": pa.array(s[keep])})
        if out.num_rows > k:
            out = out.sort_by([("score", "descending"),
                               (id_col, "ascending")]).slice(0, k)
        return out

    scored = ds.map_batches(score, batch_format="pyarrow",
                            zero_copy_batch=True, batch_size=batch_size)
    from ..functions.rayutil import global_topk
    return global_topk(scored, [("score", "descending"),
                                (id_col, "ascending")], k)


def ctfidf_topk(docs, labels, *, id_col: str, text_col: str,
                label_id_col: str, label_col: str, k: int = 5,
                token_pattern: str = "[a-z]{4,}",
                broadcast_max_rows: int = 2_000_000,
                num_buckets: int = 64):
    """Class-based TF-IDF cluster labeling (the BERTopic representation
    step, Grootendorst 2022): for every cluster, the ``k`` terms most
    distinctive of it — score(t, c) = cnt(t, c) · ln(K / df_c(t)) with
    cnt the term's count inside cluster c, K the cluster count and
    df_c(t) the number of clusters containing t. The step that turns an
    opaque embedding-cluster id into something a human can read.

    Scale shape: ONE cogroup join attaches the label to each document
    (the label table is corpus-sized — never broadcast), one (label,
    term) groupby for counts, one term groupby for class-df; the class-df
    table is term-vocab-sized and broadcasts under ``broadcast_max_rows``
    (loud past it). Scores are per-term e9-quantized (integer rows, no
    summation), top-k per cluster via one vocab-sized bucket exchange
    with (score desc, term asc) tie-breaks — hash-exact vs a SQL
    ROW_NUMBER twin. Returns (label, term, cnt, score_e9) rows."""
    import ray as _ray

    from ray.data.aggregate import Count

    from ..functions.normalize import extract_all_matches
    from ..functions.rayutil import (bucketed_group_apply, collect_table,
                                     get_broadcast)
    from ..stages.joins import cogroup_inner_join

    joined = cogroup_inner_join(
        docs.map_batches(
            lambda t: pa.table({"__id": t.column(id_col),
                                "__text": t.column(text_col)}),
            batch_format="pyarrow", zero_copy_batch=True).map_batches(
            lambda t: t.rename_columns(["node", "__text"]),
            batch_format="pyarrow", zero_copy_batch=True),
        labels.map_batches(
            lambda t: pa.table({"node": t.column(label_id_col),
                                "__label": pc.cast(t.column(label_col),
                                                   pa.int64())}),
            batch_format="pyarrow", zero_copy_batch=True),
        key="node", right_cols=["__label"], num_buckets=num_buckets)

    def explode(t: pa.Table) -> pa.Table:
        texts = t.column("__text")
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        ml = extract_all_matches(pc.utf8_lower(texts), token_pattern)
        flat = pc.list_flatten(ml)
        parent = pc.list_parent_indices(ml)
        lab = t.column("__label")
        if isinstance(lab, pa.ChunkedArray):
            lab = lab.combine_chunks()
        return pa.table({"label": lab.take(parent), "term": flat})

    lt_counts = (joined.map_batches(explode, batch_format="pyarrow",
                                    zero_copy_batch=True)
                 .groupby(["label", "term"]).aggregate(Count())
                 .map_batches(
        lambda t: t.rename_columns(["label", "term", "cnt"]),
        batch_format="pyarrow", zero_copy_batch=True).materialize())

    n_classes = (lt_counts.groupby("label").count()).count()
    class_df = (lt_counts.groupby("term").count().map_batches(
        lambda t: t.rename_columns(["term", "df"]),
        batch_format="pyarrow", zero_copy_batch=True))
    n_terms = class_df.count()
    if n_terms > broadcast_max_rows:
        raise ValueError(
            f"{n_terms} distinct terms exceed broadcast_max_rows="
            f"{broadcast_max_rows} — prune the vocabulary (raise the "
            f"token_pattern length floor or add a min-count filter)")
    df_tab = collect_table(class_df, pa.schema(
        [("term", pa.string()), ("df", pa.int64())]))
    df_tab = df_tab.sort_by([("term", "ascending")])
    terms_sorted = df_tab.column("term")
    if isinstance(terms_sorted, pa.ChunkedArray):
        terms_sorted = terms_sorted.combine_chunks()
    # per-term e9-quantized ln(K/df): one driver grid, looked up per row
    idf_e9 = np.floor(np.log(n_classes /
                             np.asarray(df_tab.column("df"),
                                        dtype=np.float64)) * 1e9
                      + 0.5).astype(np.int64)
    ref = _ray.put((terms_sorted, idf_e9))

    def score(t: pa.Table) -> pa.Table:
        terms_arr, idf = get_broadcast(ref)
        pos = pc.index_in(t.column("term"), value_set=terms_arr)
        w = idf[np.asarray(pc.cast(pos, pa.int64()))]
        cnt = np.asarray(t.column("cnt"), dtype=np.int64)
        return pa.table({"label": t.column("label"),
                         "term": t.column("term"),
                         "cnt": pa.array(cnt),
                         "score_e9": pa.array(cnt * w)})

    scored = lt_counts.map_batches(score, batch_format="pyarrow",
                                   zero_copy_batch=True)

    def topk(bucket: pa.Table) -> pa.Table:
        from ..functions.rayutil import segment_starts
        n = bucket.num_rows
        if n == 0:
            return bucket
        starts = np.asarray(segment_starts(bucket.column("label")))
        lens = np.diff(np.append(starts, n))
        pos = np.arange(n, dtype=np.int64) - np.repeat(starts, lens)
        return bucket.filter(pa.array(pos < k))

    return bucketed_group_apply(
        scored, "label", topk, num_buckets=num_buckets,
        sort_cols=[("score_e9", "descending"), ("term", "ascending")])

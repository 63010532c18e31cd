"""Deduplication operators over any (id, text) dataset — the training-data
pipeline ops (exact, MinHash+LSH near-dup, SimHash, n-gram Jaccard).

These generalize the linkage engine's blocking/pairing/clustering stages to
arbitrary document tables (`documents.parquet` in the driver fixtures): the
record-linkage flow *is* near-dedup with a scoring head (SURVEY §2.7).

Scale notes: exact dedup groups on a 128-bit content digest (32 fixed
bytes per row through the exchange instead of the document body); near-dup
reuses exact pre-clustering so verbatim duplicates collapse before any
pair is generated.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..config import PipelineConfig
from ..functions.normalize import normalize_strings
from ..functions.shingles import char_ngram_codes
from .blocking import blocking_stage, exact_precluster
from .clustering import connected_components, expand_clusters
from .pairs import pairs_stage


def attach_singleton_clusters(ds, id_col: str, cc_labeled, *,
                              broadcast_max_rows: int = 2_000_000,
                              cfg: PipelineConfig | None = None,
                              num_partitions: int = 0):
    """(record_id, cluster_id) for EVERY row of `ds`: edge-touched labels come
    from the (small) `cc_labeled` dataset via one broadcast map; everything
    else is its own singleton. Replaces the union+count set-difference shuffle
    of `connected_components(include_singletons=True)` — a measured fixed
    cost on small inputs and an extra all-nodes exchange at scale. Falls back
    to the shuffling path when the labeled set exceeds the broadcast budget.
    """
    import ray as _ray

    from ..functions.rayutil import collect_table, dict_lookup, get_broadcast_dict

    schema = pa.schema([("record_id", pa.string()),
                        ("cluster_id", pa.string())])
    # Count BEFORE collecting: on a high-dup-rate corpus the labeled set can
    # exceed driver memory, so the cap check must gate the collect itself,
    # not run after it (the fallback exists precisely for that case).
    cc_mat = cc_labeled.materialize()
    if cc_mat.count() > broadcast_max_rows:
        from ..config import DEFAULT_CONFIG
        from .clustering import _expand_clusters_cogroup
        members = ds.map_batches(
            lambda t: pa.table({
                "record_id": pc.cast(t.column(id_col), pa.string()),
                "rep_id": pc.cast(t.column(id_col), pa.string())}),
            batch_format="pyarrow", zero_copy_batch=True)
        return _expand_clusters_cogroup(
            members, cc_mat,
            num_buckets=(cfg or DEFAULT_CONFIG).num_buckets)
    lab = collect_table(cc_mat, schema)
    ref = _ray.put(lab)

    def attach(t: pa.Table) -> pa.Table:
        d = get_broadcast_dict(ref, "record_id", "cluster_id")
        rid = pc.cast(t.column(id_col), pa.string())
        return pa.table({
            "record_id": rid,
            "cluster_id": dict_lookup(rid, d, default_to_key=True),
        })

    return ds.map_batches(attach, batch_format="pyarrow", zero_copy_batch=True)


def exact_dedup(ds, *, id_col: str, text_col: str):
    """Survivor id = min(id) per identical text. Vectorized groupby aggregate.

    Oracle-SQL equivalent: SELECT min(id) AS id FROM t GROUP BY text.

    The exchange key is a 128-bit CONTENT DIGEST (32-hex string), not the
    text itself: grouping on raw text ships every document body through
    the all-to-all shuffle, while the digest is a fixed 32 bytes per row
    (~100× fewer exchange bytes on real corpora). Two independent
    tabulation lanes make digest collisions negligible at any scale
    (P < 10^-14 even at 10^12 docs — see ``string_digest128_hex``);
    distinct texts therefore never merge in practice.

    The survivor id is the NUMERIC min: ids are zero-padded to fixed width
    before the string segment-min so lexicographic order == numeric order
    (min('09','10') vs min('9','10') — unpadded string-min picks '10').
    """
    from ..functions.rayutil import grouped_min
    from ..functions.shingles import string_digest128_hex

    def as_str(t: pa.Table) -> pa.Table:
        ids = pc.cast(t.column(id_col), pa.int64())
        assert pc.min(ids).as_py() is None or pc.min(ids).as_py() >= 0, \
            "exact_dedup requires non-negative ids for padded ordering"
        txt = pc.cast(t.column(text_col), pa.string())
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        return pa.table({"__digest": string_digest128_hex(txt),
                         "__id_str": pc.utf8_lpad(pc.cast(ids, pa.string()),
                                                  20, "0")})
    surv = grouped_min(ds.map_batches(as_str, batch_format="pyarrow",
                                      zero_copy_batch=True),
                       "__digest", "__id_str")
    return surv.map_batches(
        lambda t: pa.table({id_col: pc.cast(t.column("__id_str"), pa.int64())}),
        batch_format="pyarrow", zero_copy_batch=True)


def _as_records(ds, *, id_col: str, text_col: str, cfg: PipelineConfig):
    """Adapt any (id, text) dataset to the linkage RECORDS_WIDE shape."""
    def adapt(t: pa.Table) -> pa.Table:
        n = t.num_rows
        empty = pa.array([""] * n, type=pa.string())
        mention = pc.cast(t.column(text_col), pa.string())
        return pa.table({
            "record_id": pc.cast(t.column(id_col), pa.string()),
            "conv_id": empty,
            "turn_idx": pa.array(np.zeros(n, dtype=np.int32)),
            "role": empty,
            "mention": mention,
            "mention_norm": normalize_strings(mention, nfkc=cfg.nfkc),
            "ctx_before": empty,
            "ctx_after": empty,
            "coref_prev": empty,
        })
    return ds.map_batches(adapt, batch_format="pyarrow", zero_copy_batch=True,
                          batch_size=cfg.batch_size)


class JaccardVerifier:
    """Actor-pool pair verifier: exact char-n-gram Jaccard ≥ threshold.

    The near-dup analog of the linkage PairScorer: LSH proposes, exact
    verifies (MinHash is the sketch, never the decision)."""

    def __init__(self, cfg: PipelineConfig, threshold: float):
        self.cfg = cfg
        self.threshold = threshold

    def __call__(self, batch: pa.Table) -> pa.Table:
        # reuses the scorer's whole-batch vectorized Jaccard (dictionary-
        # encode → shingle distinct strings once → one global lexsort) —
        # no per-pair Python loop
        from .scoring import encode_pair_strings, pairwise_jaccard

        mn_a = batch.column("mn_a")
        mn_b = batch.column("mn_b")
        if isinstance(mn_a, pa.ChunkedArray):
            mn_a = mn_a.combine_chunks()
        if isinstance(mn_b, pa.ChunkedArray):
            mn_b = mn_b.combine_chunks()
        idx_a, idx_b, ucodes, usplits = encode_pair_strings(mn_a, mn_b, self.cfg)
        out_j = pairwise_jaccard(idx_a, idx_b, ucodes, usplits)
        return pa.table({
            "id_a": batch.column("id_a"),
            "id_b": batch.column("id_b"),
            "sim_jaccard": pa.array(out_j),
            "is_match": pa.array(out_j >= np.float32(self.threshold)),
        })


def near_dedup_minhash(ds, *, id_col: str, text_col: str,
                       cfg: PipelineConfig, threshold: float = 0.7,
                       num_partitions: int = 8,
                       broadcast_max_rows: int = 2_000_000):
    """MinHash/LSH blocking → windowed pairs → exact-Jaccard verify → CC.

    Returns (record_id, cluster_id): docs sharing a cluster are near-dups;
    survivors are the cluster representatives (min id).

    LSH banding is re-tuned for the near-dup threshold: the linkage default
    (bands=32, rows=2) has its S-curve knee near s≈0.2 and floods the pair
    stage with sub-threshold candidates on wordy documents (measured: 500
    docs → 119k pairs, 38 matches). bands=16/rows=4 puts the knee near
    s≈0.55 for τ=0.7 verification — same 64-hash signature, ~20× fewer pairs.
    """
    import dataclasses
    cfg = dataclasses.replace(cfg, num_perm=64, bands=16, band_rows=4,
                              shingle_unit="word")
    records = _as_records(ds, id_col=id_col, text_col=text_col, cfg=cfg)
    records = exact_precluster(
        records, cfg, num_partitions,
        broadcast_max_rows=broadcast_max_rows).materialize()
    from ..functions.rayutil import adaptive_buckets
    cfg = dataclasses.replace(
        cfg, num_buckets=adaptive_buckets(records.count(), cfg.num_buckets))
    reps = records.map_batches(
        lambda t: t.filter(pc.equal(t.column("record_id"), t.column("rep_id"))).select(
            ["record_id", "mention_norm"]),
        batch_format="pyarrow", zero_copy_batch=True)
    from .salting import salted_blocking
    blocks = salted_blocking(reps, cfg,
                             est_rows=records.count() * cfg.bands)
    pairs = pairs_stage(blocks, cfg, num_partitions)
    verifier = JaccardVerifier(cfg, threshold)
    edges = pairs.map_batches(
        lambda t: verifier(t),
        batch_format="pyarrow", zero_copy_batch=True,
        batch_size=cfg.batch_size)
    matched = edges.map_batches(
        lambda t: t.filter(t.column("is_match")).select(["id_a", "id_b"]),
        batch_format="pyarrow", zero_copy_batch=True)
    rep_clusters = connected_components(reps, matched, cfg, num_partitions,
                                        include_singletons=False)
    return expand_clusters(records, rep_clusters, num_partitions,
                           num_buckets=cfg.num_buckets,
                           broadcast_max_rows=broadcast_max_rows)


def near_dedup_exact(ds, *, id_col: str, text_col: str,
                     cfg: PipelineConfig, tau_num: int = 7,
                     tau_den: int = 10, token_pattern: str = "[a-z]+",
                     ngram: int = 3, num_partitions: int = 8):
    """DETERMINISTIC near-dedup: exact AllPairs/PPJoin Jaccard self-join at
    tau_num/tau_den over distinct word-``ngram`` shingles → connected
    components. Same (record_id, cluster_id) string contract as
    near_dedup_minhash, but with no LSH recall gap — every pair at or above
    the threshold is found, so the result is a pure function of the data
    and SQL-oracle-checkable (prepare_corpus near_mode="exact" relies on
    this). Costs one extra prefix-code exchange vs the LSH path; pick LSH
    when the threshold is low or shingle sets are huge."""
    from .clustering import connected_components, expand_clusters
    from .simjoin import similarity_self_join

    pairs = similarity_self_join(ds, id_col=id_col, text_col=text_col,
                                 tau_num=tau_num, tau_den=tau_den,
                                 token_pattern=token_pattern, ngram=ngram)
    edges = pairs.map_batches(
        lambda t: pa.table({
            "id_a": pc.cast(t.column("id_a"), pa.string()),
            "id_b": pc.cast(t.column("id_b"), pa.string())}),
        batch_format="pyarrow", zero_copy_batch=True)
    nodes = ds.map_batches(
        lambda t: pa.table({
            "record_id": pc.cast(t.column(id_col), pa.string())}),
        batch_format="pyarrow", zero_copy_batch=True)
    rep_clusters = connected_components(nodes, edges, cfg, num_partitions,
                                        include_singletons=False)
    with_rep = nodes.map_batches(
        lambda t: pa.table({"record_id": t.column("record_id"),
                            "rep_id": t.column("record_id")}),
        batch_format="pyarrow", zero_copy_batch=True)
    return expand_clusters(with_rep, rep_clusters, num_partitions,
                           num_buckets=cfg.num_buckets)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash_column(texts: pa.Array, k: int = 3, unit: str = "char") -> np.ndarray:
    """64-bit SimHash per string from char- or word-k-gram hashes (vectorized).

    sim(x,y) ≈ 1 - hamming(simhash(x), simhash(y))/64. Word unit for document
    near-dup (char-grams saturate on shared vocabulary, same reasoning as
    near_dedup_minhash).
    """
    if unit == "word":
        from ..functions.shingles import word_ngram_codes
        codes, splits = word_ngram_codes(texts, k)
    else:
        codes, splits = char_ngram_codes(texts, k)
    n = len(splits) - 1
    bits = np.unpackbits(codes.view(np.uint8).reshape(-1, 8), axis=1,
                         bitorder="little").astype(np.int32) * 2 - 1
    acc = np.zeros((n, 64), dtype=np.int64)
    lens = splits[1:] - splits[:-1]
    nonempty = np.nonzero(lens > 0)[0]
    if len(nonempty):
        acc[nonempty] = np.add.reduceat(bits, splits[:-1][nonempty], axis=0)
    words = (acc > 0).astype(np.uint8)
    return np.packbits(words, axis=1, bitorder="little").view(np.uint64).ravel()


class SimHashStage:
    """map_batches: add int64 `simhash` column (bit-view for shuffle keys)."""

    def __init__(self, text_col: str, k: int = 3, unit: str = "char"):
        self.text_col = text_col
        self.k = k
        self.unit = unit

    def __call__(self, batch: pa.Table) -> pa.Table:
        t = batch.column(self.text_col)
        if isinstance(t, pa.ChunkedArray):
            t = t.combine_chunks()
        sh = simhash_column(t, self.k, self.unit)
        return batch.append_column("simhash", pa.array(sh.view(np.int64)))


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized popcount for uint64 (numpy 1.x has no bitwise_count)."""
    v = x.copy()
    out = np.zeros(x.shape, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for _ in range(8):
            out += v & np.uint64(0x0101010101010101)
            v >>= np.uint64(1)
        # fold byte counts
        out = (out * np.uint64(0x0101010101010101)) >> np.uint64(56)
    return out


def near_dedup_simhash(ds, *, id_col: str, text_col: str, max_hamming: int = 3,
                       num_partitions: int = 8,
                       cfg: PipelineConfig | None = None,
                       block_cap: int = 512, counters=None):
    """SimHash near-dup: band the 64-bit simhash into 4×16-bit chunks
    (pigeonhole: hamming ≤ 3 ⇒ at least one identical chunk), block on chunks,
    verify hamming within blocks, CC over matches.

    Execution follows the engine's shuffle rules (functions/rayutil): chunk
    blocks run through ONE bucketed shuffle-reduce (not a per-distinct-key
    map_groups over up to 4×65,536 keys), and band dedup is the sorted
    adjacent-duplicate filter (pairs._dedup_bucket — measured 10× faster than
    a multi-string-key Count aggregate). Segments larger than `block_cap`
    keep the `block_cap` lowest record_ids; drops are COUNTED via `counters`
    (a rayutil.DropCounter), never silent.
    """
    from ..config import DEFAULT_CONFIG
    from ..functions.rayutil import bucketed_group_apply, segment_starts
    from .pairs import _dedup_bucket
    cfg = cfg or DEFAULT_CONFIG

    with_sh = ds.map_batches(SimHashStage(text_col, unit="word"),
                             batch_format="pyarrow", zero_copy_batch=True)

    def explode(t: pa.Table) -> pa.Table:
        sh = np.asarray(t.column("simhash").combine_chunks()
                        if isinstance(t.column("simhash"), pa.ChunkedArray)
                        else t.column("simhash"), dtype=np.int64).view(np.uint64)
        ids = pc.cast(t.column(id_col), pa.string())
        n = len(sh)
        keys, rows = [], []
        for c in range(4):
            chunk = ((sh >> np.uint64(16 * c)) & np.uint64(0xFFFF)).astype(np.int64)
            keys.append(chunk + (c << 16))
            rows.append(np.arange(n))
        return pa.table({
            "block_key": pa.array(np.concatenate(keys)),
            "record_id": ids.take(pa.array(np.concatenate(rows))),
            "simhash": pa.array(np.concatenate([sh.view(np.int64)] * 4)),
        })

    blocks = with_sh.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)

    def _empty_edges() -> pa.Table:
        return pa.table({"id_a": pa.array([], type=pa.string()),
                         "id_b": pa.array([], type=pa.string())})

    def pair_bucket(bucket: pa.Table) -> pa.Table:
        # whole bucket sorted by (block_key, record_id); Python touches only
        # real multi-member segments — same structure as pairs.PairGen
        n = bucket.num_rows
        if n == 0:
            return _empty_edges()
        starts = segment_starts(bucket.column("block_key"))
        lens = np.diff(np.append(starts, n))
        multi = np.nonzero(lens >= 2)[0]
        if len(multi) == 0:
            return _empty_edges()
        sh = np.asarray(bucket.column("simhash"), dtype=np.int64).view(np.uint64)
        xs_all, ys_all = [], []
        dropped = 0
        for si in multi:
            s, ln = int(starts[si]), int(lens[si])
            if ln > block_cap:
                dropped += ln - block_cap  # lowest record_ids kept (sorted)
                ln = block_cap
            seg = sh[s:s + ln]
            ham = _popcount64(seg[:, None] ^ seg[None, :])
            iu, ju = np.triu_indices(ln, k=1)
            hit = ham[iu, ju] <= np.uint64(max_hamming)
            xs_all.append(s + iu[hit])
            ys_all.append(s + ju[hit])
        if dropped and counters is not None:
            counters.add("simhash_block_cap_dropped", dropped)
        ids = bucket.column("record_id")
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        return pa.table({
            "id_a": ids.take(pa.array(np.concatenate(xs_all))),
            "id_b": ids.take(pa.array(np.concatenate(ys_all))),
        })

    raw_edges = bucketed_group_apply(
        blocks, "block_key", pair_bucket,
        num_buckets=cfg.num_buckets,
        sort_cols=[("record_id", "ascending")])
    # band dedup: duplicates of a pair always share id_a → bucket by id_a,
    # adjacent-duplicate filter after the in-bucket (id_a, id_b) sort
    edges = bucketed_group_apply(
        raw_edges, "id_a", _dedup_bucket,
        num_buckets=cfg.num_buckets,
        sort_cols=[("id_b", "ascending")])

    nodes = ds.map_batches(
        lambda t: pa.table({"record_id": pc.cast(t.column(id_col), pa.string())}),
        batch_format="pyarrow", zero_copy_batch=True)
    cc = connected_components(nodes, edges, cfg, num_partitions,
                              include_singletons=False)
    return attach_singleton_clusters(ds, id_col, cc, cfg=cfg,
                                     num_partitions=num_partitions)


def flag_contaminated(corpus, benchmark, *, id_col: str, text_col: str,
                      n: int = 5):
    """Benchmark decontamination: flag every corpus doc sharing at least one
    word-n-gram with any benchmark doc (the standard test-set-overlap filter
    for training corpora; n-gram semantics per word_ngram_codes — docs with
    fewer than n tokens contribute one whole-doc shingle).

    Scale shape: the benchmark side is collected once on the driver
    (benchmarks are small by definition — unique gram hashes, not text),
    ``ray.put`` once, and each corpus batch runs one vectorized
    ``np.isin`` + segment any-reduce. No shuffle at all on the corpus side.
    """
    import ray as _ray

    from ..functions.rayutil import collect_table, get_broadcast
    from ..functions.shingles import word_ngram_codes

    bench_grams = benchmark.map_batches(
        lambda t: pa.table(
            {"g": word_ngram_codes(t.column(text_col).combine_chunks()
                                   if isinstance(t.column(text_col),
                                                 pa.ChunkedArray)
                                   else t.column(text_col), n=n)[0]}),
        batch_format="pyarrow", zero_copy_batch=True)
    grams = np.unique(np.asarray(
        collect_table(bench_grams,
                      pa.schema([("g", pa.uint64())])).column("g"),
        dtype=np.uint64))
    ref = _ray.put(grams)

    class Flagger:
        def __init__(self):
            self.grams = get_broadcast(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            col = t.column(text_col)
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            codes, splits = word_ngram_codes(col, n=n)
            hit = np.isin(codes, self.grams)
            lens = np.diff(splits)
            seg = np.zeros(len(lens), dtype=bool)
            nz = lens > 0
            if nz.any():
                seg[nz] = np.logical_or.reduceat(hit, splits[:-1][nz])
            return t.append_column("contaminated", pa.array(seg))

    return corpus.map_batches(Flagger, batch_format="pyarrow",
                              zero_copy_batch=True, concurrency=(1, 8))


def ngram_repetition(ds, *, id_col: str, text_col: str, n: int = 5):
    """Within-document n-gram repetition counts: (total word-n-grams,
    distinct word-n-grams) per doc — the standard repetition-quality signal
    (a doc with total >> distinct is boilerplate/looping output). Integer
    outputs so the DuckDB oracle hashes exactly. Stateless map, no shuffle.
    """
    from ..functions.shingles import unique_shingle_sets, word_ngram_codes

    def stats(t: pa.Table) -> pa.Table:
        col = t.column(text_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        codes, splits = word_ngram_codes(col, n=n)
        uniq = unique_shingle_sets(codes, splits)
        total = np.diff(splits)
        distinct = np.diff(np.asarray(uniq.offsets, dtype=np.int64))
        return pa.table({id_col: t.column(id_col),
                         "total_grams": pa.array(total),
                         "distinct_grams": pa.array(distinct)})

    return ds.map_batches(stats, batch_format="pyarrow", zero_copy_batch=True)


def diff_corpora(old, new, *, id_col: str, text_col: str,
                 num_buckets: int = 256):
    """Snapshot delta between two corpus versions: one row per id with
    ``status`` in {added, removed, changed, unchanged}.

    The audit step an incremental training-data pipeline runs before
    reprocessing a crawl: only `added`/`changed` ids need the expensive
    stages re-run (pair with pipelines/incremental.py and the
    checkpointed variants).

    One FULL OUTER co-group exchange on the id (stages/joins.py::
    cogroup_join_multi) carrying both text columns; status is a pair of
    vectorized null/equality checks per bucket. Ids must be unique per
    side (a snapshot key). At 100 TB, pre-hash the text to 8 bytes
    (textstats.rolling_text_hash) and diff the hashes instead — same
    operator, 1000× thinner exchange; the raw-text form below is kept
    because it is exactly SQL-checkable.
    """
    from .joins import cogroup_join_multi

    o = old.map_batches(
        lambda t: pa.table({id_col: t.column(id_col),
                            "__old": t.column(text_col)}),
        batch_format="pyarrow", zero_copy_batch=True)
    nw = new.map_batches(
        lambda t: pa.table({id_col: t.column(id_col),
                            "__new": t.column(text_col)}),
        batch_format="pyarrow", zero_copy_batch=True)
    def _side_schema(ds, payload):
        s = ds.schema()
        id_t = (s.base_schema.field(id_col).type if s is not None
                else pa.int64())
        return pa.schema([(id_col, id_t), (payload, pa.string())])

    joined = cogroup_join_multi(o, nw, key=id_col, left_cols=["__old"],
                                right_cols=["__new"], how="full",
                                num_buckets=num_buckets,
                                left_schema=_side_schema(old, "__old"),
                                right_schema=_side_schema(new, "__new"))

    def status(t: pa.Table) -> pa.Table:
        has_old = pc.is_valid(t.column("__old"))
        has_new = pc.is_valid(t.column("__new"))
        same = pc.equal(t.column("__old"), t.column("__new"))
        st = pc.if_else(
            pc.and_(has_old, has_new),
            pc.if_else(same, "unchanged", "changed"),
            pc.if_else(has_new, "added", "removed"))
        return pa.table({id_col: t.column(id_col),
                         "status": pc.cast(st, pa.string())})

    return joined.map_batches(status, batch_format="pyarrow",
                              zero_copy_batch=True)


def keep_latest(ds, *, key: str, order_cols: list[str],
                num_buckets: int = 256):
    """Dedup-by-recency: keep each key's single greatest row under the
    (order_cols) lexicographic order, carrying ALL columns — the
    "newest version of every document wins" op an incremental corpus
    needs after merging crawls (SQL: QUALIFY row_number() OVER
    (PARTITION BY key ORDER BY ... DESC) = 1).

    One bucket exchange sorted descending by order_cols; the winner per
    key is just each segment's head row — one segment_starts + one take,
    no per-key Python. ``order_cols`` must totally order rows within a
    key (include a unique id) for a deterministic result — same contract
    SQL has.
    """
    from ..functions.rayutil import bucketed_group_apply, segment_starts

    def head(bucket: pa.Table) -> pa.Table:
        n = bucket.num_rows
        if n == 0:
            return bucket
        starts = np.asarray(segment_starts(bucket.column(key)))
        return bucket.take(pa.array(starts))

    return bucketed_group_apply(
        ds, key, head, num_buckets=num_buckets,
        sort_cols=[(c, "descending") for c in order_cols])


def word_ngram_strings(texts: pa.Array, n: int = 5
                       ) -> tuple[pa.Array, np.ndarray]:
    """Word n-gram STRINGS with their row indices — (grams, row_idx),
    unordered within a row. word_ngram_codes contract: tokens are maximal
    ``\\S+`` runs; rows with 0 tokens emit no gram; 0 < tokens < n emit one
    whole-row gram. Fully vectorized: token gather via ``take`` on the flat
    token array + one ``binary_join_element_wise`` for the sliding grams,
    one ``binary_join`` for the short rows."""
    from ..functions.normalize import extract_all_matches
    from ..functions.shingles import _ragged_arange

    ml = extract_all_matches(texts, r"\S+")
    counts = np.asarray(pc.list_value_length(ml), dtype=np.int64)
    flat = pc.list_flatten(ml)
    offsets = np.concatenate(([0], np.cumsum(counts)))

    slide = counts >= n
    g_slide = np.where(slide, counts - n + 1, 0)
    starts = np.repeat(offsets[:-1], g_slide) + _ragged_arange(g_slide)
    if n > 1:
        parts = [flat.take(pa.array(starts + i)) for i in range(n)]
        grams_slide = pc.binary_join_element_wise(*parts, " ")
    else:
        grams_slide = flat.take(pa.array(starts))
    rows_slide = np.repeat(np.arange(len(counts), dtype=np.int64), g_slide)

    short = (counts > 0) & ~slide
    grams_short = pc.binary_join(ml.filter(pa.array(short)), " ")
    rows_short = np.nonzero(short)[0].astype(np.int64)

    grams = pa.concat_arrays([
        grams_slide.combine_chunks() if isinstance(grams_slide, pa.ChunkedArray)
        else grams_slide,
        grams_short.combine_chunks() if isinstance(grams_short, pa.ChunkedArray)
        else grams_short])
    return grams, np.concatenate([rows_slide, rows_short])


def dup_passages(ds, *, text_col: str, n: int = 5, min_docs: int = 2,
                 out_gram: str = "gram", out_count: str = "n_docs"):
    """Duplicate-passage mining: every word ``n``-gram appearing in at least
    ``min_docs`` DISTINCT documents, with its distinct-document count — the
    discovery half of exact-substring training-data dedup (Lee et al.,
    "Deduplicating Training Data Makes Language Models Better", ACL 2022
    finds duplicate spans; this surfaces them as an auditable table; feed
    the result to ``decontaminate`` to cut the spans).

    Plan: per batch, distinct (doc, gram) pairs via one dictionary-encode +
    one np.unique (a doc's row is never split across batches, so per-batch
    distinct == global distinct contribution) -> per-batch (gram, partial
    distinct-doc count) -> one groupby-sum over unique grams -> threshold.
    The exchange carries each batch's UNIQUE grams once, never the corpus;
    at extreme scale swap in a first pass over gram HASHES to prefilter
    grams below ``min_docs`` before shipping strings (two-pass variant,
    same contract)."""

    def partial(t: pa.Table) -> pa.Table:
        texts = t.column(text_col)
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        grams, rows = word_ngram_strings(texts, n)
        if len(grams) == 0:
            return pa.table({out_gram: pa.array([], type=pa.string()),
                             "n": pa.array([], type=pa.int64())})
        enc = pc.dictionary_encode(grams)
        codes = np.asarray(enc.indices, dtype=np.int64)
        pair = np.unique(codes * t.num_rows + rows)
        cnt = np.bincount(pair // t.num_rows,
                          minlength=len(enc.dictionary)).astype(np.int64)
        keep = cnt > 0
        return pa.table({out_gram: enc.dictionary.filter(pa.array(keep)),
                         "n": pa.array(cnt[keep])})

    agg = (ds.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby(out_gram).sum("n"))

    def fin(t: pa.Table) -> pa.Table:
        t = t.rename_columns([out_gram, out_count])
        return t.filter(pc.greater_equal(t.column(out_count),
                                         pa.scalar(min_docs)))

    return agg.map_batches(fin, batch_format="pyarrow", zero_copy_batch=True)


def dup_ratio(ds, *, id_col: str, text_col: str, n: int = 5,
              min_docs: int = 2, num_buckets: int = 64,
              out_col: str = "dup_e6"):
    """Per-document duplication ratio: for each doc with >= 1 word n-gram,
    the fraction (floor-scaled to 1e6) of its DISTINCT n-grams that appear
    in at least ``min_docs`` distinct documents — the per-doc score
    training-data pipelines threshold on to drop near-boilerplate docs
    (the action half of dup_passages; Lee et al. ACL 2022). Docs with zero
    tokens emit no row (same contract as the SQL twin, which starts from
    the gram table).

    Plan: per-batch DISTINCT (gram, doc) pairs (a doc's row is never split
    across batches, so batch-distinct == global-distinct) → one gram-keyed
    bucketed pass marks each pair's gram as duplicated via segment sizes
    (np.add.reduceat) → one doc-keyed groupby folds (dup_count, gram_count)
    → floor-scaled ratio. Two exchanges, both carrying the distinct pair
    table (proportional to corpus tokens, same class as dup_passages)."""
    from ..functions.rayutil import bucketed_group_apply, segment_starts

    sch = ds.schema()
    id_type = getattr(sch, "base_schema", sch).field(id_col).type

    def pairs_partial(t: pa.Table) -> pa.Table:
        texts = t.column(text_col)
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        grams, rows = word_ngram_strings(texts, n)
        if len(grams) == 0:
            return pa.table({"gram": pa.array([], type=pa.string()),
                             id_col: pa.array([], type=id_type)})
        ids = t.column(id_col)
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        enc = pc.dictionary_encode(grams)
        codes = np.asarray(enc.indices, dtype=np.int64)
        u = np.unique(codes * t.num_rows + rows)
        return pa.table({"gram": enc.dictionary.take(pa.array(u // t.num_rows)),
                         id_col: ids.take(pa.array(u % t.num_rows))})

    pairs = ds.map_batches(pairs_partial, batch_format="pyarrow",
                           zero_copy_batch=True)

    def per_gram(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table({id_col: pa.array([], type=id_type),
                             "dup": pa.array([], type=pa.int64()),
                             "one": pa.array([], type=pa.int64())})
        starts = segment_starts(g.column("gram"))
        sizes = np.add.reduceat(np.ones(g.num_rows, dtype=np.int64), starts)
        seg_of = np.repeat(np.arange(len(starts)),
                           np.diff(np.append(starts, g.num_rows)))
        dup = (sizes[seg_of] >= min_docs).astype(np.int64)
        return pa.table({id_col: g.column(id_col), "dup": pa.array(dup),
                         "one": pa.array(np.ones(g.num_rows, dtype=np.int64))})

    flagged = bucketed_group_apply(pairs, "gram", per_gram,
                                   num_buckets=num_buckets)
    agg = flagged.groupby(id_col).sum(["dup", "one"])

    def fin(t: pa.Table) -> pa.Table:
        d = np.asarray(t.column("sum(dup)"), dtype=np.int64)
        c = np.asarray(t.column("sum(one)"), dtype=np.int64)
        return pa.table({id_col: t.column(id_col),
                         out_col: pa.array(d * 1_000_000 // c)})

    return agg.map_batches(fin, batch_format="pyarrow", zero_copy_batch=True)


def drop_high_dup_ratio(ds, *, id_col: str, text_col: str, n: int = 5,
                        min_docs: int = 2, max_dup_e6: int = 500_000,
                        num_buckets: int = 64):
    """Boilerplate drop — the ACTION half of ``dup_ratio`` (Lee et al. ACL
    2022 apply the threshold the score half computes): keep every document
    whose duplication ratio is <= ``max_dup_e6`` (floor-scaled 1e6).
    Documents with zero word n-grams have no score row and are KEPT (nothing
    to judge them on), which is why the filter is an ANTI join against the
    DROPPED id set rather than a semi join against survivors.

    Scale shape: dup_ratio's two bucketed exchanges produce a skinny
    (id, dup_e6) table; the over-threshold ids feed the engine's bucketed
    semi/anti join (right side reduced to distinct keys per batch) — the
    full documents never shuffle. Output schema == input schema.
    """
    from .joins import semi_anti_join

    scores = dup_ratio(ds, id_col=id_col, text_col=text_col, n=n,
                       min_docs=min_docs, num_buckets=num_buckets)
    thr = int(max_dup_e6)

    def over(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater(t.column("dup_e6"), thr)).select([id_col])

    dropped = scores.map_batches(over, batch_format="pyarrow",
                                 zero_copy_batch=True)
    return semi_anti_join(ds, dropped, key=id_col, anti=True,
                          num_buckets=num_buckets)

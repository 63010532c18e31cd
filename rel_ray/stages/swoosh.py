"""Distributed iterative match-merge entity resolution (R-Swoosh family).

Published algorithm: Benjelloun, Garcia-Molina et al., "Swoosh: a generic
approach to entity resolution" (VLDB Journal 2009); the distributed
blocking-based round structure follows D-Swoosh (ICDCS 2007). REL parity
anchor: REL's candidate-selection + disambiguation loop resolves each
mention once against a FIXED entity store; match-merge is the harder
variant the store itself needs at build time — merging two entity records
can surface evidence that matches a third record neither parent matched.

Model (ICAR by construction, so the fixpoint is order-independent and the
result deterministic):

* a record is a SET of evidence tokens (field-prefixed strings, e.g.
  ``email:bob@x``, ``phone:555``, produced by the caller's tokenizer);
* match(r, s)  =  |tokens(r) ∩ tokens(s)| ≥ ``theta``;
* merge(r, s)  =  token-set union.

Union-merge is idempotent/commutative/associative and each parent is
represented by the merge, so greedy merge order cannot change the
fixpoint — which is exactly why a bulk-synchronous distributed rounds
formulation computes the same answer as sequential R-Swoosh.

Round = one Ray Data pass, no driver row loops:
  1. (cluster, token) state → bucket exchange on token → per-token
     triangular cluster-pair expansion (capped per token: a stopword-ish
     token shared by k clusters would emit k²/2 pairs; over-cap tokens
     are dropped and COUNTED via DropCounter — standard blocking-cap
     semantics, same contract as stages/pairs.py);
  2. pair → groupby count = EXACT |token intersection| (each shared
     token emits the pair once) → filter ≥ theta → match edges;
  3. connected components over the touched clusters (int-code driver
     fast path, distributed label-propagation fallback — the engine's
     clustering machinery);
  4. relabel state + record map through the CC labels (broadcast map
     under ``broadcast_max_rows``, cogroup LEFT join past it) and dedup
     merged token sets (one groupby).
Rounds repeat until a round finds no match edges (every round strictly
decreases the cluster count, so termination is guaranteed; ``max_rounds``
is a loud backstop, not a silent truncation).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _relabel(ds, col: str, labels, *, broadcast_max_rows: int,
             num_buckets: int):
    """Map ``col`` through labels (code -> cluster_code; a driver pa.Table
    from the CC fast path, or a Dataset from the distributed fallback);
    ids absent from the label table keep their value. Broadcast fast path
    under ``broadcast_max_rows``, cogroup LEFT join otherwise — the label
    set never has to fit on the driver."""
    import ray as _ray
    import ray.data as rd

    from ..functions.rayutil import get_broadcast
    from ..stages.joins import cogroup_inner_join

    if isinstance(labels, pa.Table):
        if labels.num_rows == 0:
            return ds
        if labels.num_rows <= broadcast_max_rows:
            lab = labels.sort_by([("code", "ascending")])
            ref = _ray.put((np.asarray(lab.column("code"),
                                       dtype=np.int64),
                            np.asarray(lab.column("cluster_code"),
                                       dtype=np.int64)))

            def remap(t: pa.Table) -> pa.Table:
                codes, roots = get_broadcast(ref)
                v = np.asarray(t.column(col), dtype=np.int64)
                pos = np.searchsorted(codes, v)
                pos_c = np.minimum(pos, len(codes) - 1)
                hit = codes[pos_c] == v
                out = np.where(hit, roots[pos_c], v)
                idx = t.schema.get_field_index(col)
                return t.set_column(idx, col, pa.array(out))

            return ds.map_batches(remap, batch_format="pyarrow",
                                  zero_copy_batch=True)
        labels = rd.from_arrow(labels)

    lab_ds = labels.map_batches(
        lambda t, c=col: t.rename_columns([c, "__root"]),
        batch_format="pyarrow", zero_copy_batch=True)
    joined = cogroup_inner_join(ds, lab_ds, key=col,
                                right_cols=["__root"], how="left",
                                num_buckets=num_buckets)

    def fold(t: pa.Table) -> pa.Table:
        root = t.column("__root")
        if isinstance(root, pa.ChunkedArray):
            root = root.combine_chunks()
        merged = pc.if_else(pc.is_valid(root), root,
                            pc.cast(t.column(col), pa.int64()))
        idx = t.schema.get_field_index(col)
        return t.set_column(idx, col, merged).drop_columns(["__root"])

    return joined.map_batches(fold, batch_format="pyarrow",
                              zero_copy_batch=True)


def match_merge(records, *, id_col: str = "record_id",
                token_col: str = "token", theta: int = 2,
                max_clusters_per_token: int = 256,
                max_rounds: int = 16,
                broadcast_max_rows: int = 2_000_000,
                num_buckets: int = 64, counters=None):
    """Iterative match-merge ER over a (record, evidence-token) table.

    ``records``: Dataset with ``id_col`` (int64 record code — dense-code
    string ids upstream, the engine-wide idiom) and ``token_col``
    (string evidence tokens, field-prefixed). Duplicate (id, token) rows
    are fine. Returns a Dataset (``id_col``, cluster_id) mapping every
    input record to its fixpoint entity, cluster_id = min record code in
    the merged entity.

    See module docstring for semantics, scale shape and the cap
    contract."""
    from ray.data.aggregate import Count

    from ..config import DEFAULT_CONFIG as CFG
    from ..functions.rayutil import bucketed_group_apply, segment_starts
    from ..stages.clustering import connected_components_codes

    # state: one row per (cluster, token), initially clusters == records
    state = records.map_batches(
        lambda t: pa.table({
            "c": pc.cast(t.column(id_col), pa.int64()),
            "token": t.column(token_col)}),
        batch_format="pyarrow", zero_copy_batch=True
    ).groupby(["c", "token"]).count().map_batches(
        lambda t: t.select(["c", "token"]),
        batch_format="pyarrow", zero_copy_batch=True).materialize()

    # record -> cluster map (identity at start)
    rec_map = records.map_batches(
        lambda t: pa.table({
            id_col: pc.cast(t.column(id_col), pa.int64())}),
        batch_format="pyarrow", zero_copy_batch=True
    ).groupby(id_col).count().map_batches(
        lambda t: pa.table({
            id_col: t.column(id_col),
            "cluster_id": t.column(id_col)}),
        batch_format="pyarrow", zero_copy_batch=True).materialize()

    def token_pairs(bucket: pa.Table) -> pa.Table:
        n = bucket.num_rows
        empty = pa.table({"a": pa.array([], type=pa.int64()),
                          "b": pa.array([], type=pa.int64())})
        if n == 0:
            return empty
        c = np.asarray(bucket.column("c"), dtype=np.int64)
        starts = np.asarray(segment_starts(bucket.column("token")))
        lens = np.diff(np.append(starts, n))
        over = lens > max_clusters_per_token
        if over.any() and counters is not None:
            counters.add("swoosh_tokens_over_cap", int(over.sum()))
        lens_eff = np.where(over, 0, lens)
        pos = np.arange(n, dtype=np.int64) - np.repeat(starts, lens)
        later = np.repeat(lens_eff, lens) - 1 - pos
        later = np.maximum(later, 0)
        total = int(later.sum())
        if total == 0:
            return empty
        left_idx = np.repeat(np.arange(n, dtype=np.int64), later)
        block_starts = np.cumsum(later) - later
        k = (np.arange(total, dtype=np.int64)
             - np.repeat(block_starts, later))
        right_idx = left_idx + k + 1
        return pa.table({"a": pa.array(c[left_idx]),
                         "b": pa.array(c[right_idx])})

    for _ in range(max_rounds):
        pairs = bucketed_group_apply(
            state, "token", token_pairs, num_buckets=num_buckets,
            sort_cols=[("c", "ascending")])
        edges = (pairs.groupby(["a", "b"]).aggregate(Count())
                 .map_batches(
            lambda t: t.filter(pc.greater_equal(t.column("count()"),
                                                theta)).select(["a", "b"])
            .rename_columns(["id_a", "id_b"]),
            batch_format="pyarrow", zero_copy_batch=True).materialize())
        if edges.count() == 0:
            break
        lab = connected_components_codes(edges, CFG)
        if lab is None:
            # topology exceeds the driver fast path: general distributed
            # CC; labels stay a Dataset and the relabel goes cogroup-side
            from ..stages.clustering import connected_components
            lab = connected_components(
                edges.map_batches(
                    lambda t: pa.table({"record_id": t.column("id_a")}),
                    batch_format="pyarrow", zero_copy_batch=True).union(
                    edges.map_batches(
                        lambda t: pa.table({"record_id": t.column("id_b")}),
                        batch_format="pyarrow", zero_copy_batch=True)),
                edges, CFG, include_singletons=False).materialize()
        state = _relabel(state, "c", lab,
                         broadcast_max_rows=broadcast_max_rows,
                         num_buckets=num_buckets)
        state = state.groupby(["c", "token"]).count().map_batches(
            lambda t: t.select(["c", "token"]),
            batch_format="pyarrow", zero_copy_batch=True).materialize()
        rec_map = _relabel(rec_map, "cluster_id", lab,
                           broadcast_max_rows=broadcast_max_rows,
                           num_buckets=num_buckets).materialize()
        # loop-carried cogroup outputs compound block counts, and the
        # retained plan DAG slows every execution even at stable block
        # counts (see rayutil.sever_lineage) — compact + sever per round
        from ..functions.rayutil import sever_lineage
        if state.num_blocks() > 2 * num_buckets:
            state = state.repartition(num_buckets).materialize()
        if rec_map.num_blocks() > 2 * num_buckets:
            rec_map = rec_map.repartition(num_buckets).materialize()
        state = sever_lineage(state)
        rec_map = sever_lineage(rec_map)
    else:
        raise RuntimeError(
            f"match_merge did not reach a fixpoint in {max_rounds} rounds "
            f"— raise max_rounds (every round strictly merges, so this "
            f"indicates an adversarial chain, not livelock)")

    return rec_map

"""Incremental linkage: link a NEW batch of transcripts against a FROZEN
prior clustering without touching the old corpus.

REL parity anchor: this is the batch analog of REL's serving contract —
every request is linked against a FIXED entity store built earlier
(REL:src/REL/server.py handling requests against the loaded wiki stores);
the store is never re-resolved per request. At 100 TB this is the daily
shape: yesterday's resolved entities are the store, today's crawl is the
increment, and only the increment is shuffled/scored.

Semantics (standard incremental entity resolution):

* A new record whose normalized mention EXACTLY matches a stored surface
  form is assigned that form's existing cluster id — handled by the rep
  map itself, zero extra machinery (see below).
* Otherwise the new mention is blocked/scored against BOTH the store's
  surface forms and the other new mentions; connected components over the
  matched edges assign each component either an EXISTING cluster id (if
  the component touches the store) or a fresh one (min new record id).
  Exact surface-form hits take precedence over the component label: a
  component that fuzzily bridges several store entries adopts the
  smallest old cluster id for its non-exact members, but never drags an
  exact match off its own form's cluster.
* Existing cluster ids are NEVER changed or merged: pairs with both ends
  in the store are dropped before scoring (the old corpus is not
  re-evaluated), and a component that touches several store entries
  deterministically adopts the lexicographically smallest cluster id —
  the others keep their old membership untouched.

Mechanism: store entries enter the rep universe as pseudo-records whose
record_id is ``"!" + cluster_id``. ``"!"`` (0x21) sorts before every id
character the corpus can produce, so (a) ``grouped_min`` over
mention_norm makes the store entry the rep wherever a surface form is
shared — exact matches anchor to the old cluster with no join — and (b)
min-label connected components give any component that touches the store
a ``"!"``-prefixed label, which is stripped into the old cluster id on
output. One sentinel, both anchoring rules.

Scale: the only wide shuffle is the new batch's conversation stage; the
store rides as a broadcast Arrow table (one ``ray.put``, per-process
dict build), same contract as the flagship's rep map — the
``broadcast_max_rows`` guard refuses stores that should use the bucketed
co-group fallback instead of silently OOMing workers.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..config import DEFAULT_CONFIG, PipelineConfig

_STORE_SCHEMA = pa.schema([("mention_norm", pa.string()),
                           ("cluster_id", pa.string())])


def build_entity_store(linkage_out):
    """Flagship output → entity store Dataset (mention_norm, cluster_id):
    one row per distinct surface form, mapped to its stable cluster id.

    records supplies (record_id, mention_norm); clusters supplies
    (record_id, cluster_id); the co-group join + grouped_min collapse to
    one row per surface form (all records sharing a form share a cluster,
    so min is just deterministic selection)."""
    from ..functions.rayutil import grouped_min
    from ..stages.joins import cogroup_inner_join

    recs = linkage_out["records"].map_batches(
        lambda t: t.select(["record_id", "mention_norm"]),
        batch_format="pyarrow", zero_copy_batch=True)
    cls = linkage_out["clusters"].map_batches(
        lambda t: t.select(["record_id", "cluster_id"]),
        batch_format="pyarrow", zero_copy_batch=True)
    joined = cogroup_inner_join(cls, recs, key="record_id",
                                right_cols=["mention_norm"])
    return grouped_min(joined, "mention_norm", "cluster_id")


def incremental_link(
    new_transcripts,
    store,
    cfg: PipelineConfig = DEFAULT_CONFIG,
    *,
    broadcast_max_rows: int = 2_000_000,
):
    """Link ``new_transcripts`` against a frozen ``store`` (Dataset or
    pyarrow Table with columns mention_norm, cluster_id).

    Returns {"records", "edges", "assignments"}; assignments has one row
    per new record: (record_id, cluster_id, matched_old) where
    ``matched_old`` marks attachment to a pre-existing cluster.
    """
    import dataclasses

    import numpy as np  # noqa: F401  (scorer state warm import)
    import ray as _ray
    import ray.data as rd

    from ..functions.rayutil import (adaptive_buckets, collect_table,
                                     dict_lookup, get_broadcast_dict,
                                     grouped_min)
    from ..stages.blocking import records_stage
    from ..stages.clustering import connected_components
    from ..stages.conversation import conversation_stage
    from ..stages.pairs import pairs_stage
    from ..stages.salting import salted_blocking
    from ..stages.scoring import scoring_stage

    cfg = dataclasses.replace(
        cfg, num_buckets=adaptive_buckets(new_transcripts.count(),
                                          cfg.num_buckets))

    if isinstance(store, pa.Table):
        store_tab = store
    else:
        store_tab = collect_table(store, _STORE_SCHEMA)
    if store_tab.num_rows > broadcast_max_rows:
        raise ValueError(
            f"store has {store_tab.num_rows} surface forms > "
            f"broadcast_max_rows={broadcast_max_rows}; shard the store or "
            "raise the limit (co-group fallback: resolve reps with "
            "stages/joins.cogroup_inner_join instead of the broadcast dict)")

    turns = conversation_stage(new_transcripts, cfg)
    records0 = records_stage(turns, cfg).repartition(16).materialize()

    mn = store_tab.column("mention_norm")
    if isinstance(mn, pa.ChunkedArray):
        mn = mn.combine_chunks()
    cl = store_tab.column("cluster_id")
    if isinstance(cl, pa.ChunkedArray):
        cl = cl.combine_chunks()
    pseudo = pa.table({
        "record_id": pc.binary_join_element_wise(
            pa.array(["!"] * store_tab.num_rows, type=pa.string()), cl, ""),
        "mention_norm": mn})

    new_mentions = records0.map_batches(
        lambda t: t.select(["record_id", "mention_norm"]),
        batch_format="pyarrow", zero_copy_batch=True)
    chunk = max(1024, pseudo.num_rows // 16 + 1)
    pseudo_ds = rd.from_arrow(
        [pseudo.slice(i, chunk)
         for i in range(0, max(pseudo.num_rows, 1), chunk)])
    # "!" < any corpus id char → store entries win shared surface forms:
    # the exact-match fast path IS the rep map
    rep_map = grouped_min(new_mentions.union(pseudo_ds), "mention_norm",
                          "record_id", num_buckets=cfg.num_buckets)
    _rep_schema = pa.schema([("mention_norm", pa.string()),
                             ("record_id", pa.string())])
    rep_tab = collect_table(rep_map, _rep_schema)
    rep_ref = _ray.put(rep_tab)

    chunk = max(1024, rep_tab.num_rows // 64 + 1)
    reps = rd.from_arrow([rep_tab.slice(i, chunk)
                          for i in range(0, max(rep_tab.num_rows, 1), chunk)])

    blocks = salted_blocking(reps, cfg, est_rows=rep_tab.num_rows * cfg.bands)
    pairs = pairs_stage(blocks, cfg)

    def drop_old_old(t: pa.Table) -> pa.Table:
        # never re-evaluate (or merge) the frozen store against itself
        both_old = pc.and_(pc.starts_with(t.column("id_a"), "!"),
                           pc.starts_with(t.column("id_b"), "!"))
        return t.filter(pc.invert(both_old))

    pairs = pairs.map_batches(drop_old_old, batch_format="pyarrow",
                              zero_copy_batch=True)
    edges = scoring_stage(pairs, cfg).materialize()
    matched = edges.map_batches(
        lambda t: t.filter(t.column("is_match")).select(["id_a", "id_b"]),
        batch_format="pyarrow", zero_copy_batch=True)

    def coref_resolve(t: pa.Table) -> pa.Table:
        rows = t.filter(pc.not_equal(t.column("coref_prev_mn"), ""))
        if rows.num_rows == 0:
            return pa.table({"id_a": pa.array([], type=pa.string()),
                             "id_b": pa.array([], type=pa.string())})
        d = get_broadcast_dict(rep_ref, "mention_norm", "record_id")
        rep_b = dict_lookup(rows.column("mention_norm"), d)
        rep_a = dict_lookup(rows.column("coref_prev_mn"), d, default="")
        lo = pc.min_element_wise(rep_a, rep_b)
        hi = pc.max_element_wise(rep_a, rep_b)
        out = pa.table({"id_a": lo, "id_b": hi})
        out = out.filter(pc.not_equal(out.column("id_a"), ""))
        return out.filter(pc.not_equal(out.column("id_a"),
                                       out.column("id_b")))

    coref = records0.map_batches(coref_resolve, batch_format="pyarrow",
                                 zero_copy_batch=True)

    rep_clusters = connected_components(reps, matched.union(coref), cfg,
                                        include_singletons=False)
    _cc_schema = pa.schema([("record_id", pa.string()),
                            ("cluster_id", pa.string())])
    cl_ref = _ray.put(collect_table(rep_clusters, _cc_schema))

    store_ref = _ray.put(store_tab)

    def assign(t: pa.Table) -> pa.Table:
        # precedence: (1) exact surface-form hit pins to THAT cluster —
        # a component bridging several store entries must not drag an
        # exact match onto a sibling old cluster; (2) component label,
        # old (stripped "!") or fresh (min new record id)
        store_d = get_broadcast_dict(store_ref, "mention_norm", "cluster_id")
        reps_d = get_broadcast_dict(rep_ref, "mention_norm", "record_id")
        cls_d = get_broadcast_dict(cl_ref, "record_id", "cluster_id")
        exact = dict_lookup(t.column("mention_norm"), store_d, default="")
        r = dict_lookup(t.column("mention_norm"), reps_d)
        c = dict_lookup(r, cls_d, default_to_key=True)
        hit = pc.not_equal(exact, "")
        old = pc.or_(hit, pc.starts_with(c, "!"))
        return pa.table({
            "record_id": t.column("record_id"),
            "cluster_id": pc.if_else(
                hit, exact,
                pc.if_else(pc.starts_with(c, "!"),
                           pc.utf8_slice_codeunits(c, 1), c)),
            "matched_old": old})

    assignments = records0.map_batches(assign, batch_format="pyarrow",
                                       zero_copy_batch=True)
    return {"records": records0, "edges": edges, "assignments": assignments}


def merge_entity_stores(store_a, store_b, cfg: PipelineConfig = DEFAULT_CONFIG,
                        *, num_partitions: int = 8, num_buckets: int = 64,
                        broadcast_max_rows: int = 2_000_000):
    """Merge two frozen entity stores (mention_norm, cluster_id) into one.

    A surface form present in BOTH stores is evidence its two cluster ids
    name the same real-world entity, so the merge is connected components
    over cluster ids with shared-form bridge edges (the store-level analog
    of the flagship's exact pre-cluster step; REL parity: combining two
    wiki-version p(e|m) stores). The merged id is the component MINIMUM —
    the engine-wide survivor rule, which keeps the merge idempotent
    (merge(a, a) == a) and associative up to id choice.

    Scale shape: one bucketed pass over the unioned stores emits star
    bridge edges (head -> other ids per shared form, vectorized via
    segment heads); CC runs on the skinny cluster-id graph (edges <= rows
    of the smaller store); the final remap reuses expand_clusters — Arrow
    broadcast under `broadcast_max_rows`, bucketed co-group above it.
    Nothing document-sized ever shuffles.
    """
    from ..functions.rayutil import (bucketed_group_apply, grouped_min,
                                     segment_starts)
    from ..stages.clustering import connected_components, expand_clusters

    union = store_a.union(store_b)

    def bridge(g: pa.Table) -> pa.Table:
        n = g.num_rows
        if n == 0:
            return pa.table({"id_a": pa.array([], type=pa.string()),
                             "id_b": pa.array([], type=pa.string())})
        starts = segment_starts(g.column("mention_norm"))
        seg_of = np.repeat(np.arange(len(starts)),
                           np.diff(np.append(starts, n)))
        cl = g.column("cluster_id")
        if isinstance(cl, pa.ChunkedArray):
            cl = cl.combine_chunks()
        head = cl.take(pa.array(starts[seg_of]))
        keep = pc.not_equal(head, cl)
        return pa.table({"id_a": head.filter(keep), "id_b": cl.filter(keep)})

    edges = bucketed_group_apply(union, "mention_norm", bridge,
                                 num_buckets=num_buckets,
                                 sort_cols=[("cluster_id", "ascending")])
    nodes = union.map_batches(
        lambda t: pa.table({"record_id": t.column("cluster_id")}),
        batch_format="pyarrow", zero_copy_batch=True)
    cc = connected_components(nodes, edges, cfg, num_partitions,
                              include_singletons=False)
    as_members = union.map_batches(
        lambda t: pa.table({"record_id": t.column("mention_norm"),
                            "rep_id": t.column("cluster_id")}),
        batch_format="pyarrow", zero_copy_batch=True)
    mapped = expand_clusters(as_members, cc, num_partitions,
                             num_buckets=num_buckets,
                             broadcast_max_rows=broadcast_max_rows)
    renamed = mapped.map_batches(
        lambda t: pa.table({"mention_norm": t.column("record_id"),
                            "cluster_id": t.column("cluster_id")}),
        batch_format="pyarrow", zero_copy_batch=True)
    # a form present in both stores now carries the same merged id twice;
    # grouped_min is pure dedup at that point
    return grouped_min(renamed, "mention_norm", "cluster_id",
                       num_buckets=num_buckets)

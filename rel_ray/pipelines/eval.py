"""M8: pairwise-F1 evaluation and threshold calibration (the correctness gate).

REL analog: micro-P/R/F1 vs gold (``REL:src/REL/entity_disambiguation.py``
eval path, GERBIL protocol). Here: a labeled pair (id_a,id_b) is predicted
positive iff both records land in the same cluster; F1 over the `test` split
must be ≥ 0.99 (BASELINE.json:metric).

All lookups are join-free co-groups (rel_ray.functions.rayutil explains why
Dataset.join is avoided engine-wide).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def _attach_cluster(pairs_ds, clusters, key_col: str, out_col: str):
    """Attach cluster_id of `key_col`'s record to each labeled pair row.

    Co-group: pair rows keyed by key_col + cluster rows keyed by record_id;
    one sort-shuffle. Pairs whose record is missing from `clusters` are
    dropped (inner semantics)."""

    def pair_side(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table({
            "key": t.column(key_col),
            "id_a": t.column("id_a"),
            "id_b": t.column("id_b"),
            "same_entity": t.column("same_entity"),
            "cluster_a": (t.column("cluster_a") if "cluster_a" in t.column_names
                          else pa.array([""] * n, type=pa.string())),
            "cluster": pa.array([""] * n, type=pa.string()),
            "is_cluster_row": pa.array([False] * n),
        })

    def cluster_side(t: pa.Table) -> pa.Table:
        n = t.num_rows
        empty = pa.array([""] * n, type=pa.string())
        return pa.table({
            "key": t.column("record_id"),
            "id_a": empty,
            "id_b": empty,
            "same_entity": pa.array([False] * n),
            "cluster_a": empty,
            "cluster": t.column("cluster_id"),
            "is_cluster_row": pa.array([True] * n),
        })

    u = pairs_ds.map_batches(pair_side, batch_format="pyarrow",
                             zero_copy_batch=True).union(
        clusters.map_batches(cluster_side, batch_format="pyarrow",
                             zero_copy_batch=True))

    def attach(group: pa.Table) -> pa.Table:
        mask = group.column("is_cluster_row")
        cl = pc.filter(group.column("cluster"), mask)
        rows = group.filter(pc.invert(mask))
        if len(cl) == 0 or rows.num_rows == 0:
            return pa.table({
                "id_a": pa.array([], type=pa.string()),
                "id_b": pa.array([], type=pa.string()),
                "same_entity": pa.array([], type=pa.bool_()),
                "cluster_a": pa.array([], type=pa.string()),
                out_col: pa.array([], type=pa.string()),
            })
        cid = cl[0].as_py()
        out = pa.table({
            "id_a": rows.column("id_a"),
            "id_b": rows.column("id_b"),
            "same_entity": rows.column("same_entity"),
            "cluster_a": rows.column("cluster_a"),
            out_col: pa.array([cid] * rows.num_rows, type=pa.string()),
        })
        if out_col == "cluster_a":  # first pass overwrote the placeholder
            out = out.select(["id_a", "id_b", "same_entity", out_col])
        return out

    def attach_fn(group: pa.Table) -> pa.Table:
        return attach(group)

    return u.groupby("key").map_groups(attach_fn, batch_format="pyarrow")


def pairwise_f1(clusters, labels, *, split: str = "test",
                num_partitions: int = 0) -> dict:
    """clusters: Dataset (record_id, cluster_id); labels: Dataset (LABELS schema)."""
    lab = labels.map_batches(
        lambda t: t.filter(pc.equal(t.column("split"), split)).select(
            ["id_a", "id_b", "same_entity"]),
        batch_format="pyarrow", zero_copy_batch=True)

    withA = _attach_cluster(lab, clusters, "id_a", "cluster_a")
    withAB = _attach_cluster(withA, clusters, "id_b", "cluster_b")

    def confusion(t: pa.Table) -> pa.Table:
        pred = pc.equal(t.column("cluster_a"), t.column("cluster_b"))
        gold = t.column("same_entity")
        as_i64 = lambda x: pc.cast(x, pa.int64())
        return pa.table({
            "tp": as_i64(pc.and_(pred, gold)),
            "fp": as_i64(pc.and_(pred, pc.invert(gold))),
            "fn": as_i64(pc.and_(pc.invert(pred), gold)),
            "n": pa.array([1] * t.num_rows, type=pa.int64()),
        })

    conf = withAB.map_batches(confusion, batch_format="pyarrow",
                              zero_copy_batch=True).materialize()
    tp = conf.sum("tp") or 0
    fp = conf.sum("fp") or 0
    fn = conf.sum("fn") or 0
    n = conf.sum("n") or 0
    precision = tp / (tp + fp) if tp + fp else 0.0
    recall = tp / (tp + fn) if tp + fn else 0.0
    f1 = 2 * precision * recall / (precision + recall) if precision + recall else 0.0
    return {"tp": int(tp), "fp": int(fp), "fn": int(fn), "n_pairs": int(n),
            "precision": precision, "recall": recall, "f1": f1}


def fit_threshold(edges, labels, records=None, *, split: str = "calib",
                  num_partitions: int = 0) -> dict:
    """Sweep score thresholds on the calib split; return the best-F1 threshold.

    REL analog: the LogisticRegression confidence calibration
    (``REL:src/REL/entity_disambiguation.py::train_LR``).

    Labeled pairs reference *member* records while edges are scored between
    exact-group *representatives*; pass `records` (with rep_id) to map label
    endpoints onto reps first. Pairs whose two endpoints share a rep are
    exact duplicates → score 1.0. The joined (score, same_entity) table is
    small (labeled calib pairs only), so the sweep runs driver-side.
    """
    import numpy as np

    lab = labels.map_batches(
        lambda t: t.filter(pc.equal(t.column("split"), split)).select(
            ["id_a", "id_b", "same_entity"]),
        batch_format="pyarrow", zero_copy_batch=True)

    if records is not None:
        rep_map = records.map_batches(
            lambda t: pa.table({"record_id": t.column("record_id"),
                                "cluster_id": t.column("rep_id")}),
            batch_format="pyarrow", zero_copy_batch=True)
        lab = _attach_cluster(lab, rep_map, "id_a", "cluster_a")
        lab = _attach_cluster(lab, rep_map, "id_b", "cluster_b")
        lab = lab.map_batches(
            lambda t: pa.table({
                "id_a": pc.min_element_wise(t.column("cluster_a"),
                                            t.column("cluster_b")),
                "id_b": pc.max_element_wise(t.column("cluster_a"),
                                            t.column("cluster_b")),
                "same_entity": t.column("same_entity")}),
            batch_format="pyarrow", zero_copy_batch=True)

    def key_pairs(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table({
            "key": pc.binary_join_element_wise(t.column("id_a"),
                                               t.column("id_b"), "\x1f"),
            "same_entity": t.column("same_entity"),
            "score": pa.array([float("nan")] * n, type=pa.float32()),
            "is_edge": pa.array([False] * n),
        })

    def key_edges(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table({
            "key": pc.binary_join_element_wise(t.column("id_a"),
                                               t.column("id_b"), "\x1f"),
            "same_entity": pa.array([False] * n),
            "score": pc.cast(t.column("score"), pa.float32()),
            "is_edge": pa.array([True] * n),
        })

    u = lab.map_batches(key_pairs, batch_format="pyarrow",
                        zero_copy_batch=True).union(
        edges.map_batches(key_edges, batch_format="pyarrow", zero_copy_batch=True))

    def resolve(group: pa.Table) -> pa.Table:
        mask = group.column("is_edge")
        sc = pc.filter(group.column("score"), mask)
        rows = group.filter(pc.invert(mask))
        if rows.num_rows == 0:
            return pa.table({"same_entity": pa.array([], type=pa.bool_()),
                             "score": pa.array([], type=pa.float32())})
        # same-rep pairs: id_a == id_b after rep mapping → exact dup → 1.0
        key = rows.column("key")[0].as_py()
        a, b = key.split("\x1f")
        if a == b:
            val = 1.0
        elif len(sc):
            val = sc[0].as_py()
        else:
            val = 0.0
        return pa.table({
            "same_entity": rows.column("same_entity"),
            "score": pa.array([val] * rows.num_rows, type=pa.float32()),
        })

    def resolve_fn(group: pa.Table) -> pa.Table:
        return resolve(group)

    joined = u.groupby("key").map_groups(resolve_fn, batch_format="pyarrow")
    tbl = pa.concat_tables(
        [pa.table(b) for b in joined.iter_batches(batch_format="pyarrow")],
        promote_options="default")
    score = np.nan_to_num(tbl.column("score").to_numpy(zero_copy_only=False), nan=0.0)
    gold = tbl.column("same_entity").to_numpy(zero_copy_only=False).astype(bool)
    best = {"threshold": 0.5, "f1": -1.0}
    for thr in np.linspace(0.2, 0.9, 71):
        pred = score >= thr
        tp = int((pred & gold).sum())
        fp = int((pred & ~gold).sum())
        fn = int((~pred & gold).sum())
        p = tp / (tp + fp) if tp + fp else 0.0
        r = tp / (tp + fn) if tp + fn else 0.0
        f1 = 2 * p * r / (p + r) if p + r else 0.0
        if f1 > best["f1"]:
            best = {"threshold": float(thr), "f1": f1, "precision": p, "recall": r}
    return best

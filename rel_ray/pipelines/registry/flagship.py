"""Registry segment: auto-split from pipelines/queries.py (round 5).
Shared helpers in ._common; the public dicts live in pipelines.queries."""
from ._common import *  # noqa: F401,F403


_ROLE_BY_EVENT = {"click": "user", "view": "user", "signup": "user",
                  "purchase": "assistant", "error": "tool"}

_EVENT_TEMPLATES = [
    "ok, i will check with {m} about the schedule tomorrow.",
    "as discussed, {m} sent the revised draft earlier today.",
    "the ticket was reassigned to {m} after the standup.",
    "per the notes, {m} approved the deployment window.",
    "reminder: {m} owns the follow-up on this thread.",
]


def transcripts_from_events(sf_dir: str):
    """Deterministic transcripts-shaped table synthesized from events
    (the input_hint schema; entity mentions injected as a pure function of
    event_id so clusters are non-trivial and reproducible)."""
    from ...synth import _make_entities

    rng = np.random.default_rng(42)
    entities = _make_entities(rng, 40)
    forms: list[str] = []
    for e in entities:
        forms.append(e["variants"][0])
        forms.append(e["variants"][1 % len(e["variants"])])
        forms.append(e["variants"][2 % len(e["variants"])])
    forms_arr = np.array(forms, dtype=object)  # 3 forms per entity, index = 3*e+v

    ds = _pq(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])

    def to_turns(t: pa.Table) -> pa.Table:
        eid = t.column("event_id").to_numpy()
        etype = t.column("event_type").to_pylist()
        ent = (eid % 40) * 3 + (eid // 40) % 3
        texts = []
        roles = []
        tools = []
        for i, e in enumerate(etype):
            role = _ROLE_BY_EVENT.get(e, "user")
            roles.append(role)
            if role == "tool":
                tools.append(e)
                texts.append('{"status": "error", "code": 500}')
            else:
                tools.append("")
                m = forms_arr[ent[i]]
                texts.append(_EVENT_TEMPLATES[eid[i] % len(_EVENT_TEMPLATES)]
                             .format(m=m))
        conv = pc.binary_join_element_wise(
            pa.array(["c"] * t.num_rows),
            pc.utf8_lpad(pc.cast(t.column("user_id"), pa.string()), width=6,
                         padding="0"), "")
        return pa.table({
            "conv_id": conv,
            "event_id": t.column("event_id"),
            "role": pa.array(roles, type=pa.string()),
            "text": pa.array(texts, type=pa.string()),
            "tool": pa.array(tools, type=pa.string()),
            "ts": t.column("ts"),
        })

    turns = ds.map_batches(to_turns, batch_format="pyarrow", zero_copy_batch=True)

    from ...functions.rayutil import bucketed_group_apply, segment_starts

    def assign_turn_idx(bucket: pa.Table) -> pa.Table:
        # sorted by (conv_id, ts, event_id); turn_idx = ragged arange
        n = bucket.num_rows
        if n == 0:
            return pa.table({
                "conv_id": pa.array([], type=pa.string()),
                "turn_idx": pa.array([], type=pa.int32()),
                "role": pa.array([], type=pa.string()),
                "text": pa.array([], type=pa.string()),
                "tool": pa.array([], type=pa.string()),
                "ts": pa.array([], type=pa.timestamp("us")),
            })
        starts = segment_starts(bucket.column("conv_id"))
        lens = np.diff(np.append(starts, n))
        seg_start_per_row = np.repeat(np.cumsum(lens) - lens, lens)
        turn_idx = (np.arange(n, dtype=np.int64) - seg_start_per_row).astype(np.int32)
        return pa.table({
            "conv_id": bucket.column("conv_id"),
            "turn_idx": pa.array(turn_idx),
            "role": bucket.column("role"),
            "text": bucket.column("text"),
            "tool": bucket.column("tool"),
            "ts": bucket.column("ts"),
        })

    return bucketed_group_apply(
        turns, "conv_id", assign_turn_idx, num_buckets=256,
        sort_cols=[("ts", "ascending"), ("event_id", "ascending")])


def q_linkage_clusters(sf_dir: str):
    """Flagship: full record-linkage pipeline on the events-derived
    transcripts.

    Oracle (round 5): the record universe is fully SQL-derivable (the
    same events→transcripts→mention-explosion CTE that makes
    context_windows_events value-exact), so the emitted record_id
    column is VALUE-EXACT — the pipeline must assign every derived
    record exactly once, losing none and inventing none — plus the
    shared min-id clustering invariants (_cluster_check_view) asserted
    TRUE by the SQL. The cluster CONTENT (LSH + scoring + CC) is gated
    by the pairwise-F1 ≥ 0.99 tests."""
    from ..linkage import run_linkage
    tr = transcripts_from_events(sf_dir)
    out = run_linkage(tr, CFG)
    return _cluster_check_view(out["clusters"].map_batches(
        lambda t: t.select(["record_id", "cluster_id"]),
        batch_format="pyarrow", zero_copy_batch=True))


# records_stage drops mention-less rows (mention_norm == '') before
# linkage — the SQL record universe applies the same normalization
# predicate (the expression the conversation_windows oracle proves
# SQL-identical to functions.normalize.normalize_strings on this corpus)
_SQL_MN = (r"regexp_replace(trim(regexp_replace(lower(mention), '\s+', "
           r"' ', 'g')), '^(dr|prof|ms|mr|mrs)\.? ', '')")


def _sql_linkage_cluster_check() -> str:
    return f"""
WITH recs AS ({_context_windows_sql()})
SELECT record_id, TRUE AS cluster_le_ok, TRUE AS root_self_ok
FROM recs WHERE {_SQL_MN} <> ''
"""


def _sql_linkage_cluster_check_odd() -> str:
    """Incremental-link oracle: the odd-user-half record universe."""
    return f"""
WITH recs AS ({_context_windows_sql()})
SELECT record_id, TRUE AS assigned_ok
FROM recs WHERE CAST(substr(conv_id, 2) AS BIGINT) % 2 = 1
  AND {_SQL_MN} <> ''
"""


def q_train_pair_scorer(sf_dir: str):
    """REL training-path analog (pipelines/eval.py::train_pair_weights):
    distributed logistic regression over UNGATED pair features
    (threshold=0 disables the exact JW gate) for the labeled fixture's
    train split — per-batch gradient partial sums, driver full-batch
    steps.

    Identity oracle (float fixpoint): one emitted row of booleans the
    SQL asserts TRUE — all learned weights/bias finite, the final loss
    below the ln 2 chance level (the trainer actually learned), and
    train accuracy ≥ 0.9 on the deterministic labeled fixture (the
    measured fixture accuracy is ≈1.0; exact loss-curve monotonicity is
    pinned in tests)."""
    import dataclasses

    import ray.data as rd

    from ...functions.rayutil import dict_lookup
    from ...stages.blocking import records_stage
    from ...stages.conversation import conversation_stage
    from ...stages.scoring import scoring_stage
    from ...synth import generate_corpus
    from ..eval import train_pair_weights

    tables = generate_corpus(seed=31, n_convs=200)
    turns = conversation_stage(rd.from_arrow(tables["transcripts"]), CFG)
    recs = pa.concat_tables(
        [pa.table(b) for b in records_stage(turns, CFG)
         .iter_batches(batch_format="pyarrow")])
    mn_of = dict(zip(recs.column("record_id").to_pylist(),
                     recs.column("mention_norm").to_pylist()))

    # the fixture's calibration split is the training set (the test
    # split stays untouched for the F1 gate)
    lab = tables["labels"].filter(
        pc.equal(tables["labels"].column("split"), "calib"))
    pairs = pa.table({
        "id_a": lab.column("id_a"), "id_b": lab.column("id_b"),
        "mn_a": dict_lookup(lab.column("id_a"), mn_of, default=""),
        "mn_b": dict_lookup(lab.column("id_b"), mn_of, default=""),
        "same_entity": lab.column("same_entity")})
    pairs = pairs.filter(pc.and_(pc.not_equal(pairs.column("mn_a"), ""),
                                 pc.not_equal(pairs.column("mn_b"), "")))
    y_of = dict(zip(
        pc.binary_join_element_wise(pairs.column("id_a"),
                                    pairs.column("id_b"), "|").to_pylist(),
        pairs.column("same_entity").to_pylist()))

    ungated = dataclasses.replace(CFG, threshold=0.0)
    feats = scoring_stage(
        rd.from_arrow(pairs.select(["id_a", "id_b", "mn_a", "mn_b"])),
        ungated)

    def attach_y(t: pa.Table) -> pa.Table:
        k = pc.binary_join_element_wise(t.column("id_a"),
                                        t.column("id_b"), "|")
        return t.append_column(
            "same_entity",
            dict_lookup(k, y_of, value_type=pa.bool_()))

    labeled = feats.map_batches(attach_y, batch_format="pyarrow",
                                zero_copy_batch=True).materialize()
    res = train_pair_weights(labeled)
    import math
    finite = all(math.isfinite(v) for v in res["weights"].values()) \
        and math.isfinite(res["bias"])
    return pa.table({
        "weights_finite": pa.array([bool(finite)]),
        "loss_below_chance": pa.array(
            [res["loss_curve"][-1] < math.log(2.0)]),
        "train_acc_ge_090": pa.array([res["accuracy"] >= 0.9])})


SQL_TRAIN_PAIR_SCORER = """
SELECT TRUE AS weights_finite, TRUE AS loss_below_chance,
       TRUE AS train_acc_ge_090
"""


def q_entity_summary(sf_dir: str):
    """The user-facing ENTITY TABLE (REL's end product, aggregated): one
    row per resolved entity — member count, distinct conversations, and
    the most frequent surface form (pipelines/linkage.py::entity_summary;
    one bucketed exchange computes all three stats vectorized).

    Oracle: the per-entity member counts must SUM to the SQL-derivable
    total record count (no record lost or double-counted by the
    aggregate), emitted with three engine-verified shape invariants
    (every entity non-empty, n_convs in [1, n_records], a non-null top
    form); the cluster contents are F1-gated."""
    from ray.data.aggregate import Min, Sum

    from ..linkage import entity_summary, run_linkage

    out = run_linkage(transcripts_from_events(sf_dir), CFG)
    summ = entity_summary(out["clusters"], out["records"])

    def fold(t: pa.Table) -> pa.Table:
        nr = np.asarray(t.column("n_records"), dtype=np.int64)
        nc = np.asarray(t.column("n_convs"), dtype=np.int64)
        ok = bool(((nr >= 1) & (nc >= 1) & (nc <= nr)).all()
                  and t.column("top_form").null_count == 0)
        return pa.table({
            "ok": pa.array([int(ok)]),
            "members": pa.array([int(nr.sum())], type=pa.int64())})

    agg = (summ.map_batches(fold, batch_format="pyarrow",
                            zero_copy_batch=True)
           .aggregate(Min("ok"), Sum("members")))
    return pa.table({
        "n_records": pa.array([int(agg["sum(members)"] or 0)],
                              type=pa.int64()),
        "shape_ok": pa.array([bool(agg["min(ok)"])])})


def _sql_entity_summary_check() -> str:
    return f"""
WITH recs AS ({_context_windows_sql()})
SELECT CAST(COUNT(*) AS BIGINT) AS n_records, TRUE AS shape_ok
FROM recs WHERE {_SQL_MN} <> ''
"""


def q_blocking_metrics(sf_dir: str):
    """Blocking-quality report (pipelines/eval.py::blocking_metrics): pair
    completeness + reduction ratio of the flagship's LSH blocking against
    a deterministic labeled corpus (labels mapped to exact-precluster
    reps, same id space as the candidate pairs).

    Identity oracle (the fixture is synthesized, so SQL can't see the
    counts): one emitted row of booleans the SQL asserts TRUE —
    found ≤ true, both metrics inside [0, 1], and pair completeness ≥
    0.99 (the blocking-recall floor the F1 ≥ 0.99 gate implies on this
    fixture). The metric arithmetic itself is pinned in
    tests/test_eval.py."""
    import ray.data as rd

    from ...functions.rayutil import dict_lookup
    from ...synth import generate_corpus
    from ..eval import blocking_metrics
    from ..linkage import run_linkage

    tables = generate_corpus(seed=21, n_convs=300)
    out = run_linkage(rd.from_arrow(tables["transcripts"]), CFG)
    recs = pa.concat_tables(
        [pa.table(b) for b in out["records"]
         .iter_batches(batch_format="pyarrow")])
    rep_of = dict(zip(recs.column("record_id").to_pylist(),
                      recs.column("rep_id").to_pylist()))

    def to_reps(t: pa.Table) -> pa.Table:
        a = dict_lookup(t.column("id_a"), rep_of, default_to_key=True)
        b = dict_lookup(t.column("id_b"), rep_of, default_to_key=True)
        keep = pc.not_equal(a, b)  # same-rep pairs are matched pre-blocking
        return pa.table({"id_a": a, "id_b": b,
                         "same_entity": t.column("same_entity"),
                         "split": t.column("split")}).filter(keep)

    labels = rd.from_arrow(tables["labels"]).map_batches(
        to_reps, batch_format="pyarrow", zero_copy_batch=True)
    bm = blocking_metrics(out["pairs"], labels, n_records=len(rep_of))
    comp = bm.column("pair_completeness")[0].as_py()
    red = bm.column("reduction_ratio")[0].as_py()
    found = bm.column("true_pairs_found")[0].as_py()
    true = bm.column("n_true_pairs")[0].as_py()
    return pa.table({
        "found_le_true": pa.array([found <= true]),
        "metrics_in_01": pa.array([0.0 <= comp <= 1.0
                                   and 0.0 <= red <= 1.0]),
        "completeness_ge_099": pa.array([comp >= 0.99])})


SQL_BLOCKING_METRICS = """
SELECT TRUE AS found_le_true, TRUE AS metrics_in_01,
       TRUE AS completeness_ge_099
"""


def q_incremental_link(sf_dir: str):
    """Incremental linkage (pipelines/incremental.py): resolve the
    even-user half of the corpus into a frozen entity store, then link the
    odd-user half against it — the daily-increment shape at 100 TB.

    Oracle: the new-half record universe is SQL-derivable (recs CTE
    restricted to odd user_ids), so record_id is VALUE-EXACT — one
    assignment per new record — plus a per-row boolean asserting a
    non-null cluster and a valid matched_old flag; attachment semantics
    are pinned in tests/test_incremental.py."""
    from ..incremental import build_entity_store, incremental_link
    from ..linkage import run_linkage

    tr = transcripts_from_events(sf_dir)

    def split(even: bool):
        def f(t: pa.Table) -> pa.Table:
            n = pc.cast(pc.utf8_slice_codeunits(t.column("conv_id"), 1),
                        pa.int64())
            m = pc.equal(pc.bit_wise_and(n, 1), 0 if even else 1)
            return t.filter(m)
        return f

    old_tr = tr.map_batches(split(True), batch_format="pyarrow",
                            zero_copy_batch=True)
    new_tr = tr.map_batches(split(False), batch_format="pyarrow",
                            zero_copy_batch=True)
    store = build_entity_store(run_linkage(old_tr, CFG)).materialize()
    assigns = incremental_link(new_tr, store, CFG)["assignments"]
    # oracle projection: the odd-half record universe is SQL-derivable
    # (the recs CTE restricted to odd user_ids); every new record must
    # get exactly one non-null assignment with a boolean matched_old
    return assigns.map_batches(
        lambda t: pa.table({
            "record_id": t.column("record_id"),
            "assigned_ok": pc.and_(
                pc.is_valid(t.column("cluster_id")),
                pc.is_valid(pc.cast(t.column("matched_old"),
                                    pa.bool_())))}),
        batch_format="pyarrow", zero_copy_batch=True)


def q_merge_stores_transcripts(sf_dir: str):
    """Entity-store MERGE (pipelines/incremental.py::merge_entity_stores):
    resolve the two corpus halves independently into frozen stores, then
    merge — shared surface forms bridge cluster ids, connected components
    over the skinny id graph pick the min-id survivor (the REL analog of
    combining two wiki-version p(e|m) stores).

    Oracle: the merged store's mention_norm universe is VALUE-EXACT —
    it must equal the DISTINCT normalized mentions of the whole corpus
    (the same normalization expression the conversation_windows oracle
    proves SQL-identical) — plus a per-row non-null cluster boolean;
    bridging/transitivity/idempotence are pinned in
    tests/test_incremental.py."""
    from ..incremental import build_entity_store, merge_entity_stores
    from ..linkage import run_linkage

    tr = transcripts_from_events(sf_dir)

    def split(even: bool):
        def f(t: pa.Table) -> pa.Table:
            n = pc.cast(pc.utf8_slice_codeunits(t.column("conv_id"), 1),
                        pa.int64())
            m = pc.equal(pc.bit_wise_and(n, 1), 0 if even else 1)
            return t.filter(m)
        return f

    a = build_entity_store(run_linkage(
        tr.map_batches(split(True), batch_format="pyarrow",
                       zero_copy_batch=True), CFG)).materialize()
    b = build_entity_store(run_linkage(
        tr.map_batches(split(False), batch_format="pyarrow",
                       zero_copy_batch=True), CFG)).materialize()
    merged = merge_entity_stores(a, b, CFG)
    return merged.map_batches(
        lambda t: pa.table({
            "mention_norm": t.column("mention_norm"),
            "cluster_ok": pc.is_valid(t.column("cluster_id"))}),
        batch_format="pyarrow", zero_copy_batch=True)


def _sql_merge_stores_check() -> str:
    return rf"""
WITH recs AS ({_context_windows_sql()})
SELECT DISTINCT {_SQL_MN} AS mention_norm, TRUE AS cluster_ok
FROM recs WHERE {_SQL_MN} <> ''
"""


def q_linkage_edges(sf_dir: str):
    """Scored candidate edges from the flagship pipeline.

    Identity oracle (the LSH candidate set itself is not
    SQL-derivable): per-batch folds verify over EVERY edge that
    (a) id_a < id_b (canonical pair order), (b) score ==
    w_jaccard·sim_jaccard + w_jw·sim_jw + w_emb·sim_emb recomputed in
    float32, and (c) is_match == (score ≥ threshold) — the three
    contractual properties of the scorer output — and emit one row of
    booleans plus has_edges, all asserted TRUE by the SQL. Edge
    QUALITY is gated by the pairwise-F1 tests."""
    from ray.data.aggregate import Min, Sum

    from ..linkage import run_linkage
    tr = transcripts_from_events(sf_dir)
    out = run_linkage(tr, CFG)
    w_j, w_jw, w_e, thr = (CFG.w_jaccard, CFG.w_jw, CFG.w_emb,
                           CFG.threshold)

    def fold(t: pa.Table) -> pa.Table:
        sj = np.asarray(t.column("sim_jaccard"), dtype=np.float32)
        sw = np.asarray(t.column("sim_jw"), dtype=np.float32)
        se = np.asarray(t.column("sim_emb"), dtype=np.float32)
        sc = np.asarray(t.column("score"), dtype=np.float32)
        re = (np.float32(w_j) * sj + np.float32(w_jw) * sw
              + np.float32(w_e) * se).astype(np.float32)
        im = np.asarray(pc.cast(t.column("is_match"), pa.bool_()))
        ordered = bool(pc.all(pc.less(
            t.column("id_a"), t.column("id_b"))).as_py()
            if t.num_rows else True)
        return pa.table({
            "ordered": pa.array([int(ordered)]),
            "score_ok": pa.array([int(bool((sc == re).all()))]),
            "match_ok": pa.array([int(bool(
                (im == (sc >= np.float32(thr))).all()))]),
            "n": pa.array([t.num_rows], type=pa.int64())})

    agg = (out["edges"].map_batches(fold, batch_format="pyarrow",
                                    zero_copy_batch=True)
           .aggregate(Min("ordered"), Min("score_ok"), Min("match_ok"),
                      Sum("n")))
    return pa.table({
        "ids_ordered_ok": pa.array([bool(agg["min(ordered)"])]),
        "score_consistent": pa.array([bool(agg["min(score_ok)"])]),
        "match_rule_ok": pa.array([bool(agg["min(match_ok)"])]),
        "has_edges": pa.array([bool(agg["sum(n)"] or 0)])})


SQL_LINKAGE_EDGES = """
SELECT TRUE AS ids_ordered_ok, TRUE AS score_consistent,
       TRUE AS match_rule_ok, TRUE AS has_edges
"""


def q_best_match_per_record(sf_dir: str):
    """Per-record argmax over incident candidate edges (SURVEY §2.6: REL's
    per-mention final-entity argmax, REL:src/REL/entity_disambiguation.py::
    predict). Ties break on (score desc, partner asc). Rows-only check."""
    from ...functions.rayutil import bucketed_group_apply, segment_starts
    from ..linkage import run_linkage

    out = run_linkage(transcripts_from_events(sf_dir), CFG)
    edges = out["edges"]

    def explode(t: pa.Table) -> pa.Table:
        return pa.concat_tables([
            pa.table({"rec": t.column("id_a"), "partner": t.column("id_b"),
                      "score": t.column("score")}),
            pa.table({"rec": t.column("id_b"), "partner": t.column("id_a"),
                      "score": t.column("score")}),
        ])

    both = edges.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)

    def argmax(bucket: pa.Table) -> pa.Table:
        n = bucket.num_rows
        if n == 0:
            return pa.table({"record_id": pa.array([], type=pa.string()),
                             "best_partner": pa.array([], type=pa.string()),
                             "best_score": pa.array([], type=pa.float32())})
        starts = pa.array(segment_starts(bucket.column("rec")))
        return pa.table({"record_id": bucket.column("rec").take(starts),
                         "best_partner": bucket.column("partner").take(starts),
                         "best_score": bucket.column("score").take(starts)})

    got = bucketed_group_apply(
        both, "rec", argmax, num_buckets=64,
        sort_cols=[("score", "descending"), ("partner", "ascending")])

    # agreement oracle: recompute the argmax with an independent naive
    # driver fold over the collected edges (bounded: the flagship's
    # thresholded candidate edges) and emit one asserted boolean
    from ...functions.rayutil import collect_table
    et = collect_table(edges.map_batches(
        lambda t: t.select(["id_a", "id_b", "score"]),
        batch_format="pyarrow", zero_copy_batch=True),
        pa.schema([("id_a", pa.string()), ("id_b", pa.string()),
                   ("score", pa.float32())]))
    best: dict = {}
    for a, b, s in zip(et.column("id_a").to_pylist(),
                       et.column("id_b").to_pylist(),
                       et.column("score").to_pylist()):
        for rec, partner in ((a, b), (b, a)):
            cur = best.get(rec)
            if cur is None or (-s, partner) < cur:
                best[rec] = (-s, partner)
    gt = collect_table(got, pa.schema([
        ("record_id", pa.string()), ("best_partner", pa.string()),
        ("best_score", pa.float32())]))
    agree = gt.num_rows == len(best) and all(
        best.get(r) == (-s, p)
        for r, p, s in zip(gt.column("record_id").to_pylist(),
                           gt.column("best_partner").to_pylist(),
                           gt.column("best_score").to_pylist()))
    return pa.table({"argmax_matches_naive": pa.array([bool(agree)])})


SQL_BEST_MATCH_PER_RECORD = """
SELECT TRUE AS argmax_matches_naive
"""


def q_context_windows_events(sf_dir: str):
    """ORACLE-EXACT slice of the flagship's S1+S2: events → transcripts
    derivation → conversation reconstruction → ctx windows → multi-mention
    explosion → span record_ids. Only the order-sensitive coref scan is
    excluded (not SQL-expressible); q_conversation_windows keeps it rows-only.
    """
    from ...stages.conversation import conversation_stage
    tr = transcripts_from_events(sf_dir)
    import dataclasses

    from ...functions.rayutil import adaptive_buckets
    cfg = dataclasses.replace(
        CFG, num_buckets=adaptive_buckets(_pq_nrows(sf_dir, "events"),
                                          CFG.num_buckets))
    out = conversation_stage(tr, cfg)
    return out.map_batches(
        lambda t: t.select(["record_id", "conv_id", "turn_idx", "mention",
                            "ctx_before", "ctx_after"]),
        batch_format="pyarrow", zero_copy_batch=True)


def _context_windows_sql() -> str:
    """DuckDB twin of q_context_windows_events: reproduces the deterministic
    events→transcripts derivation (forms table inlined as VALUES), the
    (ts, event_id) turn ordering, the 2-turn/240-char context windows, and
    the sentinel-equivalent multi-mention explosion with span record ids."""
    from ...synth import _make_entities

    rng = np.random.default_rng(42)
    entities = _make_entities(rng, 40)
    forms: list[str] = []
    for e in entities:
        forms.append(e["variants"][0])
        forms.append(e["variants"][1 % len(e["variants"])])
        forms.append(e["variants"][2 % len(e["variants"])])
    values = ", ".join(f"({i}, '{f}')" for i, f in enumerate(forms))
    tpl_case = " ".join(
        f"WHEN {i} THEN replace('{t}', '{{m}}', f.form)"
        for i, t in enumerate(_EVENT_TEMPLATES))
    # MENTION_PATTERN with the single quote doubled for SQL
    pat = r"[A-Z][\w''.\-]*(?: [A-Z][\w''.\-]*)*"
    return rf"""
WITH forms(idx, form) AS (VALUES {values}),
turns AS (
  SELECT 'c' || lpad(CAST(e.user_id AS VARCHAR), 6, '0') AS conv_id,
         CAST(row_number() OVER (PARTITION BY e.user_id
                                 ORDER BY e.ts, e.event_id) - 1 AS INTEGER)
           AS turn_idx,
         CASE WHEN e.event_type = 'error' THEN '{{"status": "error", "code": 500}}'
              ELSE CASE e.event_id % 5 {tpl_case} END
         END AS text
  FROM events e
  LEFT JOIN forms f ON f.idx = (e.event_id % 40) * 3 + (e.event_id // 40) % 3
),
ctx AS (
  SELECT conv_id, turn_idx, text,
         trim(coalesce(lag(text, 2) OVER w, '') || ' '
              || coalesce(lag(text, 1) OVER w, '')) AS cb,
         trim(coalesce(lead(text, 1) OVER w, '') || ' '
              || coalesce(lead(text, 2) OVER w, '')) AS ca
  FROM turns
  WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)
),
capped AS (
  SELECT conv_id, turn_idx, text,
         CASE WHEN length(cb) > 240 THEN substr(cb, length(cb) - 239) ELSE cb
         END AS ctx_before,
         substr(ca, 1, 240) AS ctx_after,
         regexp_extract_all(text, '{pat}') AS ms
  FROM ctx
)
SELECT conv_id || '#' || lpad(CAST(turn_idx AS VARCHAR), 5, '0') || '#'
         || lpad(CAST(generate_subscripts(ms, 1) - 1 AS VARCHAR), 3, '0')
         AS record_id,
       conv_id, turn_idx, unnest(ms) AS mention, ctx_before, ctx_after
FROM capped WHERE len(ms) > 0
UNION ALL
SELECT conv_id || '#' || lpad(CAST(turn_idx AS VARCHAR), 5, '0') || '#000'
         AS record_id,
       conv_id, turn_idx, '' AS mention, ctx_before, ctx_after
FROM capped WHERE len(ms) = 0
"""


def _conversation_windows_sql() -> str:
    """DuckDB twin of q_conversation_windows — extends the context-windows
    oracle with the order-sensitive `with_coref` scan
    (REL:src/REL/training_datasets.py::with_coref): the latest earlier
    record in the conversation whose normalized-mention token list differs
    and token-subset-matches (exact or dotted-abbreviation prefix,
    honorifics skipped on the later side). The engine's scan order equals
    record_id lexicographic order (zero-padded conv/turn/span), so
    "latest earlier match" is `max(earlier_id)` — a plain argmax join."""
    inner = _context_windows_sql()
    return rf"""
WITH recs0 AS ({inner}),
recs AS (
  SELECT *,
    regexp_replace(
      trim(regexp_replace(lower(mention), '\s+', ' ', 'g')),
      '^(dr|prof|ms|mr|mrs)\.? ', '') AS mn
  FROM recs0
),
pairs AS (
  SELECT l.record_id AS lid, e.record_id AS eid,
         str_split(l.mn, ' ') AS ltoks, str_split(e.mn, ' ') AS etoks
  FROM recs l JOIN recs e
    ON e.conv_id = l.conv_id AND e.record_id < l.record_id
  WHERE e.mn <> '' AND l.mn <> '' AND e.mn <> l.mn
),
coref AS (
  SELECT lid AS record_id, max(eid) AS coref_prev
  FROM pairs
  WHERE len(list_filter(ltoks, lt ->
          lt NOT IN ('dr','prof','ms','mr','mrs')
          AND len(list_filter(etoks, et ->
                et = lt OR (lt LIKE '%.'
                            AND starts_with(et, left(lt, length(lt)-1)))
              )) = 0
        )) = 0
  GROUP BY lid
)
SELECT r.record_id, r.conv_id, r.turn_idx, r.mention, r.ctx_before,
       r.ctx_after, coalesce(c.coref_prev, '') AS coref_prev
FROM recs r LEFT JOIN coref c USING (record_id)
"""


def q_conversation_windows(sf_dir: str):
    """Conversation reconstruction + context windows + `with_coref` scan over
    the events-derived transcripts — ORACLE-EXACT including the coref column
    (see _conversation_windows_sql)."""
    from ...stages.conversation import conversation_stage
    tr = transcripts_from_events(sf_dir)
    import dataclasses

    from ...functions.rayutil import adaptive_buckets
    cfg = dataclasses.replace(
        CFG, num_buckets=adaptive_buckets(_pq_nrows(sf_dir, "events"),
                                          CFG.num_buckets))
    out = conversation_stage(tr, cfg)
    return out.map_batches(
        lambda t: t.select(["record_id", "conv_id", "turn_idx", "mention",
                            "ctx_before", "ctx_after", "coref_prev"]),
        batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------


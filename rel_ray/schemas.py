"""Fixed Arrow schemas for every logical table (SURVEY.md §1.2).

REL is duck-typed dicts (``REL:src/REL/mention_detection.py`` D1–D9); here every
stage boundary has a declared ``pyarrow.Schema`` and ``assert_schema`` is cheap
enough to call in tests and at checkpoint writes.
"""

from __future__ import annotations

import pyarrow as pa

TRANSCRIPTS = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("text", pa.string()),
        ("tool", pa.string()),
        ("ts", pa.timestamp("us")),
    ]
)

# transcripts + normalization products (raw `text` is never touched — the
# per-row invariant from BASELINE.json:input_hint)
TURNS_NORM = pa.schema(
    list(TRANSCRIPTS)
    + [
        ("text_norm", pa.string()),
        ("n_chars", pa.int32()),
        ("n_tokens", pa.int32()),
    ]
)

# unit of linkage: one record per mention-bearing turn
RECORDS = pa.schema(
    [
        ("record_id", pa.string()),  # f"{conv_id}#{turn_idx:05d}#{span_idx:03d}"
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("text", pa.string()),
        ("text_norm", pa.string()),
        ("mention", pa.string()),        # extracted surface form ("" if none)
        ("mention_norm", pa.string()),
        ("ctx_before", pa.string()),
        ("ctx_after", pa.string()),
    ]
)

BLOCKS = pa.schema(
    [
        # int64 bit-view of the uint64 LSH key (Ray shuffle keys must be int64)
        ("block_key", pa.int64()),
        ("record_id", pa.string()),
    ]
)

EDGES = pa.schema(
    [
        ("id_a", pa.string()),
        ("id_b", pa.string()),
        ("sim_jaccard", pa.float32()),
        ("sim_jw", pa.float32()),
        ("sim_emb", pa.float32()),
        ("score", pa.float32()),
        ("is_match", pa.bool_()),
    ]
)

CLUSTERS = pa.schema(
    [
        ("record_id", pa.string()),
        ("cluster_id", pa.string()),  # min record_id in the connected component
        # per-representative matched-edge confidence (REL conf_ed analog):
        # best accepted-edge score / accepted-edge degree; 0 for singletons
        ("best_score", pa.float32()),
        ("n_links", pa.int32()),
    ]
)

GOLD_CLUSTERS = pa.schema(
    [
        ("record_id", pa.string()),
        ("cluster_id", pa.string()),
    ]
)

LABELS = pa.schema(
    [
        ("id_a", pa.string()),
        ("id_b", pa.string()),
        ("block_key", pa.int64()),
        ("same_entity", pa.bool_()),
        ("split", pa.string()),  # 'calib' | 'test'
    ]
)

# post-conversation linkage records (canonical column order — safe_join
# sentinel tables and union() require exact schema match)
RECORDS_WIDE = pa.schema(
    [
        ("record_id", pa.string()),
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("mention", pa.string()),
        ("mention_norm", pa.string()),
        ("ctx_before", pa.string()),
        ("ctx_after", pa.string()),
        ("coref_prev", pa.string()),
    ]
)

RECORDS_REP = pa.schema(list(RECORDS_WIDE) + [("rep_id", pa.string())])

REP_MAP = pa.schema([("mention_norm", pa.string()), ("rep_id", pa.string())])

REPS = pa.schema([("record_id", pa.string()), ("mention_norm", pa.string())])

BLOCKS_PAYLOAD = pa.schema(
    [
        ("block_key", pa.int64()),
        ("record_id", pa.string()),
        ("mention_norm", pa.string()),
    ]
)

NODE_LABELS = pa.schema([("node", pa.string()), ("label", pa.string())])

TOPO = pa.schema([("node", pa.string()), ("nbr", pa.string())])

MANIFESTS = pa.schema(
    [
        ("stage", pa.string()),
        ("partition_id", pa.int32()),
        ("input_fingerprint", pa.string()),
        ("rows_in", pa.int64()),
        ("rows_out", pa.int64()),
        ("path", pa.string()),
        ("wall_s", pa.float64()),
    ]
)


def assert_schema(table: pa.Table, schema: pa.Schema, *, allow_extra: bool = True) -> None:
    """Check that `table` carries at least `schema`'s columns with exact types."""
    for field in schema:
        idx = table.schema.get_field_index(field.name)
        if idx < 0:
            raise AssertionError(f"missing column {field.name!r}; have {table.schema.names}")
        actual = table.schema.field(idx).type
        if actual != field.type:
            raise AssertionError(f"column {field.name!r}: expected {field.type}, got {actual}")
    if not allow_extra:
        extra = set(table.schema.names) - {f.name for f in schema}
        if extra:
            raise AssertionError(f"unexpected columns {sorted(extra)}")

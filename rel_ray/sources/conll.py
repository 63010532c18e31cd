"""AIDA/CoNLL-style labeled-corpus import (SURVEY §2.1; REL analog:
``REL:src/REL/generate_train_test.py::GenTrainingTest.process_aida``).

This is how a user brings THEIR OWN gold labels into the engine: the public
AIDA-CoNLL layout is a token-per-line text file,

    -DOCSTART- (947testa CRICKET)
    CRICKET
    LEICESTERSHIRE\tB\tLEICESTERSHIRE\tLeicestershire_County_Cricket_Club
    TAKE
    ...

where a ``B``/``I`` second column opens/continues a gold mention and the
fourth column carries the gold entity identifier. The reader parses that
layout into the engine's record shape:

  * ``records``: one row per GOLD mention —
    (record_id, conv_id=doc_id, turn_idx=0, mention, mention_norm, gold_entity)
    with ``record_id = f"{doc_id}#00000#{span:03d}"`` (span = mention index
    within the document, matching the pipeline's multi-mention explosion ids);
  * ``labels``: same-document mention pairs labeled
    ``same_entity = (gold_a == gold_b)`` — the pairwise-F1 gate's input shape
    (id_a, id_b, same_entity, split).

Parsing happens per-file inside ``flat_map``-style ``map_batches`` over a
Dataset of file paths, so a directory of thousands of CoNLL shards parses in
parallel; each file is independent (documents never span files).
"""

from __future__ import annotations

import pyarrow as pa

import ray.data as rd

from ..functions.normalize import normalize_mentions


def parse_conll_text(text: str, *, doc_prefix: str = "") -> pa.Table:
    """Parse one CoNLL-format string → gold-mention records table."""
    doc_ids: list[str] = []
    rids: list[str] = []
    mentions: list[str] = []
    golds: list[str] = []

    doc_id = ""
    n_doc = 0
    span = 0
    cur_tokens: list[str] = []
    cur_gold = ""

    def flush() -> None:
        nonlocal cur_tokens, cur_gold, span
        if cur_tokens:
            doc_ids.append(doc_id)
            rids.append(f"{doc_id}#00000#{span:03d}")
            mentions.append(" ".join(cur_tokens))
            golds.append(cur_gold)
            span += 1
        cur_tokens, cur_gold = [], ""

    for line in text.splitlines():
        if line.startswith("-DOCSTART-"):
            flush()
            tag = line[len("-DOCSTART-"):].strip().strip("()")
            doc_id = f"{doc_prefix}{tag.split()[0] if tag else n_doc}"
            n_doc += 1
            span = 0
            continue
        if not line.strip():
            flush()
            continue
        parts = line.split("\t")
        if len(parts) >= 4 and parts[1] == "B":
            flush()
            cur_tokens = [parts[0]]
            cur_gold = parts[3]
        elif len(parts) >= 4 and parts[1] == "I" and cur_tokens:
            cur_tokens.append(parts[0])
        else:
            flush()
    flush()

    mention_arr = pa.array(mentions, type=pa.string())
    return pa.table({
        "record_id": pa.array(rids, type=pa.string()),
        "conv_id": pa.array(doc_ids, type=pa.string()),
        "mention": mention_arr,
        "mention_norm": normalize_mentions(mention_arr),
        "gold_entity": pa.array(golds, type=pa.string()),
    })


def read_conll(paths: str | list[str], *, parallelism: int = 0):
    """Directory/file(s) of CoNLL shards → Dataset of gold-mention records.

    One parse task per file (files are independent); reading scales with the
    shard count like every other source.
    """
    import os

    if isinstance(paths, str):
        if os.path.isdir(paths):
            files = [os.path.join(paths, n) for n in sorted(os.listdir(paths))]
        else:
            files = [paths]
    else:
        files = list(paths)

    def parse_files(batch: pa.Table) -> pa.Table:
        tabs = []
        for p in batch.column("path").to_pylist():
            with open(p, encoding="utf-8") as f:
                tabs.append(parse_conll_text(
                    f.read(), doc_prefix=os.path.basename(p) + "#"))
        return pa.concat_tables(tabs, promote_options="default")

    files_ds = rd.from_arrow(pa.table({"path": pa.array(files)}))
    return files_ds.map_batches(parse_files, batch_format="pyarrow",
                                batch_size=1)


def conll_labels(records, *, max_pairs_per_doc: int = 512,
                 calib_fraction: float = 0.3):
    """Gold-mention records → LABELS-shaped pairs (id_a, id_b, same_entity,
    split): same-document mention pairs, capped per document, split assigned
    by a deterministic document hash. Runs as a bucketed co-group on conv_id."""
    import itertools

    import numpy as np

    from ..functions.rayutil import bucketed_group_apply, segment_starts
    from ..synth import hash_u32

    def pairs_bucket(bucket: pa.Table) -> pa.Table:
        n = bucket.num_rows
        if n == 0:
            return pa.table({"id_a": pa.array([], type=pa.string()),
                             "id_b": pa.array([], type=pa.string()),
                             "same_entity": pa.array([], type=pa.bool_()),
                             "split": pa.array([], type=pa.string())})
        starts = segment_starts(bucket.column("conv_id"))
        lens = np.diff(np.append(starts, n))
        rids = bucket.column("record_id").to_pylist()
        golds = bucket.column("gold_entity").to_pylist()
        convs = bucket.column("conv_id").to_pylist()
        ia, ib, same, split = [], [], [], []
        for si, s in enumerate(starts):
            members = list(range(int(s), int(s) + int(lens[si])))
            sp = ("calib" if hash_u32(convs[int(s)]) % 10 <
                  calib_fraction * 10 else "test")
            for k, (x, y) in enumerate(itertools.combinations(members, 2)):
                if k >= max_pairs_per_doc:
                    break
                a, b = sorted((rids[x], rids[y]))
                ia.append(a)
                ib.append(b)
                same.append(golds[x] == golds[y] and golds[x] != "")
                split.append(sp)
        return pa.table({"id_a": pa.array(ia, type=pa.string()),
                         "id_b": pa.array(ib, type=pa.string()),
                         "same_entity": pa.array(same, type=pa.bool_()),
                         "split": pa.array(split, type=pa.string())})

    return bucketed_group_apply(records, "conv_id", pairs_bucket,
                                num_buckets=64,
                                sort_cols=[("record_id", "ascending")])

"""Deterministic synthetic transcript corpus (FIXTURES.md §A).

Pure function of (seed, scale): no wall clock, no global RNG. Produces the
`transcripts` input table (exact BASELINE.json:input_hint shape), the
`gold_clusters` golden output, and the `labels` same-block-pair fixture that
the pairwise-F1 gate (BASELINE.json:metric) evaluates against.

The noise model is calibrated (SURVEY.md §7 hard-list #5) so that variants of
one entity keep char-3-gram Jaccard far above cross-entity pairs: entity names
are built from per-entity-disjoint token sets, and variants are edits
(transposition, truncation-abbreviation, honorific, reorder) that preserve
most trigrams. `calibration_selftest` asserts the margin.
"""

from __future__ import annotations

import itertools

import numpy as np
import pyarrow as pa

from .config import DEFAULT_CONFIG, PipelineConfig
from .functions.shingles import band_keys, char_ngram_codes, minhash_signatures

# wide syllable pool: at bench scale (10^5+ entities) a small pool saturates
# the name space — cross-entity char-3-gram overlap rises with vocabulary
# size and LSH candidate pairs grow superlinearly (measured in round 1 at
# 14.5M turns). The FULL onset×nucleus×coda product (5,460 syllables) keeps
# per-syllable reuse ~2.7× lower than the old lexicographic [:2000] prefix,
# making pair counts scale ~linearly with corpus size.
_SYL_ONSETS = ["m", "v", "t", "dr", "qu", "z", "b", "n", "f", "gw", "h", "j",
               "k", "l", "p", "r", "s", "br", "cr", "st", "tr", "w", "x", "y",
               "ch", "sh", "th", "pl", "gr", "sn"]
_SYL_NUCLEI = ["a", "e", "i", "o", "u", "ar", "el", "in", "or", "un", "ae",
               "ia", "ou"]
_SYL_CODAS = ["", "k", "l", "m", "n", "r", "s", "t", "x", "nd", "rk", "st",
              "th", "ll"]
_SYLLABLES = [o + n + c for o in _SYL_ONSETS for n in _SYL_NUCLEI
              for c in _SYL_CODAS]

_TEMPLATES = [
    "ok, i will check with {m} about the schedule tomorrow.",
    "as discussed, {m} sent the revised draft earlier today.",
    "can you loop in {m} before we finalize the budget?",
    "the ticket was reassigned to {m} after the standup.",
    "per the notes, {m} approved the deployment window.",
    "we should ask {m} whether the numbers still hold.",
    "reminder: {m} owns the follow-up on this thread.",
    "i spoke with {m} and the contract looks fine.",
    "{m} flagged a regression in the nightly run.",
    "the review from {m} is still pending, nudge them.",
    "handing this over to {m} for the final sign-off.",
    "according to {m}, the vendor call moved to friday.",
]

# two-mention turns (multi-mention explosion stressor): {m} always precedes
# {m2} so span numbering is deterministic (span 000 = m, span 001 = m2)
_TEMPLATES2 = [
    "can {m} sync with {m2} before the demo?",
    "per {m}, the handoff goes to {m2} next week.",
    "loop in {m} and {m2} on the revised scope.",
]

_PLAIN = [
    "sounds good, let's sync later this week.",
    "no updates on my side for now.",
    "the pipeline finished without errors overnight.",
    "let me re-run the numbers and get back to you.",
    "agreed, we can revisit after the release.",
    "that matches what i saw in the logs.",
]

_TOOL_BLOBS = [
    '{"status": "ok", "rows": 1284, "elapsed_ms": 418}',
    '{"status": "ok", "result": [1, 2, 3], "cache": true}',
    '{"status": "error", "code": 503, "retry_in": 30}',
    '{"status": "ok", "files_changed": 4, "insertions": 122}',
    '{"status": "ok", "matches": [], "query_ms": 12}',
    '{"status": "ok", "rows": 0, "elapsed_ms": 7}',
    '{"status": "pending", "job_id": "j-4821", "eta_s": 90}',
    '{"status": "ok", "checksum": "9f1a2b", "bytes": 55210}',
]

_HONORIFICS = ["Dr", "Prof", "Ms", "Mr"]

SCALES = {"tiny": 50, "small": 2000}


_SYL_ARR = np.array(_SYLLABLES, dtype=object)


def _make_entities(rng: np.random.Generator, n_entities: int) -> list[dict]:
    """Entity registry with pairwise-disjoint token sets and 3-6 variant forms.

    Token candidates are drawn in vectorized blocks (rng.integers into the
    syllable array) — the per-call rng.choice(list) formulation converted the
    5,460-syllable list to an array on EVERY draw and took >10 min at 192k
    entities."""
    used_tokens: set[str] = set()
    entities = []
    # first-token trigram sets per family (last token): a confusable's first
    # name must be DISSIMILAR to every first name already in its family —
    # accidental syllable overlap ("Zelnsnarkgwunk" / "Stunlneltgwunk")
    # stacks on the engineered family-name share and pushes the pair over
    # the match threshold (measured 0.534 at seed 7)
    fam_firsts: dict[str, list[set]] = {}

    def _tri(s: str) -> set:
        return {s[i:i + 3] for i in range(len(s) - 2)}

    def token_block(k: int) -> list[str]:
        n_syl = rng.integers(2, 4, size=k)
        idx = rng.integers(0, len(_SYL_ARR), size=(k, 3))
        return ["".join(_SYL_ARR[idx[i, :n_syl[i]]]) for i in range(k)]

    def long_token_block(k: int) -> list[str]:
        # confusable FIRST names: always 3 syllables (long by construction
        # so drawing from the general pool doesn't reject ~90% of tokens)
        idx = rng.integers(0, len(_SYL_ARR), size=(k, 3))
        return ["".join(_SYL_ARR[idx[i]]) for i in range(k)]

    pool: list[str] = []
    long_pool: list[str] = []
    for e in range(n_entities):
        tokens: list[str] = []
        # ~20% of entities are CONFUSABLES: share their LAST token with an
        # earlier entity ("Marva Hollen" vs "Tobias Hollen" — same family
        # name) — hard negatives that co-block under LSH at EVERY corpus
        # scale, independent of how dense the global name space is (the
        # round-1 fixture relied on accidental syllable collisions, which
        # vanish as the pool widens). Sharing the LAST token keeps
        # Jaro-Winkler low (prefix-weighted) so the scorer's margin holds.
        shared_last = ""
        if e == 1:
            # entity #1 is ALWAYS a confusable of entity #0 (whose last token
            # is forced short below): even the tiniest fixture carries
            # labeled hard negatives, at every seed
            shared_last = entities[0]["canonical"].split(" ")[1].lower()
        elif e > 0 and rng.random() < 0.2:
            # short shared token + a LONG fresh first token keeps the
            # confusable's weighted score (Jaccard+JW+emb) safely below the
            # match threshold — solvable-by-design calibration, asserted by
            # tests/test_synth.py::test_noise_calibration_margin. Retry a few
            # donors: at tiny fixture scales a single draw often fails the
            # length filter and the label set would lose its negatives.
            for _ in range(8):
                donor = entities[int(rng.integers(0, e))]
                cand = donor["canonical"].split(" ")[1].lower()
                # family size capped at 4: bounds the dissimilarity scan AND
                # the per-family hard-negative pair count
                if len(cand) <= 6 and len(fam_firsts.get(cand, [])) < 4:
                    shared_last = cand
                    break
        if shared_last:
            fam = fam_firsts.get(shared_last, [])
            while len(tokens) < 1:
                if not long_pool:
                    long_pool = long_token_block(4096)
                tok = long_pool.pop()
                if tok in used_tokens or tok == shared_last or len(tok) < 10:
                    continue
                ts = _tri(tok)
                if any(len(ts & o) / len(ts | o) > 0.08 for o in fam):
                    continue
                tokens.append(tok)
        while len(tokens) < 1:
            if not pool:
                pool = token_block(max(1024, (n_entities - e) * 3))
            tok = pool.pop()
            if tok in used_tokens or len(tok) < 5:
                continue
            tokens.append(tok)
        if shared_last:
            tokens.append(shared_last)
        else:
            while len(tokens) < 2:
                if not pool:
                    pool = token_block(max(1024, (n_entities - e) * 3))
                tok = pool.pop()
                if tok in used_tokens or tok in tokens or len(tok) < 5:
                    continue
                if e == 0 and len(tokens) == 1 and len(tok) > 6:
                    continue  # entity #0's last token stays donor-eligible
                tokens.append(tok)
        used_tokens.update(t for t in tokens if t != shared_last)
        fam_firsts.setdefault(tokens[1], []).append(_tri(tokens[0]))
        first, last = (t.capitalize() for t in tokens)
        canonical = f"{first} {last}"
        variants = [canonical]
        # adjacent transposition inside the last token (not first char)
        i = int(rng.integers(1, len(last) - 1))
        typo_last = last[:i] + last[i + 1] + last[i] + last[i + 2 :]
        variants.append(f"{first} {typo_last}")
        # truncation abbreviation / token reorder — EXCEPT for confusables:
        # truncating the (long, distinguishing) first name of two same-family
        # entities leaves "Xxxx. Shared" vs "Yyyy. Shared" (measured score
        # 0.78 > τ), and "{shared} {first}" puts the family name in JW's
        # prefix position; both would make the fixture unsolvable by design
        if not shared_last:
            # length-aware abbreviation: a 4-char cut of a very long first
            # name sheds too many shingles and the weighted score falls
            # below the match threshold (measured 0.41 on a 15-char name)
            cut = 4 if len(first) <= 9 else 7
            variants.append(f"{first[:cut]}. {last}")
        # honorific
        variants.append(f"{rng.choice(_HONORIFICS)} {first} {last}")
        if not shared_last:
            variants.append(f"{last} {first}")
        # char drop in first token (not first char)
        j = int(rng.integers(1, len(first)))
        variants.append(f"{first[:j] + first[j + 1 :]} {last}")
        n_keep = int(rng.integers(3, len(variants) + 1))
        entities.append({"entity_id": e, "canonical": canonical, "variants": variants[:n_keep]})
    return entities


def generate_corpus(
    seed: int = 42,
    n_convs: int = 2000,
    n_entities: int | None = None,
    cfg: PipelineConfig = DEFAULT_CONFIG,
    max_block_records_for_labels: int = 40,
    with_labels: bool = True,
) -> dict[str, pa.Table]:
    """Build transcripts + gold_clusters + labels (+ mentions_truth for debugging)."""
    rng = np.random.default_rng(seed)
    if n_entities is None:
        n_entities = max(20, n_convs // 10)
    entities = _make_entities(rng, n_entities)

    # Zipf(1.1) popularity over entities (skew stressor, SURVEY §4.3)
    ranks = np.arange(1, n_entities + 1, dtype=np.float64)
    zipf_p = ranks ** -1.1
    zipf_p /= zipf_p.sum()

    base_ts = 1_700_000_000_000_000  # fixed epoch micros, not wall clock

    # ---- vectorized turn synthesis (pure function of the rng stream; the
    # per-turn python-loop formulation took >10 min at bench scale) ----
    n_turns_per_conv = 2 + np.minimum(62, rng.geometric(0.18, size=n_convs))
    n = int(n_turns_per_conv.sum())
    conv_of_turn = np.repeat(np.arange(n_convs, dtype=np.int64), n_turns_per_conv)
    starts = np.cumsum(n_turns_per_conv) - n_turns_per_conv
    turn_idx = (np.arange(n, dtype=np.int64) - np.repeat(starts, n_turns_per_conv))

    conv_offsets = rng.integers(0, 10_000, size=n_convs).astype(np.int64) * 3_600_000_000
    r_kind = rng.random(n)
    is_tool = r_kind < 0.15
    is_system = (r_kind >= 0.15) & (r_kind < 0.17)
    is_chat = ~is_tool & ~is_system
    tool_names = np.array(["search", "calc", "db", "files", "mail", "cal",
                           "git", "web", "k8s", "sql"], dtype=object)
    tool_pick = tool_names[rng.integers(0, len(tool_names), size=n)]
    blob_pick = np.array(_TOOL_BLOBS, dtype=object)[
        rng.integers(0, len(_TOOL_BLOBS), size=n)]
    blob_pad = rng.random(n) < 0.1  # near-verbatim duplicate stressor
    has_mention = is_chat & (rng.random(n) < 0.7)
    ent_pick = rng.choice(n_entities, size=n, p=zipf_p)
    var_u = rng.random(n)
    # ~15% of mention turns carry a SECOND entity (multi-mention stressor)
    two_mention = has_mention & (rng.random(n) < 0.15)
    ent2_pick = rng.choice(n_entities, size=n, p=zipf_p)
    var2_u = rng.random(n)
    tmpl2_pick = rng.integers(0, len(_TEMPLATES2), size=n)
    tmpl_pick = rng.integers(0, len(_TEMPLATES), size=n)
    plain_pick = np.array(_PLAIN, dtype=object)[rng.integers(0, len(_PLAIN), size=n)]
    ts = base_ts + conv_offsets[conv_of_turn] + turn_idx * 60_000_000
    tie = (turn_idx > 0) & (rng.random(n) < 0.03)
    ts = np.where(tie, ts - 60_000_000, ts)  # tied-ts: exercises the tie-break

    conv_ids_u = np.array([f"c{c:08d}" for c in range(n_convs)], dtype=object)
    conv_col = conv_ids_u[conv_of_turn]
    roles = np.where(is_tool, "tool",
                     np.where(is_system, "system",
                              np.where(turn_idx % 2 == 0, "user", "assistant"))
                     ).astype(object)
    tools = np.where(is_tool, tool_pick, "").astype(object)

    texts = np.empty(n, dtype=object)
    texts[is_system] = "you are a helpful assistant."
    ti = np.nonzero(is_tool)[0]
    texts[ti] = [blob_pick[i] + " " if blob_pad[i] else blob_pick[i] for i in ti]
    ci = np.nonzero(is_chat & ~has_mention)[0]
    texts[ci] = plain_pick[ci]
    rec_entity: dict[str, int] = {}  # record_id (span-level) -> entity_id
    mention_of: dict[str, str] = {}  # record_id -> injected surface form
    mi = np.nonzero(has_mention)[0]
    for i in mi:
        ent = entities[int(ent_pick[i])]
        variant = ent["variants"][int(var_u[i] * len(ent["variants"]))]
        rid0 = f"{conv_col[i]}#{turn_idx[i]:05d}#000"
        if two_mention[i]:
            ent2 = entities[int(ent2_pick[i])]
            variant2 = ent2["variants"][int(var2_u[i] * len(ent2["variants"]))]
            texts[i] = _TEMPLATES2[tmpl2_pick[i]].format(m=variant, m2=variant2)
            rid1 = f"{conv_col[i]}#{turn_idx[i]:05d}#001"
            rec_entity[rid1] = int(ent2_pick[i])
            mention_of[rid1] = variant2
        else:
            texts[i] = _TEMPLATES[tmpl_pick[i]].format(m=variant)
        rec_entity[rid0] = int(ent_pick[i])
        mention_of[rid0] = variant

    perm = rng.permutation(n)  # rows written in shuffled order: sorting must be real
    transcripts = pa.table(
        {
            "conv_id": pa.array(conv_col[perm], type=pa.string()),
            "turn_idx": pa.array(turn_idx[perm].astype(np.int32)),
            "role": pa.array(roles[perm], type=pa.string()),
            "text": pa.array(texts[perm], type=pa.string()),
            "tool": pa.array(tools[perm], type=pa.string()),
            "ts": pa.array(ts[perm], type=pa.timestamp("us")),
        }
    )

    # ---- gold clusters: min record_id per entity ----
    by_entity: dict[int, list[str]] = {}
    for rid, e in rec_entity.items():
        by_entity.setdefault(e, []).append(rid)
    gold_rids, gold_cids = [], []
    for e, rids in by_entity.items():
        cid = min(rids)
        for rid in rids:
            gold_rids.append(rid)
            gold_cids.append(cid)
    gold = pa.table({"record_id": pa.array(gold_rids), "cluster_id": pa.array(gold_cids)})

    if not with_labels:  # bench-scale corpora skip the label fixture build
        return {"transcripts": transcripts, "gold_clusters": gold}

    # ---- labels: same-block pairs under the shipped blocker config ----
    rids_sorted = sorted(rec_entity)
    labels = _build_labels(rids_sorted, rec_entity, mention_of=mention_of,
                           cfg=cfg,
                           max_block_records=max_block_records_for_labels)

    return {"transcripts": transcripts, "gold_clusters": gold, "labels": labels}


def _build_labels(rids_sorted, rec_entity, mention_of, cfg, max_block_records):
    """Enumerate labeled pairs sharing an LSH block key under `cfg`.

    Uses the SAME kernels the pipeline ships (shingles/minhash/band_keys) so
    the label set matches BASELINE.json:metric exactly. Mentions come from
    the injection-time record (`mention_of`), span-aligned with the
    pipeline's multi-mention explosion.
    """
    from .functions.normalize import normalize_mentions

    mentions = pa.array([mention_of[r] for r in rids_sorted], type=pa.string())
    mention_norm = normalize_mentions(mentions, nfkc=cfg.nfkc)
    codes, splits = char_ngram_codes(mention_norm, cfg.shingle_k)
    sig = minhash_signatures(codes, splits, cfg.num_perm, cfg.seed)
    keys = band_keys(sig, cfg.bands, cfg.band_rows, cfg.seed)  # (n, bands)

    block: dict[int, list[int]] = {}
    for i in range(len(rids_sorted)):
        for k in np.unique(keys[i]):
            if k == 0:
                continue
            block.setdefault(int(k), []).append(i)

    # conv split assignment: calib 30% / test 70%, disjoint conversations
    def conv_split(rid: str) -> str:
        h = hash_u32(rid.split("#")[0])
        return "calib" if h % 10 < 3 else "test"

    seen: set[tuple[int, int]] = set()
    ia, ib, bk, same, split = [], [], [], [], []
    for k, members in sorted(block.items()):
        members = sorted(set(members))[:max_block_records]
        for x, y in itertools.combinations(members, 2):
            if (x, y) in seen:
                continue
            seen.add((x, y))
            ra, rb = rids_sorted[x], rids_sorted[y]
            sa, sb = conv_split(ra), conv_split(rb)
            if sa != sb:
                continue
            ia.append(ra)
            ib.append(rb)
            bk.append(k)
            same.append(rec_entity[ra] == rec_entity[rb])
            split.append(sa)
    if same and all(same):
        # fixture hygiene: the label set must carry BOTH classes. At tiny
        # scales the confusable entities' band-key collision is seed-luck;
        # when no negative emerged from blocking, inject cross-entity pairs
        # directly (block_key 0 marks them as forced). The pipeline puts
        # them in different clusters, so F1 semantics are unchanged.
        by_split_ent: dict[tuple[str, int], str] = {}
        for rid in rids_sorted:
            key = (conv_split(rid), rec_entity[rid])
            by_split_ent.setdefault(key, rid)
        for sp in ("calib", "test"):
            ents_in = [(ent, rid) for (s, ent), rid in by_split_ent.items()
                       if s == sp]
            for (e1, r1), (e2, r2) in itertools.combinations(
                    sorted(ents_in)[:4], 2):
                a, b = sorted((r1, r2))
                ia.append(a)
                ib.append(b)
                bk.append(0)
                same.append(False)
                split.append(sp)
    return pa.table(
        {
            "id_a": pa.array(ia, type=pa.string()),
            "id_b": pa.array(ib, type=pa.string()),
            "block_key": pa.array(np.array(bk, dtype=np.uint64).view(np.int64)),
            "same_entity": pa.array(same, type=pa.bool_()),
            "split": pa.array(split, type=pa.string()),
        }
    )


def hash_u32(s: str) -> int:
    """Deterministic string hash (no PYTHONHASHSEED dependence)."""
    import hashlib

    return int.from_bytes(hashlib.blake2b(s.encode(), digest_size=4).digest(), "little")


def write_corpus(out_dir: str, seed: int = 42, n_convs: int = 2000, **kw) -> dict[str, str]:
    import os

    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    tables = generate_corpus(seed=seed, n_convs=n_convs, **kw)
    paths = {}
    for name, t in tables.items():
        p = os.path.join(out_dir, f"{name}.parquet")
        pq.write_table(t, p)
        paths[name] = p
    return paths

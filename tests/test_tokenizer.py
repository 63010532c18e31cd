"""Distributed BPE training/encoding vs a naive from-scratch reference."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from rel_ray.stages.tokenizer import (bpe_token_counts, bpe_train,
                                      bpe_train_from_counts, encode_word,
                                      word_counts)


def naive_bpe(word_cnt: dict[str, int], num_merges: int):
    """Quadratic reference: full pair recount every round, same tie-break
    (max count, then lexicographically smallest pair)."""
    seqs = {w: tuple(w) for w in word_cnt}
    merges = []
    for _ in range(num_merges):
        pc_ = {}
        for w, s in seqs.items():
            for j in range(len(s) - 1):
                p = (s[j], s[j + 1])
                pc_[p] = pc_.get(p, 0) + word_cnt[w]
        if not pc_:
            break
        best = min(pc_, key=lambda p: (-pc_[p], p))
        merges.append(best)
        for w, s in seqs.items():
            out, i = [], 0
            while i < len(s):
                if (i < len(s) - 1 and s[i] == best[0]
                        and s[i + 1] == best[1]):
                    out.append(best[0] + best[1])
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            seqs[w] = tuple(out)
    return merges, seqs


CORPUS = ["the cat sat on the mat", "the bat and the cat chat",
          "matter of fact the hatter sat", "low lower lowest newest newer",
          "wider wide widest the the the"]


def _docs():
    return rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(CORPUS)), type=pa.int64()),
        "text": pa.array(CORPUS)}))


def _word_cnt():
    from collections import Counter
    import re
    c = Counter()
    for t in CORPUS:
        c.update(re.findall(r"[a-z]+", t.lower()))
    return dict(c)


def test_word_counts_exact(ray_session):
    df = word_counts(_docs(), "text").to_pandas()
    got = dict(zip(df["word"], df["cnt"]))
    assert got == _word_cnt()


def test_incremental_trainer_matches_naive_recount():
    wc = _word_cnt()
    words = sorted(wc)
    for nm in (1, 5, 20, 200):
        fast = bpe_train_from_counts(words, [wc[w] for w in words], nm)
        slow, _ = naive_bpe(wc, nm)
        assert fast == slow, nm


def test_distributed_train_matches_naive(ray_session):
    merges = bpe_train(_docs(), "text", 15)
    slow, _ = naive_bpe(_word_cnt(), 15)
    got = list(zip(merges.column("left").to_pylist(),
                   merges.column("right").to_pylist()))
    assert got == slow


def test_encode_word_consistent_with_training():
    # after training to exhaustion on one word, it encodes to one token
    wc = {"banana": 3}
    merges = bpe_train_from_counts(["banana"], [3], 10)
    ranks = {m: i for i, m in enumerate(merges)}
    assert encode_word("banana", ranks) == ["banana"]
    # unseen pairs stay split
    assert len(encode_word("zzz", ranks)) == 3


def test_token_counts_match_driver_encode(ray_session):
    merges = bpe_train(_docs(), "text", 12)
    out = bpe_token_counts(_docs(), "text", "doc_id", merges).to_pandas()
    got = dict(zip(out["doc_id"], out["n_bpe_tokens"]))
    import re
    ranks = {(l, r): i for i, (l, r) in enumerate(
        zip(merges.column("left").to_pylist(),
            merges.column("right").to_pylist()))}
    for i, t in enumerate(CORPUS):
        exp = sum(len(encode_word(w, ranks))
                  for w in re.findall(r"[a-z]+", t.lower()))
        assert got[i] == exp, (i, t)


def test_min_count_prunes_and_caps(ray_session):
    # min_count=3 keeps only "the"-class words; trainer still runs
    merges = bpe_train(_docs(), "text", 5, min_count=3)
    assert merges.num_rows >= 1
    with pytest.raises(ValueError, match="max_vocab"):
        bpe_train(_docs(), "text", 5, max_vocab=2)


def test_empty_and_nonalpha(ray_session):
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([0, 1], type=pa.int64()),
        "text": pa.array(["12345 !!!", ""])}))
    merges = bpe_train(docs, "text", 5)
    assert merges.num_rows == 0
    out = bpe_token_counts(docs, "text", "doc_id", merges).to_pandas()
    assert sorted(out["n_bpe_tokens"]) == [0, 0]

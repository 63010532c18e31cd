"""Tests for the training-data operators: dedup family, similarity search,
text analysis, multimodal plumbing."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from rel_ray.config import DEFAULT_CONFIG


def _collect(ds) -> pa.Table:
    if isinstance(ds, pa.Table):  # global_topk-style ops return a Table
        return ds
    tabs = [pa.table(b) for b in ds.iter_batches(batch_format="pyarrow")]
    if not tabs:
        return pa.table({})
    return pa.concat_tables(tabs, promote_options="default")


@pytest.fixture(scope="module")
def doc_table():
    texts = [
        "the quick brown fox jumps over the lazy dog in the morning light",
        "the quick brown fox jumps over the lazy dog in the morning light",   # exact dup of 0
        "the quick brown fox jumps over the lazy dog in the evening light",   # near dup of 0
        "a completely different document about database query optimization",
        "yet another unrelated text concerning neural entity linking systems",
        "",
    ]
    return pa.table({"doc_id": pa.array(range(len(texts)), type=pa.int64()),
                     "text": pa.array(texts)})


@pytest.mark.usefixtures("ray_session")
def test_exact_dedup(doc_table):
    from rel_ray.stages.dedup import exact_dedup
    out = _collect(exact_dedup(rd.from_arrow(doc_table), id_col="doc_id",
                               text_col="text"))
    survivors = sorted(out.column("doc_id").to_pylist())
    assert survivors == [0, 2, 3, 4, 5]  # doc 1 collapsed into doc 0


@pytest.mark.usefixtures("ray_session")
def test_near_dedup_minhash(doc_table):
    from rel_ray.stages.dedup import near_dedup_minhash
    out = _collect(near_dedup_minhash(rd.from_arrow(doc_table), id_col="doc_id",
                                      text_col="text", cfg=DEFAULT_CONFIG,
                                      threshold=0.5))
    cl = dict(zip(out.column("record_id").to_pylist(),
                  out.column("cluster_id").to_pylist()))
    assert cl["0"] == cl["1"] == cl["2"]  # exact + near dups share a cluster
    assert cl["3"] != cl["0"] and cl["4"] != cl["0"]
    assert len(cl) == 6  # every doc clustered, empty doc is its own singleton
    assert cl["5"] == "5"


@pytest.mark.usefixtures("ray_session")
def test_near_dedup_exact(doc_table):
    """Deterministic AllPairs near-dedup: same cluster contract as the LSH
    path but with guaranteed recall — the prep-report oracle's backbone."""
    from rel_ray.stages.dedup import near_dedup_exact
    out = _collect(near_dedup_exact(rd.from_arrow(doc_table),
                                    id_col="doc_id", text_col="text",
                                    cfg=DEFAULT_CONFIG,
                                    tau_num=1, tau_den=2))
    cl = dict(zip(out.column("record_id").to_pylist(),
                  out.column("cluster_id").to_pylist()))
    assert cl["0"] == cl["1"] == cl["2"]  # exact + near dups share a cluster
    assert cl["3"] != cl["0"] and cl["4"] != cl["0"]
    assert len(cl) == 6
    assert cl["5"] == "5"  # shingle-free doc stays a singleton


@pytest.mark.usefixtures("ray_session")
def test_near_dedup_simhash(doc_table):
    from rel_ray.stages.dedup import near_dedup_simhash
    out = _collect(near_dedup_simhash(rd.from_arrow(doc_table), id_col="doc_id",
                                      text_col="text", max_hamming=10))
    cl = dict(zip(out.column("record_id").to_pylist(),
                  out.column("cluster_id").to_pylist()))
    assert cl["0"] == cl["1"]  # identical text ⇒ identical simhash
    assert cl["0"] != cl["3"]


@pytest.mark.usefixtures("ray_session")
def test_attach_singleton_clusters_cogroup_fallback(doc_table):
    """broadcast_max_rows=0 must route to the cogroup fallback BEFORE any
    driver collect of the labeled set (VERDICT r3 #1: the cap check has to
    gate the collect, not run after it) and produce identical clusters."""
    import ray.data

    from rel_ray.functions import rayutil
    from rel_ray.stages.dedup import attach_singleton_clusters

    ds = rd.from_arrow(doc_table)
    cc = ray.data.from_arrow(pa.table({
        "record_id": pa.array(["0", "1", "2"]),
        "cluster_id": pa.array(["0", "0", "0"])}))

    def as_map(ds_out):
        t = _collect(ds_out)
        return dict(zip(t.column("record_id").to_pylist(),
                        t.column("cluster_id").to_pylist()))

    expected = as_map(attach_singleton_clusters(ds, "doc_id", cc))

    # with the cap at 0, collect_table must never run on the labeled set
    orig = rayutil.collect_table

    def forbidden(*a, **k):
        raise AssertionError("driver collect ran despite broadcast cap 0")

    rayutil.collect_table = forbidden
    try:
        got = as_map(attach_singleton_clusters(
            ds, "doc_id", cc, broadcast_max_rows=0, cfg=DEFAULT_CONFIG))
    finally:
        rayutil.collect_table = orig
    assert got == expected
    assert got["0"] == got["1"] == got["2"] and got["5"] == "5"


def test_simhash_properties():
    from rel_ray.stages.dedup import _popcount64, simhash_column
    texts = pa.array(["the quick brown fox jumps over the lazy dog",
                      "the quick brown fox jumps over the lazy dogs",
                      "entirely different content about query planners"])
    sh = simhash_column(texts, 3, unit="word")
    ham_near = int(_popcount64(np.array([sh[0] ^ sh[1]]))[0])
    ham_far = int(_popcount64(np.array([sh[0] ^ sh[2]]))[0])
    assert ham_near < ham_far


@pytest.mark.usefixtures("ray_session")
def test_ann_topk_exact_against_numpy():
    from rel_ray.stages.similarity import ann_topk
    rng = np.random.default_rng(0)
    vecs = rng.standard_normal((200, 16)).astype(np.float32)
    tbl = pa.table({
        "vec_id": pa.array(range(200), type=pa.int64()),
        "embedding": pa.array([v.tolist() for v in vecs],
                              type=pa.list_(pa.float32())),
    })
    queries = {"ids": np.array([0, 1], dtype=np.int64),
               "vecs": vecs[:2].astype(np.float64)}
    out = _collect(ann_topk(rd.from_arrow(tbl), queries, k=5))
    got = {(r["query_id"], r["rank"]): r["vec_id"] for r in out.to_pylist()}
    # reference: exact numpy ranking
    m = vecs.astype(np.float64)
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    for q in (0, 1):
        sims = m @ m[q]
        order = np.lexsort((np.arange(200), -sims))[:5]
        for rank, vid in enumerate(order, 1):
            assert got[(q, rank)] == vid
        assert got[(q, 1)] == q  # self is its own nearest neighbor


@pytest.mark.usefixtures("ray_session")
def test_embedding_near_dup():
    from rel_ray.stages.similarity import embedding_near_dup
    rng = np.random.default_rng(1)
    base = rng.standard_normal((5, 8))
    rows, ids = [], []
    for i, b in enumerate(base):
        rows.append(b)
        ids.append(i * 10)
        rows.append(b + rng.standard_normal(8) * 1e-3)  # near-identical copy
        ids.append(i * 10 + 1)
    tbl = pa.table({"vec_id": pa.array(ids, type=pa.int64()),
                    "embedding": pa.array([r.tolist() for r in rows],
                                          type=pa.list_(pa.float32()))})
    out = _collect(embedding_near_dup(rd.from_arrow(tbl), threshold=0.999,
                                      n_planes=4))
    cl = dict(zip(out.column("record_id").to_pylist(),
                  out.column("cluster_id").to_pylist()))
    for i in range(5):
        assert cl[str(i * 10)] == cl[str(i * 10 + 1)]


def test_lang_id_and_quality():
    from rel_ray.stages.textstats import lang_id, quality_features
    texts = pa.array([
        "the cat is in the house and it is warm",
        "der Hund ist nicht in der Schule und das ist gut",
        "le chat est dans la maison et il est content",
        "xyzzy plugh",
    ])
    assert lang_id(texts).to_pylist() == ["en", "de", "fr", "und"]
    q = quality_features(texts)
    assert q.column("n_tokens").to_pylist()[0] == 10
    assert 0.0 <= q.column("quality").to_pylist()[0] <= 1.0


def test_fingerprint_winnow_deterministic_and_shift_stable():
    from rel_ray.stages.textstats import fingerprint_winnow
    a = "the quick brown fox jumps over the lazy dog repeatedly"
    fp1 = fingerprint_winnow(pa.array([a]))
    fp2 = fingerprint_winnow(pa.array([a]))
    assert fp1.to_pylist() == fp2.to_pylist()
    # winnowing keeps shared fingerprints under prefix shift
    fpb = fingerprint_winnow(pa.array(["PREFIX " + a]))
    common = set(fp1.to_pylist()[0]) & set(fpb.to_pylist()[0])
    assert len(common) >= len(set(fp1.to_pylist()[0])) // 2


@pytest.mark.usefixtures("ray_session")
def test_multimodal_decode_plumbing():
    from rel_ray.stages.multimodal import (
        MEDIA_SCHEMA, decode_stage, frame_sample_stage, synth_media_table)
    media = synth_media_table(32, seed=7)
    assert media.schema.equals(MEDIA_SCHEMA)
    out = _collect(decode_stage(rd.from_arrow(media), fake=True, dim=16,
                                batch_size=8))
    assert out.num_rows == 32
    feats = out.column("features")
    assert pa.types.is_fixed_size_list(feats.type) and feats.type.list_size == 16
    # deterministic: same payload → same features
    out2 = _collect(decode_stage(rd.from_arrow(media), fake=True, dim=16,
                                 batch_size=8))
    assert out.sort_by("media_id").equals(out2.sort_by("media_id"))

    frames = _collect(frame_sample_stage(rd.from_arrow(media), every_ms=5000))
    per_media = {}
    for r in frames.to_pylist():
        per_media.setdefault(r["media_id"], []).append(r["frame_ms"])
    for r in media.to_pylist():
        expected = 1 if r["duration_ms"] <= 0 else r["duration_ms"] // 5000 + 1
        assert len(per_media[r["media_id"]]) == expected


def test_bmp_codec_roundtrip_and_known_bytes():
    """Pure-numpy BMP: encode→decode is exact on odd widths (row padding),
    and the PARSER is pinned against a hand-built byte layout — not just
    the encoder's inverse."""
    import struct

    from rel_ray.stages.multimodal import decode_bmp, encode_bmp

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(5, 7, 3), dtype=np.uint8)
    assert np.array_equal(decode_bmp(encode_bmp(img)), img)

    # hand-built 2x2 24-bit BMP, bottom-up, BGR, rows padded to 8 bytes:
    # bottom row = red, green; top row = blue, white
    rows = (bytes([0, 0, 255]) + bytes([0, 255, 0]) + b"\x00\x00"   # file row 0 = image bottom
            + bytes([255, 0, 0]) + bytes([255, 255, 255]) + b"\x00\x00")
    payload = (struct.pack("<2sIHHI", b"BM", 54 + len(rows), 0, 0, 54)
               + struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 24, 0, len(rows),
                             0, 0, 0, 0) + rows)
    out = decode_bmp(payload)
    assert out.shape == (2, 2, 3)
    assert out[1, 0].tolist() == [255, 0, 0]      # bottom-left red (RGB)
    assert out[1, 1].tolist() == [0, 255, 0]      # bottom-right green
    assert out[0, 0].tolist() == [0, 0, 255]      # top-left blue
    assert out[0, 1].tolist() == [255, 255, 255]  # top-right white

    with pytest.raises(ValueError):
        decode_bmp(b"PNG not a bmp at all, really not")


def test_wav_codec_roundtrip_and_chunk_walk():
    """Pure-numpy WAV: stereo roundtrip is exact; the parser walks extra
    RIFF chunks (hand-built layout with a LIST chunk before data)."""
    import struct

    from rel_ray.stages.multimodal import decode_wav, encode_wav

    rng = np.random.default_rng(4)
    stereo = rng.integers(-32768, 32767, size=(300, 2)).astype(np.int16)
    out, rate = decode_wav(encode_wav(stereo, 22050))
    assert rate == 22050 and np.array_equal(out, stereo)

    # hand-built mono WAV with an extra LIST chunk between fmt and data
    samples = np.array([0, 1000, -1000, 32767], dtype=np.int16)
    data = samples.astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    body = (b"fmt " + struct.pack("<I", 16) + fmt
            + b"LIST" + struct.pack("<I", 4) + b"INFO"
            + b"data" + struct.pack("<I", len(data)) + data)
    payload = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
    out2, rate2 = decode_wav(payload)
    assert rate2 == 8000 and out2.ravel().tolist() == samples.tolist()

    with pytest.raises(ValueError):
        decode_wav(b"OGGS definitely not a riff wave file")


def test_real_decode_features_known_answer():
    """Feature extraction over REAL decoded bytes: a constant-color image
    yields constant luma features; a constant-amplitude tone yields its
    normalized amplitude; unsupported mimes stay a loud error."""
    from rel_ray.stages.multimodal import (MediaDecoder, encode_bmp,
                                           encode_wav)

    dec = MediaDecoder(fake=False, dim=8)
    img = np.full((10, 10, 3), 200, dtype=np.uint8)
    f = dec.decode(encode_bmp(img), "image/bmp", 8)
    assert f.shape == (8,)
    assert np.allclose(f, 200 / 255.0, atol=1e-3)

    tone = np.full(800, 16384, dtype=np.int16)
    f2 = dec.decode(encode_wav(tone, 8000), "audio/wav", 8)
    assert np.allclose(f2, 0.5, atol=1e-4)

    with pytest.raises(ValueError):
        dec.decode(b"bytes", "image/png", 8)


@pytest.mark.usefixtures("ray_session")
def test_real_decode_stage_end_to_end():
    """decode_stage(fake=False) over the generated real-payload media table:
    deterministic features, correct shapes, both kinds decoded."""
    from rel_ray.stages.multimodal import decode_stage, synth_real_media_table

    media = synth_real_media_table(24, seed=11)
    out = _collect(decode_stage(rd.from_arrow(media), fake=False, dim=16,
                                batch_size=8)).sort_by("media_id")
    assert out.num_rows == 24
    feats = out.column("features")
    assert pa.types.is_fixed_size_list(feats.type) and feats.type.list_size == 16
    vals = np.asarray(feats.combine_chunks().values,
                      dtype=np.float32).reshape(24, 16)
    assert np.all(vals >= 0) and np.all(vals <= 1)
    # image rows vary spatially (random pixels), audio rows follow the tone
    out2 = _collect(decode_stage(rd.from_arrow(media), fake=False, dim=16,
                                 batch_size=8)).sort_by("media_id")
    assert out.equals(out2)


@pytest.mark.usefixtures("ray_session")
def test_near_dedup_simhash_blocks_and_counters():
    """Hamming<=3 pairs are recovered via chunk-block pigeonhole (pairs land
    in >=2 distinct 16-bit chunk blocks), and block-cap drops are counted."""
    from rel_ray.functions.rayutil import DropCounter
    from rel_ray.stages.dedup import _popcount64, near_dedup_simhash, simhash_column

    base = ("alpha bravo charlie delta echo foxtrot golf hotel india juliet "
            "kilo lima mike november oscar papa quebec romeo sierra tango "
            "uniform victor whiskey xray yankee zulu one two three four five "
            "six seven eight nine ten eleven twelve thirteen fourteen fifteen "
            "sixteen seventeen eighteen nineteen twenty red green blue yellow "
            "purple orange black white grey brown pink teal ") * 3
    texts = [base,
             base.replace(" golf ", " golfx "),        # ham(0,1) == 3
             base.replace(" grey ", " greyx "),        # near-dup of 0 too
             "completely unrelated text about garden furniture and paint",
             "another distinct document describing a cooking recipe in detail"]
    tbl = pa.table({"doc_id": pa.array(range(len(texts)), type=pa.int64()),
                    "text": pa.array(texts)})
    sh = simhash_column(pa.array(texts), 3, unit="word").view(np.uint64)
    ham01 = int(_popcount64(np.array([sh[0] ^ sh[1]]))[0])
    assert ham01 <= 3  # one-word swap stays within the pigeonhole budget
    # the 0-1 pair shares at least TWO identical 16-bit chunks (ham<=3 over 4
    # chunks): the pair is found independently in >=2 blocks, so the band
    # dedup path is genuinely exercised
    same_chunks = sum(
        int((sh[0] >> np.uint64(16 * c)) & np.uint64(0xFFFF)
            == (sh[1] >> np.uint64(16 * c)) & np.uint64(0xFFFF))
        for c in range(4))
    assert same_chunks >= 2

    counters = DropCounter("test_simhash_counter")
    out = _collect(near_dedup_simhash(
        rd.from_arrow(tbl), id_col="doc_id", text_col="text", max_hamming=3,
        counters=counters, block_cap=2))
    cl = dict(zip(out.column("record_id").to_pylist(),
                  out.column("cluster_id").to_pylist()))
    assert cl["0"] == cl["1"]
    assert cl["3"] not in (cl["0"],) and cl["4"] != cl["3"]
    # block_cap=2 forces drops in every 3+-member chunk block (docs 0,1,2
    # share chunks) -> the counter must be nonzero, never silent
    import time
    deadline = time.time() + 10
    totals = counters.totals()
    while not totals and time.time() < deadline:
        time.sleep(0.2)
        totals = counters.totals()
    assert totals.get("simhash_block_cap_dropped", 0) > 0


@pytest.mark.usefixtures("ray_session")
def test_ann_lsh_recall():
    """Multi-table sign-LSH ANN: recall@10 vs the exact ranking must be >=0.9
    on a 500-vector fixture (the banding's S-curve guarantee, measured)."""
    from rel_ray.stages.similarity import ann_topk, ann_topk_lsh
    rng = np.random.default_rng(7)
    vecs = rng.standard_normal((500, 32)).astype(np.float32)
    tbl = pa.table({
        "vec_id": pa.array(range(500), type=pa.int64()),
        "embedding": pa.array([v.tolist() for v in vecs],
                              type=pa.list_(pa.float32())),
    })
    queries = {"ids": np.arange(5, dtype=np.int64),
               "vecs": vecs[:5].astype(np.float64)}
    exact = _collect(ann_topk(rd.from_arrow(tbl), queries, k=10))
    # random gaussian data is the WORST case for sign-LSH (top-10 cosines are
    # only ~0.4-0.6): shallow tables (4 planes) x 16 bands gives 0.94 here;
    # real embedding near-neighbors (cos >= 0.9) recall ~1 at the 8x8 default
    approx = _collect(ann_topk_lsh(rd.from_arrow(tbl), queries, k=10,
                                   n_planes=4, n_tables=16))
    ex = {}
    for r in exact.to_pylist():
        ex.setdefault(r["query_id"], set()).add(r["vec_id"])
    ap = {}
    for r in approx.to_pylist():
        ap.setdefault(r["query_id"], set()).add(r["vec_id"])
    hits = sum(len(ex[q] & ap.get(q, set())) for q in ex)
    recall = hits / sum(len(v) for v in ex.values())
    assert recall >= 0.9, f"ANN-LSH recall@10 = {recall}"
    # rank 1 must be the query itself (cos=1 collides in every table)
    r1 = {r["query_id"]: r["vec_id"] for r in approx.to_pylist()
          if r["rank"] == 1}
    assert all(r1[q] == q for q in range(5))


def test_fingerprint_winnow_matches_loop_reference():
    """The batch-vectorized winnowing == the straightforward per-document
    loop (Schleimer et al. windowed-min + unique) on varied row shapes."""
    from rel_ray.functions.shingles import char_ngram_codes
    from rel_ray.stages.textstats import fingerprint_winnow

    texts = ["the quick brown fox jumps over the lazy dog repeatedly",
             "", "abc", "abcd", "abcde", "abcdefgh",
             "tiny", "a much longer document with plenty of rolling hash "
                     "windows to winnow across the whole span of text"]
    k, window = 5, 4
    got = fingerprint_winnow(pa.array(texts), k, window).to_pylist()
    codes, splits = char_ngram_codes(pa.array(texts), k)
    for i, t in enumerate(texts):
        row = codes[splits[i]:splits[i + 1]]
        if len(row) == 0:
            ref = []
        elif len(row) <= window:
            ref = [int(np.uint64(row.min()).view(np.int64))]
        else:
            sw = np.lib.stride_tricks.sliding_window_view(row, window)
            # uint64 sort order, THEN the int64 bit-view (list order is the
            # unsigned hash order, matching the kernel)
            ref = [int(x) for x in np.unique(sw.min(axis=1)).view(np.int64)]
        assert got[i] == ref, f"row {i}"


@pytest.mark.usefixtures("ray_session")
def test_minhash_dedup_forced_fallback_path_equivalent():
    """broadcast_max_rows=0 + cc_local_max_edges=0 drives exact
    pre-cluster, cluster expansion AND connected components through
    their cogroup/label-prop fallbacks end-to-end; the cluster map must
    equal the broadcast fast path's byte for byte."""
    import dataclasses

    from rel_ray.stages.dedup import near_dedup_minhash

    texts = ([f"shared boilerplate sentence tail marker {i % 7} end"
              for i in range(40)]
             + ["one unique document about a garden shed"]
             + [f"shared boilerplate sentence tail marker {i % 7} end"
                for i in range(13)])
    tbl = pa.table({"doc_id": pa.array(range(len(texts)), type=pa.int64()),
                    "text": pa.array(texts)})

    def run(**kw):
        cfg = dataclasses.replace(DEFAULT_CONFIG,
                                  **kw.pop("cfg_kw", {}))
        out = _collect(near_dedup_minhash(
            rd.from_arrow(tbl).repartition(3), id_col="doc_id",
            text_col="text", cfg=cfg, threshold=0.5, **kw))
        return dict(zip(out.column("record_id").to_pylist(),
                        out.column("cluster_id").to_pylist()))

    fast = run()
    slow = run(broadcast_max_rows=0,
               cfg_kw={"cc_local_max_edges": 0})
    assert fast == slow and len(fast) == len(texts)


def test_minhash_dedup_duckdb_cross_check():
    """Independent verification of near_dedup_minhash cluster memberships:
    DuckDB computes exact word-3-gram Jaccard for every SAME-CLUSTER pair
    (must be >= the verify threshold OR exact-duplicate text) — LSH proposes,
    but nothing below the threshold may end up co-clustered (precision)."""
    import duckdb

    from rel_ray.stages.dedup import near_dedup_minhash

    texts = [
        "the nightly batch pipeline finished without errors and wrote summary tables",
        "the nightly batch pipeline finished without errors and wrote summary table",
        "the nightly batch pipeline completed without errors and wrote summary tables",
        "a completely different story about gardens and furniture and sunshine",
        "a completely different story about gardens and furniture and sunshine",
        "neural entity linking with transformers for noisy conversational text",
    ]
    tbl = pa.table({"doc_id": pa.array(range(len(texts)), type=pa.int64()),
                    "text": pa.array(texts)})
    out = _collect(near_dedup_minhash(rd.from_arrow(tbl), id_col="doc_id",
                                      text_col="text", cfg=DEFAULT_CONFIG,
                                      threshold=0.5))
    cl = dict(zip(out.column("record_id").to_pylist(),
                  out.column("cluster_id").to_pylist()))
    con = duckdb.connect()
    con.register("docs", tbl)
    # exact word-3-gram Jaccard in SQL: trigram sets via list slicing
    jac = con.execute("""
      WITH grams AS (
        SELECT doc_id, list_distinct([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
                 for i in range(1, len(ws) - 1)]) AS gs
        FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS ws
              FROM docs))
      SELECT a.doc_id, b.doc_id,
             CAST(len(list_intersect(a.gs, b.gs)) AS DOUBLE)
               / len(list_distinct(list_concat(a.gs, b.gs))) AS j
      FROM grams a JOIN grams b ON a.doc_id < b.doc_id
    """).fetchall()
    jmap = {(min(ia, ib), max(ia, ib)): j for ia, ib, j in jac}
    assert cl["0"] == cl["1"] == cl["2"]   # near-dups co-cluster
    assert cl["3"] == cl["4"]              # exact dups co-cluster
    assert cl["5"] not in (cl["0"], cl["3"])
    # reference clustering from DuckDB's exact Jaccard: transitive closure
    # over >=0.5 pairs — the engine's clusters must match it EXACTLY
    # (pair (1,2) is only 0.38 but chains through doc 0: a real transitive
    # case, so the reference must be the closure, not the direct edges)
    parent = list(range(len(texts)))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for (i, k), j in jmap.items():
        if j >= 0.5:
            parent[find(i)] = find(k)
    for i in range(len(texts)):
        for k in range(i + 1, len(texts)):
            assert (cl[str(i)] == cl[str(k)]) == (find(i) == find(k)), (i, k)


def test_similarity_self_join_exact_vs_bruteforce():
    """Prefix-filter join == brute-force all-pairs exact Jaccard (incl. the
    short-doc and exact-dup edge cases) — pairs, inter and uni all equal."""
    import itertools

    from rel_ray.functions.shingles import unique_shingle_sets, word_ngram_codes
    from rel_ray.stages.simjoin import similarity_self_join

    rng = np.random.default_rng(7)
    vocab = ["alpha", "bravo", "china", "delta", "eagle", "frank", "gamma",
             "hotel", "igloo", "jolly"]
    texts = []
    base = [" ".join(rng.choice(vocab, size=12)) for _ in range(8)]
    for b in base:
        texts.append(b)
        w = b.split()
        w[3] = "zebra"            # near-dup: one token changed
        texts.append(" ".join(w))
    texts += [base[0],            # exact dup -> J=1 pair
              "one two",          # <3 tokens: excluded entirely
              ""]                 # empty
    ids = list(range(len(texts)))
    ds = rd.from_arrow(pa.table({"doc_id": pa.array(ids, type=pa.int64()),
                                 "text": pa.array(texts)}))
    out = similarity_self_join(ds, id_col="doc_id", text_col="text",
                               tau_num=1, tau_den=2, num_buckets=8)
    got = {(r["id_a"], r["id_b"]): (r["inter"], r["uni"])
           for r in out.take_all()}

    # brute force on the driver with the same kernels
    codes, splits = word_ngram_codes(pa.array(texts), 3)
    uniq = unique_shingle_sets(codes, splits)
    sets = [np.asarray(uniq.values, dtype=np.uint64)[
        uniq.offsets[i].as_py():uniq.offsets[i + 1].as_py()] for i in ids]
    nwords = [len(t.split()) for t in texts]
    want = {}
    for i, k in itertools.combinations(ids, 2):
        if nwords[i] < 3 or nwords[k] < 3:
            continue
        inter = len(np.intersect1d(sets[i], sets[k], assume_unique=True))
        uni = len(sets[i]) + len(sets[k]) - inter
        if uni > 0 and 2 * inter >= uni:
            want[(i, k)] = (inter, uni)
    assert got == want and len(want) >= 9  # 8 near-dup pairs + dup triangle


def test_asof_join_interleaved_vs_reference():
    """As-of semantics on interleaved timestamps: latest right <= left ts per
    key, equal-ts counts, ties broken by max tie col, unmatched lefts drop,
    keys never cross."""
    from rel_ray.stages.temporal import asof_join

    rng = np.random.default_rng(11)
    n_l, n_r = 400, 300
    lk = rng.integers(0, 12, n_l)
    lt = rng.integers(0, 1000, n_l)
    rk = rng.integers(0, 14, n_r)          # some right-only keys
    rt = rng.integers(0, 1000, n_r) // 10 * 10   # force equal-ts ties
    left = rd.from_arrow(pa.table({
        "k": pa.array(lk, type=pa.int64()),
        "lts": pa.array(lt, type=pa.int64()),
        "lid": pa.array(np.arange(n_l), type=pa.int64())}))
    right = rd.from_arrow(pa.table({
        "k": pa.array(rk, type=pa.int64()),
        "rts": pa.array(rt, type=pa.int64()),
        "rid": pa.array(np.arange(n_r), type=pa.int64()),
        "payload": pa.array(rng.integers(0, 99, n_r), type=pa.int64())}))
    out = asof_join(left, right, key="k", left_ts="lts", right_ts="rts",
                    left_cols=["k", "lid", "lts"],
                    right_cols=["rid", "payload"],
                    right_tie="rid", num_buckets=8)
    got = {r["lid"]: (r["rid"], r["payload"], r["k"], r["lts"])
           for r in out.take_all()}

    payloads = [r["payload"] for r in right.take_all()]
    want = {}
    for i in range(n_l):
        best = None
        for j in range(n_r):
            if rk[j] == lk[i] and rt[j] <= lt[i]:
                if best is None or (rt[j], j) > (rt[best], best):
                    best = j
        if best is not None:
            want[i] = (best, payloads[best], int(lk[i]), int(lt[i]))
    assert set(got) == set(want)
    for lid, (rid, payload, k, lts) in got.items():
        assert want[lid][0] == rid and want[lid][2] == k and want[lid][3] == lts


def test_running_sum_and_packing_sparse_ids():
    """Distributed prefix scan == numpy cumsum on sorted order, with sparse
    non-contiguous ids arriving shuffled across blocks."""
    from rel_ray.stages.packing import pack_sequences

    rng = np.random.default_rng(3)
    ids = rng.choice(100000, size=500, replace=False).astype(np.int64)
    cnt = rng.integers(0, 40, 500).astype(np.int64)
    ds = rd.from_arrow(pa.table({"doc_id": pa.array(ids),
                                 "tok_cnt": pa.array(cnt)})).repartition(7)
    out = pack_sequences(ds, id_col="doc_id", count_col="tok_cnt",
                         budget=128, num_buckets=16)
    df = out.to_pandas().sort_values("doc_id").reset_index(drop=True)
    order = np.argsort(ids)
    want_cum = np.cumsum(cnt[order])
    assert (df["cum"].to_numpy() == want_cum).all()
    assert (df["seq_id"].to_numpy()
            == (want_cum - cnt[order]) // 128).all()


def test_ann_ivf_recall():
    """IVF recall@10 vs exact brute force on worst-case random vectors."""
    from rel_ray.stages.similarity import ann_topk, ann_topk_ivf
    rng = np.random.default_rng(5)
    vecs = rng.standard_normal((2000, 32)).astype(np.float32)
    tbl = pa.table({"vec_id": pa.array(range(2000), type=pa.int64()),
                    "embedding": pa.array([v.tolist() for v in vecs],
                                          type=pa.list_(pa.float32()))})
    queries = {"ids": np.arange(8, dtype=np.int64),
               "vecs": vecs[:8].astype(np.float64)}
    ds = rd.from_arrow(tbl)
    exact = {(r["query_id"], r["vec_id"])
             for r in _collect(ann_topk(ds, queries, k=10)).to_pylist()}
    ivf = {(r["query_id"], r["vec_id"])
           for r in _collect(ann_topk_ivf(ds, queries, k=10, n_cells=32,
                                          nprobe=8)).to_pylist()}
    recall = len(exact & ivf) / len(exact)
    assert recall >= 0.9, recall


@pytest.mark.usefixtures("ray_session")
def test_range_join_known_answer_and_cap():
    """Hand-computed interval join incl. end-exclusive boundary, key
    isolation, and the logged max_matches cap."""
    from rel_ray.stages.temporal import range_join

    left = pa.table({  # points
        "k": pa.array([1, 1, 1, 2, 3], type=pa.int64()),
        "lid": pa.array([10, 11, 12, 20, 30], type=pa.int64()),
        "t": pa.array([5, 10, 15, 5, 99], type=pa.int64()),
    })
    right = pa.table({  # intervals [s, e)
        "k": pa.array([1, 1, 2, 4], type=pa.int64()),
        "rid": pa.array([100, 101, 200, 400], type=pa.int64()),
        "s": pa.array([5, 11, 0, 0], type=pa.int64()),
        "e": pa.array([15, 16, 100, 100], type=pa.int64()),
    })
    out = _collect(range_join(
        rd.from_arrow(left), rd.from_arrow(right), key="k", left_ts="t",
        right_start="s", right_end="e", left_cols=["k", "lid"],
        right_cols=["rid"], num_buckets=4))
    got = sorted(zip(out.column("lid").to_pylist(),
                     out.column("rid").to_pylist()))
    # rid=100 covers t in [5,15): lids 10,11 (15 excluded: end-exclusive)
    # rid=101 covers [11,16): lid 12 (t=15), not 11 (t=10)
    # rid=200 covers k=2 [0,100): lid 20; k=3/4 never match
    assert got == [(10, 100), (11, 100), (12, 101), (20, 200)]

    capped = _collect(range_join(
        rd.from_arrow(left), rd.from_arrow(right), key="k", left_ts="t",
        right_start="s", right_end="e", left_cols=["k", "lid"],
        right_cols=["rid"], num_buckets=4, max_matches=1,
        counter_name="test_rj_cap"))
    assert capped.num_rows == 3  # rid=100 keeps only its first match
    from rel_ray.functions.rayutil import DropCounter
    import time as _time
    for _ in range(50):  # counter adds are fire-and-forget; allow them to land
        totals = DropCounter("test_rj_cap").totals()
        if totals.get("range_join_matches"):
            break
        _time.sleep(0.1)
    assert totals["range_join_matches"] == 1


@pytest.mark.usefixtures("ray_session")
def test_rolling_window_range_peers():
    """SQL RANGE-frame semantics: equal timestamps are peers — every peer row
    sees ALL peers (including sort-later ones) in its frame."""
    from rel_ray.stages.temporal import rolling_window_agg

    t = pa.table({
        "k": pa.array([1, 1, 1, 1, 2], type=pa.int64()),
        "rid": pa.array([0, 1, 2, 3, 4], type=pa.int64()),
        "ts": pa.array([100, 100, 105, 200, 100], type=pa.int64()),
        "v": pa.array([1, 2, 4, 8, 16], type=pa.int64()),
    })
    out = _collect(rolling_window_agg(
        rd.from_arrow(t), key="k", ts="ts", val_int="v", window=10,
        carry_cols=["rid"], num_buckets=4)).sort_by("rid")
    cnt = out.column("w_count").to_pylist()
    s = out.column("w_sum").to_pylist()
    # rid 0,1: peers at ts=100 -> both count 2 sum 3 (window [90,100])
    # rid 2: ts=105 window [95,105] -> rows 0,1,2 -> count 3 sum 7
    # rid 3: ts=200 window [190,200] -> itself only
    # rid 4: other key
    assert cnt == [2, 2, 3, 1, 1]
    assert s == [3, 3, 7, 8, 16]


@pytest.mark.usefixtures("ray_session")
def test_semi_anti_join_partition():
    """semi(left) and anti(left) partition left exactly; empty right."""
    from rel_ray.stages.joins import semi_anti_join

    left = pa.table({"k": pa.array([1, 2, 3, 4, 5], type=pa.int64()),
                     "payload": pa.array(list("abcde"))})
    right = pa.table({"k": pa.array([2, 2, 4, 9], type=pa.int64())})
    semi = _collect(semi_anti_join(rd.from_arrow(left), rd.from_arrow(right),
                                   key="k", anti=False, num_buckets=4))
    anti = _collect(semi_anti_join(rd.from_arrow(left), rd.from_arrow(right),
                                   key="k", anti=True, num_buckets=4))
    assert sorted(semi.column("k").to_pylist()) == [2, 4]
    assert sorted(anti.column("k").to_pylist()) == [1, 3, 5]
    assert semi.column_names == left.column_names
    empty_r = rd.from_arrow(right.slice(0, 0))
    assert _collect(semi_anti_join(rd.from_arrow(left), empty_r, key="k",
                                   anti=True, num_buckets=4)).num_rows == 5
    assert _collect(semi_anti_join(rd.from_arrow(left), empty_r, key="k",
                                   anti=False, num_buckets=4)).num_rows == 0


@pytest.mark.usefixtures("ray_session")
def test_tfidf_topk_hand_computed():
    """Quantized-idf TF-IDF against a hand-computed reference; absent query
    terms get weight 0."""
    from rel_ray.stages.retrieval import tfidf_topk

    docs = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], type=pa.int64()),
        "text": pa.array([
            "rare common common",          # tf(rare)=1 tf(common)=2
            "common common common",        # tf(common)=3
            "rare rare",                   # tf(rare)=2
            "nothing relevant here",
        ])})
    out = _collect(tfidf_topk(rd.from_arrow(docs), id_col="doc_id",
                              text_col="text",
                              query="rare common ghostterm", k=10,
                              scale=1 << 10))
    # N=4, df(rare)=2, df(common)=2, df(ghostterm)=0 -> w = 4*1024//2 = 2048
    # scores: d1 = 1*2048 + 2*2048 = 6144; d2 = 3*2048 = 6144; d3 = 2*2048
    got = list(zip(out.column("doc_id").to_pylist(),
                   out.column("score").to_pylist()))
    assert got == [(1, 6144), (2, 6144), (3, 4096)]  # tie broken by doc_id


@pytest.mark.usefixtures("ray_session")
def test_broadcast_inner_join():
    import ray
    from rel_ray.stages.joins import broadcast_inner_join

    left = pa.table({"k": pa.array([1, 2, 9, 2], type=pa.int64()),
                     "x": pa.array([10, 20, 90, 21], type=pa.int64())})
    dim = pa.table({"k": pa.array([1, 2, 3], type=pa.int64()),
                    "name": pa.array(["a", "b", "c"])})
    out = _collect(broadcast_inner_join(
        rd.from_arrow(left), ray.put(dim), key="k", val_cols=["name"]))
    got = sorted(zip(out.column("x").to_pylist(),
                     out.column("name").to_pylist()))
    assert got == [(10, "a"), (20, "b"), (21, "b")]  # k=9 dropped (inner)


@pytest.mark.usefixtures("ray_session")
def test_stratified_sample_deterministic():
    """Same rows on re-execution; per-stratum rates roughly honored; rate 0
    and 10000 are exact."""
    from rel_ray.stages.sampling import stratified_sample

    n = 4000
    t = pa.table({"id": pa.array(range(n), type=pa.int64()),
                  "s": pa.array(["a", "b"] * (n // 2))})
    rates = {"a": 10000, "b": 0}
    out = _collect(stratified_sample(rd.from_arrow(t), id_col="id",
                                     stratum_col="s", rates_permyriad=rates))
    assert sorted(out.column("id").to_pylist()) == list(range(0, n, 2))

    rates2 = {"a": 2500, "b": 5000}
    r1 = sorted(_collect(stratified_sample(
        rd.from_arrow(t), id_col="id", stratum_col="s",
        rates_permyriad=rates2)).column("id").to_pylist())
    r2 = sorted(_collect(stratified_sample(
        rd.from_arrow(t), id_col="id", stratum_col="s",
        rates_permyriad=rates2)).column("id").to_pylist())
    assert r1 == r2 and len(r1) > 0
    frac_a = sum(1 for i in r1 if i % 2 == 0) / (n / 2)
    frac_b = sum(1 for i in r1 if i % 2 == 1) / (n / 2)
    assert abs(frac_a - 0.25) < 0.05 and abs(frac_b - 0.5) < 0.05


@pytest.mark.usefixtures("ray_session")
def test_hll_accuracy():
    """Grouped HLL estimate within 5% of truth at p=12 (theory: ~1.6%),
    merged across many batches; tiny groups are exact via linear counting."""
    from rel_ray.stages.sketches import grouped_approx_distinct, hll_estimate, hll_fold

    rng = np.random.default_rng(7)
    vals_a = rng.integers(0, 10_000, size=60_000, dtype=np.int64)  # ~9950 distinct
    vals_b = rng.integers(0, 37, size=5_000, dtype=np.int64)       # small: exact-ish
    t = pa.table({
        "g": pa.array(["a"] * len(vals_a) + ["b"] * len(vals_b)),
        "v": pa.array(np.concatenate([vals_a, vals_b])),
    })
    out = _collect(grouped_approx_distinct(
        rd.from_arrow(t), group_col="g", value_col="v", p=12,
        num_buckets=8)).sort_by("g")
    est = dict(zip(out.column("g").to_pylist(),
                   out.column("approx_distinct").to_pylist()))
    true_a = len(np.unique(vals_a))
    true_b = len(np.unique(vals_b))
    assert abs(est["a"] - true_a) / true_a < 0.05
    assert abs(est["b"] - true_b) / true_b < 0.05

    # kernel-level merge law: fold(x ++ y) == max(fold(x), fold(y))
    from rel_ray.functions.hashing import splitmix64
    h1 = splitmix64(np.arange(0, 3000, dtype=np.uint64))
    h2 = splitmix64(np.arange(1500, 5000, dtype=np.uint64))
    r1 = hll_fold(h1, np.zeros(len(h1), dtype=np.int64), 1, 12)
    r2 = hll_fold(h2, np.zeros(len(h2), dtype=np.int64), 1, 12)
    r12 = hll_fold(np.concatenate([h1, h2]),
                   np.zeros(len(h1) + len(h2), dtype=np.int64), 1, 12)
    assert np.array_equal(np.maximum(r1, r2), r12)
    assert abs(hll_estimate(r12[0]) - 5000) / 5000 < 0.05


@pytest.mark.usefixtures("ray_session")
def test_chunk_documents_windows():
    """Overlap windows: 0-token doc emits nothing; short doc one chunk; a
    95-token doc with size=50/stride=40 gives chunks of 50/50/15."""
    from rel_ray.stages.packing import chunk_documents

    texts = ["", "three token doc", " ".join(f"w{i}" for i in range(95))]
    t = pa.table({"doc_id": pa.array([0, 1, 2], type=pa.int64()),
                  "text": pa.array(texts)})
    out = _collect(chunk_documents(rd.from_arrow(t), id_col="doc_id",
                                   text_col="text", chunk_size=50, stride=40,
                                   token_pattern="[a-z0-9]+")).sort_by(
        [("doc_id", "ascending"), ("chunk_idx", "ascending")])
    rows = out.to_pylist()
    assert [r["doc_id"] for r in rows] == [1, 2, 2, 2]
    assert [r["n_tokens"] for r in rows] == [3, 50, 50, 15]
    # overlap: chunk 1 of doc 2 starts at token 40
    assert rows[2]["chunk_text"].split()[0] == "w40"
    assert rows[2]["chunk_text"].split()[-1] == "w89"
    assert rows[3]["chunk_text"].split() == [f"w{i}" for i in range(80, 95)]


@pytest.mark.usefixtures("ray_session")
def test_scrub_pii_rules():
    """Rule order + placeholders; cross-checked against DuckDB's RE2 on the
    same crafted strings (the oracle-identity contract)."""
    import duckdb

    from rel_ray.stages.cleaning import scrub_pii

    texts = [
        "contact me at alice.smith+work@example.co.uk today",
        "see https://example.com/a?b=c&user=bob@mail.com for details",
        "call +1 555-123 4567 or 08-1234-5678 now",
        "no pii here at all",
        "mixed: http://x.io/p bob@x.io +49 171 1234567",
    ]
    t = pa.table({"doc_id": pa.array(range(5), type=pa.int64()),
                  "text": pa.array(texts)})
    out = _collect(scrub_pii(rd.from_arrow(t), text_col="text",
                             out_col="clean")).sort_by("doc_id")
    clean = out.column("clean").to_pylist()
    assert clean[0] == "contact me at <EMAIL> today"
    assert clean[1] == "see <URL> for details"          # email inside URL: once
    assert "<PHONE>" in clean[2] and "555" not in clean[2]
    assert clean[3] == texts[3]
    assert clean[4] == "mixed: <URL> <EMAIL> <PHONE>"

    con = duckdb.connect()
    sql = con.execute(r"""
      SELECT regexp_replace(regexp_replace(regexp_replace(t,
        'https?://[^\s]+', '<URL>', 'g'),
        '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        '\+?\d[\d\- ]{7,}\d', '<PHONE>', 'g')
      FROM (SELECT unnest(?) AS t)""", [texts]).fetchall()
    assert [r[0] for r in sql] == clean


@pytest.mark.usefixtures("ray_session")
def test_flag_contaminated_ngram_overlap():
    import ray.data as rd

    from rel_ray.stages.dedup import flag_contaminated

    bench = rd.from_arrow(pa.table({
        "doc_id": [0],
        "text": ["alpha beta gamma delta epsilon zeta"]}))
    corpus = rd.from_arrow(pa.table({
        "doc_id": [1, 2, 3, 4],
        "text": [
            # shares 5-gram "beta gamma delta epsilon zeta"
            "x beta gamma delta epsilon zeta y",
            # same words, different order: no shared 5-gram
            "zeta epsilon delta gamma beta alpha",
            "totally unrelated words here now",
            "",  # empty: never contaminated
        ]}))
    out = flag_contaminated(corpus, bench, id_col="doc_id", text_col="text")
    got = dict(zip(*[out.to_pandas().sort_values("doc_id")[c].tolist()
                     for c in ("doc_id", "contaminated")]))
    assert got == {1: True, 2: False, 3: False, 4: False}


@pytest.mark.usefixtures("ray_session")
def test_flag_contaminated_short_doc_whole_gram():
    import ray.data as rd

    from rel_ray.stages.dedup import flag_contaminated

    # both sides < 5 tokens: match iff the whole token sequence is equal
    bench = rd.from_arrow(pa.table({"doc_id": [0], "text": ["a b c"]}))
    corpus = rd.from_arrow(pa.table({
        "doc_id": [1, 2], "text": ["a b c", "a b"]}))
    out = flag_contaminated(corpus, bench, id_col="doc_id", text_col="text")
    got = dict(zip(*[out.to_pandas().sort_values("doc_id")[c].tolist()
                     for c in ("doc_id", "contaminated")]))
    assert got == {1: True, 2: False}


@pytest.mark.usefixtures("ray_session")
def test_ngram_repetition_counts():
    import ray.data as rd

    from rel_ray.stages.dedup import ngram_repetition

    out = ngram_repetition(rd.from_arrow(pa.table({
        "doc_id": [1, 2, 3],
        "text": [
            "a b c d e a b c d e a b c d e",  # 15 tokens -> 11 grams, 5 distinct
            "one two three",                   # short: 1 whole-doc gram
            "",                                # empty: 0 grams
        ]})), id_col="doc_id", text_col="text")
    df = out.to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert df.total_grams.tolist() == [11, 1, 0]
    assert df.distinct_grams.tolist() == [5, 1, 0]


@pytest.mark.usefixtures("ray_session")
def test_cogroup_inner_join_basic_and_unique_guard():
    import ray.data as rd

    from rel_ray.stages.joins import cogroup_inner_join

    left = rd.from_arrow(pa.table({
        "k": [1, 2, 2, 3, 4], "lv": ["a", "b", "c", "d", "e"]}))
    right = rd.from_arrow(pa.table({
        "k": [1, 2, 3], "rv": [10, 20, 30]}))
    out = cogroup_inner_join(left, right, key="k", right_cols=["rv"],
                             num_buckets=8).to_pandas()
    out = out.sort_values(["k", "lv"]).reset_index(drop=True)
    # k=4 dropped (inner); duplicate left keys both joined
    assert out.k.tolist() == [1, 2, 2, 3]
    assert out.lv.tolist() == ["a", "b", "c", "d"]
    assert out.rv.tolist() == [10, 20, 20, 30]

    dup_right = rd.from_arrow(pa.table({"k": [1, 1], "rv": [10, 11]}))
    import ray

    with pytest.raises((ValueError, ray.exceptions.RayTaskError)):
        cogroup_inner_join(left, dup_right, key="k", right_cols=["rv"],
                           num_buckets=2).materialize()


@pytest.mark.usefixtures("ray_session")
def test_dup_pairs_bucketed_emission(tmp_path):
    import pyarrow.parquet as pq

    from rel_ray.pipelines.queries import q_dup_pairs_documents

    docs = pa.table({
        "doc_id": pa.array([5, 1, 3, 2, 9, 7], type=pa.int64()),
        "text": ["same", "same", "same", "other", "other", "unique"]})
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(docs, str(d / "documents.parquet"))
    out = q_dup_pairs_documents(str(d))
    got = sorted(zip(out.column("id_a").to_pylist(),
                     out.column("id_b").to_pylist()))
    assert got == [(1, 3), (1, 5), (2, 9), (3, 5)]


@pytest.mark.usefixtures("ray_session")
def test_global_topk_matches_sort_limit():
    import ray.data as rd

    from rel_ray.functions.rayutil import global_topk

    rng = np.random.default_rng(3)
    vals = rng.integers(0, 50, size=500)
    tab = pa.table({"id": pa.array(np.arange(500, dtype=np.int64)),
                    "v": pa.array(vals.astype(np.int64))})
    ds = rd.from_arrow(tab).repartition(13)
    got = global_topk(ds, [("v", "descending"), ("id", "ascending")], 7)
    import pandas as pd

    expect = (tab.to_pandas().sort_values(["v", "id"],
                                          ascending=[False, True]).head(7))
    assert got.column("id").to_pylist() == expect["id"].tolist()
    assert got.column("v").to_pylist() == expect["v"].tolist()

    empty = rd.from_arrow(tab.slice(0, 0))
    assert global_topk(empty, [("v", "descending")], 5).num_rows == 0


def test_grouped_centroids_known_answer():
    """Integer-scaled per-label vector sums match a hand computation, across
    multiple partitions (the combiner must merge partials exactly)."""
    import ray.data as rd

    from rel_ray.stages.similarity import grouped_centroids

    vecs = pa.array([[1.0, 2.0], [3.0, 4.0], [0.5, -0.25], [1.5, 0.75]],
                    type=pa.list_(pa.float32()))
    tab = pa.table({"label": pa.array([1, 2, 1, 2], type=pa.int32()),
                    "embedding": vecs})
    ds = rd.from_arrow(tab).repartition(3)
    out = grouped_centroids(ds, group_col="label", vec_col="embedding")
    df = out.to_pandas().sort_values(["group", "dim"]).reset_index(drop=True)
    # label 1: (1+0.5, 2-0.25) = (1.5, 1.75); label 2: (4.5, 4.75)
    assert df["group"].tolist() == [1, 1, 2, 2]
    assert df["sum_scaled"].tolist() == [1_500_000, 1_750_000,
                                         4_500_000, 4_750_000]
    assert df["n"].tolist() == [2, 2, 2, 2]


# ---------------------------------------------------------------------------
# hot-key salting (stages/salting.py)
# ---------------------------------------------------------------------------

def _uf_components(pairs: pa.Table, ids: list[str]) -> dict[str, str]:
    parent = {i: i for i in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(pairs.column("id_a").to_pylist(),
                    pairs.column("id_b").to_pylist()):
        if a in parent and b in parent:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
    return {i: find(i) for i in ids}


@pytest.mark.usefixtures("ray_session")
def test_hot_key_salting_connectivity():
    """A hot block key is split into bridge-linked shards: every member stays
    in ONE connected component, per-key segment sizes drop to ~est/shards,
    and non-hot keys' pairs are untouched."""
    import dataclasses

    from rel_ray.stages.pairs import pairs_stage
    from rel_ray.stages.salting import hot_key_table, salt_blocks, sample_rows

    cfg = dataclasses.replace(
        DEFAULT_CONFIG, hot_key_min=128, hot_sample_mod=4, hot_max_shards=8,
        hot_bridge_per_shard=8, num_buckets=16)

    n_hot = 1200
    hot_ids = [f"h{i:05d}" for i in range(n_hot)]
    cold_keys, cold_ids = [], []
    for k in range(40):
        for j in range(3):
            cold_keys.append(10_000 + k)
            cold_ids.append(f"c{k:03d}_{j}")
    blocks_tab = pa.table({
        "block_key": pa.array([777] * n_hot + cold_keys, type=pa.int64()),
        "record_id": pa.array(hot_ids + cold_ids),
        "mention_norm": pa.array(["x"] * (n_hot + len(cold_ids))),
    })
    blocks = rd.from_arrow(blocks_tab).repartition(4)

    hot = hot_key_table(sample_rows(blocks, "record_id", cfg.hot_sample_mod),
                        cfg)
    assert hot.num_rows == 1 and hot.column("key").to_pylist() == [777]
    n_shards = hot.column("n_shards")[0].as_py()
    assert 2 <= n_shards <= cfg.hot_max_shards

    salted = salt_blocks(blocks, hot)
    st = _collect(salted)
    # the hot key itself is gone; per-key segment sizes are balanced
    import collections
    sizes = collections.Counter(st.column("block_key").to_pylist())
    assert 777 not in sizes
    hot_rows = {k: v for k, v in sizes.items() if v > 10}
    assert len(hot_rows) >= n_shards  # shards + bridge block
    assert max(hot_rows.values()) < n_hot / 2

    pairs_salted = _collect(pairs_stage(salted, cfg))
    comp = _uf_components(pairs_salted, hot_ids)
    assert len(set(comp.values())) == 1, "shards must stay bridge-connected"

    # cold keys: pair sets identical with and without salting
    pairs_plain = _collect(pairs_stage(blocks, cfg))

    def cold_pairs(t):
        return sorted((a, b) for a, b in zip(t.column("id_a").to_pylist(),
                                             t.column("id_b").to_pylist())
                      if a.startswith("c"))
    assert cold_pairs(pairs_salted) == cold_pairs(pairs_plain)


@pytest.mark.usefixtures("ray_session")
def test_salted_blocking_gates_small_inputs():
    """Below hot_key_min the salting path must add zero stages (same plan as
    plain blocking) and detection must not run."""
    import dataclasses

    from rel_ray.stages.blocking import blocking_stage
    from rel_ray.stages.salting import salted_blocking

    reps = rd.from_arrow(pa.table({
        "record_id": pa.array([f"r{i}" for i in range(20)]),
        "mention_norm": pa.array([f"name {i}" for i in range(20)]),
    }))
    cfg = DEFAULT_CONFIG
    out = _collect(salted_blocking(reps, cfg, est_rows=20 * cfg.bands))
    ref = _collect(blocking_stage(reps, cfg))
    assert out.sort_by([("block_key", "ascending"),
                        ("record_id", "ascending")]).equals(
        ref.sort_by([("block_key", "ascending"),
                     ("record_id", "ascending")]))

    cfg_off = dataclasses.replace(cfg, salt_hot_keys=False)
    out_off = _collect(salted_blocking(reps, cfg_off, est_rows=None))
    assert out_off.num_rows == ref.num_rows


# ---------------------------------------------------------------------------
# Bloom filter (stages/sketches.py) + tumbling window
# ---------------------------------------------------------------------------

def test_bloom_no_false_negatives_and_fpr():
    from rel_ray.stages.sketches import bloom_build, bloom_probe

    rng_vals = (np.arange(10_000, dtype=np.uint64) * np.uint64(2654435761)
                + np.uint64(17))
    members, others = rng_vals[:5000], rng_vals[5000:]
    m_bits = ((len(members) * 10 + 63) // 64) * 64
    bits = bloom_build(members, m_bits=m_bits, k=7)
    assert bloom_probe(bits, members, k=7).all(), "false negative"
    fpr = bloom_probe(bits, others, k=7).mean()
    assert fpr < 0.03, fpr  # theory ~0.8% at 10 bits/key, k=7


@pytest.mark.usefixtures("ray_session")
def test_bloom_decontaminate_superset_of_exact():
    """Bloom decontamination must flag every exactly-contaminated doc (no
    false negatives); FPs allowed but bounded on this fixture."""
    from rel_ray.stages.dedup import flag_contaminated
    from rel_ray.stages.sketches import bloom_decontaminate

    bench_texts = ["alpha beta gamma delta epsilon zeta", "one two three four five six"]
    corpus_texts = [
        "prefix alpha beta gamma delta epsilon zeta suffix",  # contaminated
        "one two three four five six and then some more",     # contaminated
        "totally clean document with no overlap whatsoever here",
        "another clean text about ray data streaming executors",
    ] * 5
    bench = rd.from_arrow(pa.table({"doc_id": pa.array(range(2), type=pa.int64()),
                                    "text": pa.array(bench_texts)}))
    corpus = rd.from_arrow(pa.table(
        {"doc_id": pa.array(range(len(corpus_texts)), type=pa.int64()),
         "text": pa.array(corpus_texts)}))

    exact = _collect(flag_contaminated(corpus, bench, id_col="doc_id",
                                       text_col="text")).sort_by("doc_id")
    bloom = _collect(bloom_decontaminate(corpus, bench, id_col="doc_id",
                                         text_col="text")).sort_by("doc_id")
    e = np.asarray(exact.column("contaminated"))
    b = np.asarray(bloom.column("contaminated"))
    assert (b | ~e).all(), "bloom missed an exact contamination"
    assert e.sum() == 10  # the two contaminated texts × 5


@pytest.mark.usefixtures("ray_session")
def test_tumbling_window_known_answer(tmp_path):
    import pyarrow.parquet as pq

    from rel_ray.pipelines.queries import q_tumbling_window_events

    h = 3_600_000_000
    ts = np.array([0, 10, h - 1, h, h + 5, 3 * h], dtype=np.int64)
    tab = pa.table({
        "event_id": pa.array(range(6), type=pa.int64()),
        "ts": pa.array(ts, type=pa.timestamp("us")),
        "user_id": pa.array([1, 1, 1, 1, 2, 2], type=pa.int64()),
        "event_type": pa.array(["view"] * 6),
        "value": pa.array([1.0, 2.0, 3.0, 4.0, 5.0, 6.5]),
        "props": pa.array(["{}"] * 6),
    })
    pq.write_table(tab, tmp_path / "events.parquet")
    out = _collect(q_tumbling_window_events(str(tmp_path))).sort_by(
        [("user_id", "ascending"), ("window_start_us", "ascending")])
    assert out.column("user_id").to_pylist() == [1, 1, 2, 2]
    assert out.column("window_start_us").to_pylist() == [0, h, h, 3 * h]
    assert out.column("sum_value_cents").to_pylist() == [600, 400, 500, 650]
    assert out.column("cnt").to_pylist() == [3, 1, 1, 1]


@pytest.mark.usefixtures("ray_session")
def test_similarity_cross_join_vs_bruteforce():
    """Cross-corpus exact similarity join: pairs match a brute-force
    reference, no same-side pairs, id_a always from the new side."""
    from rel_ray.stages.simjoin import similarity_cross_join

    new_texts = [
        "the quick brown fox jumps over the lazy dog tonight",
        "completely novel content nothing shared here at all",
        "alpha beta gamma delta epsilon zeta eta theta iota",
    ]
    base_texts = [
        "the quick brown fox jumps over the lazy dog today",
        "alpha beta gamma delta epsilon zeta eta theta kappa",
        "unrelated base document about streaming dataset executors",
    ]
    new = rd.from_arrow(pa.table({"doc_id": pa.array([1, 3, 5], type=pa.int64()),
                                  "text": pa.array(new_texts)}))
    base = rd.from_arrow(pa.table({"doc_id": pa.array([2, 4, 6], type=pa.int64()),
                                   "text": pa.array(base_texts)}))
    out = _collect(similarity_cross_join(
        new, base, id_col="doc_id", text_col="text", tau_num=1, tau_den=2,
        num_buckets=8)).sort_by([("id_a", "ascending"), ("id_b", "ascending")])

    def grams(s):
        ws = s.split()
        return {" ".join(ws[i:i + 3]) for i in range(len(ws) - 2)}

    want = []
    for i, nt in zip([1, 3, 5], new_texts):
        for j, bt in zip([2, 4, 6], base_texts):
            a, b = grams(nt), grams(bt)
            inter, uni = len(a & b), len(a | b)
            if 2 * inter >= uni:
                want.append((i, j, inter, uni))
    got = list(zip(out.column("id_a").to_pylist(),
                   out.column("id_b").to_pylist(),
                   out.column("inter").to_pylist(),
                   out.column("uni").to_pylist()))
    assert got == sorted(want)
    assert all(a % 2 == 1 and b % 2 == 0 for a, b, *_ in got)
    assert len(got) == 2  # fox pair + greek-letters pair


def test_misra_gries_bounds():
    from rel_ray.stages.sketches import mg_merge, mg_summarize

    rng = np.random.RandomState(7)
    # zipf-ish stream in two partials
    stream = np.concatenate([np.repeat(np.arange(50, dtype=np.uint64),
                                       (1000 // (np.arange(50) + 1))),
                             rng.randint(100, 10_000, 5000).astype(np.uint64)])
    rng.shuffle(stream)
    k = 32
    parts = []
    for half in np.array_split(stream, 3):
        uv, inv = np.unique(half, return_inverse=True)
        cnt = np.bincount(inv, minlength=len(uv)).astype(np.int64)
        parts.append(mg_summarize(uv, cnt, k))
    v, c, err = mg_merge(parts, k)
    assert len(v) <= k
    true = {int(x): int((stream == x).sum()) for x in np.unique(stream)}
    est = dict(zip(v.tolist(), c.tolist()))
    # lower-bound property + bounded underestimate
    for tok, e in est.items():
        assert e <= true[tok] <= e + err
    # every item with true count > err must be present
    for tok, tc in true.items():
        if tc > err:
            assert tok in est, (tok, tc, err)


@pytest.mark.usefixtures("ray_session")
def test_heavy_hitter_terms_vs_exact():
    from rel_ray.functions.shingles import string_hash_u64
    from rel_ray.stages.sketches import heavy_hitter_terms

    texts = (["the cat sat"] * 40 + ["a dog ran far"] * 25
             + [f"unique{i} filler{i}" for i in range(30)])
    ds = rd.from_arrow(pa.table({"text": pa.array(texts)})).repartition(4)
    out = heavy_hitter_terms(ds, text_col="text", k=16)
    assert out.num_rows <= 16
    est = dict(zip(out.column("token_hash").to_pylist(),
                   out.column("est_count").to_pylist()))
    err = out.column("max_err")[0].as_py() if out.num_rows else 0
    h_the = string_hash_u64(pa.array(["the"]))[0]
    h_dog = string_hash_u64(pa.array(["dog"]))[0]
    assert est[int(h_the)] <= 40 <= est[int(h_the)] + err
    assert est[int(h_dog)] <= 25 <= est[int(h_dog)] + err


@pytest.mark.usefixtures("ray_session")
def test_jsonl_and_csv_sources(tmp_path):
    import json

    from rel_ray.sources.readers import read_documents_csv, read_transcripts_jsonl

    rows = [{"conv_id": "c1", "turn_idx": i, "role": "user",
             "text": f"turn {i}", "tool": "",
             "ts": f"2026-01-01T00:00:0{i}"} for i in range(3)]
    p = tmp_path / "t.jsonl"
    p.write_text("\n".join(json.dumps(r) for r in rows))
    ds = read_transcripts_jsonl(str(p))
    t = _collect(ds).sort_by("turn_idx")
    assert t.column("turn_idx").to_pylist() == [0, 1, 2]
    assert t.schema.field("ts").type == pa.timestamp("us")
    assert t.schema.field("turn_idx").type == pa.int32()

    c = tmp_path / "d.csv"
    c.write_text("doc_id,text\n1,hello world\n2,second doc\n")
    d = _collect(read_documents_csv(str(c))).sort_by("doc_id")
    assert d.column("text").to_pylist() == ["hello world", "second doc"]
    assert d.schema.field("doc_id").type == pa.int64()


@pytest.mark.usefixtures("ray_session")
def test_partitioned_window_kernel():
    from rel_ray.stages.temporal import partitioned_window

    # two keys interleaved; key 7 has a tie on ts broken by the tie column
    t = pa.table({
        "k": pa.array([7, 3, 7, 7, 3], type=pa.int64()),
        "ts": pa.array([10, 5, 10, 20, 9], type=pa.int64()),
        "tie": pa.array([2, 1, 1, 3, 2], type=pa.int64()),
        "v": pa.array([100, 10, 50, 7, 20], type=pa.int64()),
    })
    out = _collect(partitioned_window(
        rd.from_arrow(t).repartition(3), key="k", ts="ts", tie="tie",
        val_int="v", carry_cols=["k", "tie"])).sort_by(
            [("k", "ascending"), ("row_number", "ascending")])
    assert out.column("k").to_pylist() == [3, 3, 7, 7, 7]
    assert out.column("row_number").to_pylist() == [1, 2, 1, 2, 3]
    # lag resets to 0 at every partition first row
    assert out.column("lag_val").to_pylist() == [0, 10, 0, 50, 100]
    assert out.column("run_sum").to_pylist() == [10, 30, 50, 150, 157]


@pytest.mark.usefixtures("ray_session")
def test_sessionize_gap_semantics():
    from rel_ray.stages.temporal import sessionize

    # key 1: gap EXACTLY equal to the threshold does NOT break (> not >=);
    # one past it does. key 2: single event = one session.
    t = pa.table({
        "k": pa.array([1, 1, 1, 1, 2], type=pa.int64()),
        "ts": pa.array([0, 100, 201, 250, 999], type=pa.int64()),
        "tie": pa.array([0, 1, 2, 3, 4], type=pa.int64()),
        "v": pa.array([1, 2, 4, 8, 16], type=pa.int64()),
    })
    out = _collect(sessionize(
        rd.from_arrow(t).repartition(2), key="k", ts="ts", tie="tie",
        val_int="v", gap=100)).sort_by(
            [("k", "ascending"), ("session_id", "ascending")])
    assert out.column("k").to_pylist() == [1, 1, 2]
    assert out.column("session_id").to_pylist() == [0, 1, 0]
    assert out.column("n_events").to_pylist() == [2, 2, 1]
    assert out.column("sum_val").to_pylist() == [3, 12, 16]
    assert out.column("session_start").to_pylist() == [0, 201, 999]
    assert out.column("session_end").to_pylist() == [100, 250, 999]


@pytest.mark.usefixtures("ray_session")
def test_window_session_empty_input():
    from rel_ray.stages.temporal import partitioned_window, sessionize

    t = pa.table({
        "k": pa.array([], type=pa.int64()),
        "ts": pa.array([], type=pa.int64()),
        "tie": pa.array([], type=pa.int64()),
        "v": pa.array([], type=pa.int64()),
    })
    w = _collect(partitioned_window(rd.from_arrow(t), key="k", ts="ts",
                                    tie="tie", val_int="v",
                                    carry_cols=["k"]))
    assert w.num_rows == 0
    s = _collect(sessionize(rd.from_arrow(t), key="k", ts="ts", tie="tie",
                            val_int="v", gap=10))
    assert s.num_rows == 0


@pytest.mark.usefixtures("ray_session")
def test_kmeans_recovers_blobs():
    from rel_ray.stages.similarity import kmeans

    rng = np.random.RandomState(3)
    centers = np.array([[10.0, 0.0, 0.0], [0.0, 10.0, 0.0], [0.0, 0.0, 10.0]])
    pts = np.concatenate([c + rng.randn(40, 3) * 0.05 for c in centers])
    ids = np.arange(len(pts), dtype=np.int64)
    t = pa.table({"vec_id": pa.array(ids),
                  "embedding": pa.array(list(pts.astype(np.float32)),
                                        type=pa.list_(pa.float32()))})
    ds = rd.from_arrow(t).repartition(4)
    assigns, C, inertia = kmeans(ds, n_clusters=3, iters=8)
    out = _collect(assigns).sort_by("vec_id")
    lab = np.asarray(out.column("cluster"))
    # perfect recovery: each true blob maps to exactly one cluster id
    blobs = [set(lab[i * 40:(i + 1) * 40].tolist()) for i in range(3)]
    assert all(len(b) == 1 for b in blobs)
    assert len(set().union(*blobs)) == 3
    # inertia is monotone non-increasing across Lloyd's iterations
    assert all(a >= b - 1e-9 for a, b in zip(inertia, inertia[1:]))
    # determinism: second run identical
    assigns2, C2, _ = kmeans(ds, n_clusters=3, iters=8)
    assert np.array_equal(
        np.asarray(_collect(assigns2).sort_by("vec_id").column("cluster")),
        lab)
    assert np.allclose(C, C2)


@pytest.mark.usefixtures("ray_session")
def test_cogroup_left_join():
    from rel_ray.stages.joins import cogroup_inner_join

    left = rd.from_arrow(pa.table({
        "k": pa.array([1, 2, 3, 4], type=pa.int64()),
        "lv": pa.array(["a", "b", "c", "d"])})).repartition(2)
    right = rd.from_arrow(pa.table({
        "k": pa.array([2, 4], type=pa.int64()),
        "rv": pa.array([20, 40], type=pa.int64())}))
    out = _collect(cogroup_inner_join(left, right, key="k",
                                      right_cols=["rv"], how="left")
                   ).sort_by("k")
    assert out.column("k").to_pylist() == [1, 2, 3, 4]
    assert out.column("rv").to_pylist() == [None, 20, None, 40]
    inner = _collect(cogroup_inner_join(left, right, key="k",
                                        right_cols=["rv"])).sort_by("k")
    assert inner.column("k").to_pylist() == [2, 4]


@pytest.mark.usefixtures("ray_session")
def test_count_min_guarantees():
    from rel_ray.functions.shingles import string_hash_u64
    from rel_ray.stages.sketches import cms_query, count_min_terms

    texts = (["alpha beta gamma"] * 30 + ["beta delta"] * 20
             + [f"tail{i} noise{i}" for i in range(50)])
    ds = rd.from_arrow(pa.table({"text": pa.array(texts)})).repartition(4)
    sketch = count_min_terms(ds, text_col="text", depth=4, width=1024)
    # note the [a-z]+ tokenizer strips digits: "tail7" contributes the
    # token "tail" (50 occurrences across the filler docs)
    true = {"alpha": 30, "beta": 50, "gamma": 30, "delta": 20,
            "tail": 50, "noise": 50}
    toks = list(true)
    h = string_hash_u64(pa.array(toks))
    est = cms_query(sketch, h)
    n_total = int(sketch[0].sum())  # each row sums to the full stream length
    for tok, e in zip(toks, est.tolist()):
        assert e >= true[tok]                       # never undercounts
        assert e <= true[tok] + n_total             # trivial sanity ceiling
    # width 1024 >> distinct tokens here: collisions are rare enough that
    # at least the two heaviest tokens are exact
    assert est[1] == 50
    # mergeability: sketch of the same data in one partition is identical
    s2 = count_min_terms(rd.from_arrow(pa.table({"text": pa.array(texts)})),
                         text_col="text", depth=4, width=1024)
    assert np.array_equal(sketch, s2)


@pytest.mark.usefixtures("ray_session")
def test_cogroup_join_multi():
    from rel_ray.functions.rayutil import DropCounter
    from rel_ray.stages.joins import cogroup_join_multi

    left = rd.from_arrow(pa.table({
        "k": pa.array([1, 1, 2, 3], type=pa.int64()),
        "lv": pa.array([10, 11, 20, 30], type=pa.int64())})).repartition(2)
    right = rd.from_arrow(pa.table({
        "k": pa.array([1, 1, 1, 2], type=pa.int64()),
        "rv": pa.array([100, 101, 102, 200], type=pa.int64())}))
    out = _collect(cogroup_join_multi(
        left, right, key="k", left_cols=["lv"], right_cols=["rv"]))
    got = sorted(zip(out.column("k").to_pylist(),
                     out.column("lv").to_pylist(),
                     out.column("rv").to_pylist()))
    want = sorted([(1, lv, rv) for lv in (10, 11) for rv in (100, 101, 102)]
                  + [(2, 20, 200)])
    assert got == want  # full SQL inner-join multiplicity; key 3 dropped

    # skew cap: max_matches=2 keeps 2 right rows per left row and counts
    counters = DropCounter()
    capped = _collect(cogroup_join_multi(
        left, right, key="k", left_cols=["lv"], right_cols=["rv"],
        max_matches=2, counters=counters))
    assert capped.num_rows == 2 * 2 + 1
    assert counters.totals(
        expect_keys=["join_multi_matches"]).get("join_multi_matches") == 2


@pytest.mark.usefixtures("ray_session")
def test_grouped_string_agg():
    from rel_ray.stages.temporal import grouped_string_agg

    # rows arrive out of order and split across partitions; (ts, tie)
    # ordering must still hold inside each key's joined string
    t = pa.table({"k": pa.array([2, 1, 1, 2, 1], type=pa.int64()),
                  "ts": pa.array([5, 3, 1, 4, 1], type=pa.int64()),
                  "id": pa.array([50, 30, 11, 40, 10], type=pa.int64()),
                  "v": pa.array(["e", "c", "b", "d", "a"])})
    out = _collect(grouped_string_agg(
        rd.from_arrow(t).repartition(3), key="k", ts="ts", tie="id",
        val="v", sep="-"))
    got = dict(zip(out.column("k").to_pylist(),
                   out.column("agg").to_pylist()))
    assert got == {1: "a-b-c", 2: "d-e"}


@pytest.mark.usefixtures("ray_session")
def test_rollup_sum():
    from rel_ray.stages.rollup import rollup_sum

    t = pa.table({"a": pa.array(["x", "x", "y", "y"]),
                  "b": pa.array(["p", "q", "p", "p"]),
                  "v": pa.array([1, 2, 4, 8], type=pa.int64())})
    out = _collect(rollup_sum(rd.from_arrow(t).repartition(2),
                              dims=["a", "b"], value_col="v"))
    got = sorted(zip(out.column("a").to_pylist(),
                     out.column("b").to_pylist(),
                     out.column("v").to_pylist()),
                 key=lambda r: (r[0] or "", r[1] or "", r[2]))
    assert got == sorted([
        ("x", "p", 1), ("x", "q", 2), ("y", "p", 12),   # finest
        ("x", None, 3), ("y", None, 12),                # per-a
        (None, None, 15)],                              # grand total
        key=lambda r: (r[0] or "", r[1] or "", r[2]))


@pytest.mark.usefixtures("ray_session")
def test_cogroup_join_multi_outer():
    from rel_ray.stages.joins import cogroup_join_multi

    left = rd.from_arrow(pa.table({
        "k": pa.array([1, 1, 3], type=pa.int64()),
        "lv": pa.array([10, 11, 30], type=pa.int64())}))
    right = rd.from_arrow(pa.table({
        "k": pa.array([1, 4], type=pa.int64()),
        "rv": pa.array([100, 400], type=pa.int64())}))

    def rows(how):
        out = _collect(cogroup_join_multi(
            left, right, key="k", left_cols=["lv"], right_cols=["rv"],
            how=how))
        return sorted(zip(out.column("k").to_pylist(),
                          out.column("lv").to_pylist(),
                          out.column("rv").to_pylist()),
                      key=lambda r: tuple(-1 if v is None else v for v in r))

    matched = [(1, 10, 100), (1, 11, 100)]
    assert rows("inner") == matched
    assert rows("left") == sorted(matched + [(3, 30, None)])
    assert rows("right") == sorted(
        matched + [(4, None, 400)],
        key=lambda r: tuple(-1 if v is None else v for v in r))
    assert rows("full") == sorted(
        matched + [(3, 30, None), (4, None, 400)],
        key=lambda r: tuple(-1 if v is None else v for v in r))


@pytest.mark.usefixtures("ray_session")
def test_bucketed_group_apply_int32_keys():
    # regression: narrow (4-byte) key dtypes must widen before the u64
    # hash view — a raw view halves the array and mis-buckets silently
    from rel_ray.functions.rayutil import bucketed_group_apply, segment_starts

    t = pa.table({"k": pa.array(list(range(10)) * 3, type=pa.int32()),
                  "v": pa.array(range(30), type=pa.int64())})

    def seg_count(bucket: pa.Table) -> pa.Table:
        n = bucket.num_rows
        if n == 0:
            return pa.table({"k": pa.array([], type=pa.int32()),
                             "cnt": pa.array([], type=pa.int64())})
        starts = np.asarray(segment_starts(bucket.column("k")))
        lens = np.diff(np.append(starts, n))
        kc = bucket.column("k")
        if isinstance(kc, pa.ChunkedArray):
            kc = kc.combine_chunks()
        return pa.table({"k": kc.take(pa.array(starts)),
                         "cnt": pa.array(lens.astype(np.int64))})

    out = _collect(bucketed_group_apply(
        rd.from_arrow(t).repartition(3), "k", seg_count,
        num_buckets=8)).sort_by("k")
    assert out.column("k").to_pylist() == list(range(10))
    assert out.column("cnt").to_pylist() == [3] * 10


@pytest.mark.usefixtures("ray_session")
def test_quantile_sketch():
    from rel_ray.stages.sketches import quantile_sketch, sketch_quantile

    rng = np.random.default_rng(7)
    vals = rng.lognormal(8, 2, size=20000).astype(np.int64)
    eps = 0.01
    a, b = vals[:12000], vals[12000:]
    ds_all = rd.from_arrow(pa.table({"v": pa.array(vals)})).repartition(4)
    sk = quantile_sketch(ds_all, val_col="v", eps=eps)
    # merge law: sketch(A ∪ B) == sketch(A) + sketch(B), bit-exact
    sk_a = quantile_sketch(rd.from_arrow(pa.table({"v": pa.array(a)})),
                           val_col="v", eps=eps)
    sk_b = quantile_sketch(rd.from_arrow(pa.table({"v": pa.array(b)})),
                           val_col="v", eps=eps)
    assert np.array_equal(sk, sk_a + sk_b)
    assert sk.sum() == len(vals)
    # error bound: relative error <= ~2*eps at every checked quantile
    for q in (0.1, 0.5, 0.9, 0.99):
        exact = float(np.quantile(vals, q, method="inverted_cdf"))
        est = sketch_quantile(sk, q, eps)
        assert abs(est - exact) / max(exact, 1.0) <= 2.5 * eps, (q, est, exact)
    # negative values are rejected, not silently mangled
    bad = rd.from_arrow(pa.table({"v": pa.array([-1], type=pa.int64())}))
    with pytest.raises(Exception):
        quantile_sketch(bad, val_col="v", eps=eps)


@pytest.mark.usefixtures("ray_session")
def test_bloom_semi_anti_matches_exact():
    from rel_ray.stages.joins import bloom_semi_anti, semi_anti_join

    rng = np.random.default_rng(3)
    lk = rng.integers(0, 500, size=2000)
    rk = rng.integers(250, 750, size=300)
    left = rd.from_arrow(pa.table({
        "k": pa.array(lk, type=pa.int64()),
        "payload": pa.array(np.arange(2000), type=pa.int64())})).repartition(3)
    right = rd.from_arrow(pa.table({"k": pa.array(rk, type=pa.int64())}))

    def key_set(ds):
        t = _collect(ds)
        return sorted(zip(t.column("k").to_pylist(),
                          t.column("payload").to_pylist()))

    for anti in (False, True):
        exact = key_set(semi_anti_join(left, right, key="k", anti=anti))
        bloom = key_set(bloom_semi_anti(left, right, key="k", anti=anti,
                                        m_bits=1 << 14))
        assert bloom == exact and len(exact) > 0

    # string keys route through string_hash_u64
    ls = rd.from_arrow(pa.table({"k": pa.array(["a", "b", "c", "d"]),
                                 "payload": pa.array([1, 2, 3, 4],
                                                     type=pa.int64())}))
    rs = rd.from_arrow(pa.table({"k": pa.array(["b", "d", "zz"])}))
    got = _collect(bloom_semi_anti(ls, rs, key="k", m_bits=1 << 12))
    assert sorted(got.column("k").to_pylist()) == ["b", "d"]


@pytest.mark.usefixtures("ray_session")
def test_pagerank_matches_dense_reference():
    from rel_ray.stages.graph import pagerank

    # small directed graph with a dangling node (4), a hub (0) and a cycle
    E = [(0, 1), (0, 2), (1, 2), (2, 0), (3, 0), (3, 2), (2, 4)]
    edges = rd.from_arrow(pa.table({
        "src": pa.array([f"n{a}" for a, _ in E]),
        "dst": pa.array([f"n{b}" for _, b in E])})).repartition(2)
    d, iters, n = 0.85, 5, 5
    got = _collect(pagerank(edges, damping=d, iters=iters, num_buckets=4))
    got_d = dict(zip(got.column("node").to_pylist(),
                     got.column("rank").to_pylist()))

    # dense float64 power iteration, identical update rule
    out = np.zeros((n, n))
    for a, b in E:
        out[a, b] = 1
    deg = out.sum(axis=1)
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        dangling = r[deg == 0].sum()
        base = (1 - d) / n + d * dangling / n
        contrib = np.zeros(n)
        for a, b in E:
            contrib[b] += r[a] / deg[a]
        r = d * contrib + base
    for i in range(n):
        assert abs(got_d[f"n{i}"] - r[i]) < 1e-9, (i, got_d, r)
    assert abs(sum(got_d.values()) - 1.0) < 1e-9


@pytest.mark.usefixtures("ray_session")
def test_pagerank_cogroup_path_equivalent():
    from rel_ray.stages.graph import pagerank

    E = [(0, 1), (0, 2), (1, 2), (2, 0), (3, 0), (3, 2), (2, 4)]
    edges = rd.from_arrow(pa.table({
        "src": pa.array([f"n{a}" for a, _ in E]),
        "dst": pa.array([f"n{b}" for _, b in E])}))

    def run(**kw):
        t = _collect(pagerank(edges, iters=2, num_buckets=4, **kw))
        return dict(zip(t.column("node").to_pylist(),
                        t.column("rank").to_pylist()))

    fast = run()                       # broadcast path (n=5 << max)
    slow = run(broadcast_max_rows=0)   # force the co-group fallback
    assert fast.keys() == slow.keys()
    for k in fast:
        assert abs(fast[k] - slow[k]) < 1e-12, (k, fast[k], slow[k])


@pytest.mark.usefixtures("ray_session")
def test_pagerank_weighted_cogroup_path_equivalent():
    """broadcast_max_rows=0 forces the cogroup fallback; both paths must
    agree to float tolerance, including zero-weight edges (contribute
    nothing), a zero-out-weight node (dangling) and a pure sink."""
    from rel_ray.stages.graph import pagerank_weighted

    E = [(0, 1, 3.0), (0, 2, 1.0), (1, 2, 2.0), (2, 0, 5.0),
         (3, 0, 0.0),  # node 3's only out-edge has weight 0 -> dangling
         (2, 4, 1.0)]  # node 4 is a sink
    edges = rd.from_arrow(pa.table({
        "src": pa.array([f"n{a}" for a, _, _ in E]),
        "dst": pa.array([f"n{b}" for _, b, _ in E]),
        "w": pa.array([w for _, _, w in E])})).repartition(2)

    def run(**kw):
        t = _collect(pagerank_weighted(edges, iters=4, num_buckets=4,
                                       **kw))
        return dict(zip(t.column("node").to_pylist(),
                        t.column("rank").to_pylist()))

    fast = run()
    slow = run(broadcast_max_rows=0)
    assert fast.keys() == slow.keys() and len(fast) == 5
    for k in fast:
        assert abs(fast[k] - slow[k]) < 1e-12, (k, fast[k], slow[k])
    assert abs(sum(slow.values()) - 1.0) < 1e-9


@pytest.mark.usefixtures("ray_session")
def test_diff_corpora():
    from rel_ray.stages.dedup import diff_corpora

    old = rd.from_arrow(pa.table({
        "id": pa.array([1, 2, 3, 4], type=pa.int64()),
        "text": pa.array(["a", "b", "c", "d"])})).repartition(2)
    new = rd.from_arrow(pa.table({
        "id": pa.array([2, 3, 5], type=pa.int64()),
        "text": pa.array(["b", "c2", "e"])}))
    out = _collect(diff_corpora(old, new, id_col="id", text_col="text"))
    got = dict(zip(out.column("id").to_pylist(),
                   out.column("status").to_pylist()))
    assert got == {1: "removed", 2: "unchanged", 3: "changed",
                   4: "removed", 5: "added"}


def test_json_scalar_field_kernel():
    from rel_ray.stages.cleaning import json_scalar_field

    col = pa.array(['{"k": 69}', '{"k": -2, "x": "ab"}', '{"x": "q w"}',
                    '{}', None, '{"k": true}', '{"k": ""}',
                    '{"key2": 1, "k": 3.5}'])
    assert json_scalar_field(col, "k").to_pylist() == [
        "69", "-2", None, None, None, "true", "", "3.5"]
    # string values with spaces come back whole; absent field stays null
    assert json_scalar_field(col, "x").to_pylist() == [
        None, "ab", "q w", None, None, None, None, None]


@pytest.mark.usefixtures("ray_session")
def test_new_ops_empty_inputs():
    from rel_ray.stages.dedup import diff_corpora
    from rel_ray.stages.graph import pagerank

    empty_docs = rd.from_arrow(pa.table({
        "id": pa.array([], type=pa.int64()),
        "text": pa.array([], type=pa.string())}))
    one = rd.from_arrow(pa.table({"id": pa.array([1], type=pa.int64()),
                                  "text": pa.array(["x"])}))
    out = _collect(diff_corpora(empty_docs, one, id_col="id",
                                text_col="text"))
    assert out.column("status").to_pylist() == ["added"]
    out = _collect(diff_corpora(one, empty_docs, id_col="id",
                                text_col="text"))
    assert out.column("status").to_pylist() == ["removed"]

    empty_edges = rd.from_arrow(pa.table({
        "src": pa.array([], type=pa.string()),
        "dst": pa.array([], type=pa.string())}))
    pr = _collect(pagerank(empty_edges, iters=2))
    assert pr.num_rows == 0


@pytest.mark.usefixtures("ray_session")
def test_grouped_rank_tie_semantics():
    from rel_ray.stages.temporal import grouped_rank

    # key 1 values: 5,5,7,9 -> rank 1,1,3,4; dense 1,1,2,3
    t = pa.table({"k": pa.array([1, 1, 1, 1, 2], type=pa.int64()),
                  "v": pa.array([5, 5, 7, 9, 3], type=pa.int64()),
                  "id": pa.array([10, 11, 12, 13, 20], type=pa.int64())})
    out = _collect(grouped_rank(rd.from_arrow(t).repartition(2), key="k",
                                val="v", tie="id", carry_cols=["id", "k"],
                                tiles=3))
    rows = {i: (r, d, p, ti) for i, r, d, p, ti in zip(
        out.column("id").to_pylist(), out.column("rnk").to_pylist(),
        out.column("dense_rnk").to_pylist(),
        out.column("pct_rank").to_pylist(),
        out.column("tile").to_pylist())}
    assert (rows[10][0], rows[11][0], rows[12][0], rows[13][0]) == (1, 1, 3, 4)
    assert (rows[10][1], rows[11][1], rows[12][1], rows[13][1]) == (1, 1, 2, 3)
    assert rows[13][2] == 1.0 and rows[10][2] == 0.0
    # NTILE(3) over 4 rows: sizes 2,1,1
    assert [rows[i][3] for i in (10, 11, 12, 13)] == [1, 1, 2, 3]
    # single-row partition: rank 1, pct 0.0, tile 1
    assert rows[20] == (1, 1, 0.0, 1)


@pytest.mark.usefixtures("ray_session")
def test_keep_latest_and_unpivot():
    from rel_ray.stages.dedup import keep_latest
    from rel_ray.stages.rollup import unpivot

    t = pa.table({"k": pa.array([1, 1, 2, 2, 2], type=pa.int64()),
                  "ts": pa.array([5, 9, 3, 3, 1], type=pa.int64()),
                  "id": pa.array([10, 11, 20, 21, 22], type=pa.int64()),
                  "payload": pa.array(["a", "b", "c", "d", "e"])})
    out = _collect(keep_latest(rd.from_arrow(t).repartition(2), key="k",
                               order_cols=["ts", "id"]))
    got = sorted(zip(out.column("k").to_pylist(),
                     out.column("id").to_pylist(),
                     out.column("payload").to_pylist()))
    # key 2 ties on ts=3 -> greater id (21) wins deterministically
    assert got == [(1, 11, "b"), (2, 21, "d")]

    wide = rd.from_arrow(pa.table({
        "u": pa.array([1, 2], type=pa.int64()),
        "a": pa.array([10, 20], type=pa.int64()),
        "b": pa.array([30, 40], type=pa.int64())}))
    lg = _collect(unpivot(wide, id_cols=["u"], value_cols=["a", "b"]))
    assert sorted(zip(lg.column("u").to_pylist(),
                      lg.column("metric").to_pylist(),
                      lg.column("value").to_pylist())) == [
        (1, "a", 10), (1, "b", 30), (2, "a", 20), (2, "b", 40)]


@pytest.mark.usefixtures("ray_session")
def test_profile_table():
    from rel_ray.stages.profile import profile_table

    t = pa.table({
        "i": pa.array([9, 10, None, 3], type=pa.int64()),
        "s": pa.array(["b", None, "a", "c"]),
        "f": pa.array([1.5, -2.0, 0.0, None], type=pa.float64())})
    out = profile_table(rd.from_arrow(t).repartition(2),
                        columns=["i", "s", "f"])
    rows = {r["column"]: r for r in out.to_pylist()}
    # regression: numeric min/max fold on VALUES, not strings
    # (string-min of {'9','10','3'} would be '10')
    assert rows["i"]["min"] == "3" and rows["i"]["max"] == "10"
    assert rows["i"]["n_nulls"] == 1 and rows["i"]["n_distinct"] == 3
    assert rows["s"]["min"] == "a" and rows["s"]["max"] == "c"
    assert rows["f"]["min"] == "-2.0" and rows["f"]["max"] == "1.5"
    assert all(r["distinct_exact"] for r in rows.values())
    assert all(r["n_rows"] == 4 for r in rows.values())

    # HLL fallback path: force exact_distinct_max below cardinality
    big = pa.table({"v": pa.array(np.arange(5000), type=pa.int64())})
    out2 = profile_table(rd.from_arrow(big).repartition(4), columns=["v"],
                         exact_distinct_max=100)
    r = out2.to_pylist()[0]
    assert not r["distinct_exact"]
    assert abs(r["n_distinct"] - 5000) / 5000 < 0.05


@pytest.mark.usefixtures("ray_session")
def test_bigram_lm_score():
    from rel_ray.stages.textstats import _byte_pairs, bigram_counts, lm_score

    # kernel vs naive reference, incl. empty/1-char rows at boundaries
    texts = ["", "a", "abcab", "", "xy", "a b a b"]
    col = pa.array(texts)
    codes, row_of = _byte_pairs(col)
    want = []
    for i, s in enumerate(texts):
        b = s.encode()
        want += [((b[j] << 8) | b[j + 1], i) for j in range(len(b) - 1)]
    assert sorted(zip(codes.tolist(), row_of.tolist())) == sorted(want)

    # corpus-typical docs outscore random byte strings
    rng = np.random.default_rng(5)
    english = ["the cat sat on the mat and the dog ran over the hill"] * 50
    noise = ["".join(chr(rng.integers(33, 127)) for _ in range(50))
             for _ in range(5)]
    ids = list(range(len(english) + len(noise)))
    ds = rd.from_arrow(pa.table({
        "id": pa.array(ids, type=pa.int64()),
        "text": pa.array(english + noise)})).repartition(3)
    counts = bigram_counts(ds, text_col="text")
    assert counts.sum() == sum(max(len(t) - 1, 0) for t in english + noise)
    out = _collect(lm_score(ds, id_col="id", text_col="text",
                            counts=counts))
    sc = dict(zip(out.column("id").to_pylist(),
                  out.column("lm_logprob").to_pylist()))
    eng_scores = [sc[i] for i in range(50)]
    noise_scores = [sc[i] for i in range(50, 55)]
    assert min(eng_scores) > max(noise_scores) + 1.0  # clear separation


@pytest.mark.usefixtures("ray_session")
def test_sample_k_per_group_deterministic():
    from rel_ray.stages.sampling import sample_k_per_group

    t = pa.table({"g": pa.array([1] * 20 + [2] * 3, type=pa.int64()),
                  "id": pa.array(range(23), type=pa.int64())})

    def run():
        out = _collect(sample_k_per_group(
            rd.from_arrow(t).repartition(3), group_col="g", id_col="id",
            k=4))
        return sorted(zip(out.column("g").to_pylist(),
                          out.column("id").to_pylist()))

    a, b = run(), run()
    assert a == b                       # bit-deterministic across runs
    g1 = [i for g, i in a if g == 1]
    g2 = [i for g, i in a if g == 2]
    assert len(g1) == 4                 # exact k
    assert sorted(g2) == [20, 21, 22]   # undersized group keeps all
    assert "__h" not in _collect(sample_k_per_group(
        rd.from_arrow(t), group_col="g", id_col="id", k=4)).column_names


@pytest.mark.usefixtures("ray_session")
def test_budget_sample():
    from rel_ray.stages.sampling import budget_sample

    t = pa.table({"g": pa.array(["a"] * 10 + ["b"] * 2),
                  "id": pa.array(range(12), type=pa.int64()),
                  "w": pa.array([40] * 10 + [500, 30], type=pa.int64())})
    out = _collect(budget_sample(rd.from_arrow(t).repartition(3),
                                 group_col="g", id_col="id",
                                 weight_col="w", budget=100))
    by_g = {}
    for g, w in zip(out.column("g").to_pylist(),
                    out.column("w").to_pylist()):
        by_g.setdefault(g, []).append(w)
    # group a: 40-weight rows -> exactly 2 fit under 100 (inclusive prefix)
    assert sum(by_g["a"]) <= 100 and len(by_g["a"]) == 2
    # group b: whichever of (500, 30) hashes first determines the take;
    # a 500 row never fits, the 30 row always does if it comes first
    assert sum(by_g.get("b", [])) <= 100
    # deterministic across runs
    out2 = _collect(budget_sample(rd.from_arrow(t).repartition(2),
                                  group_col="g", id_col="id",
                                  weight_col="w", budget=100))
    assert sorted(out.column("id").to_pylist()) == \
        sorted(out2.column("id").to_pylist())


@pytest.mark.usefixtures("ray_session")
def test_histogram_fixed_and_bigrams():
    from rel_ray.stages.profile import histogram_fixed

    t = pa.table({"v": pa.array([0, 5, 9, 10, 19, 25, -1, 100],
                                type=pa.int64())})
    out = _collect(histogram_fixed(rd.from_arrow(t).repartition(2),
                                   val_col="v", lo=0, hi=30,
                                   n_bins=3)).sort_by("bin")
    # width 10: [0,10)->3, [10,20)->2, [20,30)->1; -1 and 100 ignored
    assert out.column("cnt").to_pylist() == [3, 2, 1]
    assert out.column("lo_edge").to_pylist() == [0, 10, 20]
    assert out.column("hi_edge").to_pylist() == [10, 20, 30]


@pytest.mark.usefixtures("ray_session")
def test_asof_join_forward():
    from rel_ray.stages.temporal import asof_join

    left = rd.from_arrow(pa.table({
        "k": pa.array([1, 1, 1, 2], type=pa.int64()),
        "lt": pa.array([5, 11, 30, 7], type=pa.int64()),
        "lv": pa.array([100, 101, 102, 200], type=pa.int64())}))
    right = rd.from_arrow(pa.table({
        "k": pa.array([1, 1, 2], type=pa.int64()),
        "rt": pa.array([10, 20, 7], type=pa.int64()),
        "rv": pa.array([-1, -2, -3], type=pa.int64())}))
    out = _collect(asof_join(left, right, key="k", left_ts="lt",
                             right_ts="rt", left_cols=["k", "lt", "lv"],
                             right_cols=["rv"], direction="forward"))
    got = sorted(zip(out.column("lv").to_pylist(),
                     out.column("rv").to_pylist()))
    # lt=5 -> first rt>=5 is 10 (rv -1); lt=11 -> 20 (-2); lt=30 -> none
    # (dropped, inner); k=2 lt=7 -> rt=7 (equal allowed, -3)
    assert got == [(100, -1), (101, -2), (200, -3)]


@pytest.mark.usefixtures("ray_session")
def test_cube_sum():
    from rel_ray.stages.rollup import cube_sum

    t = pa.table({"a": pa.array(["x", "x", "y"]),
                  "b": pa.array(["p", "q", "p"]),
                  "v": pa.array([1, 2, 4], type=pa.int64())})
    out = _collect(cube_sum(rd.from_arrow(t).repartition(2),
                            dims=["a", "b"], value_col="v"))
    got = sorted(zip(out.column("a").to_pylist(),
                     out.column("b").to_pylist(),
                     out.column("v").to_pylist()),
                 key=lambda r: (r[0] or "", r[1] or "", r[2]))
    assert got == sorted([
        ("x", "p", 1), ("x", "q", 2), ("y", "p", 4),    # finest
        ("x", None, 3), ("y", None, 4),                 # (a)
        (None, "p", 5), (None, "q", 2),                 # (b) — CUBE-only
        (None, None, 7)],                               # grand total
        key=lambda r: (r[0] or "", r[1] or "", r[2]))


@pytest.mark.usefixtures("ray_session")
def test_profile_table_bool_column():
    # regression (round-3 advice): bool routes to the string channel and
    # used to crash pa.array([True], type=pa.string()) in the partial
    from rel_ray.stages.profile import profile_table

    t = pa.table({"b": pa.array([True, False, None, True])})
    rows = {r["column"]: r
            for r in profile_table(rd.from_arrow(t).repartition(2),
                                   columns=["b"]).to_pylist()}
    r = rows["b"]
    assert r["n_rows"] == 4 and r["n_nulls"] == 1 and r["n_distinct"] == 2
    assert r["min"] == "False" and r["max"] == "True"


def test_sample_bucket_negative_ids_match_sql_twin():
    # regression (round-3 advice): numpy % is non-negative while SQL %
    # follows the dividend sign; the documented twin is now sign-safe
    import duckdb

    from rel_ray.stages.sampling import sample_bucket

    ids = pa.array([-5, -2_147_483_649, -1, 0, 7, 2**62, -(2**62)],
                   type=pa.int64())
    got = sample_bucket(ids).tolist()
    sql = duckdb.sql(
        "SELECT (((id % 2147483648 + 2147483648) % 2147483648)"
        " * 2654435761 % 2147483648) % 10000 AS b"
        " FROM (SELECT unnest($ids) AS id)",
        params={"ids": ids.to_pylist()}).fetchall()
    assert got == [r[0] for r in sql]


@pytest.mark.usefixtures("ray_session")
def test_running_sum_overflow_guard():
    # regression (round-3 advice): a sparse id span that would wrap int64
    # in range bucketing must raise, not scan wrong
    from rel_ray.stages.packing import running_sum

    t = pa.table({"id": pa.array([0, 2**62], type=pa.int64()),
                  "n": pa.array([1, 1], type=pa.int64())})
    with pytest.raises(ValueError, match="overflows int64"):
        running_sum(rd.from_arrow(t), id_col="id", val_col="n",
                    num_buckets=64).materialize()


@pytest.mark.usefixtures("ray_session")
def test_bm25_topk_hand_computed():
    """Integer-quantized BM25 against the formula computed by hand in
    Python ints (the same rational form the SQL oracle runs)."""
    from rel_ray.stages.retrieval import bm25_topk

    texts = [
        "rare common common",            # dl=3
        "common common common common",   # dl=4
        "rare rare",                     # dl=2
        "nothing relevant here at all",  # dl=5
    ]
    docs = pa.table({"doc_id": pa.array([1, 2, 3, 4], type=pa.int64()),
                     "text": pa.array(texts)})
    out = _collect(bm25_topk(rd.from_arrow(docs), id_col="doc_id",
                             text_col="text", query="rare common ghost",
                             k=10, scale=256))
    # hand computation: N=4, L=14, df(rare)=2, df(common)=2
    toks = [t.split() for t in texts]
    N, L = 4, 14
    w = {"rare": 4 * 256 // 2, "common": 4 * 256 // 2}
    exp = {}
    for doc_id, tk in zip([1, 2, 3, 4], toks):
        dl, s = len(tk), 0
        for term, wt in w.items():
            tf = tk.count(term)
            if tf:
                s += (wt * tf * 20 * L) // (8 * L * tf + 3 * L + 9 * dl * N)
        if s > 0:
            exp[doc_id] = s
    got = dict(zip(out.column("doc_id").to_pylist(),
                   out.column("score").to_pylist()))
    assert got == exp
    # ranking is score desc, id asc
    scores = out.column("score").to_pylist()
    assert scores == sorted(scores, reverse=True)


@pytest.mark.usefixtures("ray_session")
def test_bottomk_sample_matches_naive():
    from rel_ray.stages.sampling import _KNUTH, _MOD, bottomk_sample

    ids = np.arange(1000, dtype=np.int64) * 7 - 500   # includes negatives
    t = pa.table({"doc_id": pa.array(ids),
                  "lang": pa.array(["en"] * len(ids))})
    out = _collect(bottomk_sample(rd.from_arrow(t), id_col="doc_id", k=25,
                                  carry_cols=["lang"], batch_size=100))
    h = (ids % _MOD) * _KNUTH % _MOD
    exp = ids[np.lexsort((ids, h))][:25]
    assert out.column("doc_id").to_pylist() == exp.tolist()
    assert out.num_rows == 25 and out.column_names == ["doc_id", "lang"]


def test_word_ngram_strings_contract():
    from rel_ray.stages.dedup import word_ngram_strings

    texts = pa.array([
        "a b c d e f",     # 6 tokens -> 2 sliding 5-grams
        "x y",             # short -> one whole-doc gram
        "",                # empty -> none
        "   ",             # whitespace-only -> none
        "p q r s t",       # exactly 5 -> one gram
    ])
    grams, rows = word_ngram_strings(texts, n=5)
    got = sorted(zip(rows.tolist(), grams.to_pylist()))
    assert got == [(0, "a b c d e"), (0, "b c d e f"), (1, "x y"),
                   (4, "p q r s t")]


@pytest.mark.usefixtures("ray_session")
def test_dup_passages_known_answer():
    from rel_ray.stages.dedup import dup_passages

    docs = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], type=pa.int64()),
        "text": pa.array([
            "the quick brown fox jumps high",      # shares 5-gram with d2
            "see the quick brown fox jumps",       # "the quick brown fox jumps"
            "the quick brown fox jumps high",      # exact dup of d1
            "totally unrelated little text here",
        ])})
    out = _collect(dup_passages(rd.from_arrow(docs), text_col="text",
                                n=5, min_docs=2))
    got = dict(zip(out.column("gram").to_pylist(),
                   out.column("n_docs").to_pylist()))
    assert got == {"the quick brown fox jumps": 3,
                   "quick brown fox jumps high": 2}


def _naive_agreement(pred, gold, scale=10**6):
    """Mirror of partition_agreement's integer formulas via dict counting."""
    from collections import Counter
    cont = Counter(zip(pred, gold))
    cs, gs = Counter(pred), Counter(gold)
    n = len(pred)
    pn = sum(v * v * scale // cs[p] for (p, _), v in cont.items())
    rn = sum(v * v * scale // gs[g] for (_, g), v in cont.items())
    both = sum(v * (v - 1) // 2 for v in cont.values())
    a = sum(v * (v - 1) // 2 for v in cs.values())
    b = sum(v * (v - 1) // 2 for v in gs.values())
    total = n * (n - 1) // 2
    e6 = 10**6
    num, den = 2 * (both * total - a * b), (a + b) * total - 2 * a * b
    if den == 0:
        ari = e6
    elif num >= 0:
        ari = num * e6 // den
    else:
        ari = -((-num) * e6 // den)
    return {"n": n, "pairs_both": both, "pairs_pred": a, "pairs_gold": b,
            "b3p_e6": pn * e6 // (n * scale), "b3r_e6": rn * e6 // (n * scale),
            "b3f_e6": (2 * pn * rn * e6 // ((pn + rn) * n * scale)
                       if pn + rn else 0),
            "ari_e6": ari}


@pytest.mark.usefixtures("ray_session")
def test_partition_agreement_matches_naive():
    from rel_ray.pipelines.eval import partition_agreement

    rng = np.random.default_rng(11)
    gold = [f"g{i}" for i in rng.integers(0, 7, 500)]
    # correlated pred: mostly gold's cluster, 20% scrambled
    pred = [g if rng.random() < 0.8 else f"g{rng.integers(0, 7)}"
            for g in gold]
    t = pa.table({"p": pa.array(pred), "g": pa.array(gold)})
    out = _collect(partition_agreement(
        rd.from_arrow(t).repartition(7), pred_col="p", gold_col="g"))
    got = {c: out.column(c)[0].as_py() for c in out.column_names}
    assert got == _naive_agreement(pred, gold)
    assert got["ari_e6"] > 200_000  # correlated partitions agree


@pytest.mark.usefixtures("ray_session")
def test_partition_agreement_edge_cases():
    from rel_ray.pipelines.eval import partition_agreement

    # identical partitions -> perfect scores
    t = pa.table({"p": pa.array(["a", "a", "b", "c", "c"]),
                  "g": pa.array(["x", "x", "y", "z", "z"])})
    out = _collect(partition_agreement(rd.from_arrow(t),
                                       pred_col="p", gold_col="g"))
    got = {c: out.column(c)[0].as_py() for c in out.column_names}
    assert (got["b3p_e6"], got["b3r_e6"], got["b3f_e6"], got["ari_e6"]) == (
        10**6, 10**6, 10**6, 10**6)

    # anti-correlated -> negative ARI, truncation (not floor) semantics
    pred = ["x", "y", "x", "y", "x"]
    gold = ["a", "a", "a", "b", "b"]
    t2 = pa.table({"p": pa.array(pred), "g": pa.array(gold)})
    out2 = _collect(partition_agreement(rd.from_arrow(t2),
                                        pred_col="p", gold_col="g"))
    got2 = {c: out2.column(c)[0].as_py() for c in out2.column_names}
    exp2 = _naive_agreement(pred, gold)
    assert got2 == exp2
    assert got2["ari_e6"] < 0


@pytest.mark.usefixtures("ray_session")
def test_dup_ratio_known_answer():
    from rel_ray.stages.dedup import dup_ratio

    docs = pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 5], type=pa.int64()),
        "text": pa.array([
            "the quick brown fox jumps high",   # both grams duplicated
            "see the quick brown fox jumps",    # 1 of 2 duplicated
            "the quick brown fox jumps high",   # exact dup of d1
            "totally unrelated little text here",  # unique gram
            "   ",                              # no tokens -> no row
        ])})
    out = _collect(dup_ratio(rd.from_arrow(docs), id_col="doc_id",
                             text_col="text", n=5, min_docs=2))
    got = dict(zip(out.column("doc_id").to_pylist(),
                   out.column("dup_e6").to_pylist()))
    assert got == {1: 10**6, 2: 500_000, 3: 10**6, 4: 0}


@pytest.mark.usefixtures("ray_session")
def test_heavy_hitters_exact_matches_naive():
    from rel_ray.stages.sketches import heavy_hitters_exact
    rng = np.random.default_rng(11)
    vocab = [f"tok{i:03d}" for i in range(200)]
    # zipf-ish: token 0 very frequent, long tail
    weights = 1.0 / (np.arange(1, 201) ** 1.3)
    weights /= weights.sum()
    words = rng.choice(vocab, size=20_000, p=weights)
    docs = [" ".join(words[i:i + 40]) for i in range(0, len(words), 40)]
    ds = rd.from_arrow(pa.table({"text": pa.array(docs)}))
    k = 32
    out = heavy_hitters_exact(ds, text_col="text", k=k,
                              token_pattern="[a-z0-9]+")
    # naive reference
    from collections import Counter
    import re
    c = Counter()
    for d in docs:
        c.update(re.findall("[a-z0-9]+", d))
    n = sum(c.values())
    want = sorted(((t, m) for t, m in c.items() if m * k > n),
                  key=lambda x: (-x[1], x[0]))
    got = list(zip(out.column("token").to_pylist(),
                   out.column("cnt").to_pylist()))
    assert got == want
    assert len(want) >= 3  # the fixture actually exercises the filter


@pytest.mark.usefixtures("ray_session")
def test_drop_high_dup_ratio_keeps_tokenless_and_drops_boilerplate():
    from rel_ray.stages.dedup import drop_high_dup_ratio
    boiler = "subscribe to our newsletter for daily updates and offers"
    texts = [
        boiler,                                            # 0: pure boilerplate
        boiler + " extra words here",                      # 1: mostly boilerplate
        "a genuinely unique document about arrow compute kernels and rays",
        "another unique document concerning entity resolution at scale",
        "",                                                # 4: token-less -> kept
    ]
    t = pa.table({"doc_id": pa.array(range(len(texts)), type=pa.int64()),
                  "text": pa.array(texts)})
    out = _collect(drop_high_dup_ratio(
        rd.from_arrow(t), id_col="doc_id", text_col="text", n=5,
        min_docs=2, max_dup_e6=500_000))
    kept = sorted(out.column("doc_id").to_pylist())
    # doc 0's single 5-gram window set is fully shared with doc 1 -> both
    # docs' shared grams are duplicated; doc 0 is 100% dup, doc 1 partially
    assert 0 not in kept
    assert 2 in kept and 3 in kept and 4 in kept
    # schema preserved
    assert out.column_names == ["doc_id", "text"]


@pytest.mark.usefixtures("ray_session")
def test_semantic_dedup_recovers_planted_duplicates():
    from rel_ray.stages.similarity import semantic_dedup
    rng = np.random.default_rng(5)
    dim = 16
    base = rng.normal(size=(40, dim))
    vecs = [v for v in base]
    ids = [f"v{i:03d}" for i in range(len(base))]
    # plant near-duplicates of the first 6 vectors (tiny perturbation)
    for i in range(6):
        vecs.append(base[i] + rng.normal(scale=1e-4, size=dim))
        ids.append(f"dup{i:03d}")
    mat = np.asarray(vecs)
    t = pa.table({
        "vec_id": pa.array(ids),
        "embedding": pa.FixedSizeListArray.from_arrays(
            pa.array(mat.reshape(-1)), dim),
    })
    out = _collect(semantic_dedup(
        rd.from_arrow(t), threshold=0.999, n_clusters=4, iters=4,
        id_col="vec_id", vec_col="embedding"))
    cl = dict(zip(out.column("record_id").to_pylist(),
                  out.column("cluster_id").to_pylist()))
    assert len(cl) == len(ids)  # every record assigned (singletons included)
    for i in range(6):
        # planted dup lands in the SAME cluster as its source (same kmeans
        # cell by construction: cosine ~1 -> same argmax centroid)
        assert cl[f"dup{i:03d}"] == cl[f"v{i:03d}"]
    # non-duplicated records are singletons: cluster sizes are 2 for planted
    # pairs, 1 elsewhere
    from collections import Counter
    sizes = Counter(cl.values())
    assert sorted(sizes.values(), reverse=True)[:6] == [2] * 6
    assert max(sizes.values()) == 2


@pytest.mark.usefixtures("ray_session")
def test_fellegi_sunter_em_recovers_planted_mixture():
    from rel_ray.pipelines.eval import fellegi_sunter_em
    rng = np.random.default_rng(7)
    n = 60_000
    lam = 0.22
    L = 3
    reps = np.array([0.2, 0.7, 0.95])  # representative value per level
    m_planted = np.array([[0.05, 0.15, 0.80],
                          [0.10, 0.20, 0.70],
                          [0.15, 0.25, 0.60]])
    u_planted = np.array([[0.70, 0.20, 0.10],
                          [0.60, 0.30, 0.10],
                          [0.55, 0.35, 0.10]])
    z = rng.random(n) < lam
    cols = {}
    for f in range(3):
        lvl_m = rng.choice(L, size=n, p=m_planted[f])
        lvl_u = rng.choice(L, size=n, p=u_planted[f])
        cols[f"f{f}"] = reps[np.where(z, lvl_m, lvl_u)]
    ds = rd.from_arrow(pa.table({k: pa.array(v) for k, v in cols.items()}))
    out = fellegi_sunter_em(ds, feature_cols=("f0", "f1", "f2"),
                            cuts=(0.5, 0.88))
    lam_hat = out.column("lambda_match")[0].as_py()
    assert abs(lam_hat - lam) < 0.05
    m_hat = np.asarray(out.column("m_prob")).reshape(3, L)
    u_hat = np.asarray(out.column("u_prob")).reshape(3, L)
    assert np.abs(m_hat - m_planted).max() < 0.08
    assert np.abs(u_hat - u_planted).max() < 0.08
    # match weights are monotone in agreement level for every feature
    w = np.asarray(out.column("weight_log2")).reshape(3, L)
    assert (np.diff(w, axis=1) > 0).all()


def test_fellegi_sunter_em_rejects_unidentifiable():
    from rel_ray.pipelines.eval import fellegi_sunter_em
    with pytest.raises(ValueError, match="identifiable"):
        fellegi_sunter_em(None, feature_cols=("a", "b"), cuts=(0.5, 0.88))


@pytest.mark.usefixtures("ray_session")
def test_fs_review_pairs_band_and_determinism():
    from rel_ray.pipelines.eval import fs_review_pairs
    rng = np.random.default_rng(3)
    n = 30_000
    lam, L = 0.3, 5
    reps = np.array([0.15, 0.4, 0.6, 0.8, 0.95])
    # feature 2 is DELIBERATELY weak (near-identical m/u) so many patterns
    # land at ambiguous posteriors
    m_p = np.array([[0.02, 0.08, 0.2, 0.3, 0.4],
                    [0.05, 0.15, 0.2, 0.3, 0.3],
                    [0.2, 0.2, 0.2, 0.2, 0.2]])
    u_p = np.array([[0.4, 0.3, 0.2, 0.08, 0.02],
                    [0.3, 0.3, 0.2, 0.15, 0.05],
                    [0.2, 0.2, 0.2, 0.2, 0.2]])
    z = rng.random(n) < lam
    cols = {}
    for f in range(3):
        lm = rng.choice(L, size=n, p=m_p[f])
        lu = rng.choice(L, size=n, p=u_p[f])
        cols[f"f{f}"] = reps[np.where(z, lm, lu)]
    ids = np.arange(n)
    t = pa.table({"id_a": pa.array([f"a{i:06d}" for i in ids]),
                  "id_b": pa.array([f"b{i:06d}" for i in ids]),
                  **{k: pa.array(v) for k, v in cols.items()}})
    ds = rd.from_arrow(t)
    out = fs_review_pairs(ds, feature_cols=("f0", "f1", "f2"),
                          cuts=(0.3, 0.5, 0.7, 0.9), band=(0.2, 0.8), k=50)
    assert 0 < out.num_rows <= 50
    pe6 = np.asarray(out.column("posterior_e6"))
    assert (pe6 >= 200_000).all() and (pe6 <= 800_000).all()
    # deterministic: identical call -> identical table
    out2 = fs_review_pairs(ds, feature_cols=("f0", "f1", "f2"),
                           cuts=(0.3, 0.5, 0.7, 0.9), band=(0.2, 0.8), k=50)
    assert out.equals(out2)


@pytest.mark.usefixtures("ray_session")
def test_shuffle_shard_assign_matches_naive():
    from rel_ray.stages.sampling import _KNUTH, _MOD, shuffle_shard_assign

    ids = np.arange(500, dtype=np.int64) * 3 - 200   # includes negatives
    t = pa.table({"doc_id": pa.array(ids),
                  "src": pa.array(["s%d" % (i % 4) for i in range(500)])})
    out = _collect(shuffle_shard_assign(
        rd.from_arrow(t).repartition(6), id_col="doc_id",
        rows_per_shard=64, carry_cols=["src"], num_buckets=16))
    # naive: rank in (knuth_hash, id) order
    h = (ids % _MOD) * _KNUTH % _MOD
    order = np.lexsort((ids, h))
    rank = np.empty(len(ids), dtype=np.int64)
    rank[order] = np.arange(len(ids))
    got = {r["doc_id"]: (r["shard"], r["pos"]) for r in out.to_pylist()}
    assert len(got) == 500
    for i, d in enumerate(ids):
        assert got[d] == (rank[i] // 64, rank[i] % 64), d
    # every shard except the last is exactly full
    from collections import Counter
    per_shard = Counter(s for s, _ in got.values())
    last = max(per_shard)
    assert all(per_shard[s] == 64 for s in per_shard if s != last)
    srcs = {r["doc_id"]: r["src"] for r in out.to_pylist()}
    assert srcs[ids[0]] == "s0"


@pytest.mark.usefixtures("ray_session")
def test_bottomk_vector_sample_unbiased_on_sorted_corpus():
    """The codebook/centroid training sample must not be the corpus head:
    on a value-sorted corpus whose first `sample_size` rows all lie in
    cluster A, a head sample never sees cluster B and spherical k-means
    leaves B uncovered; the Knuth-hash bottom-k sample sees both.
    Also pins determinism (same matrix twice)."""
    from rel_ray.stages.sampling import bottomk_vector_sample
    from rel_ray.stages.similarity import _l2_normalize, _spherical_kmeans

    rng = np.random.default_rng(11)
    n, size = 1200, 256
    # sorted corpus: ids 0..599 cluster A around +e0, 600.. cluster B
    # around +e1 — the head `size` rows are ALL cluster A
    a = rng.normal([8, 0, 0, 0], 0.05, size=(600, 4))
    b = rng.normal([0, 8, 0, 0], 0.05, size=(600, 4))
    X = np.concatenate([a, b])
    ds = rd.from_arrow(pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.array(list(X))})).repartition(4)

    S1 = bottomk_vector_sample(ds, id_col="vec_id", vec_col="embedding",
                               k=size)
    S2 = bottomk_vector_sample(ds, id_col="vec_id", vec_col="embedding",
                               k=size)
    assert S1.shape == (size, 4) and np.array_equal(S1, S2)

    head = X[:size]
    mean_b = _l2_normalize(np.array([[0.0, 8.0, 0.0, 0.0]]))[0]

    def covers_b(sample):
        C = _spherical_kmeans(sample, 4, seed=42)
        return float(np.max(C @ mean_b)) > 0.9

    assert not covers_b(head)   # head sample demonstrably skews
    assert covers_b(S1)         # hash sample sees both clusters


@pytest.mark.usefixtures("ray_session")
def test_knn_graph_exact_matches_naive():
    from rel_ray.stages.similarity import knn_graph_exact

    rng = np.random.default_rng(5)
    n, d, k = 40, 16, 5
    vecs = rng.normal(size=(n, d)) * 0.3
    ids = np.arange(n, dtype=np.int64) * 3 + 1
    t = pa.table({"vec_id": pa.array(ids),
                  "embedding": pa.array(list(vecs),
                                        type=pa.list_(pa.float32()))})
    out = _collect(knn_graph_exact(rd.from_arrow(t).repartition(4), k=k,
                                   scale=100, batch_size=16))
    # naive over the SAME float32-rounded inputs
    v64 = np.asarray(vecs, dtype=np.float32).astype(np.float64)
    q = np.floor(v64 * 100.0 + 0.5)
    dot = q @ q.T
    norms = np.einsum("ij,ij->i", q, q)
    cos = dot / np.sqrt(norms[:, None] * norms[None, :])
    np.fill_diagonal(cos, -np.inf)
    got = {}
    for r in out.to_pylist():
        got.setdefault(r["vec_id"], []).append(
            (r["rank"], r["neighbor_id"], r["dot_q"]))
    assert len(got) == n
    for i in range(n):
        order = np.lexsort((ids, -cos[i]))[:k]
        exp = [(rk + 1, int(ids[j]), int(dot[i, j]))
               for rk, j in enumerate(order)]
        assert sorted(got[ids[i]]) == exp, ids[i]


@pytest.mark.usefixtures("ray_session")
def test_knn_graph_exact_fewer_rows_than_k():
    from rel_ray.stages.similarity import knn_graph_exact

    t = pa.table({"vec_id": pa.array([1, 2, 3], type=pa.int64()),
                  "embedding": pa.array([[0.1, 0.2], [0.2, 0.1], [0.1, 0.1]],
                                        type=pa.list_(pa.float32()))})
    out = _collect(knn_graph_exact(rd.from_arrow(t), k=5))
    # each row gets exactly n-1 = 2 neighbors, ranks 1..2, never itself
    per = {}
    for r in out.to_pylist():
        assert r["neighbor_id"] != r["vec_id"]
        per.setdefault(r["vec_id"], []).append(r["rank"])
    assert {k_: sorted(v) for k_, v in per.items()} == {
        1: [1, 2], 2: [1, 2], 3: [1, 2]}


@pytest.mark.usefixtures("ray_session")
def test_knn_graph_ivf_recall_vs_exact():
    from rel_ray.stages.similarity import knn_graph_ivf

    rng = np.random.default_rng(7)
    n, d, k = 240, 16, 5
    centers = rng.normal(size=(8, d))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    pts = centers[rng.integers(0, 8, n)] + 0.08 * rng.normal(size=(n, d))
    pts *= 0.25
    ids = np.arange(n, dtype=np.int64)
    t = pa.table({"vec_id": pa.array(ids),
                  "embedding": pa.array(list(pts),
                                        type=pa.list_(pa.float32()))})
    ds = rd.from_arrow(t).repartition(4)
    approx = _collect(knn_graph_ivf(ds, k=k, n_cells=8, nprobe=3,
                                    sample_size=n, num_buckets=8))
    # reference: exact FLOAT-cosine top-k (the metric the IVF path ranks
    # by; knn_graph_exact ranks by QUANTIZED cosine for its SQL twin, which
    # reorders dense near-ties and would understate cell recall)
    m = np.asarray(pts, dtype=np.float32).astype(np.float64)
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    fcos = m @ m.T
    np.fill_diagonal(fcos, -np.inf)
    ex = {int(ids[i]): {int(ids[j])
                        for j in np.argsort(-fcos[i], kind="stable")[:k]}
          for i in range(n)}
    ap = {}
    for r in approx.to_pylist():
        ap.setdefault(r["vec_id"], set()).add(r["neighbor_id"])
        assert r["neighbor_id"] != r["vec_id"]
    hits = sum(len(ex[i] & ap.get(i, set())) for i in ex)
    recall = hits / sum(len(s) for s in ex.values())
    assert recall >= 0.9, recall
    # ranks are 1..k and cosines non-increasing per row
    byrow = {}
    for r in approx.to_pylist():
        byrow.setdefault(r["vec_id"], []).append((r["rank"], r["cosine"]))
    for rows in byrow.values():
        rows.sort()
        assert [rk for rk, _ in rows] == list(range(1, len(rows) + 1))
        cs = [c for _, c in rows]
        assert all(cs[i] >= cs[i + 1] for i in range(len(cs) - 1))


def test_containment_self_join_vs_bruteforce():
    """Prefix-filtered containment join == brute-force ordered-pair
    containment (quote-in-page asymmetry, exact dups both directions,
    short docs excluded)."""
    from rel_ray.functions.shingles import unique_shingle_sets, word_ngram_codes
    from rel_ray.stages.simjoin import containment_self_join

    rng = np.random.default_rng(13)
    vocab = ["alpha", "bravo", "china", "delta", "eagle", "frank", "gamma",
             "hotel", "igloo", "jolly", "kilos", "lemur"]
    texts = []
    for _ in range(6):
        page = " ".join(rng.choice(vocab, size=20))
        texts.append(page)
        quote = " ".join(page.split()[4:10])   # 6-word excerpt -> contained
        texts.append(quote)
    texts += [texts[0],          # exact dup: contained both directions
              "one two", ""]     # <3 tokens: excluded
    ids = list(range(len(texts)))
    ds = rd.from_arrow(pa.table({"doc_id": pa.array(ids, type=pa.int64()),
                                 "text": pa.array(texts)})).repartition(3)
    out = containment_self_join(ds, id_col="doc_id", text_col="text",
                                tau_num=3, tau_den=4, num_buckets=8)
    got = {(r["id_a"], r["id_b"]): (r["inter"], r["uni"])
           for r in out.take_all()}

    codes, splits = word_ngram_codes(pa.array(texts), 3)
    uniq = unique_shingle_sets(codes, splits)
    sets = [np.asarray(uniq.values, dtype=np.uint64)[
        uniq.offsets[i].as_py():uniq.offsets[i + 1].as_py()] for i in ids]
    nwords = [len(t.split()) for t in texts]
    want = {}
    for i in ids:
        for k in ids:
            if i == k or nwords[i] < 3 or nwords[k] < 3 or len(sets[i]) == 0:
                continue
            inter = len(np.intersect1d(sets[i], sets[k], assume_unique=True))
            if 4 * inter >= 3 * len(sets[i]):
                want[(i, k)] = (inter, len(sets[i]))
    assert got == want
    # the asymmetry is real: every quote->page direction present, no
    # page->quote direction (pages are 20 words, quotes 6)
    quote_to_page = [(q, p) for (q, p) in want if nwords[q] < nwords[p]]
    page_to_quote = [(p, q) for (p, q) in want
                     if nwords[p] > nwords[q] and (q, p) in quote_to_page]
    assert len(quote_to_page) >= 6 and len(page_to_quote) == 0


def test_containment_join_hot_code_cap_and_empty():
    from rel_ray.stages.simjoin import containment_self_join

    # every doc shares the stopword trigram "the big cat"; tiny tails differ
    texts = ["the big cat %d alpha beta" % i for i in range(6)]
    t = pa.table({"doc_id": pa.array(range(6), type=pa.int64()),
                  "text": pa.array(texts)})
    ds = rd.from_arrow(t)
    full = containment_self_join(ds, id_col="doc_id", text_col="text",
                                 tau_num=1, tau_den=4, num_buckets=4)
    n_full = full.count()
    assert n_full > 0
    # cap of 1 pair per code drops the oversized shared-trigram segments;
    # result is a SUBSET (never wrong pairs, only logged misses)
    capped = containment_self_join(ds, id_col="doc_id", text_col="text",
                                   tau_num=1, tau_den=4, num_buckets=4,
                                   max_pairs_per_code=1)
    got_full = {(r["id_a"], r["id_b"]) for r in full.take_all()}
    got_capped = {(r["id_a"], r["id_b"]) for r in capped.take_all()}
    assert got_capped <= got_full and len(got_capped) < n_full

    empty = pa.table({"doc_id": pa.array([], type=pa.int64()),
                      "text": pa.array([], type=pa.string())})
    out0 = containment_self_join(rd.from_arrow(empty), id_col="doc_id",
                                 text_col="text", tau_num=1, tau_den=2)
    assert out0.count() == 0


@pytest.mark.usefixtures("ray_session")
def test_pq_encode_reconstruction_and_determinism():
    from rel_ray.stages.pq import pq_encode, pq_reconstruct, pq_train

    rng = np.random.default_rng(31)
    n, d = 400, 32
    centers = rng.normal(size=(10, d))
    X = centers[rng.integers(0, 10, n)] + 0.05 * rng.normal(size=(n, d))
    t = pa.table({"vec_id": pa.array(np.arange(n, dtype=np.int64)),
                  "embedding": pa.array(list(X.astype(np.float32)),
                                        type=pa.list_(pa.float32()))})
    ds = rd.from_arrow(t).repartition(4)
    books = pq_train(ds, m=8, n_codes=64, sample_size=n, seed=3)
    assert books.shape == (8, 64, 4)
    enc1 = _collect(pq_encode(ds, books, batch_size=64)).sort_by(
        [("vec_id", "ascending")])
    enc2 = _collect(pq_encode(ds, books, batch_size=128)).sort_by(
        [("vec_id", "ascending")])
    assert enc1.equals(enc2)  # deterministic, batch-size-invariant
    codes = np.asarray(enc1.column("code").combine_chunks().values,
                       dtype=np.uint8).reshape(n, 8)
    X32 = X.astype(np.float32).astype(np.float64)
    recon = pq_reconstruct(codes, books)
    mse = ((recon - X32) ** 2).mean()
    var = X32.var()
    assert mse < 0.05 * var, (mse, var)  # 8B codes capture the structure
    # shuffled-codebook control: same codes, wrong books -> much worse
    perm = books[:, ::-1, :]
    bad = ((pq_reconstruct(codes, perm) - X32) ** 2).mean()
    assert bad > 10 * mse


@pytest.mark.usefixtures("ray_session")
def test_pq_ann_topk_recall_vs_exact_l2():
    from rel_ray.stages.pq import pq_ann_topk, pq_encode, pq_train

    rng = np.random.default_rng(33)
    n, d, k = 300, 32, 10
    centers = rng.normal(size=(12, d))
    X = centers[rng.integers(0, 12, n)] + 0.05 * rng.normal(size=(n, d))
    ids = np.arange(n, dtype=np.int64)
    t = pa.table({"vec_id": pa.array(ids),
                  "embedding": pa.array(list(X.astype(np.float32)),
                                        type=pa.list_(pa.float32()))})
    ds = rd.from_arrow(t).repartition(4)
    books = pq_train(ds, m=8, n_codes=64, sample_size=n, seed=3)
    enc = pq_encode(ds, books)
    q_idx = [0, 7, 42]
    queries = {"ids": ids[q_idx],
               "vecs": X.astype(np.float32).astype(np.float64)[q_idx]}
    # PQ's contract is a SHORTLIST: the exact top-k must sit inside the
    # ADC top-3k (the re-rank candidate set) — within a tight cluster the
    # ADC top-k itself reorders near-equidistant neighbors by design
    out = _collect(pq_ann_topk(enc, queries, books, k=3 * k))
    got = {}
    for r in out.to_pylist():
        got.setdefault(r["query_id"], set()).add(r["vec_id"])
    X64 = X.astype(np.float32).astype(np.float64)
    hits = tot = 0
    for qi in q_idx:
        dist = ((X64 - X64[qi]) ** 2).sum(axis=1)
        exact = set(ids[np.argsort(dist, kind="stable")[:k]].tolist())
        hits += len(exact & got[int(ids[qi])])
        tot += k
    assert hits / tot >= 0.9, hits / tot
    # ranks well-formed
    per = {}
    for r in out.to_pylist():
        per.setdefault(r["query_id"], []).append(r["rank"])
    assert all(sorted(v) == list(range(1, 3 * k + 1)) for v in per.values())


@pytest.mark.usefixtures("ray_session")
def test_round4_ops_empty_inputs():
    """Every round-4 operator returns an empty result (not an error) on an
    empty input dataset."""
    from rel_ray.stages.pq import pq_encode
    from rel_ray.stages.sampling import shuffle_shard_assign
    from rel_ray.stages.similarity import (cosine_pairs_exact,
                                           knn_graph_exact)

    evecs = pa.table({"vec_id": pa.array([], type=pa.int64()),
                      "embedding": pa.array([], type=pa.list_(pa.float32()))})
    eds = rd.from_arrow(evecs)
    assert knn_graph_exact(eds, k=3).count() == 0
    assert cosine_pairs_exact(eds).count() == 0
    from rel_ray.stages.pq import pq_train
    from rel_ray.stages.similarity import knn_graph_ivf
    assert knn_graph_ivf(eds, k=3).count() == 0
    with pytest.raises(ValueError, match="empty"):
        pq_train(eds)
    books = np.zeros((4, 8, 2))
    assert pq_encode(eds, books).count() == 0

    edocs = pa.table({"doc_id": pa.array([], type=pa.int64()),
                      "src": pa.array([], type=pa.string())})
    out = shuffle_shard_assign(rd.from_arrow(edocs), id_col="doc_id",
                               rows_per_shard=8, carry_cols=["src"],
                               num_buckets=4)
    assert out.count() == 0


@pytest.mark.usefixtures("ray_session")
def test_ivfpq_ann_shortlist_recall():
    from rel_ray.stages.pq import ivfpq_ann_topk, ivfpq_build

    rng = np.random.default_rng(41)
    n, d, k = 300, 32, 10
    centers = rng.normal(size=(10, d))
    X = centers[rng.integers(0, 10, n)] + 0.05 * rng.normal(size=(n, d))
    ids = np.arange(n, dtype=np.int64)
    t = pa.table({"vec_id": pa.array(ids),
                  "embedding": pa.array(list(X.astype(np.float32)),
                                        type=pa.list_(pa.float32()))})
    ds = rd.from_arrow(t).repartition(4)
    enc, index = ivfpq_build(ds, n_cells=10, m=8, n_codes=64,
                             sample_size=n, seed=3)
    # encoded table is 9 bytes/row of payload: cell int64 + 8 uint8 codes
    et = _collect(enc)
    assert et.num_rows == n
    assert set(et.column_names) == {"vec_id", "cell", "code"}
    q_idx = [0, 11, 99]
    X64 = X.astype(np.float32).astype(np.float64)
    queries = {"ids": ids[q_idx], "vecs": X64[q_idx]}
    out = _collect(ivfpq_ann_topk(enc, queries, index, k=3 * k, nprobe=3))
    got = {}
    for r in out.to_pylist():
        got.setdefault(r["query_id"], set()).add(r["vec_id"])
    hits = tot = 0
    for qi in q_idx:
        dist = ((X64 - X64[qi]) ** 2).sum(axis=1)
        exact = set(ids[np.argsort(dist, kind="stable")[:k]].tolist())
        hits += len(exact & got[int(ids[qi])])
        tot += k
    assert hits / tot >= 0.9, hits / tot
    # cell pruning is real: every returned row sits in a probed cell
    cells = {r["vec_id"]: r["cell"] for r in et.to_pylist()}
    C = index["C"]
    for pos, qi in enumerate(q_idx):
        dc = ((C - X64[qi]) ** 2).sum(axis=1)
        probed = set(np.argsort(dc, kind="stable")[:3].tolist())
        assert {cells[v] for v in got[int(ids[qi])]} <= probed


@pytest.mark.usefixtures("ray_session")
def test_grouped_collect_set_matches_naive():
    from rel_ray.stages.temporal import grouped_collect_set

    rng = np.random.default_rng(17)
    g = rng.integers(0, 12, 400)
    vocab = ["b", "a", "cc", "d", None, "a"]
    v = [vocab[i] for i in rng.integers(0, len(vocab), 400)]
    t = pa.table({"g": pa.array(g, type=pa.int64()),
                  "v": pa.array(v, type=pa.string())})
    out = _collect(grouped_collect_set(rd.from_arrow(t).repartition(5),
                                       key="g", val="v", num_buckets=8,
                                       out_col="s"))
    got = dict(zip(out.column("g").to_pylist(), out.column("s").to_pylist()))
    want = {}
    for gi, vi in zip(g, v):
        if vi is not None:
            want.setdefault(int(gi), set()).add(vi)
    assert got == {k: "|".join(sorted(s)) for k, s in want.items()}


class TestForwardFill:
    def test_locf_with_segment_barrier(self, ray_session):
        from rel_ray.stages.temporal import forward_fill
        # user 1: null, 5, null, null, 7, null -> null,5,5,5,7,7
        # user 2: null, null -> null, null (must NOT leak user 1's 7)
        t = pa.table({
            "k": pa.array([1, 1, 1, 1, 1, 1, 2, 2], type=pa.int64()),
            "o": pa.array([0, 1, 2, 3, 4, 5, 0, 1], type=pa.int64()),
            "v": pa.array([None, 5, None, None, 7, None, None, None],
                          type=pa.int64())})
        out = _collect(forward_fill(rd.from_arrow(t), key="k",
                                    order_cols=["o"], val="v",
                                    num_buckets=1)).to_pandas() \
            .sort_values(["k", "o"])
        got = [None if pa.compute.is_null(pa.scalar(x)).as_py() or x != x
               else int(x) for x in out["filled"]]
        assert got == [None, 5, 5, 5, 7, 7, None, None]

    def test_no_nulls_identity(self, ray_session):
        from rel_ray.stages.temporal import forward_fill
        t = pa.table({"k": pa.array([1, 1], type=pa.int64()),
                      "o": pa.array([0, 1], type=pa.int64()),
                      "v": pa.array([3, 4], type=pa.int64())})
        out = _collect(forward_fill(rd.from_arrow(t), key="k",
                                    order_cols=["o"], val="v",
                                    num_buckets=2)).to_pandas() \
            .sort_values("o")
        assert out["filled"].tolist() == [3, 4]


class TestCumulativeDistinct:
    def test_per_key_novelty_curve(self, ray_session):
        from rel_ray.stages.temporal import cumulative_distinct
        t = pa.table({
            "k": pa.array([1, 1, 1, 1, 2, 2], type=pa.int64()),
            "o": pa.array([0, 1, 2, 3, 0, 1], type=pa.int64()),
            "v": pa.array(["a", "b", "a", "c", "a", "a"])})
        out = _collect(cumulative_distinct(
            rd.from_arrow(t), key="k", order_cols=["o"], val="v",
            num_buckets=1)).to_pandas().sort_values(["k", "o"])
        assert out["distinct_so_far"].tolist() == [1, 2, 2, 3, 1, 1]

    def test_same_value_across_keys_independent(self, ray_session):
        from rel_ray.stages.temporal import cumulative_distinct
        # value "x" first seen by k=1 must still count as new for k=2
        t = pa.table({
            "k": pa.array([1, 2], type=pa.int64()),
            "o": pa.array([0, 0], type=pa.int64()),
            "v": pa.array(["x", "x"])})
        out = _collect(cumulative_distinct(
            rd.from_arrow(t), key="k", order_cols=["o"], val="v",
            num_buckets=1)).to_pandas()
        assert out["distinct_so_far"].tolist() == [1, 1]


class TestLongestStreak:
    def test_islands_and_gaps(self, ray_session):
        from rel_ray.stages.temporal import longest_streak
        day = 86_400_000_000
        # u1: days 0,1,2, 5,6, 9 -> max 3, active 6 (dup on day 1)
        # u2: days 3 -> max 1, active 1
        ts = [0, day, day + 1, 2 * day, 5 * day, 6 * day, 9 * day,
              3 * day]
        ks = [1, 1, 1, 1, 1, 1, 1, 2]
        t = pa.table({"k": pa.array(ks, type=pa.int64()),
                      "ts": pa.array(ts, type=pa.timestamp("us"))})
        out = _collect(longest_streak(rd.from_arrow(t), key="k", ts="ts",
                                      num_buckets=1)).to_pandas() \
            .sort_values("k")
        assert out["max_streak"].tolist() == [3, 1]
        assert out["active_periods"].tolist() == [6, 1]


class TestScd2:
    def test_change_log_to_intervals(self, ray_session):
        from rel_ray.stages.temporal import scd2_intervals
        t = pa.table({
            "k": pa.array([1, 1, 1, 1, 2], type=pa.int64()),
            "ts": pa.array([10, 20, 30, 40, 5], type=pa.timestamp("us")),
            "tie": pa.array([0, 1, 2, 3, 0], type=pa.int64()),
            "v": pa.array(["a", "a", "b", "a", "z"])})
        out = _collect(scd2_intervals(
            rd.from_arrow(t), key="k", ts="ts", tie="tie", val="v",
            num_buckets=1)).to_pandas().sort_values(
            ["k", "valid_from"]).reset_index(drop=True)
        assert out["v"].tolist() == ["a", "b", "a", "z"]
        assert [x.value // 1000 if x == x else None
                for x in out["valid_from"]] == [10, 30, 40, 5]
        vt = [None if x != x else x.value // 1000
              for x in out["valid_to"]]
        assert vt == [30, 40, None, None]


class TestPca:
    def test_recovers_planted_axes(self, ray_session):
        from rel_ray.stages.similarity import pca_fit_transform
        rng = np.random.RandomState(13)
        n, d = 600, 8
        # variance concentrated on two planted orthogonal directions
        base = np.zeros((n, d))
        base[:, 0] = rng.randn(n) * 10
        base[:, 3] = rng.randn(n) * 5
        noise = rng.randn(n, d) * 0.01
        m = (base + noise).astype(np.float32)
        t = pa.table({
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.array(list(m), type=pa.list_(pa.float32()))})
        comps, out = pca_fit_transform(rd.from_arrow(t), n_components=2)
        ev = comps.column("explained_var_e9").to_pylist()
        # two planted axes carry essentially all variance
        assert ev[0] > 7 * 10**8 and ev[0] + ev[1] > 99 * 10**7
        proj = _collect(out).to_pandas()
        assert len(proj) == n and len(proj["proj"].iloc[0]) == 2
        # projection variance matches the planted scales (10 and 5)
        p = np.stack(proj.sort_values("vec_id")["proj"].to_numpy())
        assert 8 < p[:, 0].std() < 12
        assert 4 < p[:, 1].std() < 6

    def test_deterministic(self, ray_session):
        from rel_ray.stages.similarity import pca_fit_transform
        rng = np.random.RandomState(3)
        m = rng.randn(100, 6).astype(np.float32)
        t = pa.table({
            "vec_id": pa.array(np.arange(100, dtype=np.int64)),
            "embedding": pa.array(list(m), type=pa.list_(pa.float32()))})
        c1, o1 = pca_fit_transform(rd.from_arrow(t), n_components=3)
        c2, o2 = pca_fit_transform(rd.from_arrow(t), n_components=3)
        assert c1.equals(c2)
        p1 = np.stack(_collect(o1).to_pandas().sort_values("vec_id")
                      ["proj"].to_numpy())
        p2 = np.stack(_collect(o2).to_pandas().sort_values("vec_id")
                      ["proj"].to_numpy())
        assert np.array_equal(p1, p2)


class TestTimeWeightedAvg:
    def test_holds_until_next(self, ray_session):
        from rel_ray.stages.temporal import time_weighted_avg
        # k=1: v=10 for 3us, v=40 for 1us -> (30+40)/4 = 17.5 -> 17.5e6
        t = pa.table({
            "k": pa.array([1, 1, 1, 2], type=pa.int64()),
            "ts": pa.array([0, 3, 4, 9], type=pa.timestamp("us")),
            "tie": pa.array([0, 1, 2, 0], type=pa.int64()),
            "v": pa.array([10, 40, 99, 7], type=pa.int64())})
        out = _collect(time_weighted_avg(
            rd.from_arrow(t), key="k", ts="ts", tie="tie", val="v",
            num_buckets=1)).to_pandas()
        # single-event key 2 dropped (zero span)
        assert out["k"].tolist() == [1]
        assert out["twa_e6"].tolist() == [70 * 10**6 // 4]

    def test_negative_values_truncate_toward_zero(self, ray_session):
        """DuckDB's // truncates toward zero (-7//2 = -3); numpy floors.
        Negative weighted sums must follow the documented (DuckDB)
        semantics."""
        from rel_ray.stages.temporal import time_weighted_avg
        # k=1: v=-10 for 3us, v=3 for 4us -> (-30+12)/7 = -2.571... ->
        # trunc(-18e6/7) = -2571428 (floor would give -2571429)
        t = pa.table({
            "k": pa.array([1, 1, 1], type=pa.int64()),
            "ts": pa.array([0, 3, 7], type=pa.timestamp("us")),
            "tie": pa.array([0, 1, 2], type=pa.int64()),
            "v": pa.array([-10, 3, 0], type=pa.int64())})
        out = _collect(time_weighted_avg(
            rd.from_arrow(t), key="k", ts="ts", tie="tie", val="v",
            num_buckets=1)).to_pandas()
        assert out["twa_e6"].tolist() == [-2571428]


class TestJpegCodec:
    def test_solid_roundtrip_exact(self, ray_session):
        from rel_ray.stages.jpeg import decode_jpeg, encode_jpeg
        img = np.full((16, 24, 3), [200, 64, 30], dtype=np.uint8)
        dec = decode_jpeg(encode_jpeg(img, quality=90))
        # solid colour = DC-only blocks; the quantized DC round-trips
        assert np.array_equal(dec, img)

    def test_gradient_psnr_and_grey(self, ray_session):
        from rel_ray.stages.jpeg import decode_jpeg, encode_jpeg
        x = np.linspace(0, 255, 64)
        g0, g1 = np.meshgrid(x, x)
        img = np.stack([g0, g1, (g0 + g1) / 2], axis=-1).astype(np.uint8)
        dec = decode_jpeg(encode_jpeg(img, quality=90))
        err = dec.astype(float) - img.astype(float)
        psnr = 10 * np.log10(255**2 / np.mean(err**2))
        assert psnr > 40, psnr
        grey = g0.astype(np.uint8)
        dg = decode_jpeg(encode_jpeg(grey, quality=90))
        assert dg.shape == (64, 64, 3)
        gerr = dg[..., 0].astype(float) - grey.astype(float)
        assert 10 * np.log10(255**2 / np.mean(gerr**2)) > 40

    def test_nonmultiple_of_8_and_noise(self, ray_session):
        from rel_ray.stages.jpeg import decode_jpeg, encode_jpeg
        rng = np.random.default_rng(0)
        img = rng.integers(0, 256, (23, 31, 3), dtype=np.uint8)
        dec = decode_jpeg(encode_jpeg(img, quality=95))
        assert dec.shape == img.shape
        err = dec.astype(float) - img.astype(float)
        assert 10 * np.log10(255**2 / np.mean(err**2)) > 30

    def test_rejects_non_baseline(self, ray_session):
        import pytest as _pt
        from rel_ray.stages.jpeg import decode_jpeg
        with _pt.raises(ValueError, match="SOI"):
            decode_jpeg(b"nope")
        with _pt.raises(ValueError, match="baseline"):
            decode_jpeg(b"\xFF\xD8\xFF\xC2\x00\x04\x00\x00")

    def test_media_decoder_dispatch(self, ray_session):
        from rel_ray.stages.jpeg import encode_jpeg
        from rel_ray.stages.multimodal import MediaDecoder
        img = np.full((8, 8, 3), 128, dtype=np.uint8)
        dec = MediaDecoder(fake=False, dim=8)
        f = dec.decode(encode_jpeg(img, quality=90), "image/jpeg", 8)
        assert f.shape == (8,)
        assert np.allclose(f, 128 / 255.0, atol=2e-2)


class TestPpmCodec:
    def test_roundtrip_and_known_pixels(self, ray_session):
        import numpy as np
        from rel_ray.stages.multimodal import decode_ppm, encode_ppm
        img = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
        assert np.array_equal(decode_ppm(encode_ppm(img)), img)
        # hand-built header with comment + known pixel bytes
        payload = (b"P6\n# a comment\n2 1\n255\n"
                   + bytes([255, 0, 0, 0, 255, 0]))
        out = decode_ppm(payload)
        assert out.shape == (1, 2, 3)
        assert out[0, 0].tolist() == [255, 0, 0]
        assert out[0, 1].tolist() == [0, 255, 0]

    def test_rejects_wrong_magic_and_maxval(self, ray_session):
        import numpy as np
        import pytest as _pt
        from rel_ray.stages.multimodal import decode_ppm
        with _pt.raises(ValueError, match="P6"):
            decode_ppm(b"P5\n1 1\n255\n\x00")
        with _pt.raises(ValueError, match="maxval"):
            decode_ppm(b"P6\n1 1\n65535\n\x00\x00\x00")

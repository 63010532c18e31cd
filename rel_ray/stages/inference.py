"""Batched model inference stages — the actor-pool pattern for model scoring.

Two deterministic, artifact-free "models" (no downloaded weights, per
north_rule) that exercise the exact plumbing a real model-scoring stage
needs on a 100 TB corpus:

* ``LinearClassifier`` — a quantized linear quality classifier over integer
  text features (the fastText/CCNet-style quality-filter shape used by
  web-scale training-data pipelines). Weights live in the object store
  (``ray.put`` once) and are fetched once per actor in ``__init__``; the
  per-batch path is pure Arrow/numpy. Integer weights × integer features
  keep the logit bit-exact so a DuckDB oracle can verify values, not just
  row counts.

* ``gru_encode`` — a batched character-GRU string encoder (REL parity
  anchor: the GRU/LSTM mention-context encoder inside REL's ED model,
  ``REL:src/REL/mulrel_ranker.py::MulRelRanker`` /
  ``REL:src/REL/vocabulary.py``). Weights are derived deterministically
  from a seed (no artifact); the recurrence is batched across the whole
  batch (one (B, d) × (d, d) matmul per time step, NOT per string) and
  padding-masked so each string's encoding is independent of what else
  shares its batch (batch-invariance is tested). Wired into the pairwise
  scorer as the optional ``cfg.emb_head = "gru"`` similarity head.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# default quality-filter weights: more stopwords and more tokens raise the
# logit, punctuation-dense text lowers it; bias tuned so short/punct-noise
# documents fall below 0. Integer-quantized (×1) — exact in int64.
DEFAULT_WEIGHTS = {"n_tokens": 1, "n_stop": 8, "n_punct": -6}
DEFAULT_BIAS = -30

_STOP_PATTERN = (r"\b(the|and|of|to|in|is|that|it|for|with)\b")


def text_features(text: pa.Array | pa.ChunkedArray) -> dict[str, np.ndarray]:
    """Integer feature vector per string: whitespace tokens, punctuation
    chars, English stopword hits. All Arrow kernels, all int64."""
    from ..functions.normalize import token_counts

    n_tokens = np.asarray(token_counts(text), dtype=np.int64)
    n_chars = np.asarray(pc.utf8_length(text), dtype=np.int64)
    stripped = pc.replace_substring_regex(text, r"[^\w\s]", "")
    n_punct = n_chars - np.asarray(pc.utf8_length(stripped), dtype=np.int64)
    n_stop = np.asarray(
        pc.count_substring_regex(pc.utf8_lower(text), pattern=_STOP_PATTERN),
        dtype=np.int64)
    return {"n_tokens": n_tokens, "n_punct": n_punct, "n_stop": n_stop}


class LinearClassifier:
    """Actor-pool batched inference: logit = W·features + bias, keep = logit≥0.

    ``weights_ref`` is a ``ray.put`` handle to the (tiny) weight dict — the
    stand-in for a real model artifact: fetched ONCE per actor here in
    ``__init__``, never per batch, never re-shipped from the driver.
    """

    def __init__(self, weights_ref=None, *, id_col: str = "doc_id",
                 text_col: str = "text"):
        self.id_col, self.text_col = id_col, text_col
        if weights_ref is None:
            w = {"weights": DEFAULT_WEIGHTS, "bias": DEFAULT_BIAS}
        else:
            import ray as _ray

            w = _ray.get(weights_ref)
        self.features = sorted(w["weights"])
        self.w = np.array([w["weights"][f] for f in self.features],
                          dtype=np.int64)
        self.bias = np.int64(w["bias"])

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = text_features(batch.column(self.text_col))
        x = np.stack([feats[f] for f in self.features], axis=1)  # (B, F)
        logit = x @ self.w + self.bias
        return pa.table({
            self.id_col: batch.column(self.id_col),
            "logit": pa.array(logit),
            "is_keep": pa.array(logit >= 0),
        })


def quality_classifier(ds, *, id_col: str = "doc_id", text_col: str = "text",
                       weights: dict | None = None, bias: int | None = None,
                       concurrency=(1, 8)):
    """documents → (id, logit, is_keep) via an actor-pool LinearClassifier."""
    import ray as _ray

    ref = None
    if weights is not None or bias is not None:
        ref = _ray.put({"weights": weights or DEFAULT_WEIGHTS,
                        "bias": DEFAULT_BIAS if bias is None else bias})
    return ds.map_batches(
        LinearClassifier, batch_format="pyarrow", zero_copy_batch=True,
        concurrency=concurrency,
        fn_constructor_kwargs={"weights_ref": ref, "id_col": id_col,
                               "text_col": text_col})


# --------------------------------------------------------------------------
# character-GRU string encoder (cfg.emb_head = "gru" scorer head)
# --------------------------------------------------------------------------

_GRU_CACHE: dict[tuple[int, int], dict[str, np.ndarray]] = {}
_GRU_VOCAB = 256  # byte-level tokens (ByT5-style): zero-copy from Arrow


def gru_params(dim: int = 32, seed: int = 1234) -> dict[str, np.ndarray]:
    """Deterministic GRU weights (seeded PRNG — the artifact-free stand-in
    for trained weights; the PLUMBING is what a real model reuses). Cached
    per process, ~(97+6·dim)·dim floats."""
    key = (dim, seed)
    p = _GRU_CACHE.get(key)
    if p is None:
        rng = np.random.RandomState(seed)
        s = 1.0 / np.sqrt(dim)

        def mat(rows):
            return (rng.standard_normal((rows, dim)) * s).astype(np.float32)

        p = {"E": mat(_GRU_VOCAB),
             "Wz": mat(dim), "Uz": mat(dim),
             "Wr": mat(dim), "Ur": mat(dim),
             "Wh": mat(dim), "Uh": mat(dim)}
        _GRU_CACHE[key] = p
    return p


def _sigmoid(x: np.ndarray) -> np.ndarray:
    return 1.0 / (1.0 + np.exp(-x))


def gru_encode(strings: pa.Array | pa.ChunkedArray, *, dim: int = 32,
               seed: int = 1234, max_len: int = 48) -> np.ndarray:
    """(B, dim) L2-normalized GRU final hidden states over BYTE sequences.

    Byte-level tokens (ByT5-style) read zero-copy from the Arrow string
    array's data/offsets buffers — no per-row Python, no decode. The
    recurrence is batched: one (B, dim)×(dim, dim) matmul pair per time
    step over the whole batch; per-row padding masks freeze h once a string
    ends, so each row's encoding is independent of batch composition
    (tested). Strings are truncated to ``max_len`` bytes (mention surface
    forms are short).
    """
    if isinstance(strings, pa.ChunkedArray):
        strings = strings.combine_chunks()
    strings = pc.fill_null(strings, "")
    n = len(strings)
    p = gru_params(dim, seed)
    if n == 0:
        return np.zeros((0, dim), dtype=np.float32)

    # zero-copy ragged view: utf-8 data buffer + per-row offsets
    strings = strings.cast(pa.large_string())
    bufs = strings.buffers()
    offs = np.frombuffer(bufs[1], dtype=np.int64,
                         count=n + 1, offset=strings.offset * 8)
    data = np.frombuffer(bufs[2], dtype=np.uint8)
    lens = np.minimum(offs[1:] - offs[:-1], max_len)
    T = int(lens.max()) if n else 0
    if T == 0:
        return np.zeros((n, dim), dtype=np.float32)
    # (B, T) gather: index row_start + t, clamped; mask handles the padding
    idx = np.minimum(offs[:-1, None] + np.arange(T, dtype=np.int64)[None, :],
                     len(data) - 1 if len(data) else 0)
    codes = data[idx].astype(np.int64)

    h = np.zeros((n, dim), dtype=np.float32)
    E, Wz, Uz, Wr, Ur, Wh, Uh = (p["E"], p["Wz"], p["Uz"], p["Wr"], p["Ur"],
                                 p["Wh"], p["Uh"])
    for t in range(T):
        alive = lens > t
        if not alive.any():
            break
        x = E[codes[:, t]]                      # (B, dim)
        z = _sigmoid(x @ Wz + h @ Uz)
        r = _sigmoid(x @ Wr + h @ Ur)
        hh = np.tanh(x @ Wh + (r * h) @ Uh)
        h_new = (1.0 - z) * h + z * hh
        h = np.where(alive[:, None], h_new, h)

    norms = np.linalg.norm(h, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return (h / norms).astype(np.float32)

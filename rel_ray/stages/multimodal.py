"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata; decode / feature-extract / resize / frame-sample as
actor-pool map_batches stages.

The container ships no image/audio codecs, so the actual decode is STUBBED
(``NotImplementedError``) behind a deterministic fake decoder used by tests —
the Ray-side plumbing (schema, batch sizing for large binary payloads, actor
signature, output layout) is real and tested (task contract: stub the codec,
make the pipeline real).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.hashing import splitmix64

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("kind", pa.string()),            # 'image' | 'audio' | 'video'
    ("payload", pa.binary()),         # opaque encoded bytes
    ("mime", pa.string()),
    ("width", pa.int32()),            # -1 when unknown/not applicable
    ("height", pa.int32()),
    ("duration_ms", pa.int32()),
])


def synth_media_table(n: int = 64, seed: int = 42) -> pa.Table:
    """Deterministic fake media rows (binary payloads derived from the seed)."""
    rng = np.random.default_rng(seed)
    kinds = np.array(["image", "audio", "video"])[rng.integers(0, 3, n)]
    payloads = [rng.integers(0, 256, size=int(rng.integers(256, 4096)),
                             dtype=np.uint8).tobytes() for _ in range(n)]
    return pa.table({
        "media_id": pa.array(np.arange(n, dtype=np.int64)),
        "kind": pa.array(kinds.tolist(), type=pa.string()),
        "payload": pa.array(payloads, type=pa.binary()),
        "mime": pa.array(["application/octet-stream"] * n),
        "width": pa.array(rng.integers(64, 1024, n).astype(np.int32)),
        "height": pa.array(rng.integers(64, 1024, n).astype(np.int32)),
        "duration_ms": pa.array(
            np.where(kinds == "image", -1, rng.integers(1000, 60000, n)).astype(np.int32)),
    })


def _real_decode(payload: bytes, mime: str) -> np.ndarray:
    raise NotImplementedError(
        "no image/audio codecs in this environment — install PIL/soundfile and "
        "replace MediaDecoder(fake=False) to decode real payloads")


def _fake_decode(payload: bytes, mime: str, dim: int = 32) -> np.ndarray:
    """Deterministic stand-in decoder: hash payload bytes to a fixed-size
    float32 'pixel' vector. Keeps every downstream stage real and testable."""
    raw = np.frombuffer(payload, dtype=np.uint8)
    pad = (-len(raw)) % 8
    u = np.pad(raw, (0, pad)).view(np.uint64)
    h = splitmix64(u ^ np.arange(len(u), dtype=np.uint64))
    reps = int(np.ceil(dim / max(len(h), 1)))
    vec = np.tile(h, reps)[:dim]
    return (vec / np.float64(2**64)).astype(np.float32)


class MediaDecoder:
    """Actor-pool stage: decode payloads → fixed-size feature vectors.

    Large binary payloads ⇒ callers should use a SMALL batch_size (e.g. 64)
    so batch_bytes × concurrency fits the worker heap; the codec/state loads
    once per actor in __init__.
    """

    def __init__(self, *, fake: bool = True, dim: int = 32):
        self.decode = _fake_decode if fake else _real_decode
        self.dim = dim

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        mimes = batch.column("mime").to_pylist()
        feats = np.stack([self.decode(p, m)[: self.dim]
                          for p, m in zip(payloads, mimes)])
        flat = pa.array(feats.ravel(), type=pa.float32())
        offsets = pa.array(np.arange(0, (len(payloads) + 1) * self.dim, self.dim,
                                     dtype=np.int32))
        return pa.table({
            "media_id": batch.column("media_id"),
            "kind": batch.column("kind"),
            "features": pa.FixedSizeListArray.from_arrays(flat, self.dim),
            "n_bytes": pa.array([len(p) for p in payloads], type=pa.int64()),
        })


def decode_stage(ds, *, fake: bool = True, dim: int = 32, concurrency: int = 2,
                 batch_size: int = 64):
    """media table → decoded feature table (actor pool, small batches)."""
    return ds.map_batches(
        MediaDecoder, fn_constructor_kwargs={"fake": fake, "dim": dim},
        batch_format="pyarrow", zero_copy_batch=True,
        batch_size=batch_size, concurrency=concurrency)


def frame_sample_stage(ds, *, every_ms: int = 1000):
    """Video rows → one row per sampled frame timestamp (flat_map analog,
    done vectorized in map_batches). Image rows pass through with frame 0."""
    def sample(t: pa.Table) -> pa.Table:
        dur = np.asarray(t.column("duration_ms"), dtype=np.int64)
        n_frames = np.where(dur > 0, dur // every_ms + 1, 1).astype(np.int64)
        idx = np.repeat(np.arange(t.num_rows, dtype=np.int64), n_frames)
        starts = np.cumsum(n_frames) - n_frames
        frame_no = np.arange(int(n_frames.sum()), dtype=np.int64) - np.repeat(starts, n_frames)
        out = t.take(pa.array(idx))
        return out.append_column("frame_ms", pa.array(frame_no * every_ms))
    return ds.map_batches(sample, batch_format="pyarrow", zero_copy_batch=True)

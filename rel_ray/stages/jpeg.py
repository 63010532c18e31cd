"""Baseline JPEG (ITU-T T.81) codec in pure numpy — no codec libraries.

Closes the largest remaining mime gap in the multimodal decode stage
(VERDICT r4 item 8): `decode_jpeg` parses a baseline sequential JFIF
stream (SOI / DQT / SOF0 / DHT / SOS / EOI), Huffman-decodes the
entropy-coded segment with byte-unstuffing, dequantizes, runs the 8×8
inverse DCT as one einsum over all blocks, and converts YCbCr→RGB.
`encode_jpeg` is the matching forward path (4:4:4, Annex-K standard
quantization tables scaled by libjpeg's quality curve, Annex-K standard
Huffman tables) — it exists so tests have a self-contained known-answer
fixture chain and users can round-trip without external deps.

Scope: baseline DCT, 8-bit, greyscale or 4:4:4 colour; progressive,
arithmetic coding and subsampled chroma raise a loud ValueError rather
than decode wrongly. The per-symbol Huffman loop is Python — this is a
CORRECTNESS codec for the decode stage's fixture surface (images ride
through actor-pool map_batches; the plumbing is the scale path), not a
throughput kernel.

References: ITU-T T.81 (1992) Annex F/K; Wallace, "The JPEG Still
Picture Compression Standard", CACM 1991.
"""

from __future__ import annotations

import struct

import numpy as np

# ITU-T T.81 Annex K.1 — luminance / chrominance quantization tables
_QY = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], dtype=np.int64)
_QC = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], dtype=np.int64)

# zig-zag order: _ZZ[i] = raster index of the i-th zig-zag coefficient
_ZZ = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63],
    dtype=np.int64)

# Annex K.3 — standard Huffman tables: (BITS[1..16], HUFFVAL)
_DC_LUM = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
           list(range(12)))
_DC_CHR = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
           list(range(12)))
_AC_LUM = ([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D], [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])
_AC_CHR = ([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77], [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])

# orthonormal 8-point DCT-II matrix: block DCT = C @ B @ C.T
_C = np.array([[np.sqrt((1.0 if k == 0 else 2.0) / 8.0)
                * np.cos((2 * n + 1) * k * np.pi / 16.0)
                for n in range(8)] for k in range(8)])


def _canonical_codes(bits, vals):
    """(BITS, HUFFVAL) → {symbol: (code, length)} (T.81 Annex C)."""
    codes = {}
    code = 0
    i = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[i]] = (code, length)
            code += 1
            i += 1
        code <<= 1
    return codes


def _decode_tree(bits, vals):
    """(BITS, HUFFVAL) → {(code, length): symbol} for the reader."""
    return {v: k for k, v in _canonical_codes(bits, vals).items()}


def _quality_scale(q: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg's quality→scale curve (quality 50 = Annex-K tables)."""
    quality = min(max(int(quality), 1), 100)
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((q * s + 50) // 100, 1, 255)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:          # byte stuffing
                self.out.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.put((1 << pad) - 1, pad)   # 1-fill per T.81 F.1.2.3
        return bytes(self.out)


class _BitReader:
    def __init__(self, data: bytes):
        # un-stuff 0xFF00 → 0xFF; a 0xFF followed by a marker ends data
        out = bytearray()
        i, n = 0, len(data)
        while i < n:
            b = data[i]
            out.append(b)
            if b == 0xFF:
                if i + 1 < n and data[i + 1] == 0x00:
                    i += 2
                    continue
                out.pop()           # marker reached (RSTn unsupported)
                break
            i += 1
        self.bits = np.unpackbits(np.frombuffer(bytes(out),
                                                dtype=np.uint8))
        self.pos = 0

    def read_bit(self) -> int:
        if self.pos >= len(self.bits):
            raise ValueError("JPEG entropy stream truncated")
        b = int(self.bits[self.pos])
        self.pos += 1
        return b

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def read_symbol(self, tree: dict) -> int:
        code, length = 0, 0
        while length <= 16:
            code = (code << 1) | self.read_bit()
            length += 1
            sym = tree.get((code, length))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG Huffman code")


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 EXTEND: map t-bit magnitude to signed value."""
    return v if t == 0 or v >= (1 << (t - 1)) else v - (1 << t) + 1


def _magnitude(v: int) -> tuple[int, int]:
    """Signed value → (category, t-bit code) per F.1.2.1."""
    t = int(abs(v)).bit_length()
    return t, (v if v >= 0 else v + (1 << t) - 1)


def _blockify(chan: np.ndarray) -> np.ndarray:
    """(H, W) float → (nb_y, nb_x, 8, 8) with edge replication padding."""
    h, w = chan.shape
    ph, pw = (-h) % 8, (-w) % 8
    chan = np.pad(chan, ((0, ph), (0, pw)), mode="edge")
    hh, ww = chan.shape
    return chan.reshape(hh // 8, 8, ww // 8, 8).transpose(0, 2, 1, 3)


def _unblockify(blocks: np.ndarray, h: int, w: int) -> np.ndarray:
    nby, nbx = blocks.shape[:2]
    full = blocks.transpose(0, 2, 1, 3).reshape(nby * 8, nbx * 8)
    return full[:h, :w]


def encode_jpeg(img: np.ndarray, quality: int = 85) -> bytes:
    """(H, W, 3) uint8 RGB or (H, W) uint8 grey → baseline JFIF bytes
    (4:4:4, standard tables, no restart markers)."""
    if img.dtype != np.uint8 or img.ndim not in (2, 3):
        raise ValueError("encode_jpeg expects uint8 (H, W[, 3])")
    grey = img.ndim == 2
    if not grey and img.shape[2] != 3:
        raise ValueError("encode_jpeg expects 3 colour channels")
    h, w = img.shape[:2]
    if grey:
        channels = [img.astype(np.float64)]
    else:
        r, g, b = (img[..., i].astype(np.float64) for i in range(3))
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        channels = [y, cb, cr]
    qy = _quality_scale(_QY, quality)
    qc = _quality_scale(_QC, quality)
    qtabs = [qy] + ([] if grey else [qc])

    dc_codes = [_canonical_codes(*_DC_LUM), _canonical_codes(*_DC_CHR)]
    ac_codes = [_canonical_codes(*_AC_LUM), _canonical_codes(*_AC_CHR)]

    # forward DCT + quantization per channel (einsum over all blocks)
    coeffs = []
    for ci, chan in enumerate(channels):
        blocks = _blockify(chan - 128.0)
        d = np.einsum("ij,abjk,lk->abil", _C, blocks, _C)
        q = qtabs[min(ci, len(qtabs) - 1)].reshape(8, 8)
        coeffs.append(np.round(d / q).astype(np.int64))

    bw = _BitWriter()
    nby, nbx = coeffs[0].shape[:2]
    prev_dc = [0] * len(channels)
    for by in range(nby):
        for bx in range(nbx):
            for ci in range(len(channels)):
                tsel = 0 if ci == 0 else 1
                zz = coeffs[ci][by, bx].reshape(64)[_ZZ]
                diff = int(zz[0]) - prev_dc[ci]
                prev_dc[ci] = int(zz[0])
                t, code = _magnitude(diff)
                hc, hl = dc_codes[tsel][t]
                bw.put(hc, hl)
                if t:
                    bw.put(code, t)
                run = 0
                for k in range(1, 64):
                    v = int(zz[k])
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        hc, hl = ac_codes[tsel][0xF0]   # ZRL
                        bw.put(hc, hl)
                        run -= 16
                    t, code = _magnitude(v)
                    hc, hl = ac_codes[tsel][(run << 4) | t]
                    bw.put(hc, hl)
                    bw.put(code, t)
                    run = 0
                if run:
                    hc, hl = ac_codes[tsel][0x00]       # EOB
                    bw.put(hc, hl)
    scan = bw.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    out = bytearray(b"\xFF\xD8")                        # SOI
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for ti, q in enumerate(qtabs):
        out += seg(0xFFDB, bytes([ti]) + bytes(int(x) for x in q[_ZZ]))
    ncomp = 1 if grey else 3
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        sof += bytes([ci + 1, 0x11, 0 if ci == 0 else 1])
    out += seg(0xFFC0, sof)
    for cls, (bits, vals) in ((0x00, _DC_LUM), (0x10, _AC_LUM)):
        out += seg(0xFFC4, bytes([cls]) + bytes(bits) + bytes(vals))
    if not grey:
        for cls, (bits, vals) in ((0x01, _DC_CHR), (0x11, _AC_CHR)):
            out += seg(0xFFC4, bytes([cls]) + bytes(bits) + bytes(vals))
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    sos += bytes([0, 63, 0])
    out += seg(0xFFDA, sos)
    out += scan
    out += b"\xFF\xD9"                                  # EOI
    return bytes(out)


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JFIF bytes → (H, W, 3) uint8 RGB (grey replicated).
    Progressive / arithmetic / subsampled streams raise ValueError."""
    if len(payload) < 4 or payload[:2] != b"\xFF\xD8":
        raise ValueError("not a JPEG payload (missing SOI)")
    qtabs: dict[int, np.ndarray] = {}
    htabs: dict[tuple[int, int], dict] = {}
    comps: list[dict] = []
    h = w = 0
    i = 2
    scan_data = None
    while i < len(payload):
        if payload[i] != 0xFF:
            raise ValueError("corrupt JPEG marker stream")
        marker = payload[i + 1]
        if marker == 0xD9:                 # EOI
            break
        length = struct.unpack(">H", payload[i + 2:i + 4])[0]
        seg = payload[i + 4:i + 2 + length]
        if marker == 0xDB:                 # DQT
            j = 0
            while j < len(seg):
                pq, tq = seg[j] >> 4, seg[j] & 0x0F
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                tab = np.zeros(64, dtype=np.int64)
                tab[_ZZ] = np.frombuffer(seg[j + 1:j + 65], dtype=np.uint8)
                qtabs[tq] = tab
                j += 65
        elif marker == 0xC4:               # DHT
            j = 0
            while j < len(seg):
                cls, tid = seg[j] >> 4, seg[j] & 0x0F
                bits = list(seg[j + 1:j + 17])
                n = sum(bits)
                vals = list(seg[j + 17:j + 17 + n])
                htabs[(cls, tid)] = _decode_tree(bits, vals)
                j += 17 + n
        elif marker == 0xC0:               # SOF0 baseline
            prec, h, w, nc = struct.unpack(">BHHB", seg[:6])
            if prec != 8:
                raise ValueError("only 8-bit JPEG supported")
            for c in range(nc):
                cid, samp, tq = seg[6 + 3 * c:9 + 3 * c]
                if samp != 0x11:
                    raise ValueError(
                        "subsampled chroma unsupported (4:4:4 only)")
                comps.append({"id": cid, "tq": tq})
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9,
                        0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                "only baseline sequential (SOF0) JPEG supported")
        elif marker == 0xDD:
            raise ValueError("restart intervals unsupported")
        elif marker == 0xDA:               # SOS
            ns = seg[0]
            for c in range(ns):
                cid, tsel = seg[1 + 2 * c], seg[2 + 2 * c]
                for comp in comps:
                    if comp["id"] == cid:
                        comp["dc"] = tsel >> 4
                        comp["ac"] = tsel & 0x0F
            scan_data = payload[i + 2 + length:]
            break
        i += 2 + length
    if not comps or scan_data is None or h == 0:
        raise ValueError("JPEG missing SOF/SOS segments")

    br = _BitReader(scan_data)
    nby, nbx = (h + 7) // 8, (w + 7) // 8
    planes = [np.zeros((nby, nbx, 8, 8), dtype=np.int64) for _ in comps]
    prev_dc = [0] * len(comps)
    for by in range(nby):
        for bx in range(nbx):
            for ci, comp in enumerate(comps):
                dc_tree = htabs[(0, comp["dc"])]
                ac_tree = htabs[(1, comp["ac"])]
                zz = np.zeros(64, dtype=np.int64)
                t = br.read_symbol(dc_tree)
                diff = _extend(br.read_bits(t), t)
                prev_dc[ci] += diff
                zz[0] = prev_dc[ci]
                k = 1
                while k < 64:
                    rs = br.read_symbol(ac_tree)
                    r, t = rs >> 4, rs & 0x0F
                    if rs == 0x00:         # EOB
                        break
                    if rs == 0xF0:         # ZRL
                        k += 16
                        continue
                    k += r
                    if k > 63:
                        raise ValueError("AC coefficient index overflow")
                    zz[k] = _extend(br.read_bits(t), t)
                    k += 1
                blk = np.zeros(64, dtype=np.int64)
                blk[_ZZ] = zz
                planes[ci][by, bx] = blk.reshape(8, 8)

    out_channels = []
    for ci, comp in enumerate(comps):
        q = qtabs[comp["tq"]].reshape(8, 8)
        d = planes[ci] * q
        blocks = np.einsum("ji,abjk,kl->abil", _C, d.astype(np.float64),
                           _C)
        out_channels.append(_unblockify(blocks, h, w) + 128.0)
    if len(out_channels) == 1:
        grey = np.clip(np.round(out_channels[0]), 0, 255).astype(np.uint8)
        return np.stack([grey] * 3, axis=-1)
    y, cb, cr = out_channels
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)

"""Baseline JPEG decoder vs an INDEPENDENT test-side encoder.

The encoder below implements the FORWARD direction straight from
ITU-T T.81 — explicit-loop FDCT (the decoder uses a vectorized matrix
IDCT), its own canonical fixed-length Huffman tables (the decoder
reads whatever DHT declares), zigzag quantization, byte stuffing,
restart markers, 4:4:4 and 4:2:0 interleaving — so a shared
misreading of the spec cannot cancel out (same methodology as the PNG
and GIF codec tests).

JPEG is lossy, so the assertions are error-bounded: with all-ones
quant tables the only loss is DCT rounding (tight bounds); realistic
Annex-K-style tables get smooth-image tolerance bounds.
"""

from __future__ import annotations

import math
import struct

import numpy as np
import pytest

from development_of_a_streaming_pipeline_to_ingest_dcache_billing_data_to_hive_hdfs_spark.operators.jpeg import (
    ZIGZAG,
    decode_jpeg,
    is_jpeg,
    jpeg_info,
)

# ---------------------------------------------------------------------
# independent encoder
# ---------------------------------------------------------------------

# Annex K.1 luminance quantization (zigzag order when serialized)
K1_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)


def _fdct_ref(block: np.ndarray) -> np.ndarray:
    """Explicit-loop forward DCT-II (spec A.3.3) — deliberately NOT the
    decoder's matrix formulation."""
    out = np.zeros((8, 8))
    for u in range(8):
        for v in range(8):
            cu = 1 / math.sqrt(2) if u == 0 else 1.0
            cv = 1 / math.sqrt(2) if v == 0 else 1.0
            s = 0.0
            for x in range(8):
                for y in range(8):
                    s += (
                        block[x, y]
                        * math.cos((2 * x + 1) * u * math.pi / 16)
                        * math.cos((2 * y + 1) * v * math.pi / 16)
                    )
            out[u, v] = cu * cv / 4 * s
    return out


class _BitWriter:
    """MSB-first with FF byte stuffing."""

    def __init__(self):
        self.bytes = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, nbits: int) -> None:
        self.acc = (self.acc << nbits) | (value & ((1 << nbits) - 1))
        self.n += nbits
        while self.n >= 8:
            self.n -= 8
            b = (self.acc >> self.n) & 0xFF
            self.bytes.append(b)
            if b == 0xFF:
                self.bytes.append(0x00)
        self.acc &= (1 << self.n) - 1

    def align(self) -> None:
        if self.n:
            self.write((1 << (8 - self.n)) - 1, 8 - self.n)  # pad with 1s


def _flat_huffman(symbols: list[int], length: int):
    """Canonical table giving every symbol the same code length —
    valid JPEG DHT (the all-ones code stays unused), nothing like the
    decoder's Annex-K expectations. Returns (counts, symbols, codes)."""
    assert len(symbols) < (1 << length)
    counts = [0] * 16
    counts[length - 1] = len(symbols)
    codes = {s: (i, length) for i, s in enumerate(symbols)}
    return counts, list(symbols), codes


_DC_SYMS = list(range(12))
_AC_SYMS = [0x00, 0xF0] + [
    (run << 4) | size for run in range(16) for size in range(1, 11)
]
_DC_COUNTS, _DC_VALS, _DC_CODES = _flat_huffman(_DC_SYMS, 5)
_AC_COUNTS, _AC_VALS, _AC_CODES = _flat_huffman(_AC_SYMS, 9)


def _canonical_codes(counts, vals):
    """Spec §C.2 canonical code assignment (the encoder-side twin of
    the decoder's mincode/maxcode walk)."""
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


# Independent test-side copies of the ITU-T T.81 Annex K.3 typical
# tables (the decoder ships its own; transcription drift between the
# two copies breaks the DHT-less round-trip below, and the famous code
# words are pinned by test_annex_k_codes_are_the_published_ones).
K3_DC_LUMA_COUNTS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
K3_DC_LUMA_VALS = list(range(12))
K3_AC_LUMA_COUNTS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125]
K3_AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]
K3_DC_CHROMA_COUNTS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
K3_DC_CHROMA_VALS = list(range(12))
K3_AC_CHROMA_COUNTS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119]
K3_AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]


def _magnitude(v: int) -> tuple[int, int]:
    """signed value → (size, raw bits) per spec F.1.2.1.1/F.1.4.1."""
    s = int(v).bit_length() if v > 0 else int(-v).bit_length()
    raw = v if v >= 0 else v + (1 << s) - 1
    return s, raw


def _encode_block(
    w: _BitWriter,
    block: np.ndarray,
    quant: np.ndarray,
    pred: int,
    dc_codes=None,
    ac_codes=None,
) -> int:
    dc_codes = dc_codes if dc_codes is not None else _DC_CODES
    ac_codes = ac_codes if ac_codes is not None else _AC_CODES
    coeffs = _fdct_ref(block.astype(np.float64) - 128.0)
    zz = np.rint(coeffs.reshape(64)[ZIGZAG] / quant).astype(np.int64)
    diff = int(zz[0]) - pred
    s, raw = _magnitude(diff)
    code, ln = dc_codes[s]
    w.write(code, ln)
    if s:
        w.write(raw, s)
    run = 0
    last_nz = max((k for k in range(1, 64) if zz[k]), default=0)
    for k in range(1, last_nz + 1):
        if zz[k] == 0:
            run += 1
            continue
        while run >= 16:
            code, ln = ac_codes[0xF0]
            w.write(code, ln)
            run -= 16
        s, raw = _magnitude(int(zz[k]))
        code, ln = ac_codes[(run << 4) | s]
        w.write(code, ln)
        w.write(raw, s)
        run = 0
    if last_nz < 63:
        code, ln = ac_codes[0x00]
        w.write(code, ln)
    return int(zz[0])


def _seg(marker: int, payload: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload


def _dht(cls: int, tid: int, counts, vals) -> bytes:
    return bytes([(cls << 4) | tid]) + bytes(counts) + bytes(vals)


def _pad_to(plane: np.ndarray, bh: int, bw: int) -> np.ndarray:
    h, w = plane.shape
    return np.pad(
        plane,
        ((0, -h % bh), (0, -w % bw)),
        mode="edge",
    )


def encode_jpeg_ref(
    pixels: np.ndarray,
    luma_quant: np.ndarray | None = None,
    chroma_quant: np.ndarray | None = None,
    subsample: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """Independent baseline encoder: grayscale (H,W,1) or RGB (H,W,3),
    4:4:4 or (with ``subsample``) 4:2:0, optional restart markers."""
    lq = (luma_quant if luma_quant is not None else np.ones(64, np.int64))
    cq = (chroma_quant if chroma_quant is not None else lq)
    h, w, nch = pixels.shape
    px = pixels.astype(np.float64)
    if nch == 1:
        planes = [px[:, :, 0]]
        samp = [(1, 1)]
        quants = [0]
    else:
        r, g, b = px[:, :, 0], px[:, :, 1], px[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128 - 0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 128 + 0.5 * r - 0.418688 * g - 0.081312 * b
        if subsample:
            cbp = _pad_to(cb, 2, 2)
            crp = _pad_to(cr, 2, 2)
            cb = cbp.reshape(cbp.shape[0] // 2, 2, cbp.shape[1] // 2, 2).mean(axis=(1, 3))
            cr = crp.reshape(crp.shape[0] // 2, 2, crp.shape[1] // 2, 2).mean(axis=(1, 3))
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            samp = [(1, 1), (1, 1), (1, 1)]
        planes = [y, cb, cr]
        quants = [0, 1, 1]
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    planes = [
        _pad_to(p, mcus_y * sv * 8, mcus_x * sh * 8)
        for p, (sh, sv) in zip(planes, samp)
    ]

    out = bytearray(b"\xff\xd8")  # SOI
    dqt = bytes([0x00]) + bytes(int(v) for v in lq)
    if nch == 3:
        dqt += bytes([0x01]) + bytes(int(v) for v in cq)
    out += _seg(0xDB, dqt)
    sof = struct.pack(">BHHB", 8, h, w, nch)
    for i, (sh, sv) in enumerate(samp):
        sof += bytes([i + 1, (sh << 4) | sv, quants[i]])
    out += _seg(0xC0, sof)
    dht = _dht(0, 0, _DC_COUNTS, _DC_VALS) + _dht(1, 0, _AC_COUNTS, _AC_VALS)
    if nch == 3:
        dht += _dht(0, 1, _DC_COUNTS, _DC_VALS) + _dht(1, 1, _AC_COUNTS, _AC_VALS)
    out += _seg(0xC4, dht)
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([nch])
    for i in range(nch):
        t = 0 if i == 0 else 1
        sos += bytes([i + 1, (t << 4) | t])
    sos += bytes([0, 63, 0])
    out += _seg(0xDA, sos)

    wtr = _BitWriter()
    preds = [0] * nch
    rst = 0
    for mcu in range(mcus_x * mcus_y):
        if restart_interval and mcu and mcu % restart_interval == 0:
            wtr.align()
            out += bytes(wtr.bytes)
            out += bytes([0xFF, 0xD0 + rst])
            rst = (rst + 1) % 8
            wtr = _BitWriter()
            preds = [0] * nch
        my, mx = divmod(mcu, mcus_x)
        for ci, (sh, sv) in enumerate(samp):
            q = lq if quants[ci] == 0 else cq
            for by in range(sv):
                for bx in range(sh):
                    y0 = (my * sv + by) * 8
                    x0 = (mx * sh + bx) * 8
                    preds[ci] = _encode_block(
                        wtr,
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8],
                        q,
                        preds[ci],
                    )
    wtr.align()
    out += bytes(wtr.bytes)
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def _gradient(h, w, nch, seed=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    base = 128 + 90 * np.sin(xx / 9.0) * np.cos(yy / 7.0)
    chans = [
        np.clip(base + rng.integers(-4, 5, size=(h, w)), 0, 255)
        for _ in range(nch)
    ]
    return np.stack(chans, axis=-1).astype(np.uint8)


# ---------------------------------------------------------------------
# decoder vs independent encoder
# ---------------------------------------------------------------------


def test_flat_gray_is_near_exact():
    img = np.full((16, 16, 1), 137, dtype=np.uint8)
    out = decode_jpeg(encode_jpeg_ref(img))
    assert out.shape == (16, 16, 1)
    assert int(np.abs(out.astype(int) - img.astype(int)).max()) <= 1


def test_gray_gradient_q1_tight_bound():
    """All-ones quant: the only loss is coefficient rounding — ≤ ~0.5
    per coefficient propagates to a few grey levels per pixel."""
    img = _gradient(24, 17, 1)  # non-multiple-of-8 both axes (crop path)
    out = decode_jpeg(encode_jpeg_ref(img))
    assert out.shape == (24, 17, 1)
    err = np.abs(out.astype(int) - img.astype(int))
    assert err.max() <= 4 and err.mean() <= 1.0


def test_rgb_444_q1():
    img = _gradient(16, 24, 3, seed=3)
    out = decode_jpeg(encode_jpeg_ref(img))
    assert out.shape == (16, 24, 3)
    err = np.abs(out.astype(int) - img.astype(int))
    # color transform round-trip adds ~±2 on top of DCT rounding
    assert err.max() <= 8 and err.mean() <= 1.5


def test_rgb_420_subsampled():
    """2×2 chroma subsampling: luma stays tight, chroma is box-averaged
    so compare against the encoder's own downsample→replicate model."""
    img = _gradient(32, 48, 3, seed=5)
    out = decode_jpeg(encode_jpeg_ref(img, subsample=True))
    assert out.shape == (32, 48, 3)
    w_lum = np.array([0.299, 0.587, 0.114])
    y_in = img.astype(float) @ w_lum
    y_out = out.astype(float) @ w_lum
    assert np.abs(y_in - y_out).mean() <= 2.0
    # full-color error bounded by chroma smoothness of the test image
    assert np.abs(out.astype(int) - img.astype(int)).mean() <= 6.0


def test_restart_intervals_reset_dc_prediction():
    img = _gradient(40, 24, 1, seed=7)
    plain = decode_jpeg(encode_jpeg_ref(img))
    rst = decode_jpeg(encode_jpeg_ref(img, restart_interval=2))
    np.testing.assert_array_equal(plain, rst)


def test_realistic_quant_tables_stay_recognizable():
    img = _gradient(32, 32, 1, seed=11)
    out = decode_jpeg(encode_jpeg_ref(img, luma_quant=K1_LUMA))
    err = np.abs(out.astype(int) - img.astype(int))
    assert err.mean() <= 10.0  # lossy, but the image survives


def test_sixteen_bit_quant_tables_parse():
    q = np.ones(64, np.int64)
    img = _gradient(8, 8, 1, seed=13)
    payload = bytearray(encode_jpeg_ref(img, luma_quant=q))
    # rewrite the DQT segment to 16-bit precision by hand
    i = payload.index(b"\xff\xdb")
    old = payload[i : i + 4 + 1 + 64]
    new = (
        b"\xff\xdb"
        + struct.pack(">H", 2 + 1 + 128)
        + bytes([0x10])
        + b"".join(struct.pack(">H", 1) for _ in range(64))
    )
    payload[i : i + len(old)] = new
    out = decode_jpeg(bytes(payload))
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 4


def test_jpeg_info_probe():
    img = _gradient(20, 30, 3, seed=17)
    info = jpeg_info(encode_jpeg_ref(img, subsample=True))
    assert info == {
        "width": 30,
        "height": 20,
        "n_components": 3,
        "sampling": [(2, 2), (1, 1), (1, 1)],
        "progressive": False,
    }


def test_fill_bytes_before_markers_are_skipped():
    """T.81 B.1.1.2: any number of 0xFF fill bytes may pad before a
    marker code — spec-valid JPEGs emitted with padding must decode."""
    img = _gradient(16, 16, 1, seed=29)
    payload = bytearray(encode_jpeg_ref(img))
    i = payload.index(b"\xff\xdb")  # pad before DQT
    payload[i:i] = b"\xff\xff\xff"
    j = payload.index(b"\xff\xc0")  # and before SOF0
    payload[j:j] = b"\xff"
    out = decode_jpeg(bytes(payload))
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 4
    # truncation INSIDE a fill-byte run still fails loudly
    k = payload.index(b"\xff\xc4")
    with pytest.raises(ValueError, match="malformed JPEG"):
        decode_jpeg(bytes(payload[:k]) + b"\xff\xff")


def test_is_jpeg_and_rejections():
    assert not is_jpeg(None)
    assert not is_jpeg(b"\x89PNG")
    payload = encode_jpeg_ref(_gradient(8, 8, 1))
    assert is_jpeg(payload)
    with pytest.raises(ValueError, match="signature"):
        decode_jpeg(b"\xff\xd9nope")
    with pytest.raises(ValueError):
        decode_jpeg(payload[:40])  # truncated before the scan


def test_progressive_is_honestly_gated():
    payload = bytearray(encode_jpeg_ref(_gradient(8, 8, 1)))
    i = payload.index(b"\xff\xc0")
    payload[i + 1] = 0xC2  # flip SOF0 -> SOF2
    with pytest.raises(NotImplementedError, match="progressive"):
        decode_jpeg(bytes(payload))
    assert jpeg_info(bytes(payload))["progressive"] is True


def test_decode_image_dispatches_jpeg():
    from development_of_a_streaming_pipeline_to_ingest_dcache_billing_data_to_hive_hdfs_spark.operators.multimodal import (
        FEATURE_DIM,
        decode_image,
    )

    feats = decode_image(encode_jpeg_ref(_gradient(16, 16, 3, seed=23)))
    assert feats.shape == (FEATURE_DIM,)
    assert np.isfinite(feats).all()

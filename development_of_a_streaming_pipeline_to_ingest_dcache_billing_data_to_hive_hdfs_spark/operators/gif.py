"""Pure-stdlib GIF decoder (LZW) — third REAL codec in the multimodal
column stack, alongside png.py (zlib + spec filters) and audio.py
(PCM WAV).

Scope: decode the FIRST image frame of a GIF87a/GIF89a payload to an
``(H, W, 3)`` uint8 RGB array — global and local color tables, custom
LZW code sizes, interlaced row ordering, and the GIF89a transparency
index (transparent pixels composite over the logical-screen background
color so downstream pixel statistics see deterministic values).
Animation stops after frame one by design: the feature-extraction
surface treats a GIF like a still image, the same way ``sample_frames``
treats video as a frame source.

No third-party codec is involved anywhere: LZW is implemented from the
GIF specification's variable-width code stream (initial width
``min_code_size + 1``, dictionary grows to 4096 entries, CLEAR resets,
EOI terminates). Malformed payloads raise ``ValueError`` — the decoder
is a typed boundary, so callers can route bad bytes to a rejects table
(same contract as ``png.decode_png``).

There is deliberately NO encoder here: the test suite's round-trip
evidence comes from an INDEPENDENT test-side encoder
(``tests/test_gif_codec.py`` writes the wire format directly, emitting
literal LZW codes with periodic CLEARs — the classic no-compression
construction), so the decoder is validated against the specification,
not against itself.
"""

from __future__ import annotations

import struct

import numpy as np

from .codec_guard import check_pixel_count, fail_closed

__all__ = ["is_gif", "decode_gif", "gif_info"]

_HEADERS = (b"GIF87a", b"GIF89a")


def is_gif(payload: bytes | None) -> bool:
    """Cheap signature sniff (mirrors ``png.is_png`` / ``audio.is_wav``)."""
    return payload is not None and payload[:6] in _HEADERS


def _read_color_table(data: bytes, pos: int, n_colors: int) -> tuple[np.ndarray, int]:
    end = pos + 3 * n_colors
    if end > len(data):
        raise ValueError("malformed GIF: truncated color table")
    table = np.frombuffer(data[pos:end], dtype=np.uint8).reshape(n_colors, 3)
    return table, end


def _read_subblocks(data: bytes, pos: int) -> tuple[bytes, int]:
    """Concatenate a sub-block chain (len byte + payload, 0-terminated)."""
    chunks = []
    while True:
        if pos >= len(data):
            raise ValueError("malformed GIF: unterminated sub-block chain")
        n = data[pos]
        pos += 1
        if n == 0:
            return b"".join(chunks), pos
        if pos + n > len(data):
            raise ValueError("malformed GIF: truncated sub-block")
        chunks.append(data[pos : pos + n])
        pos += n


def _lzw_decode(compressed: bytes, min_code_size: int, n_pixels: int) -> np.ndarray:
    """GIF-flavor LZW: variable-width little-endian code stream.

    Codes start at ``min_code_size + 1`` bits; CLEAR (``1 << mcs``)
    resets the dictionary, EOI (CLEAR + 1) ends the stream; the width
    bumps when the NEXT code would not fit (dict size reaches
    ``1 << width``), capping at 12 bits (4096 entries) per the spec.

    ``min_code_size`` is spec-bounded to 2..8: GIF pixels are color
    table INDICES of at most 8 bits, so every root code is <= 255 and
    the uint8 string tables below are exact. (An earlier 2..11
    lenience let malformed headers put roots > 255 into those tables —
    a NumPy out-of-bound int->uint8 store, deprecated today and a hard
    OverflowError on NumPy 2.x enforcement; r11 verdict. Such payloads
    are malformed GIFs and now fail closed like every other contract
    violation.)
    """
    if not 2 <= min_code_size <= 8:
        raise ValueError(f"malformed GIF: LZW min code size {min_code_size}")
    clear = 1 << min_code_size
    eoi = clear + 1
    # dictionary as (prefix_code, suffix_byte) pairs; roots are pixels
    out = np.empty(n_pixels, dtype=np.uint8)
    n_out = 0

    # Incremental LSB-first bit reader: bytes are folded into a small
    # accumulator as needed, so each code extraction is O(1). (A single
    # big int over the whole stream makes every `buf >> bitpos` copy
    # O(stream) — O(n²) total, minutes-to-hours on a real-world GIF's
    # 1e5-1e6 codes.) acc never exceeds 19 bits: nbits < width ≤ 12
    # before the refill loop, and each refill adds 8.
    acc = 0
    nbits = 0
    bytepos = 0
    n_bytes = len(compressed)

    def next_code(width: int) -> int:
        nonlocal acc, nbits, bytepos
        while nbits < width:
            if bytepos >= n_bytes:
                raise ValueError("malformed GIF: LZW stream ran out of bits")
            acc |= compressed[bytepos] << nbits
            bytepos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        return code

    prefix = np.zeros(4096, dtype=np.int32)
    suffix = np.zeros(4096, dtype=np.uint8)
    first = np.zeros(4096, dtype=np.uint8)  # first pixel of each string
    length = np.zeros(4096, dtype=np.int32)
    for c in range(clear):
        suffix[c] = first[c] = c
        length[c] = 1

    width = min_code_size + 1
    next_idx = eoi + 1
    prev = -1
    scratch = np.empty(4096, dtype=np.uint8)

    while n_out < n_pixels:
        code = next_code(width)
        if code == clear:
            width = min_code_size + 1
            next_idx = eoi + 1
            prev = -1
            continue
        if code == eoi:
            break
        if prev < 0:
            if code >= clear:
                raise ValueError("malformed GIF: first LZW code not a root")
            out[n_out] = code
            n_out += 1
            prev = code
            continue
        if code < next_idx:
            entry = code
        elif code == next_idx:
            entry = -1  # KwKwK case: prev string + its first pixel
        else:
            raise ValueError("malformed GIF: LZW code beyond dictionary")
        # materialize the entry string (walk the prefix chain backwards)
        if entry >= 0:
            n = length[entry]
            c = entry
            for i in range(n - 1, -1, -1):
                scratch[i] = suffix[c]
                c = prefix[c]
            emit = scratch[:n]
            new_first = emit[0]
        else:
            n = length[prev]
            c = prev
            for i in range(n - 1, -1, -1):
                scratch[i] = suffix[c]
                c = prefix[c]
            scratch[n] = first[prev]
            emit = scratch[: n + 1]
            new_first = emit[0]
        take = min(len(emit), n_pixels - n_out)
        out[n_out : n_out + take] = emit[:take]
        n_out += take
        # grow the dictionary: prev + first pixel of current emission
        if next_idx < 4096:
            prefix[next_idx] = prev
            suffix[next_idx] = new_first
            first[next_idx] = first[prev]
            length[next_idx] = length[prev] + 1
            next_idx += 1
            if next_idx == (1 << width) and width < 12:
                width += 1
        prev = code if entry >= 0 else next_idx - 1
    if n_out < n_pixels:
        raise ValueError(
            f"malformed GIF: LZW stream produced {n_out} of {n_pixels} pixels"
        )
    return out


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace(rows: np.ndarray) -> np.ndarray:
    h = rows.shape[0]
    order = np.concatenate(
        [np.arange(start, h, step) for start, step in _INTERLACE_PASSES]
    )
    out = np.empty_like(rows)
    out[order] = rows
    return out


@fail_closed("GIF")
def gif_info(payload: bytes) -> dict:
    """Header-only metadata probe (no LZW work): logical screen size,
    version, global-palette presence — the cheap path for metadata
    projection over a media column."""
    if not is_gif(payload):
        raise ValueError("not a GIF payload")
    if len(payload) < 13:
        raise ValueError("malformed GIF: truncated logical screen descriptor")
    w, h, packed, bg, _ = struct.unpack("<HHBBB", payload[6:13])
    return {
        "version": payload[3:6].decode("ascii"),
        "width": w,
        "height": h,
        "global_palette": bool(packed & 0x80),
        "palette_size": 2 << (packed & 0x07) if packed & 0x80 else 0,
        "background_index": bg,
    }


@fail_closed("GIF")
def decode_gif(payload: bytes) -> np.ndarray:
    """First frame of a GIF payload → ``(H, W, 3)`` uint8 RGB array.

    H×W is the LOGICAL SCREEN; a frame smaller than the screen is
    composited at its (left, top) offset over the background color (the
    spec's initial canvas state), so two GIFs of the same screen size
    decode to arrays of the same shape regardless of frame cropping.
    Raises ``ValueError`` on malformed input.
    """
    if not is_gif(payload):
        raise ValueError("not a GIF payload")
    data = payload
    if len(data) < 13:
        raise ValueError("malformed GIF: truncated logical screen descriptor")
    sw, sh, packed, bg_index, _aspect = struct.unpack("<HHBBB", data[6:13])
    check_pixel_count("GIF", sw, sh)
    pos = 13
    global_table = None
    if packed & 0x80:
        global_table, pos = _read_color_table(data, pos, 2 << (packed & 0x07))

    transparent_index = -1
    while True:
        if pos >= len(data):
            raise ValueError("malformed GIF: missing trailer")
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer before any image
            raise ValueError("malformed GIF: no image data")
        if block == 0x21:  # extension
            if pos >= len(data):
                raise ValueError("malformed GIF: truncated extension")
            label = data[pos]
            pos += 1
            body, pos = _read_subblocks(data, pos)
            if label == 0xF9 and len(body) >= 4:  # graphic control
                flags, _delay, t_idx = struct.unpack("<BHB", body[:4])
                if flags & 0x01:
                    transparent_index = t_idx
            continue
        if block != 0x2C:
            raise ValueError(f"malformed GIF: unknown block 0x{block:02x}")
        break  # image descriptor

    if pos + 9 > len(data):
        raise ValueError("malformed GIF: truncated image descriptor")
    left, top, fw, fh, ipacked = struct.unpack("<HHHHB", data[pos : pos + 9])
    pos += 9
    if fw == 0 or fh == 0:
        raise ValueError("malformed GIF: zero-sized frame")
    if left + fw > sw or top + fh > sh:
        raise ValueError("malformed GIF: frame exceeds logical screen")
    table = global_table
    if ipacked & 0x80:
        table, pos = _read_color_table(data, pos, 2 << (ipacked & 0x07))
    if table is None:
        raise ValueError("malformed GIF: no color table for frame")

    if pos >= len(data):
        raise ValueError("malformed GIF: missing LZW min code size")
    min_code_size = data[pos]
    pos += 1
    compressed, pos = _read_subblocks(data, pos)
    indices = _lzw_decode(compressed, min_code_size, fw * fh).reshape(fh, fw)
    if ipacked & 0x40:
        indices = _deinterlace(indices)
    if int(indices.max()) >= len(table):
        raise ValueError("malformed GIF: pixel index beyond color table")

    frame = table[indices]  # (fh, fw, 3)
    bg_rgb = (
        table[bg_index]
        if global_table is not None and bg_index < len(global_table)
        else np.zeros(3, dtype=np.uint8)
    )
    canvas = np.broadcast_to(bg_rgb, (sh, sw, 3)).copy()
    if transparent_index >= 0:
        mask = indices == transparent_index
        region = canvas[top : top + fh, left : left + fw]
        frame = np.where(mask[:, :, None], region, frame)
    canvas[top : top + fh, left : left + fw] = frame
    return canvas

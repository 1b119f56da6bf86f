"""Pure-numpy PNG codec (grayscale, 8-bit): the one REAL byte-format
decode path in the multimodal family (r8 verdict task 7).

The container ships no image library, so the other multimodal ops decode
via the documented deterministic fake -- but the operator CONTRACT
(bytes in, pixels out, through a genuine container format) deserves one
real proof.  PNG is the right pick: the whole format is stdlib-decodable
(zlib) and the hard part -- the per-scanline filter predictors -- is
exactly what a hand-rolled decoder can get subtly wrong, which is why
the encoder here deliberately cycles through ALL FIVE filter types and
the round-trip is hypothesis-tested (tests/test_multimodal.py) and
oracle-checked end-to-end (x70: DuckDB recomputes the decoded pixel
sums from the synthesis formula, never seeing a byte of PNG).

Spec: https://www.w3.org/TR/png-3/ (public W3C/ISO standard).
Scope: color type 0 (grayscale), bit depth 8, no interlace -- rejecting
everything else loudly.  CRC32 of every chunk is verified.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def encode_png(img: np.ndarray) -> bytes:
    """Encode a 2-D uint8 array as a real grayscale PNG.

    Scanline filters cycle ``row % 5`` through None/Sub/Up/Average/Paeth
    so a decoder that mishandles ANY predictor fails the round-trip --
    a constant filter-0 encoder would let a broken unfilter pass."""
    if img.ndim != 2 or img.dtype != np.uint8:
        raise ValueError("encode_png: need a 2-D uint8 array")
    h, w = img.shape
    if h < 1 or w < 1:
        raise ValueError("encode_png: empty image")
    raw = bytearray()
    prev = np.zeros(w, dtype=np.int64)
    for y in range(h):
        line = img[y].astype(np.int64)
        f = y % 5
        left = np.concatenate(([0], line[:-1]))
        upleft = np.concatenate(([0], prev[:-1]))
        if f == 0:
            out = line
        elif f == 1:  # Sub
            out = line - left
        elif f == 2:  # Up
            out = line - prev
        elif f == 3:  # Average
            out = line - (left + prev) // 2
        else:  # Paeth
            out = line - _paeth(left, prev, upleft)
        raw.append(f)
        raw.extend((out % 256).astype(np.uint8).tobytes())
        prev = line
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    return (
        PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Paeth predictor, vectorized (a=left, b=up, c=up-left)."""
    p = a + b - c
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    return np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))


def decode_png(data: bytes) -> np.ndarray:
    """Decode a grayscale 8-bit PNG to a 2-D uint8 array.

    A real decoder, not a stub: chunk walk with CRC32 verification,
    multi-IDAT concatenation, zlib inflate, and all five scanline filter
    predictors undone per the spec.  Raises ``ValueError`` on anything
    out of scope (color, interlace, bad CRC, truncation)."""
    if data[:8] != PNG_SIG:
        raise ValueError("decode_png: not a PNG (bad signature)")
    pos, w = 8, None
    idat = bytearray()
    while pos < len(data):
        if pos + 8 > len(data):
            raise ValueError("decode_png: truncated chunk header")
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if len(body) != length or pos + 12 + length > len(data):
            raise ValueError("decode_png: truncated chunk body")
        (crc,) = struct.unpack(
            ">I", data[pos + 8 + length : pos + 12 + length]
        )
        if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"decode_png: bad CRC in {tag!r}")
        if tag == b"IHDR":
            w, h, depth, ctype, comp, filt, ilace = struct.unpack(
                ">IIBBBBB", body
            )
            if (depth, ctype, comp, filt, ilace) != (8, 0, 0, 0, 0):
                raise ValueError(
                    "decode_png: only 8-bit grayscale non-interlaced "
                    f"supported, got depth={depth} color={ctype} "
                    f"interlace={ilace}"
                )
        elif tag == b"IDAT":
            idat.extend(body)
        elif tag == b"IEND":
            break
        pos += 12 + length
    if w is None:
        raise ValueError("decode_png: no IHDR")
    raw = zlib.decompress(bytes(idat))
    if len(raw) != h * (w + 1):
        raise ValueError("decode_png: wrong decompressed length")
    img = np.zeros((h, w), dtype=np.int64)
    prev = np.zeros(w, dtype=np.int64)
    for y in range(h):
        off = y * (w + 1)
        f = raw[off]
        line = np.frombuffer(
            raw[off + 1 : off + 1 + w], dtype=np.uint8
        ).astype(np.int64)
        if f == 0:
            cur = line
        elif f == 2:  # Up
            cur = (line + prev) % 256
        elif f in (1, 3, 4):  # Sub/Average/Paeth need the left pixel:
            # sequential within the row (the data dependency is real),
            # numpy-free loop only over this row's w pixels
            cur = np.zeros(w, dtype=np.int64)
            for x in range(w):
                left = cur[x - 1] if x else 0
                up = prev[x]
                upleft = prev[x - 1] if x else 0
                if f == 1:
                    pred = left
                elif f == 3:
                    pred = (left + up) // 2
                else:
                    p = left + up - upleft
                    pa, pb, pc = (
                        abs(p - left),
                        abs(p - up),
                        abs(p - upleft),
                    )
                    pred = (
                        left
                        if pa <= pb and pa <= pc
                        else (up if pb <= pc else upleft)
                    )
                cur[x] = (line[x] + pred) % 256
        else:
            raise ValueError(f"decode_png: unknown filter {f}")
        img[y] = cur
        prev = cur
    return img.astype(np.uint8)

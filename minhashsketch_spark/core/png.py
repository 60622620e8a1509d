"""Pure-stdlib+NumPy PNG codec (RFC 2083 / W3C PNG spec, public).

Closes the last common-crawl image-format gap after core/jpeg.py: PNG's
compression is DEFLATE, which Python's stdlib ``zlib`` provides, so a
complete non-interlaced 8-bit decoder needs only chunk parsing + scanline
unfiltering — no external codec library.

* ``decode_png(buf)`` — 8-bit-depth, non-interlaced PNG: color types 0
  (gray), 2 (RGB), 3 (palette), 4 (gray+alpha), 6 (RGBA); all five
  scanline filters (None/Sub/Up/Average/Paeth); CRCs are not verified
  (crawl payloads are ragged; zlib itself checksums the pixel data).
  Output is always (h, w, 3) uint8 RGB (alpha dropped, gray/palette
  expanded). Adam7 interlace and bit depths != 8 raise
  ``NotImplementedError`` — declared, not silently wrong.
* ``encode_png(px)`` — minimal deterministic encoder (filter 0 rows, one
  IDAT, fixed zlib level): lets tests synthesize real PNG bytes.

Like core/jpeg.py this is scalar work executed inside the Arrow batch UDF
(operators/multimodal.extract_features); the Spark plumbing is unchanged.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _unfilter(raw: bytes, h: int, w: int, ch: int) -> np.ndarray:
    """Filtered scanlines -> (h, w*ch) uint8 recon array."""
    stride = w * ch
    if len(raw) < h * (stride + 1):
        raise ValueError("truncated PNG pixel data")
    recon = np.zeros((h, stride), dtype=np.uint8)
    pos = 0
    for y in range(h):
        ftype = raw[pos]
        line = np.frombuffer(raw, np.uint8, stride, pos + 1).astype(np.int32)
        pos += stride + 1
        prev = recon[y - 1].astype(np.int32) if y else np.zeros(stride, np.int32)
        if ftype == 0:                                   # None
            out = line
        elif ftype == 2:                                 # Up
            out = line + prev
        elif ftype == 1:                                 # Sub
            out = line.copy()
            for x in range(ch, stride):
                out[x] = (out[x] + out[x - ch]) & 0xFF
        elif ftype == 3:                                 # Average
            out = line.copy()
            for x in range(stride):
                left = out[x - ch] if x >= ch else 0
                out[x] = (out[x] + ((left + prev[x]) >> 1)) & 0xFF
        elif ftype == 4:                                 # Paeth
            out = line.copy()
            for x in range(stride):
                left = int(out[x - ch]) if x >= ch else 0
                ul = int(prev[x - ch]) if x >= ch else 0
                out[x] = (out[x] + _paeth(left, int(prev[x]), ul)) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
        recon[y] = out & 0xFF
    return recon


def decode_png(buf: bytes) -> np.ndarray:
    """PNG bytes -> (h, w, 3) uint8 RGB."""
    if buf[:8] != _SIG:
        raise ValueError("not a PNG payload")
    i = 8
    ihdr = None
    palette = None
    idat = bytearray()
    while i + 8 <= len(buf):
        (length,), ctype = struct.unpack(">I", buf[i:i + 4]), buf[i + 4:i + 8]
        data = buf[i + 8:i + 8 + length]
        i += 12 + length                      # length + type + data + crc
        if ctype == b"IHDR":
            w, h, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", data)
            if depth != 8:
                raise NotImplementedError(f"PNG bit depth {depth} (only 8)")
            if interlace != 0:
                raise NotImplementedError("Adam7-interlaced PNG")
            if comp != 0 or filt != 0 or color not in _CHANNELS:
                raise ValueError("invalid IHDR")
            ihdr = (w, h, color)
        elif ctype == b"PLTE":
            palette = np.frombuffer(data, np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, color = ihdr
    ch = _CHANNELS[color]
    recon = _unfilter(zlib.decompress(bytes(idat)), h, w, ch)
    px = recon.reshape(h, w, ch)
    if color == 0:                                       # gray
        return np.repeat(px, 3, axis=2)
    if color == 2:                                       # RGB
        return px.copy()
    if color == 3:                                       # palette
        if palette is None:
            raise ValueError("paletted PNG missing PLTE")
        return palette[px[:, :, 0]]
    if color == 4:                                       # gray + alpha
        return np.repeat(px[:, :, :1], 3, axis=2)
    return px[:, :, :3].copy()                           # RGBA -> RGB


def encode_png(px: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB or (h, w) gray -> non-interlaced 8-bit PNG,
    filter 0 everywhere, one IDAT. Deterministic."""
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, ch = px.shape
    color = {1: 0, 3: 2}.get(ch)
    if color is None:
        raise ValueError("encode_png takes gray or RGB input")
    raw = bytearray()
    for y in range(h):
        raw.append(0)
        raw += px[y].astype(np.uint8).tobytes()

    def chunk(ctype: bytes, data: bytes) -> bytes:
        body = ctype + data
        return (struct.pack(">I", len(data)) + body
                + struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (_SIG + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(raw), 6))
            + chunk(b"IEND", b""))

"""Pure-NumPy + stdlib-zlib PNG codec (RFC 2083 / ISO 15948).

PNG's only compression primitive is DEFLATE, which Python's stdlib
`zlib` provides everywhere — so unlike JPEG there is no codec-library
gap to stub: chunk parsing, CRC validation, scanline filters
(None/Sub/Up/Average/Paeth) and the color layouts are implemented here
directly.

Scope: 8-bit greyscale (0), truecolor (2), indexed/palette (3),
greyscale+alpha (4) and RGBA (6), non-interlaced. 16-bit and Adam7
interlacing raise NotImplementedError loudly. Encoding writes 8-bit
grey/RGB/RGBA with per-row adaptive filtering (minimum-sum-of-absolutes
heuristic, the standard approach).

PNG is lossless, so tests pin EXACT roundtrips — including payloads
crafted to exercise every filter type — and CRC corruption fails
loudly. Reference parity note: the reference reads imagery via GDAL
(SDS_preprocess.py); this engine's media layer decodes binary columns
with its own codecs (operators/multimodal.py).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    p = a.astype(np.int32) + b.astype(np.int32) - c.astype(np.int32)
    pa = np.abs(p - a)
    pb = np.abs(p - b)
    pc = np.abs(p - c)
    out = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
    return out.astype(np.uint8)


def encode_png(img: np.ndarray) -> bytes:
    """Encode (h, w) grey, (h, w, 3) RGB or (h, w, 4) RGBA uint8 as an
    8-bit non-interlaced PNG with per-row adaptive filtering."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, c = img.shape
    ctype = {1: 0, 3: 2, 4: 6}.get(c)
    if ctype is None:
        raise NotImplementedError(f"{c}-channel PNG encode (1, 3 or 4)")
    bpp = c  # bytes per pixel at 8-bit depth
    raw = img.reshape(h, w * c)
    prev = np.zeros(w * c, dtype=np.uint8)
    out_rows = []
    for yrow in raw:
        left = np.concatenate([np.zeros(bpp, np.uint8), yrow[:-bpp]])
        upleft = np.concatenate([np.zeros(bpp, np.uint8), prev[:-bpp]])
        cands = {
            0: yrow,
            1: yrow - left,
            2: yrow - prev,
            3: yrow - ((left.astype(np.uint16) + prev.astype(np.uint16)) // 2).astype(np.uint8),
            4: yrow - _paeth(left, prev, upleft),
        }
        # minimum sum of absolute (signed) filtered bytes — the standard
        # adaptive heuristic from the spec's recommendations
        best = min(
            cands, key=lambda k: int(np.abs(cands[k].astype(np.int8).astype(np.int32)).sum())
        )
        out_rows.append(bytes([best]) + cands[best].tobytes())
        prev = yrow
    idat = zlib.compress(b"".join(out_rows), 6)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return _SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def decode_png(payload: bytes) -> np.ndarray:
    """Decode an 8-bit non-interlaced PNG to (h, w) or (h, w, c) uint8.
    Validates chunk CRCs; raises NotImplementedError for 16-bit or Adam7
    streams, ValueError for corrupt ones."""
    if payload[:8] != _SIG:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    w = h = depth = ctype = interlace = None
    palette = None
    trns = None
    idat = bytearray()
    while pos + 8 <= len(payload):
        ln = struct.unpack_from(">I", payload, pos)[0]
        cid = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + ln]
        crc = struct.unpack_from(">I", payload, pos + 8 + ln)[0]
        if zlib.crc32(cid + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {cid!r} CRC mismatch")
        pos += 12 + ln
        if cid == b"IHDR":
            w, h, depth, ctype, _comp, _filt, interlace = struct.unpack(">IIBBBBB", data)
            if depth != 8:
                raise NotImplementedError(f"{depth}-bit PNG (8-bit only)")
            if interlace != 0:
                raise NotImplementedError("Adam7 interlaced PNG")
        elif cid == b"PLTE":
            palette = np.frombuffer(data, np.uint8).reshape(-1, 3)
        elif cid == b"tRNS":
            trns = np.frombuffer(data, np.uint8)
        elif cid == b"IDAT":
            idat += data
        elif cid == b"IEND":
            break
    if w is None:
        raise ValueError("PNG has no IHDR")
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(ctype)
    if channels is None:
        raise NotImplementedError(f"PNG color type {ctype}")
    bpp = channels
    stride = w * channels
    raw = zlib.decompress(bytes(idat))
    if len(raw) != h * (1 + stride):
        raise ValueError("PNG scanline data has wrong length")
    arr = np.frombuffer(raw, np.uint8).reshape(h, 1 + stride)
    ftypes = arr[:, 0]
    rows = arr[:, 1:]
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for i in range(h):
        f = ftypes[i]
        r = rows[i].copy()
        if f == 0:
            pass
        elif f == 2:  # Up
            r += prev
        elif f in (1, 3, 4):  # Sub / Average / Paeth need left -> serial in x
            if f == 1:
                for x in range(bpp, stride):
                    r[x] = (int(r[x]) + int(r[x - bpp])) & 0xFF
            elif f == 3:
                for x in range(stride):
                    left = int(r[x - bpp]) if x >= bpp else 0
                    r[x] = (int(r[x]) + (left + int(prev[x])) // 2) & 0xFF
            else:
                for x in range(stride):
                    a = int(r[x - bpp]) if x >= bpp else 0
                    b = int(prev[x])
                    cc = int(prev[x - bpp]) if x >= bpp else 0
                    p = a + b - cc
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
                    r[x] = (int(r[x]) + pred) & 0xFF
        else:
            raise ValueError(f"PNG filter type {f}")
        out[i] = r
        prev = r
    img = out.reshape(h, w, channels)
    if ctype == 3:  # palette lookup
        if palette is None:
            raise ValueError("indexed PNG without PLTE")
        rgb = palette[img[:, :, 0]]
        if trns is not None:
            a = np.full((h, w, 1), 255, np.uint8)
            idx = img[:, :, 0]
            mask = idx < len(trns)
            a[mask, 0] = trns[idx[mask]]
            return np.concatenate([rgb, a], axis=-1)
        return rgb
    return img[:, :, 0] if channels == 1 else img

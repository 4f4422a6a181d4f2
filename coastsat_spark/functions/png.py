"""Pure-NumPy + stdlib-zlib PNG codec (RFC 2083 / ISO 15948).

PNG's only compression primitive is DEFLATE, which Python's stdlib
`zlib` provides everywhere — so unlike JPEG there is no codec-library
gap to stub: chunk parsing, CRC validation, scanline filters
(None/Sub/Up/Average/Paeth), Adam7 deinterlacing and the color layouts
are implemented here directly.

Scope — decode: bit depths 1/2/4/8/16; greyscale (0), truecolor (2),
indexed/palette (3), greyscale+alpha (4) and RGBA (6); interlace
methods 0 (none) and 1 (Adam7). Sub-8-bit greyscale is expanded to the
full 8-bit range (the standard left-bit-replication-equivalent scaling
for depths whose max divides 255); 16-bit decodes to uint16.
Encode: 8-bit (uint8 input) and 16-bit (uint16 input) grey/RGB/RGBA,
non-interlaced or Adam7, with per-row adaptive filtering
(minimum-sum-of-absolutes heuristic, the standard approach).

PNG is lossless, so tests pin EXACT roundtrips — including payloads
crafted to exercise every filter type and every Adam7 pass geometry —
and CRC corruption fails loudly. Reference parity note: the reference
reads imagery via GDAL (SDS_preprocess.py); this engine's media layer
decodes binary columns with its own codecs (operators/multimodal.py).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

from ._guard import check_dims

_SIG = b"\x89PNG\r\n\x1a\n"

# Adam7 pass geometry: (x_start, y_start, x_step, y_step), spec order.
_ADAM7 = (
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
)

_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


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


def _filter_rows(raw: np.ndarray, bpp: int) -> bytes:
    """Adaptively filter (h, stride) uint8 rows; returns the scanline
    stream (filter byte + filtered payload per row). `prev` starts at
    zero, so each Adam7 pass filters independently per the spec."""
    h, stride = raw.shape
    prev = np.zeros(stride, dtype=np.uint8)
    out_rows = []
    for yrow in raw:
        left = np.concatenate([np.zeros(bpp, np.uint8), yrow[:-bpp]]) if stride > bpp else np.zeros(stride, np.uint8)
        upleft = np.concatenate([np.zeros(bpp, np.uint8), prev[:-bpp]]) if stride > bpp else np.zeros(stride, np.uint8)
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
    return b"".join(out_rows)


def _unfilter_rows(seg: np.ndarray, h: int, stride: int, bpp: int) -> np.ndarray:
    """Reverse scanline filtering over one (sub)image: `seg` is the flat
    uint8 stream of h rows of (1 filter byte + stride bytes)."""
    arr = seg.reshape(h, 1 + stride)
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
    return out


def _rows_to_samples(rows: np.ndarray, w: int, channels: int, depth: int) -> np.ndarray:
    """Unpack (h, stride) defiltered bytes into (h, w, channels) samples
    (uint8 for depth<=8 — sub-8-bit values NOT yet scaled — uint16 for 16)."""
    h = rows.shape[0]
    if depth == 8:
        return rows[:, : w * channels].reshape(h, w, channels)
    if depth == 16:
        u16 = rows[:, : w * channels * 2].reshape(h, -1).view(">u2").astype(np.uint16)
        return u16.reshape(h, w, channels)
    # 1 / 2 / 4-bit: single-channel only (grey or palette index) per spec
    bits = np.unpackbits(rows, axis=1)[:, : w * depth].reshape(h, w, depth)
    weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.uint8)
    vals = (bits * weights).sum(-1).astype(np.uint8)
    return vals[:, :, None]


def _pack_rows(img: np.ndarray, depth: int) -> np.ndarray:
    """(h, w, c) uint8/uint16 -> (h, stride) big-endian bytes for encode."""
    h, w, c = img.shape
    if depth == 8:
        return img.reshape(h, w * c).astype(np.uint8)
    return np.ascontiguousarray(img.astype(">u2")).reshape(h, -1).view(np.uint8)


def _pass_geometry(w: int, h: int, interlace: int):
    """Yield (x0, y0, dx, dy, pw, ph) for each non-empty (sub)image."""
    if interlace == 0:
        yield (0, 0, 1, 1, w, h)
        return
    for x0, y0, dx, dy in _ADAM7:
        pw = (w - x0 + dx - 1) // dx
        ph = (h - y0 + dy - 1) // dy
        if pw > 0 and ph > 0:
            yield (x0, y0, dx, dy, pw, ph)


def encode_png(img: np.ndarray, interlace: bool = False) -> bytes:
    """Encode (h, w) grey, (h, w, 2) grey+alpha, (h, w, 3) RGB or
    (h, w, 4) RGBA as PNG with per-row adaptive filtering. uint8 input
    writes bit depth 8; uint16 writes 16 (big-endian samples).
    `interlace=True` writes Adam7."""
    img = np.asarray(img)
    if img.dtype == np.uint16:
        depth = 16
    else:
        img = img.astype(np.uint8)
        depth = 8
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, c = img.shape
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}.get(c)
    if ctype is None:
        raise NotImplementedError(f"{c}-channel PNG encode (1, 2, 3 or 4)")
    bpp = c * depth // 8
    stream = bytearray()
    for x0, y0, dx, dy, pw, ph in _pass_geometry(w, h, 1 if interlace else 0):
        sub = img[y0::dy, x0::dx]
        stream += _filter_rows(_pack_rows(sub, depth), bpp)
    idat = zlib.compress(bytes(stream), 6)
    ihdr = struct.pack(">IIBBBBB", w, h, depth, ctype, 0, 0, 1 if interlace else 0)
    return _SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def decode_png(payload: bytes) -> np.ndarray:
    """Decode a PNG to (h, w) or (h, w, c) uint8 (depths 1-8) or uint16
    (depth 16). Handles Adam7 interlacing; validates chunk CRCs; raises
    ValueError for corrupt streams."""
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
            if depth not in (1, 2, 4, 8, 16):
                raise ValueError(f"PNG bit depth {depth}")
            if interlace not in (0, 1):
                raise ValueError(f"PNG interlace method {interlace}")
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
    check_dims(w, h, "PNG IHDR")
    channels = _CHANNELS.get(ctype)
    if channels is None:
        raise NotImplementedError(f"PNG color type {ctype}")
    if depth < 8 and ctype not in (0, 3):
        raise ValueError(f"PNG depth {depth} invalid for color type {ctype}")
    if depth == 16 and ctype == 3:
        raise ValueError("PNG 16-bit palette is invalid")
    bpp = max(1, channels * depth // 8)
    # Bound the inflate by the size the declared geometry can consume:
    # zlib expands up to ~1000x, so an unbounded decompress of a hostile
    # IDAT is a memory bomb the dimension guard can't see. Anything past
    # `expected` is a wrong-length error anyway — detect it one byte in.
    expected = sum(
        ph * (1 + (pw * channels * depth + 7) // 8)
        for _, _, _, _, pw, ph in _pass_geometry(w, h, interlace)
    )
    d = zlib.decompressobj()
    raw = d.decompress(bytes(idat), expected + 1)
    flat = np.frombuffer(raw, np.uint8)
    dtype = np.uint16 if depth == 16 else np.uint8
    img = np.zeros((h, w, channels), dtype=dtype)
    off = 0
    for x0, y0, dx, dy, pw, ph in _pass_geometry(w, h, interlace):
        stride = (pw * channels * depth + 7) // 8
        need = ph * (1 + stride)
        if off + need > len(flat):
            raise ValueError("PNG scanline data has wrong length")
        rows = _unfilter_rows(flat[off : off + need], ph, stride, bpp)
        off += need
        img[y0::dy, x0::dx] = _rows_to_samples(rows, pw, channels, depth)
    if off != len(flat):
        raise ValueError("PNG scanline data has wrong length")
    if ctype == 3:  # palette lookup
        if palette is None:
            raise ValueError("indexed PNG without PLTE")
        idx = img[:, :, 0]
        if int(idx.max(initial=0)) >= len(palette):
            raise ValueError("PNG palette index out of range")
        rgb = palette[idx]
        if trns is not None:
            a = np.full((h, w, 1), 255, np.uint8)
            mask = idx < len(trns)
            a[mask, 0] = trns[idx[mask]]
            return np.concatenate([rgb, a], axis=-1)
        return rgb
    if ctype == 0 and depth < 8:
        # expand to full 8-bit range: max sample maps to 255 exactly
        # (255 is divisible by 1, 3 and 15, so this equals bit replication)
        img = (img.astype(np.uint16) * (255 // ((1 << depth) - 1))).astype(np.uint8)
    return img[:, :, 0] if channels == 1 else img

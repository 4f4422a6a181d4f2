"""Pure-Python/NumPy GIF codec (GIF87a/GIF89a, W3C/CompuServe spec).

GIF's only compression primitive is its LZW variant (LSB-first bit
packing, variable 3..12-bit code widths, clear/EOI codes, NO
early-change — the opposite bit order of TIFF's LZW in tiff.py), which
needs no external library — so like PNG this codec is real, not a stub.

Scope — decode: global + local color tables, non-interlaced and
interlaced (4-pass) frames, multi-frame animations composited onto the
logical screen honoring disposal methods 0/1 (leave) and 2 (restore to
background) and GCE transparency; returns all frames as (n, h, w, 3)
uint8 plus per-frame delays. Encode: lossless paletted frames (index
arrays + one global palette), optional interlace, per-frame delays,
optional transparent index. Round-trips are exact by construction and
pinned by tests.

Hostile-input hardening matches the other codecs: declared screen and
frame dimensions hit `check_dims` BEFORE any allocation, every frame's
LZW expansion stops at its declared pixel count (a tiny payload cannot
expand past w*h indexes), sub-block walks are bounds-checked, and the
mutation-fuzz suite (tests/test_codec_fuzz.py) pins that truncation or
byte flips anywhere always surface as a clean Exception.

Reference parity note: the reference reads imagery via GDAL
(SDS_preprocess.py); this engine's media layer decodes binary columns
with its own codecs (operators/multimodal.py).
"""

from __future__ import annotations

import struct

import numpy as np

from ._guard import check_dims

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))  # (row_start, row_step)


# ------------------------------------------------------------------ LZW

def _lzw_decode(data: bytes, min_code_size: int, max_pixels: int) -> bytes:
    """GIF LZW: LSB-first codes, widths (min_code_size+1)..12, dictionary
    reset on CLEAR. Output is hard-capped at `max_pixels` so hostile
    streams cannot out-expand the declared frame geometry."""
    if not 2 <= min_code_size <= 11:
        raise ValueError(f"GIF: bad LZW minimum code size {min_code_size}")
    clear = 1 << min_code_size
    eoi = clear + 1
    width = min_code_size + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    out = bytearray()
    prev: bytes | None = None
    acc = 0
    nbits = 0
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            if code == clear:
                table = [bytes([i]) for i in range(clear)] + [b"", b""]
                width = min_code_size + 1
                prev = None
                continue
            if code == eoi:
                return bytes(out)
            if prev is None:
                if code >= len(table):
                    raise ValueError("GIF: first LZW code out of range")
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                if len(table) < 4096:  # deferred-clear streams: table freezes when full
                    table.append(prev + entry[:1])
            elif code == len(table) and len(table) < 4096:  # KwKwK
                entry = prev + prev[:1]
                table.append(entry)
            else:
                raise ValueError("GIF: LZW code out of range")
            out += entry
            if len(out) >= max_pixels:
                return bytes(out[:max_pixels])
            prev = entry
            if len(table) == (1 << width) and width < 12:
                width += 1
    return bytes(out)


def _lzw_encode(indexes: bytes, min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    width = min_code_size + 1
    table = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    acc = 0
    nbits = 0
    out = bytearray()

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear)
    run = b""
    for b in indexes:
        nxt = run + bytes([b])
        if nxt in table:
            run = nxt
            continue
        emit(table[run])
        table[nxt] = next_code
        next_code += 1
        if next_code == (1 << width) + 1 and width < 12:
            width += 1
        if next_code == 4097:  # table full: reset
            emit(clear)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        run = bytes([b])
    if run:
        emit(table[run])
    emit(eoi)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _subblocks(data: bytes) -> bytes:
    return b"".join(
        bytes([len(data[i : i + 255])]) + data[i : i + 255]
        for i in range(0, len(data), 255)
    ) + b"\x00"


def _read_subblocks(buf: bytes, pos: int) -> tuple[bytes, int]:
    parts = []
    while True:
        if pos >= len(buf):
            raise ValueError("GIF: truncated sub-block stream")
        n = buf[pos]
        pos += 1
        if n == 0:
            return b"".join(parts), pos
        if pos + n > len(buf):
            raise ValueError("GIF: truncated sub-block")
        parts.append(buf[pos : pos + n])
        pos += n


# ---------------------------------------------------------------- encode

def encode_gif(
    index_frames: np.ndarray,
    palette: np.ndarray,
    delays_cs: "list[int] | None" = None,
    interlace: bool = False,
    transparent: "int | None" = None,
    disposal: int = 0,
) -> bytes:
    """Encode paletted frames losslessly: `index_frames` is (n, h, w) or
    (h, w) uint8 palette indexes, `palette` is (k, 3) uint8 with k <= 256.
    Animations get one GCE per frame (delay in centiseconds, optional
    transparent index, disposal method)."""
    f = np.asarray(index_frames, dtype=np.uint8)
    if f.ndim == 2:
        f = f[None]
    n, h, w = f.shape
    pal = np.asarray(palette, dtype=np.uint8)
    if pal.ndim != 2 or pal.shape[1] != 3 or not 1 <= len(pal) <= 256:
        raise ValueError("palette must be (k<=256, 3) uint8")
    if int(f.max(initial=0)) >= len(pal):
        raise ValueError("frame index exceeds palette size")
    depth = max(2, int(len(pal) - 1).bit_length())  # GCT size >= 4 entries
    gct = np.zeros((1 << depth, 3), dtype=np.uint8)
    gct[: len(pal)] = pal
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | ((depth - 1) << 4) | (depth - 1), 0, 0)
    out += gct.tobytes()
    delays = delays_cs or [0] * n
    for i in range(n):
        if n > 1 or transparent is not None:
            flags = (disposal & 7) << 2 | (1 if transparent is not None else 0)
            out += struct.pack(
                "<BBBBHBB", 0x21, 0xF9, 4, flags, delays[i],
                transparent or 0, 0,
            )
        out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0x40 if interlace else 0)
        idx = f[i]
        if interlace:
            rows = [r for start, step in _INTERLACE_PASSES for r in range(start, h, step)]
            idx = idx[rows]
        out.append(depth)
        out += _subblocks(_lzw_encode(idx.tobytes(), depth))
    out.append(0x3B)
    return bytes(out)


# ---------------------------------------------------------------- decode

def decode_gif(payload: bytes) -> tuple[np.ndarray, list[int]]:
    """Decode to ((n_frames, h, w, 3) uint8, per-frame delay in cs):
    frames are composited onto the logical screen in order, honoring
    disposal 0/1 (leave) and 2 (restore region to background) and GCE
    transparency. Raises ValueError/struct.error on malformed input,
    NotImplementedError on spec corners outside scope (disposal 3)."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    w, h, flags, bg, _ = struct.unpack_from("<HHBBB", payload, 6)
    check_dims(w, h, "GIF logical screen")
    pos = 13
    gct = None
    if flags & 0x80:
        k = 2 << (flags & 7)
        gct = np.frombuffer(payload, np.uint8, k * 3, pos).reshape(k, 3)
        pos += k * 3
    bg_rgb = gct[bg] if gct is not None and bg < len(gct) else np.zeros(3, np.uint8)
    canvas = np.broadcast_to(bg_rgb, (h, w, 3)).copy()
    frames: list[np.ndarray] = []
    delays: list[int] = []
    transparent: "int | None" = None
    disposal = 0
    delay = 0
    max_frames = 4096
    while True:
        if pos >= len(payload):
            raise ValueError("GIF: missing trailer")
        block = payload[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            if pos >= len(payload):
                raise ValueError("GIF: truncated extension")
            label = payload[pos]
            pos += 1
            data, pos = _read_subblocks(payload, pos)
            if label == 0xF9 and len(data) >= 4:
                gflags, delay = data[0], int.from_bytes(data[1:3], "little")
                disposal = (gflags >> 2) & 7
                transparent = data[3] if gflags & 1 else None
                if disposal == 3:
                    raise NotImplementedError("GIF disposal 3 (restore-previous)")
            continue
        if block != 0x2C:
            raise ValueError(f"GIF: unknown block 0x{block:02x}")
        if len(frames) >= max_frames:
            raise ValueError("GIF: too many frames")
        left, top, fw, fh, iflags = struct.unpack_from("<HHHHB", payload, pos)
        pos += 9
        check_dims(fw, fh, "GIF frame")
        if left + fw > w or top + fh > h:
            raise ValueError("GIF: frame exceeds logical screen")
        table = gct
        if iflags & 0x80:
            k = 2 << (iflags & 7)
            if pos + k * 3 > len(payload):
                raise ValueError("GIF: truncated local color table")
            table = np.frombuffer(payload, np.uint8, k * 3, pos).reshape(k, 3)
            pos += k * 3
        if table is None:
            raise ValueError("GIF: frame without any color table")
        if pos >= len(payload):
            raise ValueError("GIF: truncated image data")
        mcs = payload[pos]
        pos += 1
        data, pos = _read_subblocks(payload, pos)
        raw = _lzw_decode(data, mcs, fw * fh)
        if len(raw) < fw * fh:
            raise ValueError("GIF: LZW stream shorter than frame")
        idx = np.frombuffer(raw, np.uint8).reshape(fh, fw)
        if iflags & 0x40:  # deinterlace
            rows = [r for start, step in _INTERLACE_PASSES for r in range(start, fh, step)]
            de = np.empty_like(idx)
            de[rows] = idx
            idx = de
        if int(idx.max(initial=0)) >= len(table):
            raise ValueError("GIF: palette index out of range")
        region = canvas[top : top + fh, left : left + fw]
        rgb = table[idx]
        if transparent is not None:
            keep = idx == transparent
            rgb = np.where(keep[:, :, None], region, rgb)
        canvas[top : top + fh, left : left + fw] = rgb
        # total-output bound: every frame materializes a full logical-screen
        # copy, so a small file declaring a huge screen + many tiny frames
        # would otherwise multiply past the per-image cap (decode_avi's
        # frames= guard, applied cumulatively here)
        check_dims(w, h, "GIF animation", frames=len(frames) + 1)
        frames.append(canvas.copy())
        delays.append(delay)
        if disposal == 2:
            canvas[top : top + fh, left : left + fw] = bg_rgb
        transparent = None
        disposal = 0
        delay = 0
    if not frames:
        raise ValueError("GIF: no frames")
    return np.stack(frames), delays

"""Pure-NumPy + stdlib TIFF / GeoTIFF codec (TIFF 6.0 + OGC GeoTIFF).

GeoTIFF is the reference's actual ingest format: CoastSat downloads
Landsat/Sentinel scenes as multi-band uint16 `.tif` band stacks and
reads them through GDAL (SDS_preprocess.py:66-200 `preprocess_single`,
SDS_download.py:903-964 warp).  This engine's media layer decodes
binary columns with its own codecs, so the band-stack ingest path can
run on real file bytes without GDAL in the environment.

Scope (decode):
  - classic TIFF (magic 42), little- ("II") and big-endian ("MM");
  - first IFD; strip (273/278/279) and tile (322-325) layouts;
  - compression 1 (none), 5 (LZW, TIFF MSB-first early-change variant),
    8 / 32946 (Deflate via stdlib zlib), 32773 (PackBits);
  - predictor 2 (horizontal differencing, any integer depth);
  - BitsPerSample 8/16/32/64 with SampleFormat uint/int/float;
  - SamplesPerPixel >= 1, PlanarConfiguration 1 (chunky) and 2 (planar);
  - GeoTIFF georeferencing: ModelPixelScale (33550) + ModelTiepoint
    (33922) or ModelTransformation (34264), GeoKeyDirectory (34735)
    EPSG extraction, GeoAsciiParams (34737).
BigTIFF (magic 43: 16-byte header, u64 offsets, 20-byte IFD entries,
LONG8/SLONG8/IFD8 types) decodes and encodes (opt-in `bigtiff=True`)
with the same tag semantics.  Predictor 3 (floating-point
differencing) and exotic photometrics (YCbCr / CMYK / CIELab) raise
NotImplementedError loudly.

Encode writes chunky strips or tiles with any of the four compressions,
optional predictor 2, and the GeoTIFF tags from a GDAL-style
geotransform + EPSG code.  TIFF is lossless, so tests pin EXACT
roundtrips across dtype x compression x layout x endianness.
"""

from __future__ import annotations

import struct
import zlib

from ._guard import check_dims

import numpy as np

# ------------------------------------------------------------------ LZW
# TIFF 6.0 section 13 variant: MSB-first bit packing, ClearCode=256,
# EOI=257, first dynamic code 258, 9->12 bit codes with the "early
# change" width switch (the libtiff convention: width bumps when the
# NEXT entry to be assigned is (1<<bits)-1).

_CLEAR, _EOI = 256, 257


def lzw_encode(data: bytes) -> bytes:
    out = bytearray()
    bitbuf = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal bitbuf, nbits
        bitbuf = (bitbuf << width) | code
        nbits += width
        while nbits >= 8:
            nbits -= 8
            out.append((bitbuf >> nbits) & 0xFF)

    table: dict[tuple[int, int], int] = {}
    next_code, bits = 258, 9
    emit(_CLEAR, bits)
    prev = -1
    for byte in data:
        if prev < 0:
            prev = byte
            continue
        key = (prev, byte)
        code = table.get(key)
        if code is not None:
            prev = code
            continue
        emit(prev, bits)
        table[key] = next_code
        next_code += 1
        # early change: widen as soon as the next assignment would be
        # the all-ones code at the current width
        if next_code == (1 << bits) - 1 and bits < 12:
            bits += 1
        prev = byte
        if next_code >= 4094:
            emit(prev, bits)
            emit(_CLEAR, bits)
            table.clear()
            next_code, bits = 258, 9
            prev = -1
    if prev >= 0:
        emit(prev, bits)
    emit(_EOI, bits)
    if nbits:
        out.append((bitbuf << (8 - nbits)) & 0xFF)
    return bytes(out)


def lzw_decode(data: bytes, expected: int | None = None) -> bytes:
    out = bytearray()
    table: list[bytes] = []

    def reset() -> int:
        table.clear()
        table.extend(bytes([i]) for i in range(256))
        table.append(b"")  # 256 Clear
        table.append(b"")  # 257 EOI
        return 9

    bits = reset()
    bitbuf = 0
    nbits = 0
    pos = 0
    old: bytes | None = None
    n = len(data)
    while True:
        while nbits < bits:
            if pos >= n:
                return bytes(out)  # truncated stream without EOI: tolerate
            bitbuf = (bitbuf << 8) | data[pos]
            pos += 1
            nbits += 8
        nbits -= bits
        code = (bitbuf >> nbits) & ((1 << bits) - 1)
        if code == _EOI:
            break
        if code == _CLEAR:
            bits = reset()
            old = None
            continue
        if old is None:
            if code >= len(table):
                raise ValueError("LZW: first code after Clear out of range")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(old + entry[:1])
        elif code == len(table):
            entry = old + old[:1]
            table.append(entry)
        else:
            raise ValueError(f"LZW: code {code} beyond table size {len(table)}")
        out += entry
        old = entry
        # early change, decoder side: the decoder's table is one entry
        # behind the encoder's (it learns old+entry[0] only on the NEXT
        # code), so it must widen when its next free slot is
        # (1<<bits)-2 — exactly when the encoder's next_code hits
        # (1<<bits)-1 and the encoder starts writing wider codes.
        if len(table) == (1 << bits) - 2 and bits < 12:
            bits += 1
        if expected is not None and len(out) >= expected:
            break
    return bytes(out)


# ------------------------------------------------------------- PackBits


def packbits_encode(data: bytes) -> bytes:
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        run = 1
        while i + run < n and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 2:
            out.append(257 - run)
            out.append(data[i])
            i += run
            continue
        lit = i
        while i < n and i - lit < 128:
            if i + 2 < n and data[i] == data[i + 1] == data[i + 2]:
                break
            i += 1
        out.append(i - lit - 1)
        out += data[lit:i]
    return bytes(out)


def packbits_decode(data: bytes, expected: int | None = None) -> bytes:
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        h = data[i]
        i += 1
        if h < 128:
            out += data[i : i + h + 1]
            i += h + 1
        elif h > 128:
            out += bytes([data[i]]) * (257 - h)
            i += 1
        # 128: no-op
        if expected is not None and len(out) >= expected:
            break  # runs expand 128x: stop a hostile stream at the
            # segment's geometric size instead of 128x the file size
    return bytes(out)


# ------------------------------------------------------------ TIFF core

_TYPE_SIZE = {
    1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4, 10: 8, 11: 4, 12: 8,
    16: 8, 17: 8, 18: 8,  # BigTIFF LONG8 / SLONG8 / IFD8
}
_TYPE_NP = {
    1: "u1", 3: "u2", 4: "u4", 6: "i1", 8: "i2", 9: "i4", 11: "f4", 12: "f8",
    16: "u8", 17: "i8", 18: "u8",
}

_COMP_NONE, _COMP_LZW, _COMP_DEFLATE_ADOBE, _COMP_PACKBITS, _COMP_DEFLATE = 1, 5, 8, 32773, 32946
_COMP_BY_NAME = {
    "none": _COMP_NONE,
    "lzw": _COMP_LZW,
    "deflate": _COMP_DEFLATE_ADOBE,
    "packbits": _COMP_PACKBITS,
}

_SF_UINT, _SF_INT, _SF_FLOAT = 1, 2, 3
_DTYPE_SF = {
    "u1": (8, _SF_UINT), "u2": (16, _SF_UINT), "u4": (32, _SF_UINT),
    "i1": (8, _SF_INT), "i2": (16, _SF_INT), "i4": (32, _SF_INT),
    "f4": (32, _SF_FLOAT), "f8": (64, _SF_FLOAT),
}
_SF_DTYPE = {v: k for k, v in _DTYPE_SF.items()}


def _read_tags(payload: bytes) -> tuple[str, dict[int, np.ndarray]]:
    if payload[:2] == b"II":
        bo = "<"
    elif payload[:2] == b"MM":
        bo = ">"
    else:
        raise ValueError("not a TIFF (bad byte-order mark)")
    magic = struct.unpack_from(bo + "H", payload, 2)[0]
    if magic == 43:
        # BigTIFF: 16-byte header (offset size 8, pad 0, u64 IFD
        # offset); 20-byte IFD entries with u64 counts, 8-byte inline
        # values, u64 overflow offsets.
        osize, pad = struct.unpack_from(bo + "HH", payload, 4)
        if osize != 8 or pad != 0:
            raise ValueError(f"BigTIFF header (offset size {osize}, pad {pad})")
        ifd_off = struct.unpack_from(bo + "Q", payload, 8)[0]
        n_entries = struct.unpack_from(bo + "Q", payload, ifd_off)[0]
        entry0, stride, inline = ifd_off + 8, 20, 8
    elif magic == 42:
        ifd_off = struct.unpack_from(bo + "I", payload, 4)[0]
        n_entries = struct.unpack_from(bo + "H", payload, ifd_off)[0]
        entry0, stride, inline = ifd_off + 2, 12, 4
    else:
        raise ValueError(f"not a TIFF (magic {magic})")
    tags: dict[int, np.ndarray] = {}
    for i in range(n_entries):
        off = entry0 + stride * i
        tag, typ = struct.unpack_from(bo + "HH", payload, off)
        count = struct.unpack_from(bo + ("Q" if inline == 8 else "I"), payload, off + 4)[0]
        size = _TYPE_SIZE.get(typ)
        if size is None:
            continue
        nbytes = size * count
        val_off = off + stride - inline
        src = (
            val_off
            if nbytes <= inline
            else struct.unpack_from(bo + ("Q" if inline == 8 else "I"), payload, val_off)[0]
        )
        if typ == 2:
            tags[tag] = np.frombuffer(payload, "S1", count, src)
        elif typ in (5, 10):  # RATIONAL: keep as float ratio
            raw = np.frombuffer(payload, bo + ("u4" if typ == 5 else "i4"), count * 2, src)
            tags[tag] = raw[0::2].astype(np.float64) / np.where(raw[1::2] == 0, 1, raw[1::2])
        else:
            tags[tag] = np.frombuffer(payload, bo + _TYPE_NP[typ], count, src)
    return bo, tags


def _unsigned_view(seg: np.ndarray) -> np.ndarray:
    """Same-byte-order unsigned reinterpretation (differencing is value
    arithmetic mod 2^bits — the byte order of the view must match the
    data's or multi-byte samples get swapped before the sum)."""
    bo = seg.dtype.byteorder
    return seg.view(np.dtype(("" if bo == "|" else bo) + f"u{seg.dtype.itemsize}"))


def _undiff(seg: np.ndarray) -> np.ndarray:
    """Invert predictor-2 horizontal differencing in place-compatible
    form: cumulative sum along x with native-width wraparound."""
    if seg.dtype.kind == "f":
        raise NotImplementedError("predictor 2 on float samples")
    u = _unsigned_view(seg)
    return np.cumsum(u, axis=1, dtype=u.dtype).astype(u.dtype).view(seg.dtype)


def _diff(seg: np.ndarray) -> np.ndarray:
    u = _unsigned_view(seg)
    out = u.copy()
    out[:, 1:] = u[:, 1:] - u[:, :-1]
    return out.view(seg.dtype)


def decode_geotiff(payload: bytes) -> tuple[np.ndarray, dict]:
    """Decode a TIFF/GeoTIFF payload to ((h, w, bands) array, meta).

    meta: {"transform": GDAL 6-tuple geotransform or None,
           "epsg": int or None, "ascii": str or None}.
    """
    bo, tags = _read_tags(payload)

    def tag1(t: int, default=None):
        v = tags.get(t)
        return default if v is None else int(v[0])

    w, h = tag1(256), tag1(257)
    if w is None or h is None:
        raise ValueError("TIFF missing ImageWidth/ImageLength")
    spp = tag1(277, 1)
    check_dims(w, h, "TIFF IFD", frames=spp)  # spp multiplies the buffer
    bps_arr = tags.get(258, np.array([8]))
    if len(set(int(b) for b in bps_arr)) != 1:
        raise NotImplementedError("heterogeneous BitsPerSample")
    bps = int(bps_arr[0])
    comp = tag1(259, _COMP_NONE)
    photometric = tag1(262, 1)
    if photometric in (5, 6, 8):
        raise NotImplementedError(f"photometric {photometric} (CMYK/YCbCr/CIELab)")
    planar = tag1(284, 1)
    predictor = tag1(317, 1)
    sf_arr = tags.get(339, np.array([_SF_UINT]))
    sf = int(sf_arr[0])
    dt_key = _SF_DTYPE.get((bps, sf))
    if dt_key is None:
        raise NotImplementedError(f"BitsPerSample={bps} SampleFormat={sf}")
    dtype = np.dtype(bo + dt_key)
    if predictor == 3:
        raise NotImplementedError("predictor 3 (floating-point differencing)")
    if predictor not in (1, 2):
        raise ValueError(f"predictor {predictor}")

    tiled = 322 in tags
    if tiled:
        tw, th = tag1(322), tag1(323)
        check_dims(tw, th, "TIFF tile")  # per-tile buffers use TILE dims
        offsets, counts = tags[324], tags[325]
    else:
        tw, th = w, tag1(278, h)
        offsets, counts = tags[273], tags[279]

    def decompress(raw: bytes, nbytes: int) -> bytes:
        if comp == _COMP_NONE:
            return raw
        if comp in (_COMP_DEFLATE_ADOBE, _COMP_DEFLATE):
            # bound the inflate by the segment's geometric size — zlib
            # expands ~1000x, so an unbounded decompress of a hostile
            # segment is a memory bomb; bytes past nbytes are ignored
            # by the consumer (frombuffer takes exactly nbytes) anyway
            return zlib.decompressobj().decompress(raw, nbytes)
        if comp == _COMP_LZW:
            return lzw_decode(raw, expected=nbytes)
        if comp == _COMP_PACKBITS:
            return packbits_decode(raw, expected=nbytes)
        raise NotImplementedError(f"TIFF compression {comp}")

    seg_bands = 1 if planar == 2 else spp
    out = np.zeros((h, w, spp), dtype=dtype.newbyteorder("="))
    n_x = -(-w // tw) if tiled else 1
    n_y = -(-h // th)
    segs_per_band = n_x * n_y
    itemsize = dtype.itemsize
    for si in range(len(offsets)):
        band0 = si // segs_per_band if planar == 2 else 0
        k = si % segs_per_band
        ty, tx = divmod(k, n_x)
        y0, x0 = ty * th, tx * tw
        rows = th if tiled else min(th, h - y0)
        cols = tw
        nbytes = rows * cols * seg_bands * itemsize
        raw = decompress(bytes(payload[int(offsets[si]) : int(offsets[si]) + int(counts[si])]), nbytes)
        if len(raw) < nbytes:
            raise ValueError(f"TIFF segment {si}: {len(raw)} bytes, expected {nbytes}")
        seg = np.frombuffer(raw, dtype, rows * cols * seg_bands).reshape(rows, cols * seg_bands)
        if predictor == 2:
            # differencing is per 16/8/32-bit sample with channel stride
            s3 = seg.reshape(rows, cols, seg_bands)
            seg = _undiff(s3.reshape(rows, cols * seg_bands).view(dtype)).reshape(rows, cols, seg_bands) \
                if seg_bands == 1 else np.stack(
                    [_undiff(s3[:, :, b]) for b in range(seg_bands)], axis=-1
                )
        else:
            seg = seg.reshape(rows, cols, seg_bands)
        vr = min(rows, h - y0)
        vc = min(cols, w - x0)
        if planar == 2:
            out[y0 : y0 + vr, x0 : x0 + vc, band0] = seg[:vr, :vc, 0]
        else:
            out[y0 : y0 + vr, x0 : x0 + vc, :] = seg[:vr, :vc, :]

    meta = {"transform": None, "epsg": None, "ascii": None}
    if 34264 in tags:
        m = tags[34264].astype(np.float64)
        meta["transform"] = (float(m[3]), float(m[0]), float(m[1]),
                             float(m[7]), float(m[4]), float(m[5]))
    elif 33550 in tags and 33922 in tags:
        sx, sy = float(tags[33550][0]), float(tags[33550][1])
        tp = tags[33922].astype(np.float64)
        i, j, x, y = tp[0], tp[1], tp[3], tp[4]
        meta["transform"] = (float(x - i * sx), sx, 0.0, float(y + j * sy), 0.0, -sy)
    if 34735 in tags:
        kd = tags[34735]
        nkeys = int(kd[3])
        for ki in range(nkeys):
            key_id, loc, _cnt, val = (int(v) for v in kd[4 + 4 * ki : 8 + 4 * ki])
            if key_id in (3072, 2048) and loc == 0:  # Projected / GeographicCSType
                meta["epsg"] = val
    if 34737 in tags:
        meta["ascii"] = tags[34737].tobytes().rstrip(b"\x00|").decode("ascii", "replace")
    return out, meta


def decode_tiff(payload: bytes) -> np.ndarray:
    """Decode a TIFF payload to (h, w, bands); georeferencing dropped."""
    return decode_geotiff(payload)[0]


# --------------------------------------------------------------- encode


def encode_geotiff(
    img: np.ndarray,
    transform: tuple[float, float, float, float, float, float] | None = None,
    epsg: int | None = None,
    compression: str = "deflate",
    predictor: bool = False,
    rows_per_strip: int | None = None,
    tile: tuple[int, int] | None = None,
    big_endian: bool = False,
    bigtiff: bool = False,
) -> bytes:
    """Encode (h, w) or (h, w, bands) as a chunky TIFF/GeoTIFF.

    transform: GDAL geotransform (x0, sx, rx, y0, ry, -sy); only
    axis-aligned (rx == ry == 0) transforms are expressible through the
    PixelScale+Tiepoint tag pair this writes.  epsg lands in a GeoKey
    directory as Projected (>=10000 heuristic: 2048 geographic else
    3072 projected).

    bigtiff=True writes the BigTIFF (magic 43) layout — 16-byte header,
    u64 IFD offset, 20-byte entries with LONG8 segment offsets/counts —
    the format real >4 GiB Landsat mosaics ship in; same tag semantics.
    """
    comp = _COMP_BY_NAME.get(compression)
    if comp is None:
        raise ValueError(f"compression {compression!r} (none/lzw/deflate/packbits)")
    img = np.asarray(img)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, spp = img.shape
    dt_key = img.dtype.newbyteorder("=").str[1:]
    if dt_key not in _DTYPE_SF:
        raise NotImplementedError(f"dtype {img.dtype} (u1/u2/u4/i1/i2/i4/f4/f8)")
    bps, sf = _DTYPE_SF[dt_key]
    if predictor and sf == _SF_FLOAT:
        raise NotImplementedError("predictor on float samples")
    bo = ">" if big_endian else "<"
    dtype = np.dtype(bo + dt_key)
    data = img.astype(dtype)

    def pack_seg(seg: np.ndarray) -> bytes:
        if predictor:
            # np.stack drops non-native byte order — restore the file order
            seg = np.stack([_diff(seg[:, :, b]) for b in range(spp)], axis=-1).astype(dtype)
        raw = np.ascontiguousarray(seg).tobytes()
        if comp == _COMP_NONE:
            return raw
        if comp == _COMP_DEFLATE_ADOBE:
            return zlib.compress(raw, 6)
        if comp == _COMP_LZW:
            return lzw_encode(raw)
        return packbits_encode(raw)

    segs: list[bytes] = []
    if tile is not None:
        tw, th = tile
        if tw % 16 or th % 16:
            raise ValueError("TIFF tile dims must be multiples of 16")
        for y0 in range(0, h, th):
            for x0 in range(0, w, tw):
                t = np.zeros((th, tw, spp), dtype=dtype)
                vr, vc = min(th, h - y0), min(tw, w - x0)
                t[:vr, :vc] = data[y0 : y0 + vr, x0 : x0 + vc]
                segs.append(pack_seg(t))
        n_x = -(-w // tw)
    else:
        if rows_per_strip is None:
            rows_per_strip = max(1, min(h, (1 << 16) // max(1, w * spp * dtype.itemsize)))
        th = rows_per_strip
        for y0 in range(0, h, th):
            segs.append(pack_seg(data[y0 : min(y0 + th, h)]))

    # ---- layout: header (8 classic / 16 bigtiff) | segment data |
    #      overflow values | IFD
    header_size = 16 if bigtiff else 8
    # segment offsets/counts: LONG in classic, LONG8 in BigTIFF
    off_typ = 16 if bigtiff else 4
    inline = 8 if bigtiff else 4
    seg_offsets: list[int] = []
    pos = header_size
    for s in segs:
        seg_offsets.append(pos)
        pos += len(s)
        pos += pos & 1  # word-align

    entries: list[tuple[int, int, int, bytes]] = []  # (tag, type, count, payload bytes)

    def add(tag: int, typ: int, values) -> None:
        if typ == 2:
            data_b = values if isinstance(values, bytes) else values.encode("ascii")
            count = len(data_b)
        else:
            arr = np.asarray(values, dtype=bo + _TYPE_NP[typ])
            data_b = arr.tobytes()
            count = arr.size
        entries.append((tag, typ, count, data_b))

    add(256, 4, [w])
    add(257, 4, [h])
    add(258, 3, [bps] * spp)
    add(259, 3, [comp])
    add(262, 3, [2 if (spp == 3 and dt_key == "u1") else 1])
    if tile is None:
        add(273, off_typ, seg_offsets)
        add(277, 3, [spp])
        add(278, 4, [th])
        add(279, off_typ, [len(s) for s in segs])
    else:
        add(277, 3, [spp])
    add(284, 3, [1])
    if predictor:
        add(317, 3, [2])
    if tile is not None:
        add(322, 4, [tile[0]])
        add(323, 4, [tile[1]])
        add(324, off_typ, seg_offsets)
        add(325, off_typ, [len(s) for s in segs])
    add(339, 3, [sf] * spp)
    if transform is not None:
        x0, sx, rx, y0, ry, nsy = transform
        if rx or ry:
            raise NotImplementedError("rotated geotransform (use ModelTransformation)")
        add(33550, 12, [sx, -nsy, 0.0])
        add(33922, 12, [0.0, 0.0, 0.0, x0, y0, 0.0])
    if epsg is not None:
        model_key = 2 if epsg < 10000 else 1  # geographic vs projected model
        cs_key = 2048 if epsg < 10000 else 3072
        add(34735, 3, [1, 1, 0, 3,
                       1024, 0, 1, model_key,
                       1025, 0, 1, 1,  # RasterPixelIsArea
                       cs_key, 0, 1, epsg])

    entries.sort(key=lambda e: e[0])
    off_fmt = "Q" if bigtiff else "I"
    cnt_fmt = "Q" if bigtiff else "I"
    overflow = bytearray()
    overflow_base = pos
    packed_entries = []
    for tag, typ, count, data_b in entries:
        if len(data_b) <= inline:
            val = data_b + b"\x00" * (inline - len(data_b))
        else:
            if (overflow_base + len(overflow)) & 1:
                overflow += b"\x00"
            val = struct.pack(bo + off_fmt, overflow_base + len(overflow))
            overflow += data_b
        packed_entries.append(struct.pack(bo + "HH" + cnt_fmt, tag, typ, count) + val)
    ifd_off = overflow_base + len(overflow)
    ifd_off += ifd_off & 1
    if bigtiff:
        ifd = (
            struct.pack(bo + "Q", len(packed_entries))
            + b"".join(packed_entries)
            + struct.pack(bo + "Q", 0)
        )
    else:
        ifd = (
            struct.pack(bo + "H", len(packed_entries))
            + b"".join(packed_entries)
            + struct.pack(bo + "I", 0)
        )

    out = bytearray()
    if bigtiff:
        out += (b"II" if bo == "<" else b"MM") + struct.pack(bo + "HHHQ", 43, 8, 0, ifd_off)
    else:
        out += (b"II" if bo == "<" else b"MM") + struct.pack(bo + "HI", 42, ifd_off)
    for s, off in zip(segs, seg_offsets):
        out += b"\x00" * (off - len(out))
        out += s
    out += b"\x00" * (overflow_base - len(out))
    out += overflow
    out += b"\x00" * (ifd_off - len(out))
    out += ifd
    return bytes(out)


def encode_tiff(img: np.ndarray, **kw) -> bytes:
    """encode_geotiff without georeferencing."""
    return encode_geotiff(img, transform=None, epsg=None, **kw)

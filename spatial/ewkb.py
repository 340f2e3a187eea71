"""Hex-EWKB codec: string column <-> GEOMETRY struct column.

Brand-new vectorized implementation of the computation specified by the
reference's ``readGeometry``/``writeGeometry``
(/root/reference/src/Database/Postgis/Serialize.hs:27-31) and the parser
cascade at Serialize.hs:151-250 -- re-derived from the PostGIS EWKB wire
format, not translated.

Semantics matched to the reference (verified against its golden fixtures,
tests/GeoSpec.hs:17-20,37-44):

* header = endianness byte ("00" big / "01" little, Serialize.hs:48-54),
  uint32 type word with flag bits Z=0x80000000, M=0x40000000,
  SRID=0x20000000, type = word & 0x1fffffff (Serialize.hs:22-25,151-164);
* coordinates are IEEE754 doubles in x,y[,z][,m] order (Serialize.hs:203-212,
  131-132 -- NB the reference's putPosition binds its pattern vars in z,m
  order but writes the record's _z then _m, i.e. x,y,z,m on the wire);
* decode accepts BOTH standard EWKB nesting and the reference's two quirks:
  MultiPoint bodies as bare positions (Serialize.hs:115-118,181-186) and
  nested Multi* elements that repeat the SRID flag (Serialize.hs:120-128);
  it additionally accepts ISO-WKB type codes (1001/2001/3001 style Z/M/ZM),
  which the reference errors on (Serialize.hs:164);
* encode defaults to standard little-endian EWKB (SRID flag only on the top
  header; nested elements carry Z/M flags but no SRID) -- deterministic
  across hosts, unlike the reference which stamps host endianness
  (Serialize.hs:94). ``compat="reference"`` reproduces the reference's
  bare-position MultiPoint and repeated-SRID nesting for parity tests.
* malformed input decodes to a NULL struct row instead of raising: a
  10^12-row job must not die on one bad page (the reference ``error``s,
  Serialize.hs:164).

Hot path note -- three tiers, in order of preference per Arrow batch:

1. all-2D-LE-point fast path (the overwhelmingly common shape in a geocoded
   web corpus): whole batch decoded with two reshaped ``frombuffer`` calls,
   zero per-row work;
2. template-grouped path: rows sharing an identical byte layout outside
   their coordinate blocks decode with one uint8 matrix compare + one
   strided view per block;
3. mixed-structure two-pass path (structurally heterogeneous corpora --
   scraped polygons with varying ring/vertex counts): pass 1 walks ONLY
   headers/counts per row into an offset table, pass 2 moves every
   coordinate byte of the batch in one vectorized gather per
   (dims, endianness) class. Per-row Python cost is proportional to the
   number of structure words, never the number of coordinates.

A per-row scalar parser remains as the last-resort fallback for malformed
bytes and exotic shapes; tests/test_fuzz_codecs.py pins batch == per-row
decode equivalence.
"""

from __future__ import annotations

import struct
from typing import Optional

import numpy as np
import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

from .geometry import (
    EWKB_TYPE_MASK,
    GEOMETRY,
    GEOMETRY_FIELDS,
    GEOMETRYCOLLECTION,
    LINESTRING,
    MULTILINESTRING,
    MULTIPOINT,
    MULTIPOLYGON,
    POINT,
    POLYGON,
    WKB_M,
    WKB_SRID,
    WKB_Z,
    Geom,
)


# --------------------------------------------------------------------------
# pure-Python core (row granularity, numpy coordinate blocks)
# --------------------------------------------------------------------------

class _Cursor:
    __slots__ = ("buf", "off", "spans")

    def __init__(self, buf: bytes):
        self.buf = buf
        self.off = 0
        self.spans = None  # optional [(offset, n_points, dims, fmt)] log


def _read_header(c: _Cursor):
    bo = c.buf[c.off]
    c.off += 1
    fmt = "<" if bo == 1 else ">"
    (word,) = struct.unpack_from(fmt + "I", c.buf, c.off)
    c.off += 4
    gtype = word & EWKB_TYPE_MASK
    has_z = bool(word & WKB_Z)
    has_m = bool(word & WKB_M)
    # ISO WKB encodes dimensionality in the code itself (1001 = Point Z ...)
    if gtype >= 1000:
        kind = gtype % 1000
        d = gtype // 1000
        has_z = has_z or d in (1, 3)
        has_m = has_m or d in (2, 3)
        gtype = kind
    srid = None
    if word & WKB_SRID:
        (srid,) = struct.unpack_from(fmt + "i", c.buf, c.off)
        c.off += 4
    return fmt, gtype, has_z, has_m, srid


def _read_coords(c: _Cursor, fmt: str, n: int, dims: int) -> np.ndarray:
    nb = n * dims * 8
    arr = np.frombuffer(c.buf, dtype=fmt + "f8", count=n * dims, offset=c.off)
    if c.spans is not None:
        c.spans.append((c.off, n, dims, fmt))
    c.off += nb
    return arr.reshape(n, dims)


def _read_count(c: _Cursor, fmt: str) -> int:
    (n,) = struct.unpack_from(fmt + "I", c.buf, c.off)
    c.off += 4
    return n


def _parse(c: _Cursor) -> Geom:
    fmt, gtype, has_z, has_m, srid = _read_header(c)
    dims = 2 + int(has_z) + int(has_m)
    xs: list = []
    ys: list = []
    zs: list = [] if has_z else None
    ms: list = [] if has_m else None
    roffs = [0]
    poffs = [0]

    def push(block: np.ndarray):
        xs.extend(block[:, 0].tolist())
        ys.extend(block[:, 1].tolist())
        k = 2
        if has_z:
            zs.extend(block[:, k].tolist())
            k += 1
        if has_m:
            ms.extend(block[:, k].tolist())
        roffs.append(len(xs))

    if gtype == POINT:
        push(_read_coords(c, fmt, 1, dims))
        poffs.append(1)
    elif gtype == LINESTRING:
        n = _read_count(c, fmt)
        push(_read_coords(c, fmt, n, dims))
        poffs.append(1)
    elif gtype == POLYGON:
        nr = _read_count(c, fmt)
        for _ in range(nr):
            n = _read_count(c, fmt)
            push(_read_coords(c, fmt, n, dims))
        poffs.append(nr)
    elif gtype == MULTIPOINT:
        n = _read_count(c, fmt)
        remaining = len(c.buf) - c.off
        if remaining == n * dims * 8:
            # reference quirk: bare positions, no nested headers
            # (Serialize.hs:181-186)
            block = _read_coords(c, fmt, n, dims)
            for i in range(n):
                push(block[i : i + 1])
                poffs.append(len(roffs) - 1)
        else:
            for _ in range(n):
                sub_fmt, sub_t, sz, sm, _ = _read_header(c)
                sub_dims = 2 + int(sz) + int(sm)
                push(_read_coords(c, sub_fmt, 1, sub_dims))
                poffs.append(len(roffs) - 1)
    elif gtype == MULTILINESTRING:
        n = _read_count(c, fmt)
        for _ in range(n):
            sub_fmt, _, sz, sm, _ = _read_header(c)
            sub_dims = 2 + int(sz) + int(sm)
            cnt = _read_count(c, sub_fmt)
            push(_read_coords(c, sub_fmt, cnt, sub_dims))
            poffs.append(len(roffs) - 1)
    elif gtype == MULTIPOLYGON:
        n = _read_count(c, fmt)
        for _ in range(n):
            sub_fmt, _, sz, sm, _ = _read_header(c)
            sub_dims = 2 + int(sz) + int(sm)
            nr = _read_count(c, sub_fmt)
            for _ in range(nr):
                cnt = _read_count(c, sub_fmt)
                push(_read_coords(c, sub_fmt, cnt, sub_dims))
            poffs.append(len(roffs) - 1)
    else:
        raise ValueError(f"unsupported WKB type code {gtype}")

    return Geom(gtype, srid, has_z, has_m, xs, ys, zs, ms, roffs, poffs)


def decode_hex(hex_str: str) -> Optional[Geom]:
    """hex-EWKB -> Geom; None on malformed input (never raises)."""
    if hex_str is None:
        return None
    try:
        buf = bytes.fromhex(hex_str)
        return _parse(_Cursor(buf))
    except Exception:
        return None


def decode_wkb(buf: bytes) -> Optional[Geom]:
    if buf is None:
        return None
    try:
        return _parse(_Cursor(bytes(buf)))
    except Exception:
        return None


# -- GeometryCollection (WKB 7) -- parity-plus over the reference ------------

def _parse_many(c: _Cursor) -> list[Geom]:
    """Parse the geometry at the cursor into a flat list: a collection
    yields its children (nested collections flattened), anything else a
    single-element list. Children without their own SRID inherit the
    collection header's (PostGIS stamps SRID on the top header only)."""
    save = c.off
    fmt, gtype, _hz, _hm, srid = _read_header(c)
    if gtype != GEOMETRYCOLLECTION:
        c.off = save
        return [_parse(c)]
    n = _read_count(c, fmt)
    out: list[Geom] = []
    for _ in range(n):
        out.extend(_parse_many(c))
    if srid is not None:
        for g in out:
            if g.srid is None:
                g.srid = srid
    return out


def decode_collection_hex(hex_str: str) -> Optional[list[Geom]]:
    """hex-(E)WKB -> flat list of Geom. Collections (WKB 7, which the
    reference ``error``s on, Serialize.hs:164) flatten to their children --
    the per-child ``gtype`` field IS the part-kind array; a non-collection
    input yields a one-element list. None on malformed input."""
    if hex_str is None:
        return None
    try:
        buf = bytes.fromhex(hex_str)
        c = _Cursor(buf)
        out = _parse_many(c)
        if c.off != len(buf):
            raise ValueError("trailing bytes")
        return out
    except Exception:
        return None


def encode_collection_hex(geoms: list, srid: Optional[int] = None,
                          endian: str = "little") -> str:
    """list of Geom -> hex GEOMETRYCOLLECTION (WKB 7). SRID flag on the
    collection header only; children are encoded SRID-free (standard
    PostGIS nesting, same rule ewkb_encode applies to Multi* parts)."""
    import dataclasses

    fmt = "<" if endian == "little" else ">"
    out = bytearray(
        _header_bytes(GEOMETRYCOLLECTION, srid, False, False, True, fmt))
    out += struct.pack(fmt + "I", len(geoms))
    for g in geoms:
        out += encode_geom(dataclasses.replace(g, srid=None), "standard",
                           endian)
    return bytes(out).hex()


# -- encode ----------------------------------------------------------------

def _header_bytes(gtype: int, srid, has_z: bool, has_m: bool,
                  with_srid: bool, fmt: str = "<") -> bytes:
    word = gtype
    if has_z:
        word |= WKB_Z
    if has_m:
        word |= WKB_M
    bo = b"\x01" if fmt == "<" else b"\x00"
    out = bo + struct.pack(fmt + "I", word | (WKB_SRID if (with_srid and srid is not None) else 0))
    if with_srid and srid is not None:
        out += struct.pack(fmt + "i", srid)
    return out


def _coords_bytes(g: Geom, a: int, b: int, fmt: str = "<") -> bytes:
    cols = [np.asarray(g.xs[a:b], dtype=fmt + "f8"),
            np.asarray(g.ys[a:b], dtype=fmt + "f8")]
    if g.has_z:
        cols.append(np.asarray(g.zs[a:b], dtype=fmt + "f8"))
    if g.has_m:
        cols.append(np.asarray(g.ms[a:b], dtype=fmt + "f8"))
    # np.stack silently promotes non-native byte order to native: re-assert
    return np.stack(cols, axis=1).astype(fmt + "f8").tobytes()


def encode_geom(g: Optional[Geom], compat: str = "standard",
                endian: str = "little") -> Optional[bytes]:
    """Geom -> EWKB bytes.

    compat="standard": SRID flag on the top-level header only; nested Multi*
    elements carry Z/M flags but no SRID (PostGIS behavior).
    compat="reference": MultiPoint body = bare positions and nested elements
    repeat the SRID (Serialize.hs:115-128).
    endian: "little" (default -- deterministic across hosts, unlike the
    reference which stamps host endianness, Serialize.hs:94) or "big" (full
    wire parity with big-endian writers; decode already accepted both).
    """
    if g is None:
        return None
    ref = compat == "reference"
    fmt = "<" if endian == "little" else ">"
    out = bytearray(_header_bytes(g.gtype, g.srid, g.has_z, g.has_m, True, fmt))
    ro, po = g.ring_offsets, g.part_offsets

    if g.gtype == POINT:
        out += _coords_bytes(g, 0, max(len(g.xs), 0), fmt) if g.xs else struct.pack(
            fmt + "%dd" % (2 + g.has_z + g.has_m), *([float("nan")] * (2 + g.has_z + g.has_m)))
    elif g.gtype == LINESTRING:
        out += struct.pack(fmt + "I", len(g.xs))
        out += _coords_bytes(g, 0, len(g.xs), fmt)
    elif g.gtype == POLYGON:
        out += struct.pack(fmt + "I", len(ro) - 1)
        for i in range(len(ro) - 1):
            out += struct.pack(fmt + "I", ro[i + 1] - ro[i])
            out += _coords_bytes(g, ro[i], ro[i + 1], fmt)
    elif g.gtype == MULTIPOINT:
        n = len(po) - 1
        out += struct.pack(fmt + "I", n)
        if ref:
            out += _coords_bytes(g, 0, len(g.xs), fmt)  # bare positions quirk
        else:
            for i in range(n):
                out += _header_bytes(POINT, g.srid, g.has_z, g.has_m, False, fmt)
                out += _coords_bytes(g, i, i + 1, fmt)
    elif g.gtype == MULTILINESTRING:
        n = len(po) - 1
        out += struct.pack(fmt + "I", n)
        for i in range(n):
            out += _header_bytes(LINESTRING, g.srid, g.has_z, g.has_m, ref, fmt)
            a, b = ro[po[i]], ro[po[i] + 1]
            out += struct.pack(fmt + "I", b - a)
            out += _coords_bytes(g, a, b, fmt)
    elif g.gtype == MULTIPOLYGON:
        n = len(po) - 1
        out += struct.pack(fmt + "I", n)
        for i in range(n):
            out += _header_bytes(POLYGON, g.srid, g.has_z, g.has_m, ref, fmt)
            r0, r1 = po[i], po[i + 1]
            out += struct.pack(fmt + "I", r1 - r0)
            for r in range(r0, r1):
                out += struct.pack(fmt + "I", ro[r + 1] - ro[r])
                out += _coords_bytes(g, ro[r], ro[r + 1], fmt)
    else:
        raise ValueError(f"unsupported gtype {g.gtype}")
    return bytes(out)


def encode_hex(g: Optional[Geom], compat: str = "standard",
               endian: str = "little") -> Optional[str]:
    b = encode_geom(g, compat, endian)
    return b.hex() if b is not None else None


# --------------------------------------------------------------------------
# Arrow-batch (pandas) layer
# --------------------------------------------------------------------------

_EMPTY_ROW = {f: None for f in GEOMETRY_FIELDS}

# An SRID 2D little-endian point is exactly 25 bytes / 50 hex chars starting
# "0101000020"; a no-SRID one is 21 bytes starting "0101000000".
_FAST_POINT_SRID = "0101000020"
_FAST_POINT_NOSRID = "0101000000"


def _decode_series_fast_points(s: pd.Series) -> Optional[pd.DataFrame]:
    """Whole-batch vectorized decode when every row is a 2D LE point."""
    vals = s.to_numpy(dtype=object)
    n = len(vals)
    if n == 0:
        return None
    first = vals[0]
    if not isinstance(first, str):
        return None
    if first.startswith(_FAST_POINT_SRID) and len(first) == 50:
        prefix, size, srid_present = _FAST_POINT_SRID, 50, True
    elif first.startswith(_FAST_POINT_NOSRID) and len(first) == 42:
        prefix, size, srid_present = _FAST_POINT_NOSRID, 42, False
    else:
        return None
    for v in vals:
        if not (isinstance(v, str) and len(v) == size and v.startswith(prefix)):
            return None
    blob = bytes.fromhex("".join(vals))
    rec = np.frombuffer(blob, dtype=np.uint8).reshape(n, size // 2)
    if srid_present:
        srid = rec[:, 5:9].copy().view("<i4").ravel()
        coords = rec[:, 9:25].copy().view("<f8").reshape(n, 2)
        srid_col = pd.array(srid, dtype="Int32")
    else:
        coords = rec[:, 5:21].copy().view("<f8").reshape(n, 2)
        srid_col = pd.array([None] * n, dtype="Int32")
    xs = [[float(x)] for x in coords[:, 0]]
    ys = [[float(y)] for y in coords[:, 1]]
    one = [0, 1]
    return pd.DataFrame(
        {
            "gtype": np.full(n, POINT, dtype=np.int32),
            "srid": srid_col,
            "has_z": np.zeros(n, dtype=bool),
            "has_m": np.zeros(n, dtype=bool),
            "xs": xs,
            "ys": ys,
            "zs": [None] * n,
            "ms": [None] * n,
            "ring_offsets": [one] * n,
            "part_offsets": [one] * n,
        }
    )


_GROUP_MIN = 4  # smaller groups: template bookkeeping beats nothing


def _decode_group(vals: list[str]):
    """Template-vectorized decode of same-structure rows (SURVEY R2/R4's
    grouped decode, generalized beyond points): parse ONE template row while
    logging its coordinate-block spans, require every other row to be
    byte-identical OUTSIDE those spans (one uint8 matrix compare -- this
    pins endianness, type word, SRID and every count field), then decode all
    coordinate payloads with one strided view per span.

    Returns (rows_dict_list_or_None, ok_mask) -- rows failing the structural
    check get None entries and fall back to the scalar parser."""
    try:
        tbuf = bytes.fromhex(vals[0])
        cur = _Cursor(tbuf)
        cur.spans = []
        g0 = _parse(cur)
        if cur.off != len(tbuf):
            return None, None
    except Exception:
        return None, None
    size = len(tbuf)
    n = len(vals)
    # cheap negative filter before the whole-group fromhex: a 3-row sample
    # must match the template on the hex chars before the first coordinate
    # block (catches length-colliding heterogeneous groups -- e.g. two-ring
    # polygons whose ring sizes split the same total differently -- for the
    # price of three short string compares instead of a full matrix build;
    # such groups decode via the mixed-structure path instead)
    if cur.spans and n > 3:
        pre = cur.spans[0][0] * 2
        v0 = vals[0]
        step = max(1, n // 3)
        if any(vals[k][:pre] != v0[:pre] for k in range(1, n, step)):
            return None, None
    try:
        mat = np.frombuffer(bytes.fromhex("".join(vals)),
                            dtype=np.uint8).reshape(n, size)
    except Exception:
        return None, None
    coord_mask = np.zeros(size, dtype=bool)
    for off, npts, dims, _fmt in cur.spans:
        coord_mask[off : off + npts * dims * 8] = True
    ok = (mat[:, ~coord_mask] == mat[0, ~coord_mask]).all(axis=1)
    n_ok = int(ok.sum())
    if n_ok == 0:
        return None, None
    # everything below must fall back to the scalar parser on ANY surprise
    # (e.g. mixed-dims nested elements produce unequal span widths): the
    # codec contract is "malformed -> null row, never a raised batch"
    try:
        sel = mat[ok]
        blocks = []
        for off, npts, dims, fmt in cur.spans:
            raw = sel[:, off : off + npts * dims * 8]
            arr = np.ascontiguousarray(raw).view(fmt + "f8").reshape(n_ok, npts, dims)
            blocks.append(arr if fmt == "<" else arr.astype("<f8"))
        coords = np.concatenate(blocks, axis=1) if blocks else np.zeros((n_ok, 0, 4))
        base = g0.as_row()
        cols = {
            "xs": list(coords[:, :, 0]),
            "ys": list(coords[:, :, 1]),
        }
        k = 2
        cols["zs"] = list(coords[:, :, k]) if g0.has_z else None
        if g0.has_z:
            k += 1
        cols["ms"] = list(coords[:, :, k]) if g0.has_m else None
        return (base, cols), ok
    except Exception:
        return None, None


def _group_rows(base: dict, cols: dict, ok: np.ndarray) -> list:
    """Materialize per-row dicts from a group decode (mixed-batch path)."""
    rows = []
    j = 0
    for flag in ok:
        if not flag:
            rows.append(None)
            continue
        row = dict(base)
        row["xs"] = cols["xs"][j]
        row["ys"] = cols["ys"][j]
        row["zs"] = cols["zs"][j] if cols["zs"] is not None else None
        row["ms"] = cols["ms"][j] if cols["ms"] is not None else None
        rows.append(row)
        j += 1
    return rows


# --------------------------------------------------------------------------
# mixed-structure batch decode (two-pass: structure scan -> bulk gather)
# --------------------------------------------------------------------------
#
# The template path above only wins when many rows share an identical byte
# layout. A structurally heterogeneous corpus (scraped polygons with varying
# ring/vertex counts -- the realistic shape) used to fall back to the per-row
# parser, which materializes every coordinate through Python lists. The
# two-pass path below keeps the per-row work proportional to the number of
# STRUCTURE words (headers + counts, a handful of ints) and moves every
# coordinate byte in a single vectorized gather per (dims, endianness) class:
#
#   pass 1  _scan: walk headers/counts only, emitting an offset table
#           [(abs_offset, n_points, dims, endianness)] per row -- no
#           coordinate bytes touched, no Python floats created;
#   pass 2  one fancy-index gather over the concatenated batch buffer per
#           (dims, fmt) class, one .view(f8) reshape, then O(1)-per-row
#           np.split views into per-row coordinate arrays.
#
# Acceptance is byte-for-byte identical to _parse (same header reader, same
# quirk handling); tests/test_fuzz_codecs.py pins batch == per-row decode.

def _scan(c: _Cursor):
    """Structure-only walk of one geometry: the _parse cascade with
    coordinate reads replaced by span bookkeeping. Returns
    (gtype, srid, has_z, has_m, ring_offsets, part_offsets, spans) where
    spans = [(offset, n_points, dims, fmt), ...] in wire order. Raises on
    anything _parse would raise on (malformed -> caller nulls the row)."""
    end = len(c.buf)
    fmt, gtype, has_z, has_m, srid = _read_header(c)
    dims = 2 + int(has_z) + int(has_m)
    spans: list = []
    roffs = [0]
    poffs = [0]
    tot = 0

    def take(n: int, d: int, f: str):
        nonlocal tot
        nb = n * d * 8
        if c.off + nb > end:
            raise ValueError("truncated coordinate block")
        if n:
            spans.append((c.off, n, d, f))
        c.off += nb
        tot += n
        roffs.append(tot)

    if gtype == POINT:
        take(1, dims, fmt)
        poffs.append(1)
    elif gtype == LINESTRING:
        take(_read_count(c, fmt), dims, fmt)
        poffs.append(1)
    elif gtype == POLYGON:
        nr = _read_count(c, fmt)
        for _ in range(nr):
            take(_read_count(c, fmt), dims, fmt)
        poffs.append(nr)
    elif gtype == MULTIPOINT:
        n = _read_count(c, fmt)
        if end - c.off == n * dims * 8:
            # reference quirk: bare positions (Serialize.hs:181-186) --
            # ONE span, n single-point rings
            if n:
                spans.append((c.off, n, dims, fmt))
            c.off += n * dims * 8
            for i in range(1, n + 1):
                roffs.append(i)
                poffs.append(i)
            tot = n
        else:
            for _ in range(n):
                sub_fmt, _t, sz, sm, _ = _read_header(c)
                take(1, 2 + int(sz) + int(sm), sub_fmt)
                poffs.append(len(roffs) - 1)
    elif gtype == MULTILINESTRING:
        n = _read_count(c, fmt)
        for _ in range(n):
            sub_fmt, _t, sz, sm, _ = _read_header(c)
            take(_read_count(c, sub_fmt), 2 + int(sz) + int(sm), sub_fmt)
            poffs.append(len(roffs) - 1)
    elif gtype == MULTIPOLYGON:
        n = _read_count(c, fmt)
        for _ in range(n):
            sub_fmt, _t, sz, sm, _ = _read_header(c)
            sub_dims = 2 + int(sz) + int(sm)
            nr = _read_count(c, sub_fmt)
            for _ in range(nr):
                take(_read_count(c, sub_fmt), sub_dims, sub_fmt)
            poffs.append(len(roffs) - 1)
    else:
        raise ValueError(f"unsupported WKB type code {gtype}")
    return gtype, srid, has_z, has_m, roffs, poffs, spans


def _decode_mixed_batch(vals: np.ndarray, idxs: list, out: list) -> None:
    """Two-pass decode of the structurally heterogeneous remainder of a
    batch. Fills out[i] with a GEOMETRY row dict for every row it can
    decode; leaves out[i] = None (scalar-parser fallback) for rows with
    malformed bytes or exotic shapes (mixed dims/endianness across one
    row's coordinate blocks)."""
    hexes, keep = [], []
    for i in idxs:
        v = vals[i]
        if isinstance(v, str) and len(v) >= 18 and len(v) % 2 == 0:
            hexes.append(v)
            keep.append(i)
    if not keep:
        return
    try:
        big = bytes.fromhex("".join(hexes))
        lens = [len(h) // 2 for h in hexes]
    except ValueError:
        # a corrupt row poisons the joined conversion: redo per-row, keep
        # the convertible ones (rare path -- corrupt batches only)
        bufs, keep2, lens = [], [], []
        for i, h in zip(keep, hexes):
            try:
                b = bytes.fromhex(h)
            except ValueError:
                continue
            bufs.append(b)
            keep2.append(i)
            lens.append(len(b))
        keep = keep2
        if not keep:
            return
        big = b"".join(bufs)

    mv = memoryview(big)

    # pass 1: structure scan (headers + counts only)
    rows = []  # (i, base_row_dict, need, spans_abs)
    pos = 0
    for i, nb in zip(keep, lens):
        try:
            c = _Cursor(mv[pos : pos + nb])
            gtype, srid, hz, hm, roffs, poffs, spans = _scan(c)
        except Exception:
            pos += nb
            continue
        base = {
            "gtype": gtype, "srid": srid, "has_z": hz, "has_m": hm,
            "xs": None, "ys": None, "zs": None, "ms": None,
            "ring_offsets": roffs, "part_offsets": poffs,
        }
        rows.append((i, base, 2 + int(hz) + int(hm),
                     [(pos + o, n, d, f) for o, n, d, f in spans]))
        pos += nb

    # pass 2: per-row zero-copy coordinate views. A single-span row (point,
    # linestring, 1-ring polygon, bare multipoint) costs one frombuffer view
    # + one strided slice per column -- no byte is copied until Arrow
    # serializes the result. Multi-span rows copy their coordinate bytes
    # exactly once into a row matrix (the output needs one array per row, so
    # that concatenation is inherent). Rows mixing dims/endianness across
    # blocks (legal but exotic: nested Multi* elements with differing
    # headers) stay on the scalar parser.
    empty64 = np.empty(0, dtype="<f8")
    for i, base, need, spans in rows:
        if not spans:
            base["xs"] = empty64
            base["ys"] = empty64
            if base["has_z"]:
                base["zs"] = empty64
            if base["has_m"]:
                base["ms"] = empty64
            out[i] = base
            continue
        d0, f0 = spans[0][2], spans[0][3]
        if any(d != d0 or f != f0 for _, _, d, f in spans) or d0 < need:
            continue  # scalar fallback (d0 < need nulls there, as _parse does)
        if len(spans) == 1:
            o, npts, d, f = spans[0]
            v = np.frombuffer(big, dtype=f + "f8", count=npts * d, offset=o)
            if f == ">":
                v = v.astype("<f8")
            flat = v
        else:
            tot = base["ring_offsets"][-1]
            mat = np.empty((tot, d0), dtype="<f8")
            p = 0
            for o, npts, d, f in spans:
                mat[p : p + npts] = np.frombuffer(
                    big, dtype=f + "f8", count=npts * d, offset=o
                ).reshape(npts, d)
                p += npts
            flat = mat.reshape(-1)
        base["xs"] = flat[0::d0]
        base["ys"] = flat[1::d0]
        if base["has_z"]:
            base["zs"] = flat[2::d0]
        if base["has_m"]:
            base["ms"] = flat[2 + int(base["has_z"]) :: d0]
        out[i] = base


def _decode_series(s: pd.Series) -> pd.DataFrame:
    fast = _decode_series_fast_points(s)
    if fast is not None:
        return fast
    vals = s.to_numpy(dtype=object)
    n = len(vals)
    # group rows by (length, header prefix): candidates for template decode
    groups: dict = {}
    for i, v in enumerate(vals):
        if isinstance(v, str) and len(v) >= 18:
            groups.setdefault((len(v), v[:18]), []).append(i)

    # homogeneous-batch fast path: one group covering every row -> build the
    # result frame columnar, no per-row dicts at all
    if len(groups) == 1 and n >= _GROUP_MIN:
        (key, idxs), = groups.items()
        if len(idxs) == n:
            res, ok = _decode_group(list(vals))
            if res is not None and ok.all():
                base, cols = res
                data = {f: [base[f]] * n for f in GEOMETRY_FIELDS
                        if f not in ("xs", "ys", "zs", "ms")}
                data["xs"] = cols["xs"]
                data["ys"] = cols["ys"]
                data["zs"] = cols["zs"] if cols["zs"] is not None else [None] * n
                data["ms"] = cols["ms"] if cols["ms"] is not None else [None] * n
                return pd.DataFrame(data, columns=GEOMETRY_FIELDS)

    out: list = [None] * n
    for idxs in groups.values():
        if len(idxs) < _GROUP_MIN:
            continue
        res, ok = _decode_group([vals[i] for i in idxs])
        if res is None:
            continue
        for i, row in zip(idxs, _group_rows(res[0], res[1], ok)):
            if row is not None:
                out[i] = row
    pending = [i for i in range(n) if out[i] is None]
    if pending:
        _decode_mixed_batch(vals, pending, out)
    for i, v in enumerate(vals):
        if out[i] is None:
            g = decode_hex(v) if isinstance(v, str) else None
            out[i] = g.as_row() if g is not None else _EMPTY_ROW
    return pd.DataFrame(out, columns=GEOMETRY_FIELDS)


@pandas_udf(GEOMETRY)
def ewkb_decode(s: pd.Series) -> pd.DataFrame:
    """hex-EWKB string column -> GEOMETRY struct column (R1-R18)."""
    return _decode_series(s)


def _row_to_geom(row) -> Optional[Geom]:
    # row: dict-like struct from a pandas_udf input DataFrame
    if row is None or row.get("gtype") is None or (isinstance(row.get("gtype"), float) and np.isnan(row["gtype"])):
        return None
    return Geom(
        int(row["gtype"]),
        None if row["srid"] is None or (isinstance(row["srid"], float) and np.isnan(row["srid"])) else int(row["srid"]),
        bool(row["has_z"]),
        bool(row["has_m"]),
        list(row["xs"]) if row["xs"] is not None else [],
        list(row["ys"]) if row["ys"] is not None else [],
        list(row["zs"]) if row["zs"] is not None else None,
        list(row["ms"]) if row["ms"] is not None else None,
        [int(v) for v in row["ring_offsets"]] if row["ring_offsets"] is not None else [0],
        [int(v) for v in row["part_offsets"]] if row["part_offsets"] is not None else [0],
    )


def _encode_frame(df: pd.DataFrame, compat: str) -> pd.Series:
    out = []
    recs = df.to_dict("records")
    for row in recs:
        g = _row_to_geom(row)
        out.append(encode_hex(g, compat) if g is not None else None)
    return pd.Series(out)


@pandas_udf(StringType())
def ewkb_encode(geom: pd.DataFrame) -> pd.Series:
    """GEOMETRY struct column -> lowercase hex-EWKB (standard, little-endian).

    Lowercase matches the reference's toHexWord (Serialize.hs:66-73); its own
    tests compare uppercase-normalized (tests/GeoSpec.hs:23-24,41-44)."""
    return _encode_frame(geom, "standard")


@pandas_udf(StringType())
def ewkb_encode_reference_compat(geom: pd.DataFrame) -> pd.Series:
    """Like ewkb_encode but reproducing the reference's wire quirks."""
    return _encode_frame(geom, "reference")


def ewkb_decode_collection(col):
    """hex-(E)WKB column -> array<GEOMETRY> column: WKB 7 collections
    flatten to their children (nested collections recursively); plain
    geometries become one-element arrays; malformed rows null. The
    per-element ``gtype`` is the part-kind array, so downstream plans
    explode + filter by kind with plain array/posexplode ops."""
    from pyspark.sql.types import ArrayType

    @pandas_udf(ArrayType(GEOMETRY))
    def dec(s: pd.Series) -> pd.Series:
        out = []
        for v in s:
            gs = decode_collection_hex(v) if isinstance(v, str) else None
            out.append(None if gs is None else [g.as_row() for g in gs])
        return pd.Series(out)

    return dec(col)


def ewkb_encode_collection(col, srid=None):
    """array<GEOMETRY> column -> hex GEOMETRYCOLLECTION (WKB 7) column."""

    @pandas_udf(StringType())
    def enc(s: pd.Series) -> pd.Series:
        out = []
        for items in s:
            if items is None:
                out.append(None)
                continue
            geoms = [_row_to_geom(r) for r in items]
            if any(g is None for g in geoms):
                out.append(None)
            else:
                out.append(encode_collection_hex(geoms, srid))
        return pd.Series(out)

    return enc(col)

"""WKT/EWKT codec: GEOMETRY struct column <-> OGC well-known text.

Net-new surface mandated by BASELINE.json's north star ("WKT parse/serialize")
-- the reference has no WKT support at all (its cabal exposes only the EWKB +
GeoJSON modules, /root/reference/haskell-postgis.cabal:37-41), so this is
specified from OGC 06-103r4 directly.

* encode: ``POINT (x y)``, ``LINESTRING Z (...)``, ``POLYGON ((...),(...))``,
  Multi* with full nesting; dimension markers ``Z``/``M``/``ZM``; empty
  geometry -> ``POINT EMPTY`` etc. Floats render shortest-round-trip but
  integral values render without the trailing ``.0`` (the conventional WKT
  form, e.g. ``POINT (1 2)``).
* EWKT: ``SRID=4326;POINT (...)`` emitted when the geometry carries an SRID
  and ``ewkt=True`` (default); plain WKT otherwise.
* decode accepts EWKT srid prefixes, ``Z``/``M``/``ZM`` markers with or
  without spaces (``POINTZ``), arbitrary whitespace, EMPTY, and is
  case-insensitive. Malformed text -> null row.
"""

from __future__ import annotations

import re
from typing import Optional

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

from .geometry import (
    GEOMETRY,
    GEOMETRY_FIELDS,
    GTYPE_NAMES,
    LINESTRING,
    MULTILINESTRING,
    MULTIPOINT,
    MULTIPOLYGON,
    POINT,
    POLYGON,
    Geom,
    linestring,
    multilinestring,
    multipoint,
    multipolygon,
    point,
    polygon,
)
from .ewkb import _EMPTY_ROW, _row_to_geom

_NAME_TO_GTYPE = {v.upper(): k for k, v in GTYPE_NAMES.items()}

_HEAD_RE = re.compile(
    r"^\s*(?:SRID\s*=\s*(-?\d+)\s*;)?\s*"
    r"(POINT|LINESTRING|POLYGON|MULTIPOINT|MULTILINESTRING|MULTIPOLYGON)"
    r"\s*(ZM|Z|M)?\s*(EMPTY|\(.*\))\s*$",
    re.IGNORECASE | re.DOTALL,
)

_NUM_RE = re.compile(r"[-+]?(?:\d+\.?\d*|\.\d+)(?:[eE][-+]?\d+)?")


def _fmt(x: float) -> str:
    f = float(x)
    if f.is_integer() and abs(f) < 1e16:
        return str(int(f))
    return repr(f)


def _pos(g: Geom, i: int) -> str:
    parts = [_fmt(g.xs[i]), _fmt(g.ys[i])]
    if g.has_z:
        parts.append(_fmt(g.zs[i]))
    if g.has_m:
        parts.append(_fmt(g.ms[i]))
    return " ".join(parts)


def _span(g: Geom, a: int, b: int) -> str:
    return "(" + ", ".join(_pos(g, i) for i in range(a, b)) + ")"


def encode_wkt(g: Optional[Geom], ewkt: bool = True) -> Optional[str]:
    if g is None:
        return None
    ro, po = g.ring_offsets, g.part_offsets
    t = g.gtype
    tag = GTYPE_NAMES[t].upper()
    dim = ("" if not (g.has_z or g.has_m)
           else " " + ("Z" if g.has_z else "") + ("M" if g.has_m else ""))
    if not g.xs:
        body = "EMPTY"
    elif t == POINT:
        body = "(" + _pos(g, 0) + ")"
    elif t == LINESTRING:
        body = _span(g, 0, len(g.xs))
    elif t == POLYGON:
        body = "(" + ", ".join(_span(g, ro[i], ro[i + 1]) for i in range(len(ro) - 1)) + ")"
    elif t == MULTIPOINT:
        body = "(" + ", ".join("(" + _pos(g, i) + ")" for i in range(len(g.xs))) + ")"
    elif t == MULTILINESTRING:
        body = "(" + ", ".join(
            _span(g, ro[po[i]], ro[po[i] + 1]) for i in range(len(po) - 1)) + ")"
    elif t == MULTIPOLYGON:
        parts = []
        for i in range(len(po) - 1):
            parts.append("(" + ", ".join(
                _span(g, ro[r], ro[r + 1]) for r in range(po[i], po[i + 1])) + ")")
        body = "(" + ", ".join(parts) + ")"
    else:
        return None
    text = tag + dim + " " + body
    if ewkt and g.srid is not None:
        text = f"SRID={g.srid};" + text
    return text


def _split_top(s: str) -> list[str]:
    """Split a parenthesized list body on top-level commas."""
    out, depth, start = [], 0, 0
    for i, ch in enumerate(s):
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == "," and depth == 0:
            out.append(s[start:i])
            start = i + 1
    out.append(s[start:])
    return out


def _strip_parens(s: str) -> str:
    s = s.strip()
    if not (s.startswith("(") and s.endswith(")")):
        raise ValueError(f"expected parenthesized group: {s[:40]!r}")
    return s[1:-1]


def _parse_pos(s: str, has_z: bool, has_m: bool):
    nums = [float(x) for x in _NUM_RE.findall(s)]
    want = 2 + int(has_z) + int(has_m)
    if len(nums) != want:
        raise ValueError(f"position {s!r}: {len(nums)} ordinates, expected {want}")
    return tuple(nums)


def decode_wkt(text: Optional[str]) -> Optional[Geom]:
    if text is None:
        return None
    try:
        m = _HEAD_RE.match(text)
        if not m:
            return None
        srid = int(m.group(1)) if m.group(1) else None
        t = _NAME_TO_GTYPE[m.group(2).upper()]
        dim = (m.group(3) or "").upper()
        body = m.group(4)
        if body.upper() == "EMPTY":
            return Geom(t, srid)
        # infer dims from first position if no explicit marker
        if dim:
            has_z, has_m = "Z" in dim, "M" in dim
        else:
            nd = len(_NUM_RE.findall(_split_top(body.replace("(", " ").replace(")", " "))[0]))
            has_z = nd >= 3
            has_m = nd >= 4
        kw = dict(srid=srid, has_z=has_z, has_m=has_m)
        inner = _strip_parens(body)
        if t == POINT:
            p = _parse_pos(inner, has_z, has_m)
            z = p[2] if has_z else None
            mm = p[2 + int(has_z)] if has_m else None
            return point(p[0], p[1], z, mm, srid=srid)
        if t == LINESTRING:
            return linestring([_parse_pos(p, has_z, has_m) for p in _split_top(inner)], **kw)
        if t == POLYGON:
            rings = [[_parse_pos(p, has_z, has_m) for p in _split_top(_strip_parens(r))]
                     for r in _split_top(inner)]
            return polygon(rings, **kw)
        if t == MULTIPOINT:
            pts = []
            for p in _split_top(inner):
                p = p.strip()
                if p.startswith("("):
                    p = _strip_parens(p)
                pts.append(_parse_pos(p, has_z, has_m))
            return multipoint(pts, **kw)
        if t == MULTILINESTRING:
            lines = [[_parse_pos(p, has_z, has_m) for p in _split_top(_strip_parens(l))]
                     for l in _split_top(inner)]
            return multilinestring(lines, **kw)
        if t == MULTIPOLYGON:
            polys = []
            for pg in _split_top(inner):
                rings = [[_parse_pos(p, has_z, has_m) for p in _split_top(_strip_parens(r))]
                         for r in _split_top(_strip_parens(pg))]
                polys.append(rings)
            return multipolygon(polys, **kw)
        return None
    except Exception:
        return None


_COLL_HEAD_RE = re.compile(
    r"^\s*(?:SRID\s*=\s*(-?\d+)\s*;)?\s*GEOMETRYCOLLECTION"
    r"\s*(EMPTY|\(.*\))\s*$",
    re.IGNORECASE | re.DOTALL,
)


def encode_wkt_collection(geoms: list, srid: Optional[int] = None,
                          ewkt: bool = True) -> str:
    """list of Geom -> ``GEOMETRYCOLLECTION (POINT (..), ...)`` (OGC
    06-103r4 §7.2.6; EMPTY when the list is empty). Children render plain
    WKT (SRID lives on the collection's EWKT prefix only, mirroring the
    EWKB collection's header-only SRID rule)."""
    body = ("EMPTY" if not geoms else
            "(" + ", ".join(encode_wkt(g, ewkt=False) for g in geoms) + ")")
    text = "GEOMETRYCOLLECTION " + body
    if ewkt and srid is not None:
        text = f"SRID={srid};" + text
    return text


def decode_wkt_collection(text: Optional[str]) -> Optional[list[Geom]]:
    """WKT/EWKT -> flat list of Geom: collections flatten to their children
    (nested ones recursively; children inherit the collection SRID when
    they carry none), plain geometries become one-element lists, malformed
    text -> None -- the same contract as ewkb.decode_collection_hex."""
    if text is None:
        return None
    m = _COLL_HEAD_RE.match(text)
    if not m:
        g = decode_wkt(text)
        return [g] if g is not None else None
    srid = int(m.group(1)) if m.group(1) else None
    body = m.group(2)
    if body.upper() == "EMPTY":
        return []
    try:
        out: list[Geom] = []
        for child in _split_top(_strip_parens(body)):
            sub = decode_wkt_collection(child)
            if sub is None:
                return None
            out.extend(sub)
        if srid is not None:
            for g in out:
                if g.srid is None:
                    g.srid = srid
        return out
    except Exception:
        return None


@pandas_udf(StringType())
def wkt_encode(geom: pd.DataFrame) -> pd.Series:
    out = []
    for row in geom.to_dict("records"):
        g = _row_to_geom(row)
        out.append(encode_wkt(g) if g is not None else None)
    return pd.Series(out)


@pandas_udf(GEOMETRY)
def wkt_decode(s: pd.Series) -> pd.DataFrame:
    rows = []
    for v in s:
        g = decode_wkt(v) if isinstance(v, str) else None
        rows.append(g.as_row() if g is not None else _EMPTY_ROW)
    return pd.DataFrame(rows, columns=GEOMETRY_FIELDS)

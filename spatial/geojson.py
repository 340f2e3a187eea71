"""GeoJSON codec: GEOMETRY struct column <-> GeoJSON string column.

Re-implements the computation of the reference's aeson instances
(/root/reference/src/Database/Postgis/JSON.hs) from the GeoJSON spec plus
the reference's observable output contract:

* encode emits keys in ALPHABETICAL order with no whitespace and
  shortest-round-trip float text -- the exact bytes of the reference fixture
  (tests/GeoSpec.hs:21). Python's ``repr(float)`` is shortest-round-trip, the
  same rendering aeson uses, so byte-identity holds without a custom dtoa.
* SRID is carried via the (deprecated) ``crs`` member
  ``{"type":"name","properties":{"name":"EPSG:<srid>"}}`` (JSON.hs:114-115).
  The reference misspells the authority as ``ESPG`` (JSON.hs:115) and its
  byte-identity fixture contains the typo, so ``compat="reference"``
  reproduces it; the default emits the correct ``EPSG``.
* decode dispatches directly on the embedded ``"type"`` tag (the reference
  try-each-constructor alternative chain at JSON.hs:130-137 computes the same
  function) and extracts SRID with the same loose rule as parseCRS
  (JSON.hs:118-128): split ``crs.properties.name`` on ``:``, parse the last
  token as decimal, ANY authority prefix accepted (including the typo).
* positions serialize as ``[x,y]``/``[x,y,z]``/``[x,y,z,m]``. The reference's
  ``catMaybes`` rendering (JSON.hs:23) makes an M-without-Z position emit 3
  elements that decode as Z -- a silent corruption. The engine flags it: an
  M-without-Z geometry encodes M only if ``m_without_z="emit"`` is passed,
  else M is dropped (documented lossy), and decode of a 3-element position
  always reads Z, matching the reference.
* malformed JSON decodes to null, never raises.
"""

from __future__ import annotations

import json
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

_NAME_TO_GTYPE = {v: k for k, v in GTYPE_NAMES.items()}

_CRS_SRID_RE = re.compile(r":(\d+)\s*$")


def _fmt(x: float) -> str:
    """Shortest round-trip decimal text, matching aeson/Python repr."""
    r = repr(float(x))
    return r


def _pos_text(g: Geom, i: int, emit_m: bool) -> str:
    parts = [_fmt(g.xs[i]), _fmt(g.ys[i])]
    if g.has_z:
        parts.append(_fmt(g.zs[i]))
    if g.has_m and emit_m and g.has_z:
        parts.append(_fmt(g.ms[i]))
    elif g.has_m and emit_m and not g.has_z:
        # reference's catMaybes would emit this as a 3rd element that
        # round-trips as Z (JSON.hs:23); only do so when explicitly asked
        parts.append(_fmt(g.ms[i]))
    return "[" + ",".join(parts) + "]"


def _span_text(g: Geom, a: int, b: int, emit_m: bool) -> str:
    return "[" + ",".join(_pos_text(g, i, emit_m) for i in range(a, b)) + "]"


def encode_geojson(g: Optional[Geom], compat: str = "standard",
                   m_without_z: str = "drop") -> Optional[str]:
    """Geom -> GeoJSON text (alphabetical keys, no whitespace)."""
    if g is None:
        return None
    emit_m = g.has_z or m_without_z == "emit"
    ro, po = g.ring_offsets, g.part_offsets
    t = g.gtype
    if t == POINT:
        coords = _pos_text(g, 0, emit_m) if g.xs else "[]"
    elif t == LINESTRING:
        coords = _span_text(g, 0, len(g.xs), emit_m)
    elif t == POLYGON:
        coords = "[" + ",".join(
            _span_text(g, ro[i], ro[i + 1], emit_m) for i in range(len(ro) - 1)
        ) + "]"
    elif t == MULTIPOINT:
        coords = "[" + ",".join(_pos_text(g, i, emit_m) for i in range(len(g.xs))) + "]"
    elif t == MULTILINESTRING:
        coords = "[" + ",".join(
            _span_text(g, ro[po[i]], ro[po[i] + 1], emit_m)
            for i in range(len(po) - 1)
        ) + "]"
    elif t == MULTIPOLYGON:
        parts = []
        for i in range(len(po) - 1):
            rings = ",".join(
                _span_text(g, ro[r], ro[r + 1], emit_m)
                for r in range(po[i], po[i + 1])
            )
            parts.append("[" + rings + "]")
        coords = "[" + ",".join(parts) + "]"
    else:
        return None
    authority = "ESPG" if compat == "reference" else "EPSG"
    out = '{"coordinates":' + coords
    if g.srid is not None:
        out += (
            ',"crs":{"type":"name","properties":{"name":"'
            + authority + ":" + str(g.srid) + '"}}'
        )
    out += ',"type":"' + GTYPE_NAMES[t] + '"}'
    return out


def _parse_srid(obj) -> Optional[int]:
    crs = obj.get("crs")
    if not isinstance(crs, dict):
        return None
    name = (crs.get("properties") or {}).get("name")
    if not isinstance(name, str):
        return None
    m = _CRS_SRID_RE.search(name)
    return int(m.group(1)) if m else None


def _dims(coords, depth: int) -> int:
    c = coords
    for _ in range(depth):
        if not c:
            return 2
        c = c[0]
    return len(c) if c else 2


def decode_geojson(text: Optional[str]) -> Optional[Geom]:
    """GeoJSON text -> Geom (3-element positions decode as Z, per JSON.hs:23-28);
    None on malformed input."""
    if text is None:
        return None
    try:
        return _decode_geom_obj(json.loads(text))
    except Exception:
        return None


def _decode_geom_obj(obj) -> Optional[Geom]:
    """Parsed-dict form of decode_geojson (shared with the collection
    decoder so children never re-serialize)."""
    try:
        t = _NAME_TO_GTYPE.get(obj.get("type"))
        if t is None:
            return None
        srid = _parse_srid(obj)
        coords = obj["coordinates"]
        depth = {POINT: 0, LINESTRING: 1, POLYGON: 2,
                 MULTIPOINT: 1, MULTILINESTRING: 2, MULTIPOLYGON: 3}[t]
        nd = _dims(coords, depth)
        has_z = nd >= 3
        has_m = nd >= 4
        kw = dict(srid=srid, has_z=has_z, has_m=has_m)
        if t == POINT:
            if not coords:
                return Geom(POINT, srid)
            z = coords[2] if has_z else None
            m = coords[3] if has_m else None
            return point(coords[0], coords[1], z, m, srid=srid)
        if t == LINESTRING:
            return linestring(coords, **kw)
        if t == POLYGON:
            return polygon(coords, **kw)
        if t == MULTIPOINT:
            return multipoint(coords, **kw)
        if t == MULTILINESTRING:
            return multilinestring(coords, **kw)
        return multipolygon(coords, **kw)
    except Exception:
        return None


def encode_geojson_collection(geoms: list, srid: Optional[int] = None,
                              compat: str = "standard") -> str:
    """list of Geom -> ``{"geometries":[...],"type":"GeometryCollection"}``
    with the codec's byte contract (alphabetical keys, no whitespace).
    Children render crs-free -- GeoJSON carries no per-child crs; the
    collection-level ``crs`` member covers them (same header-only SRID rule
    as the EWKB/WKT collections)."""
    import dataclasses

    inner = ",".join(encode_geojson(dataclasses.replace(g, srid=None), compat)
                     for g in geoms)
    authority = "ESPG" if compat == "reference" else "EPSG"
    out = "{"
    if srid is not None:
        out += ('"crs":{"type":"name","properties":{"name":"'
                + authority + ":" + str(srid) + '"}},')
    return out + '"geometries":[' + inner + '],"type":"GeometryCollection"}'


def decode_geojson_collection(text: Optional[str]) -> Optional[list[Geom]]:
    """GeoJSON -> flat list of Geom: GeometryCollection flattens to its
    children (nested ones recursively; children inherit the collection crs
    SRID when they carry none), a plain geometry becomes a one-element
    list, malformed input -> None (same contract as the EWKB/WKT
    collection decoders)."""
    if text is None:
        return None
    try:
        obj = json.loads(text)
    except Exception:
        return None
    return _decode_collection_obj(obj)


def _decode_collection_obj(obj):
    """Parsed-dict form of decode_geojson_collection: children recurse on
    dicts directly (no re-serialize/re-parse per nesting level)."""
    if not isinstance(obj, dict):
        return None
    if obj.get("type") != "GeometryCollection":
        g = _decode_geom_obj(obj)
        return [g] if g is not None else None
    srid = _parse_srid(obj)
    kids = obj.get("geometries")
    if not isinstance(kids, list):
        return None
    out: list[Geom] = []
    for sub in kids:
        part = _decode_collection_obj(sub)
        if part is None:
            return None
        out.extend(part)
    if srid is not None:
        for g in out:
            if g.srid is None:
                g.srid = srid
    return out


# -- Arrow batch layer -----------------------------------------------------

from .ewkb import _EMPTY_ROW, _row_to_geom  # noqa: E402


def _make_encoder(compat: str):
    @pandas_udf(StringType())
    def _enc(geom: pd.DataFrame) -> pd.Series:
        out = []
        for row in geom.to_dict("records"):
            g = _row_to_geom(row)
            out.append(encode_geojson(g, compat) if g is not None else None)
        return pd.Series(out)

    return _enc


to_geojson = _make_encoder("standard")
to_geojson_reference_compat = _make_encoder("reference")


@pandas_udf(GEOMETRY)
def from_geojson(s: pd.Series) -> pd.DataFrame:
    rows = []
    for v in s:
        g = decode_geojson(v) if isinstance(v, str) else None
        rows.append(g.as_row() if g is not None else _EMPTY_ROW)
    return pd.DataFrame(rows, columns=GEOMETRY_FIELDS)

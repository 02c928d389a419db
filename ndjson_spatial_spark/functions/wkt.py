"""WKT (Well-Known Text) ingestion/sink for the canonical geometry struct.

The reference ingests GeoJSON/NDJSON/CSV only; WKT is the other text
geometry interchange every geo stack emits (PostGIS, Hive/Sedona, BigQuery,
Snowflake), so the engine accepts it as a first-class source format
(engine extension, SURVEY §2.1 family).  The parser maps WKT to the SAME
GeoJSON-style nesting and reuses `geo._flatten_coords` /
`geo._flatten_collection`, so every downstream operator and the
GeometryCollection tagging behave identically regardless of the input
format.  Z/M ordinates beyond (x, y) are rejected per row (null geometry,
the engine's corrupt-row convention), as is any malformed text.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import types as T
from pyspark.sql.pandas.functions import pandas_udf

from .geo import (
    GEOM_TYPE,
    _flatten_collection,
    _flatten_coords,
    _struct_to_geojson_obj,
)

__all__ = ["parse_wkt", "st_aswkt"]

_SIMPLE = {"POINT", "LINESTRING", "POLYGON",
           "MULTIPOINT", "MULTILINESTRING", "MULTIPOLYGON"}
_CASE = {"POINT": "Point", "LINESTRING": "LineString", "POLYGON": "Polygon",
         "MULTIPOINT": "MultiPoint", "MULTILINESTRING": "MultiLineString",
         "MULTIPOLYGON": "MultiPolygon"}


def _parse_parens(s: str, i: int):
    """Parse a WKT paren group starting at s[i] == '(' into nested lists;
    leaves are [x, y] floats.  Returns (value, index past ')')."""
    out = []
    i += 1
    n = len(s)
    while i < n:
        while i < n and s[i].isspace():
            i += 1
        if s[i] == "(":
            sub, i = _parse_parens(s, i)
            out.append(sub)
        else:
            j = i
            while j < n and s[j] not in ",)":
                j += 1
            parts = s[i:j].split()
            if len(parts) != 2:           # Z/M ordinates unsupported
                raise ValueError("expected 'x y' coordinate")
            out.append([float(parts[0]), float(parts[1])])
            i = j
        while i < n and s[i].isspace():
            i += 1
        if i < n and s[i] == ",":
            i += 1
            continue
        if i < n and s[i] == ")":
            return out, i + 1
    raise ValueError("unterminated paren group")


def _wkt_geometry(s: str, i: int = 0):
    """Parse one geometry starting at s[i]; returns (geojson_dict, next_i).
    Raises on malformed/EMPTY/Z-M input."""
    n = len(s)
    while i < n and s[i].isspace():
        i += 1
    j = i
    while j < n and (s[j].isalpha()):
        j += 1
    kw = s[i:j].upper()
    i = j
    while i < n and s[i].isspace():
        i += 1
    if kw == "GEOMETRYCOLLECTION":
        if s[i] != "(":
            raise ValueError("expected '('")
        i += 1
        members = []
        while True:
            g, i = _wkt_geometry(s, i)
            members.append(g)
            while i < n and s[i].isspace():
                i += 1
            if i < n and s[i] == ",":
                i += 1
                continue
            if i < n and s[i] == ")":
                i += 1
                break
        return {"type": "GeometryCollection", "geometries": members}, i
    if kw not in _SIMPLE:
        raise ValueError(f"unsupported WKT type {kw!r}")
    if s[i] != "(":
        raise ValueError("expected '('")    # includes the EMPTY form
    coords, i = _parse_parens(s, i)
    if kw == "POINT":
        if len(coords) != 1:
            raise ValueError("POINT takes one coordinate")
        coords = coords[0]
    elif kw == "MULTIPOINT":
        # both "(1 2, 3 4)" and "((1 2), (3 4))" are valid WKT
        coords = [c[0] if (len(c) == 1 and isinstance(c[0], list))
                  else c for c in coords]
    return {"type": _CASE[kw], "coordinates": coords}, i


@pandas_udf(GEOM_TYPE)
def parse_wkt(s: pd.Series) -> pd.DataFrame:
    """WKT geometry string -> canonical geometry struct (null on malformed
    rows, the corrupt-row convention shared with parse_geojson)."""
    gt, X, Y, RO, PO = [], [], [], [], []
    for v in s:
        if v is None or (isinstance(v, float) and np.isnan(v)):
            gt.append(None); X.append(None); Y.append(None)
            RO.append(None); PO.append(None)
            continue
        try:
            g, i = _wkt_geometry(str(v))
            if str(v)[i:].strip():
                raise ValueError("trailing content")
            if g["type"] == "GeometryCollection":
                xs, ys, ro, po, tagged = _flatten_collection(g["geometries"])
                gt.append(tagged)
            else:
                xs, ys, ro, po = _flatten_coords(g["type"], g["coordinates"])
                gt.append(g["type"])
            X.append(xs); Y.append(ys); RO.append(ro); PO.append(po)
        except Exception:
            gt.append(None); X.append(None); Y.append(None)
            RO.append(None); PO.append(None)
    return pd.DataFrame({"geom_type": gt, "x": X, "y": Y,
                         "ring_offsets": RO, "part_offsets": PO})


def _num(v: float) -> str:
    """Shortest-roundtrip float text, integer-valued floats without '.0'
    (the conventional WKT spelling)."""
    f = float(v)
    return str(int(f)) if f.is_integer() else repr(f)


def _ring_txt(ring) -> str:
    return "(" + ", ".join(f"{_num(p[0])} {_num(p[1])}" for p in ring) + ")"


def _obj_to_wkt(g: dict) -> str:
    t = g["type"]
    c = g.get("coordinates")
    if t == "Point":
        return f"POINT ({_num(c[0])} {_num(c[1])})"
    if t == "LineString":
        return "LINESTRING " + _ring_txt(c)
    if t == "MultiPoint":
        return "MULTIPOINT " + _ring_txt(c)
    if t == "Polygon":
        return "POLYGON (" + ", ".join(_ring_txt(r) for r in c) + ")"
    if t == "MultiLineString":
        return "MULTILINESTRING (" + ", ".join(_ring_txt(r) for r in c) + ")"
    if t == "MultiPolygon":
        return ("MULTIPOLYGON ("
                + ", ".join("(" + ", ".join(_ring_txt(r) for r in poly) + ")"
                            for poly in c) + ")")
    if t == "GeometryCollection":
        return ("GEOMETRYCOLLECTION ("
                + ", ".join(_obj_to_wkt(m) for m in g["geometries"]) + ")")
    raise ValueError(f"unsupported type {t!r}")


@pandas_udf(T.StringType())
def st_aswkt(geom: pd.DataFrame) -> pd.Series:
    """Canonical struct -> WKT string (sink-side; null geometry -> null).
    Round-trips with parse_wkt, including tagged GeometryCollections."""
    out = []
    for i in range(len(geom)):
        gt = geom["geom_type"].iat[i]
        if gt is None:
            out.append(None)
            continue
        obj = _struct_to_geojson_obj(
            gt, geom["x"].iat[i], geom["y"].iat[i],
            list(geom["ring_offsets"].iat[i]),
            list(geom["part_offsets"].iat[i]),
        )
        out.append(_obj_to_wkt(obj) if obj is not None else None)
    return pd.Series(out)

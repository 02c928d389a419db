"""EPSG-code registry: common projected CRS -> proj4-style parameter dicts.

The reference resolves ANY EPSG code or proj4 string through GDAL
(ndjson-spatial/src/transform.rs:32-85).  This engine implements the
projection methods directly (kernels/crs.py: Karney transverse mercator,
LCC-2SP 9802, Albers 9822, polar stereographic 9810/9829, Mercator
9804/9805, oblique Lambert azimuthal equal-area 9820, plus closed-form
web mercator in kernels/cells.py); this module
closes the lookup gap for the most-used projected CRS families so
`st_transform(geom, 4326, 5070)` works by code, not only by hand-built
parameter dict.  All parameter values are the published EPSG registry
entries (epsg.org, public data).

Datum shifts (round-5): entries whose geographic base is NOT
WGS84-equivalent carry a `towgs84` tuple — the published position-vector
Helmert parameters to WGS84 (EPSG method 9606; classic proj4 +towgs84
semantics) — and st_transform applies them between the projection legs
(kernels/crs.py: datum_to_wgs84/datum_from_wgs84).  NAD83/ETRS89/GDA
datums agree with WGS84 to well under a metre and intentionally carry no
towgs84 (identity, matching proj4's treatment).  Grid-shift files
(NTv2, OSTN15) remain a documented scope boundary: the OSGB36 Helmert is
the published single-transform (~2 m national accuracy vs OSTN15's cm).
`to_meter` entries mark CRSs whose axis unit is not the metre (US survey
foot state-plane zones): projected coordinates are divided by `to_meter`
on output and multiplied on input, matching proj4 semantics.
"""

from __future__ import annotations


def _utm(lon0: float, fn: float, ellps: str, towgs84=None) -> dict:
    out = {"proj": "tmerc", "lon_0": lon0, "k_0": 0.9996,
           "x_0": 500000.0, "y_0": fn, "ellps": ellps}
    if towgs84 is not None:
        out["towgs84"] = towgs84
    return out


# Published datum transformations to WGS84 (position vector, EPSG 9606):
# OSGB36: EPSG tfm 1314 (the standard UK-wide single Helmert, ~2 m);
# NAD27: EPSG tfm 1173 (CONUS mean 3-param Molodensky-style translation).
_OSGB36 = (446.448, -125.157, 542.060, 0.1502, 0.2470, 0.8421, -20.4894)
_NAD27 = (-8.0, 160.0, 176.0)


# Static entries: code -> param dict (proj4-style keys).
EPSG_REGISTRY: dict[int, dict] = {
    # --- conic conformal (LCC-2SP, EPSG method 9802) ---
    2154: {"proj": "lcc", "lat_1": 49.0, "lat_2": 44.0, "lat_0": 46.5,
           "lon_0": 3.0, "x_0": 700000.0, "y_0": 6600000.0,
           "ellps": "GRS80"},            # RGF93 / Lambert-93 (France)
    3347: {"proj": "lcc", "lat_1": 49.0, "lat_2": 77.0,
           "lat_0": 63.390675, "lon_0": -91.86666666666667,
           "x_0": 6200000.0, "y_0": 3000000.0,
           "ellps": "GRS80"},            # NAD83 / Statistics Canada Lambert
    32118: {"proj": "lcc", "lat_1": 41.03333333333333,
            "lat_2": 40.66666666666666, "lat_0": 40.16666666666666,
            "lon_0": -74.0, "x_0": 300000.0, "y_0": 0.0,
            "ellps": "GRS80"},           # NAD83 / New York Long Island (m)
    32139: {"proj": "lcc", "lat_1": 31.88333333333333,
            "lat_2": 30.11666666666667, "lat_0": 29.66666666666667,
            "lon_0": -100.3333333333333, "x_0": 700000.0,
            "y_0": 3000000.0, "ellps": "GRS80"},  # NAD83 / Texas Central (m)
    2229: {"proj": "lcc", "lat_1": 35.46666666666667,
           "lat_2": 34.03333333333333, "lat_0": 33.5, "lon_0": -118.0,
           "x_0": 2000000.0001016002, "y_0": 500000.0001016001,
           "ellps": "GRS80",
           "to_meter": 0.3048006096012192},
    # NAD83 / California zone 5 (US survey foot)

    # --- equal-area conic (Albers, EPSG method 9822) ---
    5070: {"proj": "aea", "lat_1": 29.5, "lat_2": 45.5, "lat_0": 23.0,
           "lon_0": -96.0, "x_0": 0.0, "y_0": 0.0,
           "ellps": "GRS80"},            # NAD83 / Conus Albers
    3338: {"proj": "aea", "lat_1": 55.0, "lat_2": 65.0, "lat_0": 50.0,
           "lon_0": -154.0, "x_0": 0.0, "y_0": 0.0,
           "ellps": "GRS80"},            # NAD83 / Alaska Albers
    3577: {"proj": "aea", "lat_1": -18.0, "lat_2": -36.0, "lat_0": 0.0,
           "lon_0": 132.0, "x_0": 0.0, "y_0": 0.0,
           "ellps": "GRS80"},            # GDA94 / Australian Albers
    102039: {"proj": "aea", "lat_1": 29.5, "lat_2": 45.5, "lat_0": 23.0,
             "lon_0": -96.0, "x_0": 0.0, "y_0": 0.0,
             "ellps": "GRS80"},          # ESRI USA Contiguous Albers (alias)

    # --- transverse mercator national grids (EPSG 9807) ---
    27700: {"proj": "tmerc", "lat_0": 49.0, "lon_0": -2.0,
            "k_0": 0.9996012717, "x_0": 400000.0, "y_0": -100000.0,
            "ellps": "airy",
            "towgs84": _OSGB36},         # OSGB36 / British National Grid
    2193: {"proj": "tmerc", "lat_0": 0.0, "lon_0": 173.0, "k_0": 0.9996,
           "x_0": 1600000.0, "y_0": 10000000.0,
           "ellps": "GRS80"},            # NZGD2000 / NZ Transverse Mercator
    5243: {"proj": "lcc", "lat_1": 48.66666666666666,
           "lat_2": 53.66666666666666, "lat_0": 51.0, "lon_0": 10.5,
           "x_0": 0.0, "y_0": 0.0, "ellps": "GRS80"},  # ETRS89 / LCC Germany

    # --- Lambert azimuthal equal-area, oblique (EPSG 9820) ---
    3035: {"proj": "laea", "lat_0": 52.0, "lon_0": 10.0,
           "x_0": 4321000.0, "y_0": 3210000.0,
           "ellps": "GRS80"},            # ETRS89-extended / LAEA Europe

    # --- Mercator (EPSG 9804 variant A) ---
    3395: {"proj": "merc", "lon_0": 0.0, "k_0": 1.0, "x_0": 0.0,
           "y_0": 0.0, "ellps": "WGS84"},  # WGS 84 / World Mercator

    # --- polar stereographic (EPSG 9810 variant A / 9829 variant B) ---
    3031: {"proj": "stere", "lat_ts": -71.0, "lon_0": 0.0, "x_0": 0.0,
           "y_0": 0.0, "south": True,
           "ellps": "WGS84"},            # WGS 84 / Antarctic Polar Stereo
    3032: {"proj": "stere", "lat_ts": -71.0, "lon_0": 70.0,
           "x_0": 6000000.0, "y_0": 6000000.0, "south": True,
           "ellps": "WGS84"},            # WGS 84 / Australian Antarctic PS
    3413: {"proj": "stere", "lat_ts": 70.0, "lon_0": -45.0, "x_0": 0.0,
           "y_0": 0.0, "south": False,
           "ellps": "WGS84"},            # WGS 84 / NSIDC Sea Ice North
    3976: {"proj": "stere", "lat_ts": -70.0, "lon_0": 0.0, "x_0": 0.0,
           "y_0": 0.0, "south": True,
           "ellps": "WGS84"},            # WGS 84 / NSIDC Sea Ice South
    5041: {"proj": "stere", "k_0": 0.994, "lon_0": 0.0,
           "x_0": 2000000.0, "y_0": 2000000.0, "south": False,
           "ellps": "WGS84"},            # WGS 84 / UPS North (E,N)
    5042: {"proj": "stere", "k_0": 0.994, "lon_0": 0.0,
           "x_0": 2000000.0, "y_0": 2000000.0, "south": True,
           "ellps": "WGS84"},            # WGS 84 / UPS South (E,N)
    32661: {"proj": "stere", "k_0": 0.994, "lon_0": 0.0,
            "x_0": 2000000.0, "y_0": 2000000.0, "south": False,
            "ellps": "WGS84"},           # WGS 84 / UPS North (N,E legacy)
    32761: {"proj": "stere", "k_0": 0.994, "lon_0": 0.0,
            "x_0": 2000000.0, "y_0": 2000000.0, "south": True,
            "ellps": "WGS84"},           # WGS 84 / UPS South (N,E legacy)

    # --- geographic CRSs on non-WGS84 datums (round-5 Helmert step) ---
    4277: {"proj": "longlat", "ellps": "airy",
           "towgs84": _OSGB36},          # OSGB 1936 (geographic)
    4267: {"proj": "longlat", "ellps": "clrk66",
           "towgs84": _NAD27},           # NAD27 (geographic)
    # WGS84-equivalent geographic CRSs (identity datum, proj4 treatment)
    4258: {"proj": "longlat", "ellps": "GRS80"},   # ETRS89
    4269: {"proj": "longlat", "ellps": "GRS80"},   # NAD83
    4283: {"proj": "longlat", "ellps": "GRS80"},   # GDA94
}


def epsg_params(code: int) -> dict | None:
    """Resolve an EPSG code to a proj4-style parameter dict; None when the
    code isn't covered.  Zone ranges are computed, not enumerated:
    WGS84 UTM 326xx/327xx, ETRS89 UTM 258xx, NAD83 UTM 269xx, GDA2020 MGA
    78xx/GDA94 MGA 283xx."""
    got = EPSG_REGISTRY.get(code)
    if got is not None:
        return got
    if 32601 <= code <= 32660:     # WGS 84 / UTM north
        return _utm((code - 32600) * 6.0 - 183.0, 0.0, "WGS84")
    if 32701 <= code <= 32760:     # WGS 84 / UTM south
        return _utm((code - 32700) * 6.0 - 183.0, 10000000.0, "WGS84")
    if 25828 <= code <= 25838:     # ETRS89 / UTM 28N-38N
        return _utm((code - 25800) * 6.0 - 183.0, 0.0, "GRS80")
    if 26901 <= code <= 26923:     # NAD83 / UTM 1N-23N
        return _utm((code - 26900) * 6.0 - 183.0, 0.0, "GRS80")
    if 26701 <= code <= 26722:     # NAD27 / UTM 1N-22N (Clarke 1866)
        return _utm((code - 26700) * 6.0 - 183.0, 0.0, "clrk66", _NAD27)
    if 28348 <= code <= 28358:     # GDA94 / MGA 48-58 (south)
        return _utm((code - 28300) * 6.0 - 183.0, 10000000.0, "GRS80")
    if 7846 <= code <= 7859:       # GDA2020 / MGA 46-59 (south)
        return _utm((code - 7800) * 6.0 - 183.0, 10000000.0, "GRS80")
    return None


# proj4 keys whose values are numeric in the param dicts the engine's
# st_transform consumes; everything else stays a string/flag.
_NUM_KEYS = {"lat_0", "lat_1", "lat_2", "lat_ts", "lon_0", "k_0", "k",
             "x_0", "y_0", "to_meter"}


def parse_proj4(s: str) -> dict:
    """proj4 string -> the engine's param dict (the other half of the
    reference's GDAL spec surface, transform.rs:32-85).

        parse_proj4("+proj=lcc +lat_1=49 +lat_2=44 +lat_0=46.5 "
                    "+lon_0=3 +x_0=700000 +y_0=6600000 +ellps=GRS80")

    Supported: +proj (tmerc/utm/lcc/aea/stere/merc/laea/longlat),
    +lat_0/1/2, +lat_ts, +lon_0, +k/+k_0, +x_0/+y_0, +ellps (mapped to
    the kernel ellipsoid names), +zone/+south (UTM), +units=us-ft/ft,
    +to_meter, +towgs84=tx,ty,tz[,rx,ry,rz,ds] (round-5: applied as a
    position-vector Helmert datum step, classic proj4 semantics),
    +datum=WGS84/NAD83/ETRS89/NAD27/OSGB36 (ellipsoid + the published
    Helmert where one exists; grid-shift files stay out of scope).
    Unknown +proj values raise ValueError; unknown auxiliary keys are
    ignored (proj4's own behavior for irrelevant params)."""
    toks: dict[str, str | bool] = {}
    for t in s.split():
        t = t.lstrip("+")
        if not t:
            continue
        if "=" in t:
            k, v = t.split("=", 1)
            toks[k] = v
        else:
            toks[t] = True

    def datum_fields(out: dict) -> dict:
        ell = str(toks.get("ellps", toks.get("datum", "WGS84")))
        out["ellps"] = {
            "WGS84": "WGS84", "GRS80": "GRS80", "NAD83": "GRS80",
            "ETRS89": "GRS80", "airy": "airy", "intl": "intl",
            "clrk66": "clrk66", "NAD27": "clrk66", "OSGB36": "airy",
            "krass": "krass", "sphere": "sphere",
        }.get(ell, ell)
        if "towgs84" in toks:
            vals = tuple(float(v) for v in str(toks["towgs84"]).split(","))
            if len(vals) not in (3, 7):
                raise ValueError(f"+towgs84 needs 3 or 7 values: {s!r}")
            if any(vals):
                out["towgs84"] = vals
        elif toks.get("datum") == "NAD27":
            out["towgs84"] = _NAD27
        elif toks.get("datum") == "OSGB36":
            out["towgs84"] = _OSGB36
        return out

    proj = toks.get("proj")
    if proj in (None, "longlat", "latlong"):
        return datum_fields({"proj": "longlat"})
    out: dict = {}
    if proj == "utm":
        zone = int(str(toks.get("zone", 0)))
        if not 1 <= zone <= 60:
            raise ValueError(f"proj4 utm needs +zone=1..60: {s!r}")
        out = {"proj": "tmerc", "lon_0": zone * 6.0 - 183.0,
               "k_0": 0.9996, "x_0": 500000.0,
               "y_0": 10000000.0 if toks.get("south") else 0.0}
    elif proj in ("tmerc", "lcc", "aea", "stere", "merc", "laea"):
        out = {"proj": proj}
        if proj == "stere":
            # the engine implements the POLAR aspect; proj4 selects it by
            # lat_0=+-90
            lat0 = float(str(toks.get("lat_0", 90)))
            if abs(lat0) != 90.0:
                raise ValueError(
                    "only polar stereographic (+lat_0=+-90) is supported")
            out["south"] = lat0 < 0
    else:
        raise ValueError(f"unsupported +proj={proj!r}")
    for k in _NUM_KEYS:
        if k in toks:
            out["k_0" if k == "k" else k] = float(str(toks[k]))
    datum_fields(out)
    units = toks.get("units")
    if units in ("us-ft",):
        out["to_meter"] = 1200.0 / 3937.0
    elif units in ("ft",):
        out["to_meter"] = 0.3048
    return out

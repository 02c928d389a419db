"""Ellipsoidal transverse-mercator (UTM) forward/inverse, vectorized numpy.

The reference accepts arbitrary CRS pairs through GDAL
(ndjson-spatial/src/transform.rs:32-85); this sandbox has no proj library,
so the engine implements the widely-published Krüger/Karney series for the
transverse-mercator projection directly (standard 6th-order expansion in
the third flattening — see Karney, "Transverse Mercator with an accuracy
of a few nanometers", J. Geodesy 2011; coefficients below are that public
series).  This covers every UTM zone (EPSG:326xx north / 327xx south) on
WGS84 in addition to the closed-form web-mercator pair in kernels/cells.py.

Accuracy: sub-micron within a UTM zone's normal extent (series truncation),
round-trip < 1e-9 degrees (pinned by tests).
"""

from __future__ import annotations

import numpy as np

__all__ = ["tm_forward", "tm_inverse", "utm_params",
           "lcc_constants", "lcc_forward", "lcc_inverse",
           "aea_constants", "aea_forward", "aea_inverse",
           "ps_forward", "ps_inverse", "merc_forward", "merc_inverse",
           "laea_constants", "laea_forward", "laea_inverse",
           "ELLIPSOIDS", "ellipsoid",
           "WGS84_A", "WGS84_F"]

WGS84_A = 6378137.0
WGS84_F = 1.0 / 298.257223563

_n = WGS84_F / (2.0 - WGS84_F)          # third flattening
_e = np.sqrt(WGS84_F * (2.0 - WGS84_F))  # eccentricity
# rectifying radius
_A = WGS84_A / (1.0 + _n) * (1.0 + _n**2 / 4.0 + _n**4 / 64.0 + _n**6 / 256.0)

_ALPHA = np.array([
    _n / 2 - 2 * _n**2 / 3 + 5 * _n**3 / 16 + 41 * _n**4 / 180
    - 127 * _n**5 / 288 + 7891 * _n**6 / 37800,
    13 * _n**2 / 48 - 3 * _n**3 / 5 + 557 * _n**4 / 1440 + 281 * _n**5 / 630
    - 1983433 * _n**6 / 1935360,
    61 * _n**3 / 240 - 103 * _n**4 / 140 + 15061 * _n**5 / 26880
    + 167603 * _n**6 / 181440,
    49561 * _n**4 / 161280 - 179 * _n**5 / 168 + 6601661 * _n**6 / 7257600,
    34729 * _n**5 / 80640 - 3418889 * _n**6 / 1995840,
    212378941 * _n**6 / 319334400,
])

_BETA = np.array([
    _n / 2 - 2 * _n**2 / 3 + 37 * _n**3 / 96 - _n**4 / 360
    - 81 * _n**5 / 512 + 96199 * _n**6 / 604800,
    _n**2 / 48 + _n**3 / 15 - 437 * _n**4 / 1440 + 46 * _n**5 / 105
    - 1118711 * _n**6 / 3870720,
    17 * _n**3 / 480 - 37 * _n**4 / 840 - 209 * _n**5 / 4480
    + 5569 * _n**6 / 90720,
    4397 * _n**4 / 161280 - 11 * _n**5 / 504 - 830251 * _n**6 / 7257600,
    4583 * _n**5 / 161280 - 108847 * _n**6 / 3991680,
    20648693 * _n**6 / 638668800,
])

_J = np.arange(1, 7, dtype=np.float64)

# ------------------------------------------------------------- ellipsoids
#
# National grids are defined on their own reference ellipsoids (GRS80 for
# NAD83/ETRS89/RGF93, Airy 1830 for OSGB36, ...).  Every kernel below takes
# an `ellps` name; the Karney series coefficients are recomputed per
# ellipsoid and cached.  Scope boundary (documented, same as the EPSG
# registry): the kernels implement the PROJECTION math exactly for the
# stated ellipsoid — geodetic datum SHIFTS (e.g. OSGB36<->WGS84 Helmert)
# are not applied; input lon/lat are taken in the CRS's own geographic base.

ELLIPSOIDS = {
    # name -> (semi-major axis a, flattening f)
    "WGS84": (6378137.0, 1.0 / 298.257223563),
    "GRS80": (6378137.0, 1.0 / 298.257222101),
    "airy": (6377563.396, 1.0 / 299.3249646),
    "intl": (6378388.0, 1.0 / 297.0),
    "clrk66": (6378206.4, 1.0 / 294.978698214),
    "krass": (6378245.0, 1.0 / 298.3),
    "sphere": (6371000.0, 0.0),
}

_ELL_CACHE: dict = {}


def ellipsoid(name: str = "WGS84"):
    """Cached per-ellipsoid constants: (a, f, e, n3, A, alpha, beta) where
    n3 is the third flattening, A the rectifying radius and alpha/beta the
    6th-order Karney TM series coefficients for that ellipsoid."""
    got = _ELL_CACHE.get(name)
    if got is not None:
        return got
    a, f = ELLIPSOIDS[name]
    n = f / (2.0 - f) if f else 0.0
    e = np.sqrt(f * (2.0 - f))
    A = a / (1.0 + n) * (1.0 + n**2 / 4.0 + n**4 / 64.0 + n**6 / 256.0)
    alpha = np.array([
        n / 2 - 2 * n**2 / 3 + 5 * n**3 / 16 + 41 * n**4 / 180
        - 127 * n**5 / 288 + 7891 * n**6 / 37800,
        13 * n**2 / 48 - 3 * n**3 / 5 + 557 * n**4 / 1440 + 281 * n**5 / 630
        - 1983433 * n**6 / 1935360,
        61 * n**3 / 240 - 103 * n**4 / 140 + 15061 * n**5 / 26880
        + 167603 * n**6 / 181440,
        49561 * n**4 / 161280 - 179 * n**5 / 168 + 6601661 * n**6 / 7257600,
        34729 * n**5 / 80640 - 3418889 * n**6 / 1995840,
        212378941 * n**6 / 319334400,
    ])
    beta = np.array([
        n / 2 - 2 * n**2 / 3 + 37 * n**3 / 96 - n**4 / 360
        - 81 * n**5 / 512 + 96199 * n**6 / 604800,
        n**2 / 48 + n**3 / 15 - 437 * n**4 / 1440 + 46 * n**5 / 105
        - 1118711 * n**6 / 3870720,
        17 * n**3 / 480 - 37 * n**4 / 840 - 209 * n**5 / 4480
        + 5569 * n**6 / 90720,
        4397 * n**4 / 161280 - 11 * n**5 / 504 - 830251 * n**6 / 7257600,
        4583 * n**5 / 161280 - 108847 * n**6 / 3991680,
        20648693 * n**6 / 638668800,
    ])
    got = (a, f, float(e), float(n), float(A), alpha, beta)
    _ELL_CACHE[name] = got
    return got


def utm_params(epsg: int):
    """EPSG:326xx/327xx -> (lon0_deg, k0, false_easting, false_northing);
    None for non-UTM codes."""
    if 32601 <= epsg <= 32660:
        zone, fn = epsg - 32600, 0.0
    elif 32701 <= epsg <= 32760:
        zone, fn = epsg - 32700, 10000000.0
    else:
        return None
    return (zone * 6.0 - 183.0, 0.9996, 500000.0, fn)


def tm_forward(lon, lat, lon0: float, k0: float = 0.9996,
               fe: float = 500000.0, fn: float = 0.0,
               ellps: str = "WGS84"):
    """(lon, lat) degrees -> transverse-mercator (easting, northing)."""
    _, _, e_, _, A_, alpha_, _ = ellipsoid(ellps)
    lam = np.radians(np.asarray(lon, np.float64) - lon0)
    phi = np.radians(np.asarray(lat, np.float64))
    s = np.sin(phi)
    # conformal latitude via Gauss-Schreiber: tau' = sinh(asinh-type form)
    t = np.sinh(np.arctanh(s) - e_ * np.arctanh(e_ * s))
    xi_p = np.arctan2(t, np.cos(lam))
    eta_p = np.arcsinh(np.sin(lam) / np.sqrt(t * t + np.cos(lam) ** 2))
    two_j_xi = 2.0 * _J[:, None] * xi_p[None, :]
    two_j_eta = 2.0 * _J[:, None] * eta_p[None, :]
    xi = xi_p + (alpha_[:, None] * np.sin(two_j_xi) * np.cosh(two_j_eta)).sum(0)
    eta = eta_p + (alpha_[:, None] * np.cos(two_j_xi) * np.sinh(two_j_eta)).sum(0)
    return fe + k0 * A_ * eta, fn + k0 * A_ * xi


def tm_inverse(x, y, lon0: float, k0: float = 0.9996,
               fe: float = 500000.0, fn: float = 0.0,
               ellps: str = "WGS84"):
    """Transverse-mercator (easting, northing) -> (lon, lat) degrees."""
    _, _, e_, _, A_, _, beta_ = ellipsoid(ellps)
    eta = (np.asarray(x, np.float64) - fe) / (k0 * A_)
    xi = (np.asarray(y, np.float64) - fn) / (k0 * A_)
    two_j_xi = 2.0 * _J[:, None] * xi[None, :]
    two_j_eta = 2.0 * _J[:, None] * eta[None, :]
    xi_p = xi - (beta_[:, None] * np.sin(two_j_xi) * np.cosh(two_j_eta)).sum(0)
    eta_p = eta - (beta_[:, None] * np.cos(two_j_xi) * np.sinh(two_j_eta)).sum(0)
    tau_p = np.sin(xi_p) / np.sqrt(np.sinh(eta_p) ** 2 + np.cos(xi_p) ** 2)
    lam = np.arctan2(np.sinh(eta_p), np.cos(xi_p))
    # invert the conformal-latitude map by Newton iteration on tau
    tau = tau_p / (1.0 - e_ * e_)
    e2 = e_ * e_
    for _ in range(5):
        sig = np.sinh(e_ * np.arctanh(e_ * tau / np.sqrt(1.0 + tau * tau)))
        f = tau * np.sqrt(1.0 + sig * sig) - sig * np.sqrt(1.0 + tau * tau) - tau_p
        dtau = (
            (np.sqrt((1.0 + sig * sig) * (1.0 + tau * tau)) - sig * tau)
            * (1.0 - e2) * np.sqrt(1.0 + tau * tau)
            / (1.0 + (1.0 - e2) * tau * tau)
        )
        tau = tau - f / dtau
    return np.degrees(lam) + lon0, np.degrees(np.arctan(tau))


# ---------------------------------------------------------------- LCC 2SP
#
# Lambert Conformal Conic, two standard parallels, ellipsoidal (the EPSG
# 9802 method — the projection behind most US State Plane zones, France
# Lambert-93, Canada LCC, etc.).  Formulas are the published EPSG Guidance
# Note 7-2 ones; together with the parameterized transverse-mercator core
# above this closes most of the projected-CRS surface the reference reaches
# through GDAL (ndjson-spatial/src/transform.rs:32-85).

def _lcc_m(phi, e=_e):
    return np.cos(phi) / np.sqrt(1.0 - (e * np.sin(phi)) ** 2)


def _lcc_t(phi, e=_e):
    return np.tan(np.pi / 4.0 - phi / 2.0) / (
        (1.0 - e * np.sin(phi)) / (1.0 + e * np.sin(phi))
    ) ** (e / 2.0)


def lcc_constants(lat1: float, lat2: float, lat0: float,
                  ellps: str = "WGS84"):
    """Projection constants (n, a*F, rho0) for standard parallels lat1/lat2
    and latitude-of-origin lat0 (degrees).  Plan-time scalars — exported so
    the DuckDB oracle can inline the exact same doubles."""
    a, _, e, _, _, _, _ = ellipsoid(ellps)
    p1, p2, p0 = np.radians([lat1, lat2, lat0])
    m1, m2 = _lcc_m(p1, e), _lcc_m(p2, e)
    t1, t2, t0 = _lcc_t(p1, e), _lcc_t(p2, e), _lcc_t(p0, e)
    if lat1 == lat2:
        n = np.sin(p1)
    else:
        n = (np.log(m1) - np.log(m2)) / (np.log(t1) - np.log(t2))
    aF = a * (m1 / (n * t1 ** n))
    rho0 = aF * t0 ** n
    return float(n), float(aF), float(rho0)


def lcc_forward(lon, lat, lat1: float, lat2: float, lat0: float,
                lon0: float, fe: float = 0.0, fn: float = 0.0,
                ellps: str = "WGS84"):
    """(lon, lat) degrees -> LCC-2SP (easting, northing), vectorized."""
    _, _, e, _, _, _, _ = ellipsoid(ellps)
    n, aF, rho0 = lcc_constants(lat1, lat2, lat0, ellps)
    phi = np.radians(np.asarray(lat, np.float64))
    rho = aF * _lcc_t(phi, e) ** n
    th = n * np.radians(np.asarray(lon, np.float64) - lon0)
    return fe + rho * np.sin(th), fn + rho0 - rho * np.cos(th)


def lcc_inverse(x, y, lat1: float, lat2: float, lat0: float,
                lon0: float, fe: float = 0.0, fn: float = 0.0,
                ellps: str = "WGS84"):
    """LCC-2SP (easting, northing) -> (lon, lat) degrees, vectorized.
    Latitude via the standard fixed-point iteration on the isometric
    form (converges quadratically; 8 rounds ≪ 1e-12 rad)."""
    _, _, e, _, _, _, _ = ellipsoid(ellps)
    n, aF, rho0 = lcc_constants(lat1, lat2, lat0, ellps)
    xr = np.asarray(x, np.float64) - fe
    yr = rho0 - (np.asarray(y, np.float64) - fn)
    rho = np.sign(n) * np.sqrt(xr * xr + yr * yr)
    # EPSG Guidance Note 7-2 (method 9802): for southern standard parallels
    # n<0 makes rho, rho0 (and hence x', y') negative — theta must be taken
    # from the sign-adjusted coordinates or the arctan2 branch flips and
    # longitudes come back ~180/n degrees off.
    th = np.arctan2(np.sign(n) * xr, np.sign(n) * yr)
    t = (rho / aF) ** (1.0 / n)
    phi = np.pi / 2.0 - 2.0 * np.arctan(t)
    for _ in range(8):
        es = e * np.sin(phi)
        phi = np.pi / 2.0 - 2.0 * np.arctan(
            t * ((1.0 - es) / (1.0 + es)) ** (e / 2.0)
        )
    return np.degrees(th / n) + lon0, np.degrees(phi)


def _phi_from_t(t, e, rounds: int = 8):
    """Invert the isometric-form t(phi) = tan(pi/4 - phi/2)/esf(phi) by the
    standard fixed-point iteration (Snyder eq. 7-9/3-5; quadratic
    convergence, 8 rounds << 1e-12 rad).  Shared by the LCC / polar
    stereographic / Mercator inverses."""
    phi = np.pi / 2.0 - 2.0 * np.arctan(t)
    for _ in range(rounds):
        es = e * np.sin(phi)
        phi = np.pi / 2.0 - 2.0 * np.arctan(
            t * ((1.0 - es) / (1.0 + es)) ** (e / 2.0)
        )
    return phi


# ----------------------------------------------------- Albers (EPSG 9822)
#
# Albers Equal Area conic, two standard parallels, ellipsoidal — the
# projection behind the NAD83 CONUS/Alaska national grids (EPSG:5070,
# 3338) and most continental-scale equal-area products.  Formulas: Snyder,
# "Map Projections — A Working Manual" (USGS PP 1395) eqs. 14-1..14-21 /
# EPSG Guidance Note 7-2 method 9822.


def _aea_q(phi, e):
    s = np.sin(phi)
    return (1.0 - e * e) * (
        s / (1.0 - (e * s) ** 2)
        - (1.0 / (2.0 * e)) * np.log((1.0 - e * s) / (1.0 + e * s))
    )


def aea_constants(lat1: float, lat2: float, lat0: float,
                  ellps: str = "WGS84"):
    """Plan-time (n, C, rho0) — exported so the DuckDB oracle can inline
    the exact same doubles."""
    a, _, e, _, _, _, _ = ellipsoid(ellps)
    p1, p2, p0 = np.radians([lat1, lat2, lat0])
    m1, m2 = _lcc_m(p1, e), _lcc_m(p2, e)
    q1, q2, q0 = _aea_q(p1, e), _aea_q(p2, e), _aea_q(p0, e)
    if lat1 == lat2:
        n = np.sin(p1)
    else:
        n = (m1 * m1 - m2 * m2) / (q2 - q1)
    C = m1 * m1 + n * q1
    rho0 = a * np.sqrt(C - n * q0) / n
    return float(n), float(C), float(rho0)


def aea_forward(lon, lat, lat1: float, lat2: float, lat0: float,
                lon0: float, fe: float = 0.0, fn: float = 0.0,
                ellps: str = "WGS84"):
    """(lon, lat) degrees -> Albers equal-area (easting, northing)."""
    a, _, e, _, _, _, _ = ellipsoid(ellps)
    n, C, rho0 = aea_constants(lat1, lat2, lat0, ellps)
    q = _aea_q(np.radians(np.asarray(lat, np.float64)), e)
    rho = a * np.sqrt(C - n * q) / n
    th = n * np.radians(np.asarray(lon, np.float64) - lon0)
    return fe + rho * np.sin(th), fn + rho0 - rho * np.cos(th)


def aea_inverse(x, y, lat1: float, lat2: float, lat0: float,
                lon0: float, fe: float = 0.0, fn: float = 0.0,
                ellps: str = "WGS84"):
    """Albers equal-area (easting, northing) -> (lon, lat) degrees.
    Latitude by Snyder's iteration on q (eq. 3-16), seeded with the
    spherical arcsin."""
    a, _, e, _, _, _, _ = ellipsoid(ellps)
    n, C, rho0 = aea_constants(lat1, lat2, lat0, ellps)
    xr = np.asarray(x, np.float64) - fe
    yr = rho0 - (np.asarray(y, np.float64) - fn)
    rho = np.sign(n) * np.sqrt(xr * xr + yr * yr)
    th = np.arctan2(np.sign(n) * xr, np.sign(n) * yr)
    q = (C - (rho * n / a) ** 2) / n
    # q_pole = q at phi=90; clamp the asin seed against rounding overshoot
    qp = _aea_q(np.pi / 2.0, e)
    phi = np.arcsin(np.clip(q / 2.0, -1.0, 1.0))
    e2 = e * e
    for _ in range(8):
        s = np.sin(phi)
        den = 1.0 - e2 * s * s
        phi = phi + den * den / (2.0 * np.cos(phi)) * (
            q / (1.0 - e2) - s / den
            + (1.0 / (2.0 * e)) * np.log((1.0 - e * s) / (1.0 + e * s))
        )
    # exactly-polar rho==0 rows: iteration above is 0/0-safe only off-pole
    phi = np.where(np.abs(q) >= qp, np.sign(q) * np.pi / 2.0, phi)
    return np.degrees(th / n) + lon0, np.degrees(phi)


# --------------------------------- polar stereographic (EPSG 9810 / 9829)
#
# Variant A (k0 at the pole — UPS EPSG:5041/5042) and variant B (standard
# parallel lat_ts — EPSG:3031 Antarctic, EPSG:3413 NSIDC Arctic).
# Formulas: EPSG Guidance Note 7-2 / Snyder eqs. 21-33..21-41.  The south
# aspect is handled by mirroring lat/y through the equator.


def _ps_k0(lat_ts: float | None, k0: float, e: float):
    if lat_ts is None:
        return k0
    pts = np.radians(abs(lat_ts))
    mts = _lcc_m(pts, e)
    tts = _lcc_t(pts, e)
    return float(mts * np.sqrt((1.0 + e) ** (1.0 + e)
                               * (1.0 - e) ** (1.0 - e)) / (2.0 * tts))


def ps_forward(lon, lat, lon0: float, lat_ts: float | None = None,
               k0: float = 0.994, fe: float = 2000000.0,
               fn: float = 2000000.0, south: bool = False,
               ellps: str = "WGS84"):
    """(lon, lat) degrees -> polar stereographic (easting, northing).
    `lat_ts` (variant B standard parallel) overrides `k0` (variant A);
    `south=True` selects the south-pole aspect (mirrored through the
    equator, per EPSG GN 7-2: lon/E increase the same way on both)."""
    a, _, e, _, _, _, _ = ellipsoid(ellps)
    k = _ps_k0(lat_ts, k0, e)
    sgn = -1.0 if south else 1.0
    phi = np.radians(sgn * np.asarray(lat, np.float64))
    lam = np.radians(np.asarray(lon, np.float64) - lon0)
    t = _lcc_t(phi, e)
    rho = 2.0 * a * k * t / np.sqrt((1.0 + e) ** (1.0 + e)
                                    * (1.0 - e) ** (1.0 - e))
    return fe + rho * np.sin(lam), fn - sgn * rho * np.cos(lam)


def ps_inverse(x, y, lon0: float, lat_ts: float | None = None,
               k0: float = 0.994, fe: float = 2000000.0,
               fn: float = 2000000.0, south: bool = False,
               ellps: str = "WGS84"):
    """Polar stereographic (easting, northing) -> (lon, lat) degrees."""
    a, _, e, _, _, _, _ = ellipsoid(ellps)
    k = _ps_k0(lat_ts, k0, e)
    sgn = -1.0 if south else 1.0
    xr = np.asarray(x, np.float64) - fe
    yr = sgn * (fn - np.asarray(y, np.float64))
    rho = np.sqrt(xr * xr + yr * yr)
    t = rho * np.sqrt((1.0 + e) ** (1.0 + e)
                      * (1.0 - e) ** (1.0 - e)) / (2.0 * a * k)
    phi = _phi_from_t(t, e)
    # yr is sign-folded above so lam = arctan2(xr, yr) on BOTH aspects
    lam = np.arctan2(xr, yr)
    return np.degrees(lam) + lon0, sgn * np.degrees(phi)


# ------------------------------------------- Mercator (EPSG 9804 / 9805)
#
# Ellipsoidal Mercator, variant A (k0, e.g. EPSG:3395 World Mercator) and
# variant B (standard parallel lat_ts -> k0 = m(lat_ts)).  The spherical
# web-mercator pair stays in kernels/cells.py (EPSG:3857 is its own
# method, 1024).


def merc_forward(lon, lat, lon0: float = 0.0, k0: float = 1.0,
                 lat_ts: float | None = None, fe: float = 0.0,
                 fn: float = 0.0, ellps: str = "WGS84"):
    """(lon, lat) degrees -> ellipsoidal Mercator (easting, northing)."""
    a, _, e, _, _, _, _ = ellipsoid(ellps)
    if lat_ts is not None:
        k0 = float(_lcc_m(np.radians(abs(lat_ts)), e))
    phi = np.radians(np.asarray(lat, np.float64))
    x = a * k0 * np.radians(np.asarray(lon, np.float64) - lon0)
    y = -a * k0 * np.log(_lcc_t(phi, e))
    return fe + x, fn + y


def merc_inverse(x, y, lon0: float = 0.0, k0: float = 1.0,
                 lat_ts: float | None = None, fe: float = 0.0,
                 fn: float = 0.0, ellps: str = "WGS84"):
    """Ellipsoidal Mercator (easting, northing) -> (lon, lat) degrees."""
    a, _, e, _, _, _, _ = ellipsoid(ellps)
    if lat_ts is not None:
        k0 = float(_lcc_m(np.radians(abs(lat_ts)), e))
    t = np.exp(-(np.asarray(y, np.float64) - fn) / (a * k0))
    phi = _phi_from_t(t, e)
    lon_ = np.degrees((np.asarray(x, np.float64) - fe) / (a * k0)) + lon0
    return lon_, np.degrees(phi)


# ------------------------------- Lambert Azimuthal Equal Area (EPSG 9820)
#
# The projection behind ETRS89-LAEA Europe (EPSG:3035) and EASE-Grid 2.0
# (EPSG:6931/6932/6933 use its polar/cylindrical siblings; the oblique
# form here covers 3035-class national/continental grids).  Formulas:
# EPSG Guidance Note 7-2 method 9820 / Snyder PP 1395 eqs. 24-x (authalic
# latitude form).


def laea_constants(lat0: float, lon0: float, ellps: str = "WGS84"):
    """Plan-time scalars (qp, Rq, beta0, D) — exported for oracles."""
    a, _, e, _, _, _, _ = ellipsoid(ellps)
    p0 = np.radians(lat0)
    qp = _aea_q(np.pi / 2.0, e)
    q0 = _aea_q(p0, e)
    beta0 = np.arcsin(np.clip(q0 / qp, -1.0, 1.0))
    Rq = a * np.sqrt(qp / 2.0)
    m0 = _lcc_m(p0, e)
    D = a * m0 / (Rq * np.cos(beta0))
    return float(qp), float(Rq), float(beta0), float(D)


def laea_forward(lon, lat, lat0: float, lon0: float,
                 fe: float = 0.0, fn: float = 0.0, ellps: str = "WGS84"):
    """(lon, lat) degrees -> oblique LAEA (easting, northing)."""
    _, _, e, _, _, _, _ = ellipsoid(ellps)
    qp, Rq, b0, D = laea_constants(lat0, lon0, ellps)
    q = _aea_q(np.radians(np.asarray(lat, np.float64)), e)
    beta = np.arcsin(np.clip(q / qp, -1.0, 1.0))
    lam = np.radians(np.asarray(lon, np.float64) - lon0)
    sb0, cb0 = np.sin(b0), np.cos(b0)
    sb, cb = np.sin(beta), np.cos(beta)
    B = Rq * np.sqrt(2.0 / (1.0 + sb0 * sb + cb0 * cb * np.cos(lam)))
    x = (B * D) * (cb * np.sin(lam))
    y = (B / D) * (cb0 * sb - sb0 * cb * np.cos(lam))
    return fe + x, fn + y


def laea_inverse(x, y, lat0: float, lon0: float,
                 fe: float = 0.0, fn: float = 0.0, ellps: str = "WGS84"):
    """Oblique LAEA (easting, northing) -> (lon, lat) degrees."""
    a, _, e, _, _, _, _ = ellipsoid(ellps)
    qp, Rq, b0, D = laea_constants(lat0, lon0, ellps)
    xr = (np.asarray(x, np.float64) - fe)
    yr = (np.asarray(y, np.float64) - fn)
    sb0, cb0 = np.sin(b0), np.cos(b0)
    rho = np.sqrt((xr / D) ** 2 + (D * yr) ** 2)
    with np.errstate(invalid="ignore", divide="ignore"):
        C = 2.0 * np.arcsin(np.clip(rho / (2.0 * Rq), -1.0, 1.0))
        sC, cC = np.sin(C), np.cos(C)
        q = qp * (cC * sb0 + D * yr * sC * cb0 / rho)
        lam = np.arctan2(xr * sC,
                         D * rho * cb0 * cC - D * D * yr * sb0 * sC)
    # rho == 0: projection center
    q = np.where(rho == 0.0, qp * sb0, q)
    lam = np.where(rho == 0.0, 0.0, lam)
    e2 = e * e
    phi = np.arcsin(np.clip(q / 2.0, -1.0, 1.0))
    for _ in range(8):
        s = np.sin(phi)
        den = 1.0 - e2 * s * s
        phi = phi + den * den / (2.0 * np.cos(phi)) * (
            q / (1.0 - e2) - s / den
            + (1.0 / (2.0 * e)) * np.log((1.0 - e * s) / (1.0 + e * s))
        )
    phi = np.where(np.abs(q) >= qp, np.sign(q) * np.pi / 2.0, phi)
    return np.degrees(lam) + lon0, np.degrees(phi)


# ----------------------------------------------------- datum shifts (r5)
#
# 7-parameter Helmert (position-vector convention, EPSG method 9606) plus
# the geodetic<->geocentric conversions it operates between.  The
# reference applies datum transformations implicitly through GDAL's
# CoordTransform (ndjson-spatial/src/transform.rs:55-65); this closes the
# engine's largest remaining CRS gap: OSGB36 or NAD27 coordinates were
# previously interpreted as if their datum were WGS84 (up to ~100 m off).
# towgs84 semantics follow classic proj4: the 7 params map the LOCAL
# datum's geocentric frame TO WGS84; the inverse applies the forward
# formula with negated parameters (proj4 pj_geocentric_from_wgs84 — exact
# to well under a millimetre for real-world rotation magnitudes).
# Grid-shift files (NTv2/OSTN15) remain a documented scope boundary.


def geodetic_to_geocentric(lon, lat, h=0.0, ellps: str = "WGS84"):
    """(lon, lat) degrees [+ ellipsoidal height m] -> geocentric X, Y, Z
    (EPSG GN 7-2 §4.1.1)."""
    a, f, e, _, _, _, _ = ellipsoid(ellps)
    lam = np.radians(np.asarray(lon, np.float64))
    phi = np.radians(np.asarray(lat, np.float64))
    sp, cp = np.sin(phi), np.cos(phi)
    e2 = e * e
    nu = a / np.sqrt(1.0 - e2 * sp * sp)
    x = (nu + h) * cp * np.cos(lam)
    y = (nu + h) * cp * np.sin(lam)
    z = (nu * (1.0 - e2) + h) * sp
    return x, y, z


def geocentric_to_geodetic(x, y, z, ellps: str = "WGS84"):
    """Geocentric X, Y, Z -> (lon, lat) degrees via Bowring's (1976)
    closed-form solution — no iteration, so the exact same op sequence is
    replayable in SQL oracles (accurate to well under 1e-9 deg for
    terrestrial points; heights are discarded, 2-D engine)."""
    a, f, e, _, _, _, _ = ellipsoid(ellps)
    x = np.asarray(x, np.float64)
    y = np.asarray(y, np.float64)
    z = np.asarray(z, np.float64)
    b = a * (1.0 - f)
    e2 = e * e
    ep2 = e2 / (1.0 - e2)
    p = np.sqrt(x * x + y * y)
    theta = np.arctan2(z * a, p * b)
    st, ct = np.sin(theta), np.cos(theta)
    phi = np.arctan2(z + ep2 * b * st * st * st,
                     p - e2 * a * ct * ct * ct)
    lam = np.arctan2(y, x)
    return np.degrees(lam), np.degrees(phi)


def helmert_geocentric(x, y, z, params):
    """Position-vector 7-param Helmert on geocentric coords (EPSG 9606):
    params = (tx, ty, tz [m], rx, ry, rz [arc-sec], ds [ppm]); 3-tuples
    are treated as pure translations."""
    if len(params) == 3:
        tx, ty, tz = params
        rx = ry = rz = ds = 0.0
    else:
        tx, ty, tz, rx, ry, rz, ds = params
    sec = np.pi / (180.0 * 3600.0)
    rx, ry, rz = rx * sec, ry * sec, rz * sec
    m = 1.0 + ds * 1e-6
    xp = tx + m * (x - rz * y + ry * z)
    yp = ty + m * (rz * x + y - rx * z)
    zp = tz + m * (-ry * x + rx * y + z)
    return xp, yp, zp


def datum_to_wgs84(lon, lat, ellps: str, towgs84):
    """Local-datum (lon, lat) -> WGS84 (lon, lat), h=0 on the local
    ellipsoid (classic proj4 2-D behaviour)."""
    x, y, z = geodetic_to_geocentric(lon, lat, 0.0, ellps)
    x, y, z = helmert_geocentric(x, y, z, towgs84)
    return geocentric_to_geodetic(x, y, z, "WGS84")


def datum_from_wgs84(lon, lat, ellps: str, towgs84):
    """WGS84 (lon, lat) -> local-datum (lon, lat): forward formula with
    negated parameters (classic proj4 inverse)."""
    neg = tuple(-float(v) for v in towgs84)
    x, y, z = geodetic_to_geocentric(lon, lat, 0.0, "WGS84")
    x, y, z = helmert_geocentric(x, y, z, neg)
    return geocentric_to_geodetic(x, y, z, ellps)

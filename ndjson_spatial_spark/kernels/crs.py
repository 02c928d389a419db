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
               fe: float = 500000.0, fn: float = 0.0):
    """(lon, lat) degrees -> transverse-mercator (easting, northing)."""
    lam = np.radians(np.asarray(lon, np.float64) - lon0)
    phi = np.radians(np.asarray(lat, np.float64))
    s = np.sin(phi)
    # conformal latitude via Gauss-Schreiber: tau' = sinh(asinh-type form)
    t = np.sinh(np.arctanh(s) - _e * np.arctanh(_e * s))
    xi_p = np.arctan2(t, np.cos(lam))
    eta_p = np.arcsinh(np.sin(lam) / np.sqrt(t * t + np.cos(lam) ** 2))
    two_j_xi = 2.0 * _J[:, None] * xi_p[None, :]
    two_j_eta = 2.0 * _J[:, None] * eta_p[None, :]
    xi = xi_p + (_ALPHA[:, None] * np.sin(two_j_xi) * np.cosh(two_j_eta)).sum(0)
    eta = eta_p + (_ALPHA[:, None] * np.cos(two_j_xi) * np.sinh(two_j_eta)).sum(0)
    return fe + k0 * _A * eta, fn + k0 * _A * xi


def tm_inverse(x, y, lon0: float, k0: float = 0.9996,
               fe: float = 500000.0, fn: float = 0.0):
    """Transverse-mercator (easting, northing) -> (lon, lat) degrees."""
    eta = (np.asarray(x, np.float64) - fe) / (k0 * _A)
    xi = (np.asarray(y, np.float64) - fn) / (k0 * _A)
    two_j_xi = 2.0 * _J[:, None] * xi[None, :]
    two_j_eta = 2.0 * _J[:, None] * eta[None, :]
    xi_p = xi - (_BETA[:, None] * np.sin(two_j_xi) * np.cosh(two_j_eta)).sum(0)
    eta_p = eta - (_BETA[:, None] * np.cos(two_j_xi) * np.sinh(two_j_eta)).sum(0)
    tau_p = np.sin(xi_p) / np.sqrt(np.sinh(eta_p) ** 2 + np.cos(xi_p) ** 2)
    lam = np.arctan2(np.sinh(eta_p), np.cos(xi_p))
    # invert the conformal-latitude map by Newton iteration on tau
    tau = tau_p / (1.0 - _e * _e)
    e2 = _e * _e
    for _ in range(5):
        sig = np.sinh(_e * np.arctanh(_e * tau / np.sqrt(1.0 + tau * tau)))
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

def _lcc_m(phi):
    return np.cos(phi) / np.sqrt(1.0 - (_e * np.sin(phi)) ** 2)


def _lcc_t(phi):
    return np.tan(np.pi / 4.0 - phi / 2.0) / (
        (1.0 - _e * np.sin(phi)) / (1.0 + _e * np.sin(phi))
    ) ** (_e / 2.0)


def lcc_constants(lat1: float, lat2: float, lat0: float):
    """Projection constants (n, a*F, rho0) for standard parallels lat1/lat2
    and latitude-of-origin lat0 (degrees).  Plan-time scalars — exported so
    the DuckDB oracle can inline the exact same doubles."""
    p1, p2, p0 = np.radians([lat1, lat2, lat0])
    m1, m2 = _lcc_m(p1), _lcc_m(p2)
    t1, t2, t0 = _lcc_t(p1), _lcc_t(p2), _lcc_t(p0)
    if lat1 == lat2:
        n = np.sin(p1)
    else:
        n = (np.log(m1) - np.log(m2)) / (np.log(t1) - np.log(t2))
    aF = WGS84_A * (m1 / (n * t1 ** n))
    rho0 = aF * t0 ** n
    return float(n), float(aF), float(rho0)


def lcc_forward(lon, lat, lat1: float, lat2: float, lat0: float,
                lon0: float, fe: float = 0.0, fn: float = 0.0):
    """(lon, lat) degrees -> LCC-2SP (easting, northing), vectorized."""
    n, aF, rho0 = lcc_constants(lat1, lat2, lat0)
    phi = np.radians(np.asarray(lat, np.float64))
    rho = aF * _lcc_t(phi) ** n
    th = n * np.radians(np.asarray(lon, np.float64) - lon0)
    return fe + rho * np.sin(th), fn + rho0 - rho * np.cos(th)


def lcc_inverse(x, y, lat1: float, lat2: float, lat0: float,
                lon0: float, fe: float = 0.0, fn: float = 0.0):
    """LCC-2SP (easting, northing) -> (lon, lat) degrees, vectorized.
    Latitude via the standard fixed-point iteration on the isometric
    form (converges quadratically; 8 rounds ≪ 1e-12 rad)."""
    n, aF, rho0 = lcc_constants(lat1, lat2, lat0)
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
        es = _e * np.sin(phi)
        phi = np.pi / 2.0 - 2.0 * np.arctan(
            t * ((1.0 - es) / (1.0 + es)) ** (_e / 2.0)
        )
    return np.degrees(th / n) + lon0, np.degrees(phi)

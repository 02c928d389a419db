"""Property-based kernel tests (hypothesis, numpy-only — no Spark session).

The geometry and cell kernels are the trust root of every spatial
operator; each property here is an algebraic invariant that must hold for
ALL inputs, not just the fixture shapes (SURVEY §5 strategy: "test far
more" than the reference's inline cases).
"""

import numpy as np
from hypothesis import given, settings, strategies as st

from ndjson_spatial_spark.kernels import cells as KC
from ndjson_spatial_spark.kernels import crs as KCRS
from ndjson_spatial_spark.kernels.geometry import (
    clip_polygon_convex,
    clip_ring_rect,
    points_in_polygon,
    _signed_area,
)

SETTINGS = settings(max_examples=60, deadline=None, derandomize=True)

coord = st.floats(min_value=-1e6, max_value=1e6, allow_nan=False,
                  allow_infinity=False, width=64)


def convex_polygon(draw, n_min=3, n_max=8):
    """Random convex polygon: points on a circle at sorted angles."""
    n = draw(st.integers(n_min, n_max))
    angles = sorted(
        draw(st.lists(st.floats(0, 2 * np.pi - 1e-3), min_size=n, max_size=n,
                      unique=True))
    )
    if len(angles) < 3:
        angles = [0.0, 2.0, 4.0]
    r = draw(st.floats(1.0, 1e5))
    cx0 = draw(st.floats(-1e5, 1e5))
    cy0 = draw(st.floats(-1e5, 1e5))
    xs = np.array([cx0 + r * np.cos(a) for a in angles])
    ys = np.array([cy0 + r * np.sin(a) for a in angles])
    return xs, ys


convex = st.builds(lambda d: d, st.data())


class TestClipProperties:
    @SETTINGS
    @given(st.data())
    def test_self_clip_is_identity_area(self, data):
        xs, ys = convex_polygon(data.draw)
        rx, ry = clip_polygon_convex(xs, ys, xs, ys)
        scale = max(np.abs(xs).max(), np.abs(ys).max(), 1.0)
        assert abs(abs(_signed_area(rx, ry)) - abs(_signed_area(xs, ys))) \
            <= 1e-9 * scale * scale + 1e-6

    @SETTINGS
    @given(st.data())
    def test_clip_area_bounded_and_symmetric(self, data):
        ax, ay = convex_polygon(data.draw)
        bx, by = convex_polygon(data.draw)
        abx, aby = clip_polygon_convex(ax, ay, bx, by)
        bax, bay = clip_polygon_convex(bx, by, ax, ay)
        area_ab = abs(_signed_area(abx, aby)) if len(abx) else 0.0
        area_ba = abs(_signed_area(bax, bay)) if len(bax) else 0.0
        a_a = abs(_signed_area(ax, ay))
        a_b = abs(_signed_area(bx, by))
        # clip-vertex roundoff is ~eps * |coord|, so area error scales with
        # the SQUARE of the coordinate magnitude (not with the area —
        # slivers have tiny area but full-size coordinates)
        scale = max(np.abs(ax).max(), np.abs(ay).max(),
                    np.abs(bx).max(), np.abs(by).max(), 1.0)
        tol = 1e-9 * scale * scale + 1e-6
        # intersection is commutative in measure and bounded by both
        assert abs(area_ab - area_ba) <= tol
        assert area_ab <= min(a_a, a_b) + tol

    @SETTINGS
    @given(st.data())
    def test_rect_clip_matches_convex_clip(self, data):
        xs, ys = convex_polygon(data.draw)
        x0 = data.draw(st.floats(-2e5, 1e5))
        y0 = data.draw(st.floats(-2e5, 1e5))
        w = data.draw(st.floats(1.0, 3e5))
        h = data.draw(st.floats(1.0, 3e5))
        rx = np.array([x0, x0 + w, x0 + w, x0])
        ry = np.array([y0, y0, y0 + h, y0 + h])
        ax1, ay1 = clip_ring_rect(xs, ys, x0, y0, x0 + w, y0 + h)
        ax2, ay2 = clip_polygon_convex(xs, ys, rx, ry)
        a1 = abs(_signed_area(ax1, ay1)) if len(ax1) else 0.0
        a2 = abs(_signed_area(ax2, ay2)) if len(ax2) else 0.0
        scale = max(np.abs(xs).max(), np.abs(ys).max(), abs(x0) + w,
                    abs(y0) + h, 1.0)
        assert abs(a1 - a2) <= 1e-9 * scale * scale + 1e-6


class TestPIPProperties:
    @SETTINGS
    @given(st.data())
    def test_pip_agrees_with_halfplane_test_on_convex(self, data):
        xs, ys = convex_polygon(data.draw)
        n = 40
        rng = np.random.default_rng(7)
        lo_x, hi_x = xs.min() - 10, xs.max() + 10
        lo_y, hi_y = ys.min() - 10, ys.max() + 10
        px = rng.uniform(lo_x, hi_x, n)
        py = rng.uniform(lo_y, hi_y, n)
        ro = np.array([0, len(xs) + 1])
        po = np.array([0, 1])
        cx = np.append(xs, xs[0])
        cy = np.append(ys, ys[0])
        got = points_in_polygon(px, py, cx, cy, ro, po)
        # closed form for convex CCW: inside iff left of (or on) every edge
        exp = np.ones(n, bool)
        sgn = 1.0 if _signed_area(xs, ys) > 0 else -1.0
        margin = np.full(n, np.inf)
        for i in range(len(xs)):
            x1, y1 = xs[i], ys[i]
            x2, y2 = xs[(i + 1) % len(xs)], ys[(i + 1) % len(xs)]
            cross = sgn * ((x2 - x1) * (py - y1) - (y2 - y1) * (px - x1))
            exp &= cross >= 0
            margin = np.minimum(margin, np.abs(cross))
        # ignore points within float noise of an edge (boundary convention
        # may differ between the two formulations)
        clear = margin > 1e-3 * max(1.0, np.abs(xs).max(), np.abs(ys).max())
        assert (got[clear] == exp[clear]).all()


class TestCellProperties:
    @SETTINGS
    @given(st.data())
    def test_cell_id_roundtrip(self, data):
        res = data.draw(st.integers(0, 20))
        size = 1 << res
        tx = np.array(data.draw(st.lists(
            st.integers(0, size - 1), min_size=1, max_size=20)), np.uint64)
        ty = np.array(data.draw(st.lists(
            st.integers(0, size - 1), min_size=len(tx), max_size=len(tx))),
            np.uint64)
        cid = KC.cell_id(tx, ty, res)
        assert (KC.cell_resolution(cid) == res).all()
        gx, gy = KC.cell_tile_xy(cid)
        assert (gx == tx.astype(np.int64)).all()
        assert (gy == ty.astype(np.int64)).all()

    @SETTINGS
    @given(st.data())
    def test_parent_contains_child(self, data):
        res = data.draw(st.integers(2, 20))
        p_res = data.draw(st.integers(0, res - 1))
        x = np.array([data.draw(st.floats(-KC.MERC_MAX * 0.99,
                                          KC.MERC_MAX * 0.99))])
        y = np.array([data.draw(st.floats(-KC.MERC_MAX * 0.99,
                                          KC.MERC_MAX * 0.99))])
        child = KC.point_cells(x, y, res)
        parent = KC.point_cells(x, y, p_res)
        assert (KC.cell_parent(child, p_res) == parent).all()

    @SETTINGS
    @given(st.data())
    def test_bbox_cover_contains_point_cell(self, data):
        res = data.draw(st.integers(0, 16))
        x = data.draw(st.floats(-KC.MERC_MAX * 0.98, KC.MERC_MAX * 0.98))
        y = data.draw(st.floats(-KC.MERC_MAX * 0.98, KC.MERC_MAX * 0.98))
        w = data.draw(st.floats(0.0, 1e6))
        h = data.draw(st.floats(0.0, 1e6))
        maxx = min(x + w, KC.MERC_MAX * 0.99)
        maxy = min(y + h, KC.MERC_MAX * 0.99)
        covers, res_used = KC.bbox_cells(
            np.array([x]), np.array([y]), np.array([maxx]), np.array([maxy]),
            res, cap=4096, min_res=0,
        )
        # any point inside the bbox maps to a cell whose ancestor at
        # res_used is in the cover — stage-1 SUPERSET invariant
        px = np.array([x, maxx, (x + maxx) / 2])
        py = np.array([y, maxy, (y + maxy) / 2])
        pc = KC.point_cells(px, py, int(res_used[0]))
        cover_set = set(covers[0].tolist())
        assert all(int(c) in cover_set for c in pc)


class TestCrsProperties:
    @SETTINGS
    @given(st.floats(-84.0, 84.0), st.floats(-9.0, 9.0))
    def test_utm_roundtrip(self, lat, dlon):
        lon0 = 15.0
        e, n = KCRS.tm_forward(np.array([lon0 + dlon]), np.array([lat]), lon0)
        lon2, lat2 = KCRS.tm_inverse(e, n, lon0)
        assert abs(lon2[0] - (lon0 + dlon)) < 1e-9
        assert abs(lat2[0] - lat) < 1e-9

    @SETTINGS
    @given(st.floats(20.0, 55.0), st.floats(-130.0, -60.0))
    def test_lcc_roundtrip(self, lat, lon):
        e, n = KCRS.lcc_forward(np.array([lon]), np.array([lat]),
                                33.0, 45.0, 39.0, -96.0)
        lon2, lat2 = KCRS.lcc_inverse(e, n, 33.0, 45.0, 39.0, -96.0)
        assert abs(lon2[0] - lon) < 1e-9
        assert abs(lat2[0] - lat) < 1e-9

    @SETTINGS
    @given(st.floats(-55.0, -20.0), st.floats(110.0, 155.0))
    def test_lcc_roundtrip_southern_parallels(self, lat, lon):
        # n < 0 (southern standard parallels, EPSG method 9802): rho/rho0
        # flip sign so the inverse must take theta from sign-adjusted
        # coordinates (GDA94 Geoscience-Australia-style conic).
        e, n = KCRS.lcc_forward(np.array([lon]), np.array([lat]),
                                -18.0, -36.0, -27.0, 132.0,
                                500000.0, 1000000.0)
        lon2, lat2 = KCRS.lcc_inverse(e, n, -18.0, -36.0, -27.0, 132.0,
                                      500000.0, 1000000.0)
        assert abs(lon2[0] - lon) < 1e-9
        assert abs(lat2[0] - lat) < 1e-9

    def test_lcc_scale_is_unity_on_standard_parallels(self):
        # defining property of the 2SP conic: point scale k = rho*n/(a*m)
        # equals exactly 1 on both standard parallels, < 1 between them
        n, aF, _ = KCRS.lcc_constants(33.0, 45.0, 39.0)
        for lat, expect_one in ((33.0, True), (45.0, True), (39.0, False)):
            phi = np.radians(np.array([lat]))
            rho = aF * KCRS._lcc_t(phi) ** n
            k = rho * n / (KCRS.WGS84_A * KCRS._lcc_m(phi))
            if expect_one:
                assert abs(k[0] - 1.0) < 1e-12
            else:
                assert k[0] < 1.0

    def test_lambert93_matches_published_grid(self):
        # France Lambert-93 (EPSG:2154) parameters; the projected origin
        # (lon_0, lat_0) must land exactly on the false origin
        e, n = KCRS.lcc_forward(np.array([3.0]), np.array([46.5]),
                                49.0, 44.0, 46.5, 3.0, 700000.0, 6600000.0)
        assert abs(e[0] - 700000.0) < 1e-6
        assert abs(n[0] - 6600000.0) < 1e-6

    @SETTINGS
    @given(st.floats(30.0, 70.0), st.floats(-15.0, 45.0))
    def test_laea_roundtrip(self, lat, lon):
        e, n = KCRS.laea_forward(np.array([lon]), np.array([lat]),
                                 52.0, 10.0, 4321000.0, 3210000.0, "GRS80")
        lon2, lat2 = KCRS.laea_inverse(e, n, 52.0, 10.0,
                                       4321000.0, 3210000.0, "GRS80")
        assert abs(lon2[0] - lon) < 1e-9
        assert abs(lat2[0] - lat) < 1e-9

    def test_laea_preserves_area(self):
        # defining property: projected area of a densified geographic quad
        # equals its authalic-sphere area Rq^2 * dlam * (sin b2 - sin b1)
        qp, Rq, _, _ = KCRS.laea_constants(52.0, 10.0, "GRS80")
        a, _, e, _, _, _, _ = KCRS.ellipsoid("GRS80")
        lat1, lat2, lon1, lon2 = 47.0, 48.0, 7.0, 9.0
        n = 200
        lons = np.concatenate([
            np.linspace(lon1, lon2, n), np.full(n, lon2),
            np.linspace(lon2, lon1, n), np.full(n, lon1)])
        lats = np.concatenate([
            np.full(n, lat1), np.linspace(lat1, lat2, n),
            np.full(n, lat2), np.linspace(lat2, lat1, n)])
        x, y = KCRS.laea_forward(lons, lats, 52.0, 10.0, ellps="GRS80")
        area = abs(0.5 * (np.dot(x, np.roll(y, -1))
                          - np.dot(np.roll(x, -1), y)))
        b1 = np.arcsin(KCRS._aea_q(np.radians(lat1), e) / qp)
        b2 = np.arcsin(KCRS._aea_q(np.radians(lat2), e) / qp)
        want = Rq * Rq * np.radians(lon2 - lon1) * (np.sin(b2) - np.sin(b1))
        assert abs(area - want) < 1e-6 * want

    @SETTINGS
    @given(st.floats(-179.9, 179.9), st.floats(-85.0, 85.0))
    def test_mercator_roundtrip(self, lon, lat):
        x, y = KC.lonlat_to_mercator(np.array([lon]), np.array([lat]))
        lon2, lat2 = KC.mercator_to_lonlat(x, y)
        assert abs(lon2[0] - lon) < 1e-9
        assert abs(lat2[0] - lat) < 1e-7

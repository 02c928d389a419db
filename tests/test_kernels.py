"""Unit tests for pure-numpy geometry + cell kernels (no Spark needed).

Fixture values trace to the reference's inline tests and documented
semantics (see FIXTURES.md F5-F7; file:line cites in each test).
"""

import numpy as np
import pytest

from ndjson_spatial_spark.kernels import cells as C
from ndjson_spatial_spark.kernels import geometry as G


def bg_single(coords_rings, parts=None):
    """Build a 1-row BatchGeometry from [[(x,y),...], ...] ring list."""
    xs, ys, ro = [], [], [0]
    for ring in coords_rings:
        xs.extend(p[0] for p in ring)
        ys.extend(p[1] for p in ring)
        ro.append(len(xs))
    po = parts if parts is not None else [0, len(coords_rings)]
    return G.BatchGeometry([np.array(xs)], [np.array(ys)], [np.array(ro)], [np.array(po)])


SQUARE = [(0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0), (0.0, 0.0)]
HOLE = [(1.0, 1.0), (1.0, 2.0), (2.0, 2.0), (2.0, 1.0), (1.0, 1.0)]  # CW hole, area 1

# the reference's own test polygon (ndjson-spatial/src/area.rs:128-153)
REF_RECT = [
    (189776.5420303712, 4816290.5053447075),
    (761661.7830505947, 4816290.5053447075),
    (761661.7830505947, 5472415.100443922),
    (189776.5420303712, 5472415.100443922),
    (189776.5420303712, 4816290.5053447075),
]


class TestArea:
    def test_square(self):
        assert G.batch_area(bg_single([SQUARE]))[0] == pytest.approx(16.0)

    def test_reference_rectangle(self):
        # planar area = width * height (GEOS planar semantics, area.rs:59-62)
        w = 761661.7830505947 - 189776.5420303712
        h = 5472415.100443922 - 4816290.5053447075
        assert G.batch_area(bg_single([REF_RECT]))[0] == pytest.approx(w * h)

    def test_hole_subtracts(self):
        assert G.batch_area(bg_single([SQUARE, HOLE]))[0] == pytest.approx(15.0)

    def test_multipolygon_parts_sum(self):
        sq2 = [(10.0, 10.0), (12.0, 10.0), (12.0, 12.0), (10.0, 12.0), (10.0, 10.0)]
        bg = bg_single([SQUARE, sq2], parts=[0, 1, 2])
        assert G.batch_area(bg)[0] == pytest.approx(16.0 + 4.0)

    def test_batch_of_rows(self):
        rows = [bg_single([SQUARE]), bg_single([REF_RECT])]
        bg = G.BatchGeometry(
            [np.array([p[0] for p in SQUARE]), np.array([p[0] for p in REF_RECT])],
            [np.array([p[1] for p in SQUARE]), np.array([p[1] for p in REF_RECT])],
            [np.array([0, 5]), np.array([0, 5])],
            [np.array([0, 1]), np.array([0, 1])],
        )
        a = G.batch_area(bg)
        assert a[0] == pytest.approx(16.0)
        assert a[1] == pytest.approx(G.batch_area(rows[1])[0])

    def test_degenerate_collinear_ring(self):
        line = [(0.0, 0.0), (1.0, 1.0), (2.0, 2.0), (0.0, 0.0)]
        assert G.batch_area(bg_single([line]))[0] == pytest.approx(0.0)


class TestCentroid:
    def test_square(self):
        cx, cy = G.batch_centroid(bg_single([SQUARE]))
        assert (cx[0], cy[0]) == (pytest.approx(2.0), pytest.approx(2.0))

    def test_hole_shifts_centroid(self):
        # hole at lower-left corner pushes centroid up-right
        cx, cy = G.batch_centroid(bg_single([SQUARE, HOLE]))
        assert cx[0] > 2.0 and cy[0] > 2.0
        # exact: (16*2 - 1*1.5) / 15
        assert cx[0] == pytest.approx((16 * 2 - 1 * 1.5) / 15)
        assert cy[0] == pytest.approx((16 * 2 - 1 * 1.5) / 15)

    def test_area_weighted_multipart(self):
        sq2 = [(10.0, 10.0), (12.0, 10.0), (12.0, 12.0), (10.0, 12.0), (10.0, 10.0)]
        cx, cy = G.batch_centroid(bg_single([SQUARE, sq2], parts=[0, 1, 2]))
        # weights 16 @(2,2) and 4 @(11,11)
        assert cx[0] == pytest.approx((16 * 2 + 4 * 11) / 20)
        assert cy[0] == pytest.approx((16 * 2 + 4 * 11) / 20)

    def test_winding_independent(self):
        cw = [SQUARE[0]] + SQUARE[-2:0:-1] + [SQUARE[0]]
        cx, cy = G.batch_centroid(bg_single([cw]))
        assert (cx[0], cy[0]) == (pytest.approx(2.0), pytest.approx(2.0))

    def test_degenerate_falls_back_to_vertex_mean(self):
        line = [(0.0, 0.0), (2.0, 2.0), (4.0, 4.0), (0.0, 0.0)]
        cx, cy = G.batch_centroid(bg_single([line]))
        assert np.isfinite(cx[0]) and np.isfinite(cy[0])


class TestBbox:
    def test_reference_ordering_quirk(self):
        # non-point: [minx, maxx, miny, maxy] (ndjson-common/src/common.rs:59-61)
        bb = G.batch_bbox(bg_single([SQUARE]), is_point=np.array([False]))
        assert list(bb[0]) == [0.0, 4.0, 0.0, 4.0]

    def test_point_ordering(self):
        # point: [x, y, x, y] (common.rs:24-27)
        bg = G.BatchGeometry(
            [np.array([7.0])], [np.array([9.0])], [np.array([0, 1])], [np.array([0, 1])]
        )
        bb = G.batch_bbox(bg, is_point=np.array([True]))
        assert list(bb[0]) == [7.0, 9.0, 7.0, 9.0]


class TestPIP:
    def test_basic(self):
        px = np.array([2.0, 5.0, 1.5, 0.0])
        py = np.array([2.0, 2.0, 1.5, -1.0])
        xs = np.array([p[0] for p in SQUARE + HOLE])
        ys = np.array([p[1] for p in SQUARE + HOLE])
        got = G.points_in_polygon(px, py, xs, ys, [0, 5, 10], [0, 2])
        # (2,2) on hole corner boundary -> even-odd; use clear cases
        assert got[1] == False  # outside  # noqa: E712
        assert got[3] == False  # below  # noqa: E712
        assert got[2] == False  # inside the hole  # noqa: E712

    def test_inside_and_hole(self):
        px = np.array([3.0, 1.5])
        py = np.array([3.0, 1.5])
        xs = np.array([p[0] for p in SQUARE + HOLE])
        ys = np.array([p[1] for p in SQUARE + HOLE])
        got = G.points_in_polygon(px, py, xs, ys, [0, 5, 10], [0, 2])
        assert got[0] == True and got[1] == False  # noqa: E712


class TestDistance:
    def test_squared(self):
        # reference writes squared distance (nearest_distance.rs:64-75)
        d = G.squared_distance([0.0], [0.0], [3.0], [4.0])
        assert d[0] == pytest.approx(25.0)


class TestClip:
    def test_overlapping_squares(self):
        ax = [0.0, 4.0, 4.0, 0.0]
        ay = [0.0, 0.0, 4.0, 4.0]
        bx = [2.0, 6.0, 6.0, 2.0]
        by = [2.0, 2.0, 6.0, 6.0]
        a = G.polygon_intersection_area(ax, ay, bx, by)
        assert a == pytest.approx(4.0)

    def test_contained(self):
        ax = [1.0, 2.0, 2.0, 1.0]
        ay = [1.0, 1.0, 2.0, 2.0]
        bx = [0.0, 4.0, 4.0, 0.0]
        by = [0.0, 0.0, 4.0, 4.0]
        assert G.polygon_intersection_area(ax, ay, bx, by) == pytest.approx(1.0)

    def test_disjoint(self):
        ax = [0.0, 1.0, 1.0, 0.0]
        ay = [0.0, 0.0, 1.0, 1.0]
        bx = [5.0, 6.0, 6.0, 5.0]
        by = [5.0, 5.0, 6.0, 6.0]
        assert G.polygon_intersection_area(ax, ay, bx, by) == 0.0

    def test_clip_cw_clip_polygon_normalized(self):
        ax = [0.0, 4.0, 4.0, 0.0]
        ay = [0.0, 0.0, 4.0, 4.0]
        # CW clip square
        bx = [2.0, 2.0, 6.0, 6.0]
        by = [2.0, 6.0, 6.0, 2.0]
        assert G.polygon_intersection_area(ax, ay, bx, by) == pytest.approx(4.0)


class TestMercator:
    def test_roundtrip(self):
        lon = np.array([-122.4194, 0.0, 151.2093])
        lat = np.array([37.7749, 0.0, -33.8688])
        x, y = C.lonlat_to_mercator(lon, lat)
        lon2, lat2 = C.mercator_to_lonlat(x, y)
        np.testing.assert_allclose(lon2, lon, atol=1e-9)
        np.testing.assert_allclose(lat2, lat, atol=1e-9)

    def test_known_point(self):
        # closed-form web-mercator: lon 180 -> x = pi * R
        x, _ = C.lonlat_to_mercator([180.0], [0.0])
        assert x[0] == pytest.approx(C.MERC_MAX)


class TestCells:
    def test_id_roundtrip(self):
        tx = np.array([0, 1, 123456, (1 << 20) - 1], np.uint64)
        ty = np.array([0, 2, 654321, (1 << 20) - 1], np.uint64)
        cid = C.cell_id(tx, ty, 20)
        rx, ry = C.cell_tile_xy(cid)
        np.testing.assert_array_equal(rx, tx.astype(np.int64))
        np.testing.assert_array_equal(ry, ty.astype(np.int64))
        np.testing.assert_array_equal(C.cell_resolution(cid), 20)

    def test_parent_prefix(self):
        cid = C.cell_id([1023], [511], 10)
        p = C.cell_parent(cid, 8)
        tx, ty = C.cell_tile_xy(p)
        assert (tx[0], ty[0]) == (1023 >> 2, 511 >> 2)
        assert C.cell_resolution(p)[0] == 8

    def test_zorder_locality(self):
        # neighbors at fine res share coarse parents
        a = C.cell_id([100], [100], 12)
        b = C.cell_id([101], [100], 12)
        assert C.cell_parent(a, 6)[0] == C.cell_parent(b, 6)[0]

    def test_ring1_has_8_neighbors_interior(self):
        cid = C.cell_id([100], [100], 12)
        ring = C.cell_neighbors_ring(cid, 1)
        assert ring.shape == (1, 8)
        assert (ring >= 0).all()
        txs, tys = C.cell_tile_xy(ring[0])
        assert sorted(zip(txs.tolist(), tys.tolist())) == sorted(
            (100 + dx, 100 + dy)
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
            if (dx, dy) != (0, 0)
        )

    def test_ring_edge_clipped(self):
        cid = C.cell_id([0], [0], 5)
        ring = C.cell_neighbors_ring(cid, 1)
        assert (ring == -1).sum() == 5  # corner cell: only 3 valid neighbors

    def test_point_cells_deterministic(self):
        x, y = C.lonlat_to_mercator([-122.4, -122.4], [37.77, 37.77])
        cid = C.point_cells(x, y, 15)
        assert cid[0] == cid[1]

    def test_bbox_cells_cover_contains_point_cell(self):
        x, y = C.lonlat_to_mercator([10.0], [45.0])
        pc = C.point_cells(x, y, 12)[0]
        covers, res_used = C.bbox_cells(x - 5000, y - 5000, x + 5000, y + 5000, 12)
        assert res_used[0] == 12
        assert pc in covers[0]

    def test_bbox_cells_cap_coarsens(self):
        covers, res_used = C.bbox_cells(
            [-C.MERC_MAX * 0.9], [-C.MERC_MAX * 0.9],
            [C.MERC_MAX * 0.9], [C.MERC_MAX * 0.9], 20, cap=64,
        )
        assert res_used[0] < 20
        assert len(covers[0]) <= 64

    def test_xyz_tile_equivalence(self):
        # level-z cells ARE XYZ tiles: check a known tile (lon=0+,lat=0+ at z=1 -> (1,0))
        x, y = C.lonlat_to_mercator([1.0], [1.0])
        cid = C.point_cells(x, y, 1)
        tx, ty = C.cell_tile_xy(cid)
        assert (tx[0], ty[0]) == (1, 0)


class TestGeohash:
    def bisect_geohash(self, lon, lat, p):
        """Independent textbook implementation: interval bisection."""
        from ndjson_spatial_spark.functions.cells_fn import GEOHASH_BASE32
        lo_lon, hi_lon, lo_lat, hi_lat = -180.0, 180.0, -90.0, 90.0
        out, bit, ch, even = [], 0, 0, True
        while len(out) < p:
            if even:
                mid = (lo_lon + hi_lon) / 2
                if lon >= mid:
                    ch = ch * 2 + 1
                    lo_lon = mid
                else:
                    ch = ch * 2
                    hi_lon = mid
            else:
                mid = (lo_lat + hi_lat) / 2
                if lat >= mid:
                    ch = ch * 2 + 1
                    lo_lat = mid
                else:
                    ch = ch * 2
                    hi_lat = mid
            even = not even
            bit += 1
            if bit == 5:
                out.append(GEOHASH_BASE32[ch])
                bit, ch = 0, 0
        return "".join(out)

    def test_matches_bisection_reference(self, spark):
        import numpy as np
        from pyspark.sql import functions as F

        from ndjson_spatial_spark.functions.cells_fn import st_geohash

        rng = np.random.default_rng(42)
        pts = [(float(lo), float(la))
               for lo, la in zip(rng.uniform(-179.9, 179.9, 120),
                                 rng.uniform(-89.9, 89.9, 120))]
        df = spark.createDataFrame(pts, ["lon", "lat"])
        for p in (1, 4, 5, 8, 9, 12):
            got = [r.g for r in df.select(
                st_geohash(F.col("lon"), F.col("lat"), p).alias("g")
            ).collect()]
            want = [self.bisect_geohash(lo, la, p) for lo, la in pts]
            assert got == want, p

    def test_canonical_vector(self, spark):
        from pyspark.sql import functions as F

        from ndjson_spatial_spark.functions.cells_fn import st_geohash

        df = spark.createDataFrame([(10.40744, 57.64911)], ["lon", "lat"])
        assert df.select(
            st_geohash(F.col("lon"), F.col("lat"), 11).alias("g")
        ).collect()[0].g == "u4pruydqqvj"

    def test_decode_brackets_point_and_cell_size(self, spark):
        import math

        import numpy as np
        from pyspark.sql import functions as F

        from ndjson_spatial_spark.functions.cells_fn import (decode_geohash,
                                                             st_geohash)

        rng = np.random.default_rng(7)
        pts = [(float(lo), float(la))
               for lo, la in zip(rng.uniform(-179.9, 179.9, 60),
                                 rng.uniform(-89.9, 89.9, 60))]
        df = spark.createDataFrame(pts, ["lon", "lat"])
        for p in (1, 4, 9, 12):
            enc = df.select("lon", "lat",
                            st_geohash(F.col("lon"), F.col("lat"), p)
                            .alias("gh"))
            for r in decode_geohash(enc, "gh", p).collect():
                assert r.lon_min <= r.lon < r.lon_max
                assert r.lat_min <= r.lat < r.lat_max
                n_lon = (5 * p + 1) // 2
                assert math.isclose(r.lon_max - r.lon_min,
                                    360.0 / (1 << n_lon), rel_tol=1e-12)

    def test_decode_rejects_invalid(self, spark):
        from ndjson_spatial_spark.functions.cells_fn import decode_geohash

        df = spark.createDataFrame(
            [(1, "u4pruydqq"), (2, "u4pruydqA"), (3, "short"), (4, None),
             (5, "u4pruydqi")],   # 'i' is not base32
            ["id", "gh"])
        out = {r.id: r.lon_min for r in
               decode_geohash(df, "gh", 9).collect()}
        assert out[1] is not None
        assert out[2] is None and out[3] is None and out[4] is None
        assert out[5] is None

    def test_decode_plan_stays_codegen(self, spark):
        from pyspark.sql import functions as F

        from ndjson_spatial_spark.functions.cells_fn import (decode_geohash,
                                                             st_geohash)

        df = spark.createDataFrame([(10.4, 57.6)], ["lon", "lat"]).select(
            st_geohash(F.col("lon"), F.col("lat"), 11).alias("gh"))
        plan = decode_geohash(df, "gh", 11)._jdf.queryExecution() \
            .executedPlan().toString()
        assert plan.startswith("*(1)")   # whole-stage codegen retained


class TestDatumShift:
    """Round-5 Helmert datum kernels (kernels/crs.py; the reference gets
    datum shifts implicitly from GDAL, transform.rs:55-65)."""

    def test_position_vector_worked_example(self):
        # EPSG GN 7-2 method 9606 worked example: WGS72 -> WGS84
        # (tz=+4.5 m, rz=+0.554", ds=+0.219 ppm)
        from ndjson_spatial_spark.kernels import crs as K

        xp, yp, zp = K.helmert_geocentric(
            3657660.66, 255768.55, 5201382.11,
            (0.0, 0.0, 4.5, 0.0, 0.0, 0.554, 0.219))
        assert float(xp) == pytest.approx(3657660.78, abs=0.02)
        assert float(yp) == pytest.approx(255778.43, abs=0.01)
        assert float(zp) == pytest.approx(5201387.75, abs=0.01)

    def test_three_param_translation(self):
        from ndjson_spatial_spark.kernels import crs as K

        xp, yp, zp = K.helmert_geocentric(100.0, 200.0, 300.0,
                                          (-8.0, 160.0, 176.0))
        assert (float(xp), float(yp), float(zp)) == (92.0, 360.0, 476.0)

    def test_geodetic_geocentric_roundtrip(self):
        from ndjson_spatial_spark.kernels import crs as K

        lon = np.array([-3.2, 151.2, 0.0, 179.9])
        lat = np.array([55.5, -33.8, 51.4779, -89.0])
        x, y, z = K.geodetic_to_geocentric(lon, lat, 0.0, "WGS84")
        lo, la = K.geocentric_to_geodetic(x, y, z, "WGS84")
        assert np.max(np.abs(lo - lon)) < 1e-12
        assert np.max(np.abs(la - lat)) < 1e-12

    def test_osgb36_shift_magnitude(self):
        # The OSGB36<->WGS84 offset in SE England is famously ~100-120 m;
        # without the datum step it was 0.  Also: to/from are inverses.
        from ndjson_spatial_spark.kernels import crs as K
        from ndjson_spatial_spark.kernels.epsg import _OSGB36

        lon, lat = np.array([0.0]), np.array([51.4779])
        lo, la = K.datum_from_wgs84(lon, lat, "airy", _OSGB36)
        dx_m = float(lo[0]) * 111320.0 * np.cos(np.radians(51.4779))
        dy_m = (float(la[0]) - 51.4779) * 110574.0
        assert 80.0 < abs(dx_m) < 140.0
        assert 30.0 < abs(dy_m) < 90.0
        back = K.datum_to_wgs84(lo, la, "airy", _OSGB36)
        assert float(back[0][0]) == pytest.approx(0.0, abs=1e-7)
        assert float(back[1][0]) == pytest.approx(51.4779, abs=1e-7)

    def test_proj4_towgs84_parsing(self):
        from ndjson_spatial_spark.kernels.epsg import parse_proj4

        s = parse_proj4("+proj=longlat +ellps=airy "
                        "+towgs84=446.448,-125.157,542.06,"
                        "0.1502,0.247,0.8421,-20.4894")
        assert s["proj"] == "longlat" and s["ellps"] == "airy"
        assert len(s["towgs84"]) == 7
        # all-zero towgs84 == identity (proj4 treats it as absent)
        s0 = parse_proj4("+proj=utm +zone=33 +towgs84=0,0,0")
        assert "towgs84" not in s0
        sn = parse_proj4("+proj=utm +zone=15 +datum=NAD27")
        assert sn["ellps"] == "clrk66" and sn["towgs84"] == (-8.0, 160.0, 176.0)

    def test_nad27_utm_registry(self):
        from ndjson_spatial_spark.kernels.epsg import epsg_params

        s = epsg_params(26715)  # NAD27 / UTM 15N
        assert s["ellps"] == "clrk66" and s["lon_0"] == -93.0
        assert s["towgs84"] == (-8.0, 160.0, 176.0)
        # NAD83 neighbour carries none (WGS84-equivalent datum)
        assert "towgs84" not in epsg_params(26915)


class TestHexIndex:
    def test_assigns_nearest_hex_center(self, spark):
        """Cube rounding assigns each point to the hex whose center is
        euclidean-nearest (the defining property of the pixel->hex map;
        ties impossible on this lattice)."""
        import math

        from pyspark.sql import functions as F

        from ndjson_spatial_spark.functions.cells_fn import (
            SQRT3, hex_center_expr, st_hex_index)

        size = 64.0
        pts = [(float(17 * i % 311 - 150), float(23 * i % 331 - 160))
               for i in range(400)]
        df = spark.createDataFrame(pts, "px double, py double")
        out = df.select(
            "px", "py",
            st_hex_index(F.col("px"), F.col("py"), size).alias("h"),
        ).select("px", "py", "h.q", "h.r").collect()

        def center(q, r):
            return (size * 1.5 * q, size * (SQRT3 / 2.0 * q + SQRT3 * r))

        for row in out:
            cx, cy = center(row.q, row.r)
            d0 = (row.px - cx) ** 2 + (row.py - cy) ** 2
            # every hex center within 3 rings must be no closer
            for dq in range(-3, 4):
                for dr in range(-3, 4):
                    ox, oy = center(row.q + dq, row.r + dr)
                    d = (row.px - ox) ** 2 + (row.py - oy) ** 2
                    assert d >= d0 - 1e-9, (row, dq, dr)

    def test_center_roundtrip_and_origin(self, spark):
        from pyspark.sql import functions as F

        from ndjson_spatial_spark.functions.cells_fn import (
            hex_center_expr, st_hex_index)

        cells = [(q, r) for q in range(-4, 5) for r in range(-4, 5)]
        df = spark.createDataFrame(cells, "q long, r long")
        out = df.select(
            "q", "r",
            hex_center_expr(F.col("q"), F.col("r"), 100.0).alias("c"),
        ).select(
            "q", "r",
            st_hex_index(F.col("c.x"), F.col("c.y"), 100.0).alias("h"),
        ).collect()
        for row in out:
            assert (row.h.q, row.h.r) == (row.q, row.r)

    def test_validation(self, spark):
        import pytest as _pt
        from pyspark.sql import functions as F

        from ndjson_spatial_spark.functions.cells_fn import st_hex_index
        with _pt.raises(ValueError):
            st_hex_index(F.lit(0.0), F.lit(0.0), 0.0)


class TestConvexClipBatch:
    """clip_rings_convex_batch must be bit-identical (values AND vertex
    order) to per-row clip_polygon_convex — the round-5 batched overlay
    path for convex-clip and concave x concave (triangle-unit) pairs."""

    def test_bit_parity_random_mixed_clip_sizes(self):
        import numpy as np
        import ndjson_spatial_spark.kernels.geometry as KG

        rng = np.random.default_rng(11)
        subs, clips = [], []
        for _ in range(300):
            ns = int(rng.integers(3, 15))
            nc = int(rng.integers(3, 10))
            ang = np.sort(rng.uniform(0, 2 * np.pi, ns))
            rad = rng.uniform(2, 10, ns)
            sx = rng.uniform(-6, 6) + rad * np.cos(ang)
            sy = rng.uniform(-6, 6) + rad * np.sin(ang)
            ang = np.sort(rng.uniform(0, 2 * np.pi, nc))
            r = rng.uniform(2, 9)
            cx = rng.uniform(-6, 6) + r * np.cos(ang)
            cy = rng.uniform(-6, 6) + r * np.sin(ang)
            if KG._signed_area(cx, cy) == 0:
                continue
            if KG._signed_area(cx, cy) < 0:
                cx, cy = cx[::-1], cy[::-1]
            subs.append((sx, sy))
            clips.append((cx, cy))
        X, Y, c = KG.pad_rings_batch(subs)
        CX, CY, cc = KG.pad_rings_batch(clips)
        # mixed clip sizes force surplus passes on most rows
        assert int(cc.min()) < int(cc.max())
        OX, OY, oc = KG.clip_rings_convex_batch(X, Y, c, CX, CY, cc)
        for r, ((sx, sy), (cx, cy)) in enumerate(zip(subs, clips)):
            ex, ey = KG.clip_polygon_convex(sx, sy, cx, cy)
            m = int(oc[r])
            assert len(ex) == m
            assert np.array_equal(ex, OX[r, :m])
            assert np.array_equal(ey, OY[r, :m])

    def test_triangle_units_match_scalar_and_integer_lattice(self):
        import numpy as np
        import ndjson_spatial_spark.kernels.geometry as KG

        # integer-lattice subject clipped by the triangles of a concave
        # ring — the case-D unit shape
        concave = (np.array([0.0, 10.0, 10.0, 5.0, 0.0]),
                   np.array([0.0, 0.0, 10.0, 4.0, 10.0]))
        tris = KG.triangulate_ring(*concave)
        assert len(tris) >= 2
        subj = (np.array([2.0, 9.0, 9.0, 2.0]),
                np.array([1.0, 1.0, 9.0, 9.0]))
        X, Y, c = KG.pad_rings_batch([subj] * len(tris))
        TX = np.array([tx for tx, _ in tris])
        TY = np.array([ty for _, ty in tris])
        cc = np.full(len(tris), 3, np.int64)
        OX, OY, oc = KG.clip_rings_convex_batch(X, Y, c, TX, TY, cc)
        for u, (tx, ty) in enumerate(tris):
            ex, ey = KG.clip_polygon_convex(subj[0], subj[1], tx, ty)
            m = int(oc[u])
            assert len(ex) == m
            assert np.array_equal(ex, OX[u, :m])
            assert np.array_equal(ey, OY[u, :m])

    def test_disjoint_rows_report_degenerate_counts(self):
        import numpy as np
        import ndjson_spatial_spark.kernels.geometry as KG

        subj = (np.array([0.0, 1.0, 1.0, 0.0]),
                np.array([0.0, 0.0, 1.0, 1.0]))
        clip = (np.array([5.0, 7.0, 6.0]), np.array([5.0, 5.0, 7.0]))
        X, Y, c = KG.pad_rings_batch([subj])
        CX, CY, cc = KG.pad_rings_batch([clip])
        _, _, oc = KG.clip_rings_convex_batch(X, Y, c, CX, CY, cc)
        assert int(oc[0]) < 3

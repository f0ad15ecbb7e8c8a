import numpy as np

from osmquadtreepostgis_ray.functions import ewkb, geometry as g, mercator


def _sq(x0, y0, x1, y1):
    return np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]], dtype=float)


def test_area_length():
    r = _sq(0, 0, 2, 3)
    assert g.ring_signed_area(r) == 6.0
    assert g.ring_signed_area(r[::-1]) == -6.0
    hole = _sq(0.5, 0.5, 1.5, 1.5)
    assert g.polygon_area([r, hole]) == 5.0
    assert g.path_length(np.array([[0, 0], [3, 4]])) == 5.0


def test_validate_rings():
    open_dup = np.array([[0, 0], [2, 0], [2, 0], [2, 2], [0, 2]], dtype=float)
    out = g.validate_rings([open_dup[::-1]])  # wrong orientation, open, dup
    assert len(out) == 1
    r = out[0]
    assert np.array_equal(r[0], r[-1])
    assert g.ring_signed_area(r) > 0
    # degenerate ring dropped
    assert g.validate_rings([np.array([[0, 0], [1, 1]])]) == []


def test_point_on_surface_inside():
    # concave L-shape where the centroid falls outside
    L = np.array([[0, 0], [4, 0], [4, 1], [1, 1], [1, 4], [0, 4], [0, 0]], dtype=float)
    p = g.point_on_surface([L])
    assert g.points_in_polygon(p[None, :], [L])[0]


def test_pip_with_hole():
    outer = _sq(0, 0, 10, 10)
    hole = _sq(4, 4, 6, 6)[::-1]
    pts = np.array([[1, 1], [5, 5], [11, 5], [4.5, 5]])
    res = g.points_in_polygon(pts, [outer, hole])
    assert res.tolist() == [True, False, False, False]


def test_simplify():
    x = np.linspace(0, 10, 101)
    line = np.stack([x, np.zeros_like(x)], axis=1)
    line[50, 1] = 5.0
    s = g.simplify(line, 1.0)
    assert len(s) == 5  # spike kept, collinear runs collapsed
    assert 5.0 in s[:, 1]
    flat = np.stack([x, np.zeros_like(x)], axis=1)
    assert len(g.simplify(flat, 0.5)) == 2
    ring = _sq(0, 0, 1, 1)
    assert np.array_equal(g.simplify_ring(ring, 100.0), ring)  # no collapse


def test_grid_index_matches_bruteforce():
    rs = np.random.RandomState(7)
    polys = []
    for i in range(30):
        x0, y0 = rs.uniform(0, 90, 2)
        polys.append((i, [_sq(x0, y0, x0 + rs.uniform(1, 10), y0 + rs.uniform(1, 10))]))
    pts = rs.uniform(0, 100, size=(500, 2))
    idx = g.GridIndex(polys)
    pi, zi = idx.query(pts)
    got = set(zip(pi.tolist(), zi.tolist()))
    want = set()
    for zid, rings in polys:
        hit = g.points_in_polygon(pts, rings)
        for j in np.flatnonzero(hit):
            want.add((int(j), zid))
    assert got == want


def test_ewkb_roundtrip():
    b = ewkb.point(1.5, -2.5)
    t, srid, c = ewkb.parse(b)
    assert (t, srid) == (ewkb.WKB_POINT, 3857)
    assert c.tolist() == [1.5, -2.5]

    ls = np.array([[0, 0], [1, 1], [2, 0]], dtype=float)
    t, srid, c = ewkb.parse(ewkb.linestring(ls))
    assert np.array_equal(c, ls)

    rings = [_sq(0, 0, 4, 4), _sq(1, 1, 2, 2)[::-1]]
    t, srid, rr = ewkb.parse(ewkb.polygon(rings))
    assert t == ewkb.WKB_POLYGON and len(rr) == 2
    assert np.array_equal(rr[0], rings[0])

    mp = ewkb.multipolygon([[_sq(0, 0, 1, 1)], [_sq(5, 5, 6, 6)]])
    t, srid, parts = ewkb.parse(mp)
    assert t == ewkb.WKB_MULTIPOLYGON and len(parts) == 2


def test_ewkb_vectorized_matches_scalar():
    x = np.array([0.0, 12.5, -7.25])
    y = np.array([1.0, -3.5, 88.0])
    vec = ewkb.points_vectorized(x, y)
    for i in range(3):
        assert vec[i] == ewkb.point(x[i], y[i])
    boxes = ewkb.box_polygons_vectorized(x, y, x + 1, y + 1)
    t, srid, rr = ewkb.parse(boxes[1])
    assert t == ewkb.WKB_POLYGON
    assert rr[0][0].tolist() == [12.5, -3.5]
    assert len(rr[0]) == 5


def test_mercator_roundtrip():
    lon = np.array([-180.0, 0.0, 123.456])
    lat = np.array([-85.0, 0.0, 51.5])
    x, y = mercator.forward(lon, lat)
    lo, la = mercator.inverse(x, y)
    assert np.allclose(lo, lon) and np.allclose(la, lat)
    x2, _ = mercator.forward(lon, lat, round_2dp=True)
    assert np.all(np.round(x2, 2) == x2)

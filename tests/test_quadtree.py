import duckdb
import numpy as np

from osmquadtreepostgis_ray.functions import quadtree as qt


def test_roundtrip_ixy():
    rs = np.random.RandomState(0)
    for depth in (1, 4, 8, 16, 26):
        n = 1 << depth
        ix = rs.randint(0, n, 1000)
        iy = rs.randint(0, n, 1000)
        cell = qt.encode_ixy(ix, iy, depth)
        dx, dy, dd = qt.decode(cell)
        assert np.array_equal(dx, ix)
        assert np.array_equal(dy, iy)
        assert np.all(dd == depth)


def test_encode_degrees_exact_fixed_point():
    # milli-degree inputs land in the exact integer cell
    lon_milli = np.array([0, 11250, 179999, 359999, 123456])
    lat_milli = np.array([0, 84999, 169999, 85000, 99999])
    lon = lon_milli / 1000.0 - 180.0
    lat = (lat_milli + 5000) / 1000.0 - 90.0   # shift into [-90,90)
    cell = qt.encode(lon, lat, 8)
    ix_exp = (lon_milli * 10000 * 256) // qt.LON_SPAN
    iy_exp = ((lat_milli + 5000) * 10000 * 256) // qt.LAT_SPAN
    ix, iy, _ = qt.decode(cell)
    assert np.array_equal(ix, ix_exp)
    assert np.array_equal(iy, iy_exp)


def test_parent_at_depth_children():
    cell = qt.encode_ixy(np.array([300]), np.array([77]), 10)[0]
    p = qt.parent(np.array([cell]))[0]
    ix, iy, d = qt.decode(np.array([p]))
    assert (ix[0], iy[0], d[0]) == (150, 38, 9)
    assert int(qt.at_depth(np.array([cell]), 9)[0]) == int(p)
    kids = qt.children(p)
    assert len(kids) == 4
    assert all(int(qt.parent(np.array([k]))[0]) == int(p) for k in kids)


def test_ring_and_disk():
    c = qt.encode_ixy(np.array([10]), np.array([10]), 6)[0]
    r1 = qt.ring(c, 1)
    assert len(r1) == 8
    d1 = qt.disk(c, 1)
    assert len(d1) == 9
    assert set(r1.tolist()) | {int(c)} == set(d1.tolist())
    # edge clipping
    corner = qt.encode_ixy(np.array([0]), np.array([0]), 6)[0]
    assert len(qt.ring(corner, 1)) == 3


def test_sql_interleave_matches_numpy():
    con = duckdb.connect()
    depth = 8
    rows = con.sql(
        f"""
        WITH pts AS (
            SELECT range AS i,
                   (range * 9973) % 360000 AS lonm,
                   (range * 7907) % 170000 AS latm
            FROM range(2000)
        )
        SELECT i,
               {qt.interleave_sql(f'((lonm * 10000) * 256) // {qt.LON_SPAN}', f'(((latm + 5000) * 10000) * 256) // {qt.LAT_SPAN}', depth)} AS cell
        FROM pts ORDER BY i
        """
    ).fetchnumpy()
    i = rows["i"].astype(np.int64)
    lonm = (i * 9973) % 360000
    latm = (i * 7907) % 170000
    ix, iy = qt.fixed_to_ixy(lonm * 10000, (latm + 5000) * 10000, depth)
    cells = qt.encode_ixy(ix, iy, depth)
    assert np.array_equal(rows["cell"].astype(np.int64), cells)


def test_quadkey_roundtrip_and_prefix_property():
    """quadkey: digits rebuild (ix, iy) exactly; a child's quadkey is
    its parent's quadkey plus one digit (the pyramid prefix property
    web-map servers rely on); uniform-depth guard raises."""
    import numpy as np
    import pytest
    from osmquadtreepostgis_ray.functions import quadtree as qt

    rng = np.random.RandomState(7)
    depth = 8
    ix = rng.randint(0, 1 << depth, 200).astype(np.int64)
    iy = rng.randint(0, 1 << depth, 200).astype(np.int64)
    cells = qt.encode_ixy(ix, iy, depth)
    qks = qt.quadkey(cells)
    assert all(len(q) == depth for q in qks)
    for q, x, y in zip(qks, ix, iy):
        rx = ry = 0
        for ch in q:
            d = int(ch)
            rx = rx * 2 + (d & 1)
            ry = ry * 2 + (d >> 1)
        assert (rx, ry) == (x, y)

    parents = qt.parent(cells)
    pqk = qt.quadkey(parents)
    assert all(q[:-1] == p for q, p in zip(qks, pqk))

    mixed = np.concatenate([cells[:1], parents[:1]])
    with pytest.raises(ValueError):
        qt.quadkey(mixed)

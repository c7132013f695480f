"""Conformance: tile_hash_32 cell index vs a literal scalar re-derivation of
src/latlng.cc:75-96 (untested upstream; the scalar oracle follows the C++
statement by statement)."""

import numpy as np

from geo_ray.kernels import cell as C
from geo_ray.kernels import mercator as M


def scalar_tile_hash_32(lat: float, lng: float) -> int:
    """Direct transliteration of the reference loop (oracle for the vector kernel)."""
    mx, my = M.latlng_to_merc(lat, lng)
    x = int(M.merc_to_pixel_x(mx, 16, tile_size=1))
    y = int(M.merc_to_pixel_y(my, 16, tile_size=1))
    z = 16
    h = 0
    for offset in range(0, 32, 2):
        quad = ((y % 2) << 1) | (x % 2)
        h |= quad << offset
        x >>= 1
        y >>= 1
        z -= 1
    assert z == 0
    return h & 0xFFFFFFFF


def test_hash_matches_scalar_oracle():
    rng = np.random.default_rng(11)
    lat = rng.uniform(-85, 85, 500)
    lng = rng.uniform(-180, 180, 500)
    h = C.tile_hash_32(lat, lng)
    for i in range(0, 500, 13):
        assert int(h[i]) == scalar_tile_hash_32(lat[i], lng[i])


def test_prefix_is_spatial():
    # nearby points share coarse prefixes; antipodal points do not
    h1 = C.tile_hash_32(np.array([49.8726]), np.array([8.6310]))
    h2 = C.tile_hash_32(np.array([49.8728]), np.array([8.6312]))
    h3 = C.tile_hash_32(np.array([-49.87]), np.array([-171.37]))
    assert C.cell_prefix(h1, 10) == C.cell_prefix(h2, 10)
    assert C.cell_prefix(h1, 2) != C.cell_prefix(h3, 2)


def test_cell_at_zoom_consistent_with_prefix():
    rng = np.random.default_rng(12)
    lat = rng.uniform(-80, 80, 200)
    lng = rng.uniform(-180, 180, 200)
    x, y = C.cell_at_zoom(lat, lng, 8)
    h = C.tile_hash_32(lat, lng)
    p = C.cell_prefix(h, 8)
    # prefix is the morton interleave of the zoom-8 cell coords
    expect = C.hash_from_xy(x, y) & np.uint32(0xFFFF)
    assert (p == expect).all()


def test_neighbor_cells_ring():
    row, nx, ny = C.neighbor_cells(np.array([5]), np.array([5]), zoom=4, ring=1)
    assert row.size == 9
    assert sorted(zip(nx.tolist(), ny.tolist()))[0] == (4, 4)
    # clipped at the world edge
    row, nx, ny = C.neighbor_cells(np.array([0]), np.array([0]), zoom=4, ring=1)
    assert row.size == 4
    assert (nx >= 0).all() and (ny >= 0).all()


def test_geohash_known_values():
    """Public geohash goldens: Wikipedia's (57.64911, 10.40744) -> u4pruyd
    and the original 'ezs42' example; encode is pure bit interleave."""
    import numpy as np

    from geo_ray.kernels import geohash as gh

    got = gh.geohash_encode(
        np.array([57.64911, 42.6]), np.array([10.40744, -5.6]), 7
    )
    assert got[0] == "u4pruyd"
    assert got[1][:5] == "ezs42"
    # cell value round-trips through the string alphabet
    cells = gh.geohash_cell(np.array([57.64911]), np.array([10.40744]), 7)
    s = "".join(gh.ALPHABET[(int(cells[0]) >> (5 * (6 - c))) & 31] for c in range(7))
    assert s == "u4pruyd"


def test_cube_cell_properties():
    """Face selection, hierarchy algebra and locality of the S2-style id."""
    import numpy as np

    from geo_ray.kernels import cubecell as cc

    # (0, 0): y is the dominant positive axis -> face 2, centered (u, v)
    face, u, v = cc.cube_face_uv(np.array([0.0]), np.array([0.0]))
    assert face[0] == 2 and abs(u[0]) < 1e-15 and abs(v[0]) < 1e-15
    # poles land on the z faces
    assert cc.cube_face_uv(np.array([89.9]), np.array([13.0]))[0][0] == 4
    assert cc.cube_face_uv(np.array([-89.9]), np.array([13.0]))[0][0] == 5
    rng = np.random.default_rng(5)
    lat = rng.uniform(-85, 85, 500)
    lng = rng.uniform(-180, 180, 500)
    cell = cc.cube_cell(lat, lng, 12)
    assert (cell >= 0).all() and (cell < 6 * 4**12).all()
    # parent algebra: ancestor at level 5 == 2*(12-5)-bit right shift
    assert (cc.cube_cell_parent(cell, 12, 5) == (cell >> 14)).all()
    assert (cc.cube_cell_parent(cell, 12, 12) == cell).all()
    # locality: nearby points share their coarse ancestor
    c1 = cc.cube_cell(np.array([49.0]), np.array([8.0]), 12)
    c2 = cc.cube_cell(np.array([49.0001]), np.array([8.0001]), 12)
    assert cc.cube_cell_parent(c1, 12, 5)[0] == cc.cube_cell_parent(c2, 12, 5)[0]


def test_geohash_roundtrip():
    import numpy as np

    from geo_ray.kernels import geohash as gh

    rng = np.random.default_rng(9)
    lat = rng.uniform(-85, 85, 2000)
    lng = rng.uniform(-180, 180, 2000)
    h = gh.geohash_encode(lat, lng, 7)
    clat, clng = gh.geohash_decode(h, 7)
    assert (gh.geohash_encode(clat, clng, 7) == h).all()
    # centers sit inside the original cell: re-encode at finer precision
    # may differ, but coarse prefix agrees
    h5 = gh.geohash_encode(lat, lng, 5)
    assert np.char.startswith(h.astype(str), h5.astype(str)).all()

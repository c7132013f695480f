"""Conformance: tile algebra vs /root/reference/test/tile_test.cc."""

import numpy as np

from geo_ray.kernels import tile as T


def tiles_set(xs, ys, zs):
    return sorted(zip(xs.tolist(), ys.tolist(), zs.tolist()))


def test_direct_children_root():
    xs, ys, zs = T.tiles_on_z(0, 0, 0, 1)
    assert list(zip(xs, ys, zs)) == [(0, 0, 1), (1, 0, 1), (0, 1, 1), (1, 1, 1)]


def test_direct_children_darmstadt():
    xs, ys, zs = T.tiles_on_z(8585, 5565, 14, 15)
    assert list(zip(xs, ys, zs)) == [
        (17170, 11130, 15),
        (17171, 11130, 15),
        (17170, 11131, 15),
        (17171, 11131, 15),
    ]


def test_bounds_on_z():
    # tile_test.cc:38-117
    assert tuple(int(v) for v in T.bounds_on_z(23, 42, 3, 3)) == (23, 42, 24, 43)
    assert tuple(int(v) for v in T.bounds_on_z(0, 0, 0, 1)) == (0, 0, 2, 2)
    assert tuple(int(v) for v in T.bounds_on_z(56, 84, 7, 9)) == (224, 336, 228, 340)
    assert tuple(int(v) for v in T.bounds_on_z(17170, 11131, 15, 14)) == (8585, 5565, 8586, 5566)
    assert tuple(int(v) for v in T.bounds_on_z(15670, 131, 15, 12)) == (1958, 16, 1959, 17)
    assert tuple(int(v) for v in T.bounds_on_z(12314, 23455, 15, 0)) == (0, 0, 1, 1)


def test_two_levels_down_enumeration():
    xs, ys, zs = T.tiles_on_z(56, 84, 7, 9)
    expected = [
        (224, 336, 9), (225, 336, 9), (226, 336, 9), (227, 336, 9),
        (224, 337, 9), (225, 337, 9), (226, 337, 9), (227, 337, 9),
        (224, 338, 9), (225, 338, 9), (226, 338, 9), (227, 338, 9),
        (224, 339, 9), (225, 339, 9), (226, 339, 9), (227, 339, 9),
    ]
    assert list(zip(xs, ys, zs)) == expected


def test_make_tile_range():
    xs, ys, zs = T.tile_range_tiles(2, 3, 3, 4, 6)
    assert list(zip(xs, ys, zs)) == [(2, 3, 6), (3, 3, 6), (2, 4, 6), (3, 4, 6)]


def test_parent_quad_pos():
    x = np.array([17170, 17171, 17170, 17171])
    y = np.array([11130, 11130, 11131, 11131])
    px, py, pz = T.parent(x, y, np.full(4, 15))
    assert (px == 8585).all() and (py == 5565).all() and (pz == 14).all()
    assert T.quad_pos(x, y).tolist() == [0, 1, 2, 3]


def test_pack_unpack_key_roundtrip():
    rng = np.random.default_rng(7)
    z = rng.integers(0, 21, 1000)
    x = rng.integers(0, 2**20, 1000) % (1 << np.maximum(z, 1))
    y = rng.integers(0, 2**20, 1000) % (1 << np.maximum(z, 1))
    k = T.pack_key(x, y, z)
    ux, uy, uz = T.unpack_key(k)
    assert (ux == x).all() and (uy == y).all() and (uz == z).all()
    # ordering: z is the most significant field, as in tile::operator< (tile.h:16-18)
    assert (T.pack_key(0, 0, 5) > T.pack_key(2**20, 2**20, 4)).all()


def test_latlng_tile_range_of_box():
    # darmstadt-ish box at z14 must contain the known Darmstadt tile 8585/5565
    x0, y0, x1, y1 = (
        int(v[0])
        for v in T.tile_range_of_box(
            np.array([49.95]), np.array([8.6]), np.array([49.8]), np.array([8.7]), 14
        )
    )
    assert x0 <= 8585 <= x1
    assert y0 <= 5565 <= y1

"""Tile pyramid iterator semantics, ported from the reference test suite
(/root/reference/test/tile_test.cc:15-196)."""

import itertools

from geo_ray.kernels.tile_iter import (
    Bounds,
    Tile,
    TileIterator,
    make_tile_pyramid,
    make_tile_range,
    tile_range_on_z,
)


def tiles(rng):
    return list(rng)


def test_direct_children_root():
    assert tiles(Tile(0, 0, 0).direct_children()) == [
        Tile(0, 0, 1),
        Tile(1, 0, 1),
        Tile(0, 1, 1),
        Tile(1, 1, 1),
    ]


def test_direct_children_darmstadt():
    assert tiles(Tile(8585, 5565, 14).direct_children()) == [
        Tile(17170, 11130, 15),
        Tile(17171, 11130, 15),
        Tile(17170, 11131, 15),
        Tile(17171, 11131, 15),
    ]


def test_range_on_z_same_level():
    uut = Tile(23, 42, 3)
    assert tiles(uut.range_on_z(3)) == [uut]
    assert uut.bounds_on_z(3) == Bounds(23, 42, 24, 43)


def test_range_on_z_one_down():
    uut = Tile(0, 0, 0)
    assert tiles(uut.range_on_z(1)) == [
        Tile(0, 0, 1),
        Tile(1, 0, 1),
        Tile(0, 1, 1),
        Tile(1, 1, 1),
    ]
    assert uut.bounds_on_z(1) == Bounds(0, 0, 2, 2)


def test_range_on_z_two_down():
    uut = Tile(56, 84, 7)
    expected = [
        Tile(x, y, 9) for y in (336, 337, 338, 339) for x in (224, 225, 226, 227)
    ]
    assert tiles(uut.range_on_z(9)) == expected
    assert uut.bounds_on_z(9) == Bounds(224, 336, 228, 340)


def test_range_on_z_up():
    uut = Tile(17170, 11131, 15)
    assert tiles(uut.range_on_z(14)) == [Tile(8585, 5565, 14)]
    assert uut.bounds_on_z(14) == Bounds(8585, 5565, 8586, 5566)

    uut = Tile(15670, 131, 15)
    assert tiles(uut.range_on_z(12)) == [Tile(1958, 16, 12)]
    assert uut.bounds_on_z(12) == Bounds(1958, 16, 1959, 17)

    uut = Tile(12314, 23455, 15)
    assert tiles(uut.range_on_z(0)) == [Tile(0, 0, 0)]
    assert uut.bounds_on_z(0) == Bounds(0, 0, 1, 1)


def test_iterator_increment_auto_descend():
    it = TileIterator(0, 0, 1)
    for want in [Tile(1, 0, 1), Tile(0, 1, 1), Tile(1, 1, 1), Tile(0, 0, 2)]:
        it.increment()
        assert it.tile == want


def test_iterator_decrement_auto_ascend():
    it = TileIterator.at_zoom(2)
    for want in [
        Tile(1, 1, 1),
        Tile(0, 1, 1),
        Tile(1, 0, 1),
        Tile(0, 0, 1),
        Tile(0, 0, 0),
    ]:
        it.decrement()
        assert it.tile == want


def test_iterator_bounds_descend_and_back():
    it = TileIterator(2, 4, 2, Bounds(2, 4, 3, 5))
    assert it.tile == Tile(2, 4, 2)
    it.increment()
    assert it.tile == Tile(4, 8, 3)
    it.decrement()
    assert it.tile == Tile(2, 4, 2)


def test_make_tile_range_rect():
    assert tiles(make_tile_range(2, 3, 3, 4, 6)) == [
        Tile(2, 3, 6),
        Tile(3, 3, 6),
        Tile(2, 4, 6),
        Tile(3, 4, 6),
    ]


def test_tile_range_on_z_releveling_invariant():
    """Re-leveling down then back up must preserve the tile list (the
    reference's 21x21 loop, tile_test.cc:170-186)."""
    parent = Tile(8585, 5565, 14)
    for i in range(21):
        expected = tiles(parent.range_on_z(i))
        for j in range(i, 21):
            r = tile_range_on_z(parent.as_tile_range(), j)
            actual = tiles(tile_range_on_z(r, i))
            assert actual, (i, j)
            assert actual == expected, (i, j)


def test_tile_range_full_levels():
    for z in range(10):
        n = 0
        for t in make_tile_range(z):
            assert t.z == z
            n += 1
        assert n == 4**z


def test_make_tile_pyramid_prefix():
    got = list(itertools.islice(iter(make_tile_pyramid()), 21))
    assert got[0] == Tile(0, 0, 0)
    assert [t.z for t in got] == [0] + [1] * 4 + [2] * 16
    assert got[1:5] == tiles(make_tile_range(1))[:4]

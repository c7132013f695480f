"""Point-in-polygon oracle fixtures (FIXTURES.md §5.h — untested upstream;
semantics pinned by this independent fixture set)."""

import numpy as np

from geo_ray.kernels import pip as P


def test_square():
    ring_lat = np.array([0.0, 0.0, 10.0, 10.0])
    ring_lng = np.array([0.0, 10.0, 10.0, 0.0])
    lat = np.array([5.0, 15.0, -1.0, 5.0, 9.99])
    lng = np.array([5.0, 5.0, 5.0, 15.0, 9.99])
    got = P.points_in_ring(lat, lng, ring_lat, ring_lng)
    assert got.tolist() == [True, False, False, False, True]


def test_closed_ring_equivalent():
    ring_lat = np.array([0.0, 0.0, 10.0, 10.0, 0.0])
    ring_lng = np.array([0.0, 10.0, 10.0, 0.0, 0.0])
    got = P.points_in_ring(np.array([5.0]), np.array([5.0]), ring_lat, ring_lng)
    assert got.tolist() == [True]


def test_concave_c_shape():
    # "C" opening to the east: outer 0..10, bite 2..8 from lng 4..10
    ring_lat = np.array([0.0, 0.0, 2.0, 2.0, 8.0, 8.0, 10.0, 10.0])
    ring_lng = np.array([0.0, 10.0, 10.0, 4.0, 4.0, 10.0, 10.0, 0.0])
    lat = np.array([5.0, 1.0, 9.0, 5.0])
    lng = np.array([6.0, 5.0, 5.0, 2.0])
    got = P.points_in_ring(lat, lng, ring_lat, ring_lng)
    assert got.tolist() == [False, True, True, True]


def test_winding_order_irrelevant():
    ring_lat = np.array([0.0, 0.0, 10.0, 10.0])
    ring_lng = np.array([0.0, 10.0, 10.0, 0.0])
    got_ccw = P.points_in_ring(np.array([5.0]), np.array([5.0]), ring_lat[::-1], ring_lng[::-1])
    assert got_ccw.tolist() == [True]


def test_area_with_hole():
    outer = (np.array([0.0, 0.0, 10.0, 10.0]), np.array([0.0, 10.0, 10.0, 0.0]))
    hole = (np.array([4.0, 4.0, 6.0, 6.0]), np.array([4.0, 6.0, 6.0, 4.0]))
    lat = np.array([5.0, 2.0, 11.0])
    lng = np.array([5.0, 2.0, 5.0])
    got = P.points_in_area(lat, lng, [outer], [[hole]])
    assert got.tolist() == [False, True, False]


def test_multi_outer():
    o1 = (np.array([0.0, 0.0, 1.0, 1.0]), np.array([0.0, 1.0, 1.0, 0.0]))
    o2 = (np.array([5.0, 5.0, 6.0, 6.0]), np.array([5.0, 6.0, 6.0, 5.0]))
    lat = np.array([0.5, 5.5, 3.0])
    lng = np.array([0.5, 5.5, 3.0])
    got = P.points_in_area(lat, lng, [o1, o2], [[], []])
    assert got.tolist() == [True, True, False]


def test_degenerate_rings():
    assert P.points_in_ring(np.array([0.0]), np.array([0.0]), np.array([1.0]), np.array([1.0])).tolist() == [False]
    assert (
        P.points_in_ring(np.array([0.0]), np.array([0.0]), np.array([1.0, 2.0]), np.array([1.0, 2.0])).tolist()
        == [False]
    )

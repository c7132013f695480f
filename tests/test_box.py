"""Conformance: box kernels vs /root/reference/test/box_test.cc."""

import numpy as np

from geo_ray.kernels import box as B


def test_basic_box():
    lat = np.array([49.980557, 50.002645])
    lng = np.array([9.143697, 9.072252])
    min_lat, min_lng, max_lat, max_lng = B.make_box(lat, lng)
    assert min_lat == 49.980557
    assert min_lng == 9.072252
    assert max_lat == 50.002645
    assert max_lng == 9.143697

    # contains(self) — inclusive box-in-box
    assert B.contains_box(min_lat, min_lng, max_lat, max_lng, min_lat, min_lng, max_lat, max_lng)
    # contains point-box {50.0, 9.1}
    assert B.contains_box(min_lat, min_lng, max_lat, max_lng, 50.0, 9.1, 50.0, 9.1)
    # does NOT contain a box leaking below min_lat
    assert not B.contains_box(min_lat, min_lng, max_lat, max_lng, 49.9, 9.11, 50.0, 9.12)


def test_contains_point_strict():
    # box.h:72-75 uses strict comparisons: boundary points are outside
    assert not B.contains_point(0.0, 0.0, 1.0, 1.0, 0.0, 0.5)
    assert not B.contains_point(0.0, 0.0, 1.0, 1.0, 1.0, 0.5)
    assert B.contains_point(0.0, 0.0, 1.0, 1.0, 0.5, 0.5)


def test_overlaps_inclusive():
    # box.h:82-88: touching boxes DO overlap
    assert B.overlaps(0.0, 0.0, 1.0, 1.0, 1.0, 1.0, 2.0, 2.0)
    assert not B.overlaps(0.0, 0.0, 1.0, 1.0, 1.1, 1.1, 2.0, 2.0)


def test_extend_meters():
    min_lat, min_lng, max_lat, max_lng = B.extend_meters(50.0, 9.0, 50.0, 9.0, 111000.0)
    assert np.isclose(min_lat, 49.0) and np.isclose(max_lat, 51.0)
    # lng buffer uses 111200*cos(lat) m/deg at the already-extended latitudes
    assert min_lng < 9.0 - 111000.0 / 111200.0  # wider than at the equator
    assert max_lng > 9.0 + 111000.0 / 111200.0


def test_boxes_of_lists():
    lat = np.array([1.0, 3.0, 2.0, -5.0, 0.0])
    lng = np.array([10.0, 30.0, 20.0, -50.0, 0.0])
    offsets = np.array([0, 3, 3, 5])
    mn_lat, mn_lng, mx_lat, mx_lng = B.boxes_of_lists(lat, lng, offsets)
    assert mn_lat.tolist() == [1.0, np.inf, -5.0]
    assert mx_lat.tolist() == [3.0, -np.inf, 0.0]
    assert B.is_empty(mn_lat, mn_lng, mx_lat, mx_lng).tolist() == [False, True, False]


def test_centroid():
    lat, lng = B.centroid(0.0, 0.0, 2.0, 4.0)
    assert lat == 1.0 and lng == 2.0
    lat, lng = B.centroid(np.inf, np.inf, -np.inf, -np.inf)
    assert lat == 0.0 and lng == 0.0

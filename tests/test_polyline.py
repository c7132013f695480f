"""Conformance: polyline kernels vs /root/reference/test/polyline_test.cc."""

import numpy as np
import pytest

from geo_ray.constants import EPSILON
from geo_ray.kernels import distance as D
from geo_ray.kernels import polyline as P
from geo_ray.kernels import segment as S
from tests.conftest import latlng_close


def test_distance_to_polyline_before_line():
    d, blat, blng, seg = S.distance_to_polyline(-1.0, 0.0, [0.0, 1.0], [0.0, 0.0])
    assert d[0] == pytest.approx(float(D.haversine(-1.0, 0.0, 0.0, 0.0)), rel=1e-12)
    assert latlng_close(blat[0], blng[0], 0.0, 0.0)


def test_distance_to_polyline_after_line():
    d, blat, blng, seg = S.distance_to_polyline(2.0, 0.0, [0.0, 1.0], [0.0, 0.0])
    assert seg[0] == 0
    assert d[0] == pytest.approx(float(D.haversine(2.0, 0.0, 1.0, 0.0)), rel=1e-12)
    assert latlng_close(blat[0], blng[0], 1.0, 0.0)


def test_distance_to_polyline_point_on_line():
    line_lat = [0.0, 1.0, 1.0, 0.0]
    line_lng = [0.0, 0.0, 1.0, 1.0]
    d, blat, blng, seg = S.distance_to_polyline(0.5, 0.0, line_lat, line_lng)
    assert d[0] < EPSILON
    assert seg[0] == 0
    assert float(D.haversine(blat[0], blng[0], 0.5, 0.0)) < EPSILON


def test_distance_to_polyline_closest_point():
    line_lat = [0.0, 1.0, 1.0, 0.0]
    line_lng = [0.0, 0.0, 1.0, 1.0]
    d, blat, blng, seg = S.distance_to_polyline(0.75, 0.5, line_lat, line_lng)
    assert seg[0] == 1
    want = float(D.haversine(0.75, 0.5, 1.0, 0.5))
    assert abs(d[0] - want) < EPSILON
    assert float(D.haversine(blat[0], blng[0], 1.0, 0.5)) < EPSILON


def test_distance_to_polyline_segments():
    # polyline_test.cc:64-88
    line_lat = [0.0, 1.0, 1.0, 0.0, 0.4, 1.4, 1.4, 0.4]
    line_lng = [0.0, 0.0, 1.0, 1.0, 1.4, 1.4, 0.4, 0.4]
    cases = [
        ((0.99, 0.95), (1.0, 0.95), 1),
        ((0.9, 1.01), (0.9, 1.0), 2),
        ((0.6, 0.9), (0.6, 1.0), 2),
        ((0.41, 1.39), (0.41, 1.40), 4),
        ((1.0, 1.5), (1.0, 1.4), 4),
        ((1.39, 1.4), (1.39, 1.4), 4),
        ((1.41, 0.6), (1.4, 0.6), 5),
    ]
    for (plat, plng), (elat, elng), eseg in cases:
        d, blat, blng, seg = S.distance_to_polyline(plat, plng, line_lat, line_lng)
        assert seg[0] == eseg
        assert float(D.haversine(blat[0], blng[0], elat, elng)) < 2 * EPSILON


def test_length():
    lat = np.array([0.0, 1.0, 1.0])
    lng = np.array([0.0, 0.0, 1.0])
    want = float(D.haversine(0, 0, 1, 0)) + float(D.haversine(1, 0, 1, 1))
    assert P.length(lat, lng) == pytest.approx(want, rel=1e-12)


def test_lengths_of_lists():
    lat = np.array([0.0, 1.0, 1.0, 5.0, 5.0, 9.0])
    lng = np.array([0.0, 0.0, 1.0, 5.0, 6.0, 9.0])
    offsets = np.array([0, 3, 3, 5, 6])
    out = P.lengths_of_lists(lat, lng, offsets)
    assert out[0] == pytest.approx(P.length(lat[:3], lng[:3]), rel=1e-12)
    assert out[1] == 0.0
    assert out[2] == pytest.approx(float(D.haversine(5, 5, 5, 6)), rel=1e-12)
    assert out[3] == 0.0  # single point


def test_extract_reversible():
    lat = np.arange(5.0)
    lng = np.arange(5.0) + 10
    a, b = P.extract(lat, lng, 1, 3)
    assert a.tolist() == [1, 2, 3] and b.tolist() == [11, 12, 13]
    a, b = P.extract(lat, lng, 3, 1)
    assert a.tolist() == [3, 2, 1] and b.tolist() == [13, 12, 11]
    a, b = P.extract(lat, lng, 3, 0)
    assert a.tolist() == [3, 2, 1, 0]


def test_serialize_roundtrip():
    lat = np.array([1.5, 2.5, 3.5])
    lng = np.array([-1.0, -2.0, -3.0])
    flat = P.serialize(lat, lng)
    assert flat.tolist() == [1.5, -1.0, 2.5, -2.0, 3.5, -3.0]
    rlat, rlng = P.deserialize(flat)
    assert (rlat == lat).all() and (rlng == lng).all()

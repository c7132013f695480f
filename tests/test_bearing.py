"""Conformance: bearing / destination_point / midpoint.

Ported from /root/reference/test/latlng_test.cc:8-59.
"""

import numpy as np
import pytest

from geo_ray.kernels import bearing as B
from geo_ray.kernels import distance as D


def test_bearing_cardinal():
    assert B.bearing(0.0, 0.0, 10.0, 0.0) == pytest.approx(0.0, abs=1e-9)
    assert B.bearing(0.0, 0.0, 0.0, 10.0) == pytest.approx(90.0)
    assert B.bearing(10.0, 0.0, 0.0, 0.0) == pytest.approx(180.0)
    assert B.bearing(0.0, 0.0, 0.0, -10.0) == pytest.approx(270.0)


def test_bearing_london_paris_roundtrip():
    london = (51.5074, -0.1278)
    paris = (48.8566, 2.3522)
    b = float(B.bearing(*london, *paris))
    assert 90.0 < b < 180.0
    dist = float(D.haversine(*london, *paris))
    rec_lat, rec_lng = B.destination_point(london[0], london[1], dist, b)
    assert rec_lat == pytest.approx(paris[0], rel=0.01)
    assert rec_lng == pytest.approx(paris[1], rel=0.01)


def test_destination_point_triples():
    # latlng_test.cc:32-59 (doctest Approx default: rel ~1.19e-5)
    cases = [
        ((40.0, -20.0), 111800.0, 0.0, (41.00555556, -20.0)),
        ((-23.0, 42.0), 2342000.0, 90.0, (-21.38472222, 64.70277777)),
        ((89.0, 3.0), 11111000.0, 77.0, (-9.69722222, 106.16833333)),
    ]
    for (lat, lng), dist, brg, (elat, elng) in cases:
        alat, alng = B.destination_point(lat, lng, dist, brg)
        assert float(alat) == pytest.approx(elat, rel=1.2e-5, abs=1.2e-5)
        assert float(alng) == pytest.approx(elng, rel=1.2e-5, abs=1.2e-5)


def test_midpoint_degrees_and_quirk():
    # midpoint of symmetric points is on the meridian midpoint
    lat, lng = B.midpoint(0.0, 0.0, 0.0, 10.0)
    assert float(lat) == pytest.approx(0.0, abs=1e-9)
    assert float(lng) == pytest.approx(5.0)
    # the reference's radians quirk (src/latlng.cc:57-73 never converts back)
    qlat, qlng = B.midpoint(0.0, 0.0, 0.0, 10.0, radians_quirk=True)
    assert float(qlng) == pytest.approx(np.radians(5.0))


def test_destination_point_vectorized_matches_scalar():
    rng = np.random.default_rng(3)
    lat = rng.uniform(-80, 80, 64)
    lng = rng.uniform(-180, 180, 64)
    d = rng.uniform(0, 1e6, 64)
    brg = rng.uniform(0, 360, 64)
    vlat, vlng = B.destination_point(lat, lng, d, brg)
    for i in range(0, 64, 7):
        slat, slng = B.destination_point(lat[i], lng[i], d[i], brg[i])
        assert float(slat) == vlat[i]
        assert float(slng) == vlng[i]

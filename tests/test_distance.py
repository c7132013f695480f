"""Conformance: distance kernels vs reference test expectations.

Ported from /root/reference/test/latlng_test.cc and test/xyz_test.cc.
"""

import numpy as np
import pytest

from geo_ray.kernels import distance as D


def test_haversine_known_value():
    # London -> Paris is ~343.5 km (pinned loosely; the bearing test pins the
    # roundtrip relationship exactly)
    d = D.haversine(51.5074, -0.1278, 48.8566, 2.3522)
    assert 330_000 < d < 350_000


def test_haversine_zero_and_symmetry():
    rng = np.random.default_rng(0)
    lat = rng.uniform(-85, 85, 50)
    lng = rng.uniform(-180, 180, 50)
    assert np.allclose(D.haversine(lat, lng, lat, lng), 0.0)
    d_ab = D.haversine(lat, lng, lat[::-1], lng[::-1])
    d_ba = D.haversine(lat[::-1], lng[::-1], lat, lng)
    np.testing.assert_allclose(d_ab, d_ba, rtol=1e-12)


def test_approx_squared_distance_within_5m():
    # latlng_test.cc:197-220 incl. the antimeridian pairs
    pairs = [
        ((0.0, 0.0), (0.1, 0.0)),
        ((0.0, 0.0), (0.9, 0.0)),
        ((0.0, 0.0), (0.5, 0.0)),
        ((0.0, 0.0), (0.5, 0.2)),
        ((1.0, 1.0), (1.0010, 1.0011)),
        ((0.0, 179.0), (1.0, 179.9)),
        ((0.0, 179.0), (1.0, -179.9)),
        ((1.0, 179.9), (2.0, -179.9)),
        ((1.0, -179.9), (-1.0, 179.9)),
    ]
    for (alat, alng), (blat, blng) in pairs:
        exact = D.haversine(alat, alng, blat, blng)
        approx = np.sqrt(
            D.approx_squared_distance(
                alat, alng, blat, blng, D.approx_distance_lng_degrees(alat, alng)
            )
        )
        assert abs(exact - approx) < 5.0


def test_lower_bound_distance_lng_degrees():
    from geo_ray.constants import APPROX_DISTANCE_LAT_DEGREES

    assert D.lower_bound_distance_lng_degrees(0.0) == APPROX_DISTANCE_LAT_DEGREES
    assert D.lower_bound_distance_lng_degrees(90.0) == 0.0
    assert D.lower_bound_distance_lng_degrees(-90.0) == 0.0
    v45 = D.lower_bound_distance_lng_degrees(45.0)
    assert v45 == pytest.approx(APPROX_DISTANCE_LAT_DEGREES / 2)
    # lower bound property: never exceeds the exact value
    lats = np.linspace(-85, 85, 35)
    exact = D.approx_distance_lng_degrees(lats, np.zeros_like(lats))
    assert (D.lower_bound_distance_lng_degrees(lats) <= exact + 1e-9).all()


def test_xyz_parity_with_latlng_haversine():
    # xyz_test.cc:19-141 property: chord-based distance == haversine distance
    rng = np.random.default_rng(0)
    lat = rng.uniform(-90, 90, 100)
    lng = rng.uniform(-180, 180, 100)
    a = D.xyz(lat, lng)
    b = D.xyz(lat[::-1], lng[::-1])
    chord = D.haversine_xyz(a, b)
    exact = D.haversine(lat, lng, lat[::-1], lng[::-1])
    np.testing.assert_allclose(chord, exact, rtol=1e-9, atol=1e-6)


def test_min_haversine_xyz():
    rng = np.random.default_rng(1)
    lat = rng.uniform(-80, 80, 200)
    lng = rng.uniform(-180, 180, 200)
    bx, by, bz = D.xyz(lat, lng)
    q = D.xyz(10.0, 20.0)
    got = D.min_haversine_xyz(q, bx, by, bz)
    want = D.haversine(np.full(200, 10.0), np.full(200, 20.0), lat, lng).min()
    assert got == pytest.approx(want, rel=1e-9)

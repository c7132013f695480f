"""Conformance: closest-on-segment kernels vs latlng_test.cc:61-195."""

import numpy as np

from geo_ray.kernels import distance as D
from geo_ray.kernels import segment as S
from tests.conftest import latlng_close

ENDPOINT_CASES = [
    # (from, to, x, is_start)  — latlng_test.cc:61-93
    ((0.0, 0.0), (1.0, 0.0), (0.0, 1.0), True),
    ((0.0, 0.0), (1.0, 0.0), (0.0, -1.0), True),
    ((0.0, 0.0), (1.0, 0.0), (-1.0, 0.0), True),
    ((0.0, 0.0), (1.0, 0.0), (-0.5, 0.5), True),
    ((0.0, 0.0), (1.0, 0.0), (1.0, 1.0), False),
    ((0.0, 0.0), (1.0, 0.0), (1.0, -1.0), False),
    ((0.0, 0.0), (1.0, 0.0), (2.0, 0.0), False),
    ((0.0, 0.0), (1.0, 0.0), (1.5, 0.5), False),
    ((50.0, 0.0), (90.0, 180.0), (39.0, 10.0), True),
    ((0.0, 0.0), (0.0, 90.0), (0.0, 120.0), False),
    ((24.427, -163.318), (46.629, -85.595), (83.911, -7.324), False),
    ((-54.556, 66.671), (-68.925, -70.823), (36.411, 97.435), True),
    ((-12.087, 53.036), (-63.395, -104.788), (-15.509, -137.375), False),
    ((48.384, 3.970), (-86.712, -147.266), (66.293, 3.294), True),
    ((-26.293, 83.294), (63.181, -44.492), (10.135, -159.263), False),
    ((35.700, 17.598), (57.153, 28.220), (65.793, 36.753), False),
    ((48.507, 17.041), (37.068, 48.912), (53.585, 1.913), True),
]

INTERIOR_CASES = [
    # (from, to, x) — latlng_test.cc:95-123
    ((0.0, 0.0), (1.0, 0.0), (0.1, 0.0)),
    ((0.0, 0.0), (1.0, 0.0), (0.9, 0.0)),
    ((0.0, 0.0), (1.0, 0.0), (0.5, 0.0)),
    ((0.0, 0.0), (1.0, 0.0), (0.5, 0.2)),
    ((-59.0, 54.0), (-67.0, 26.0), (-62.7, 42.0)),
    ((1.0, 1.0), (1.0020, 1.0005), (1.0010, 1.0011)),
    ((37.3908, 8.3000), (67.8311, 39.7556), (41.4347, 27.7353)),
    ((37.2922, 25.0194), (57.9814, 5.5728), (50.6969, 5.3486)),
    ((40.303, 45.234), (46.657, 15.126), (34.561, 41.347)),
    ((36.377, 25.299), (48.428, 39.082), (43.046, 24.722)),
    ((49.885, 22.146), (70.732, 29.241), (61.708, 8.514)),
    ((37.864, 38.041), (50.021, 7.588), (41.093, 8.343)),
    ((49.660, -5.444), (66.286, 48.260), (41.630, 9.008)),
]


def _arrays(cases, with_flag):
    f = np.array([c[0] for c in cases])
    t = np.array([c[1] for c in cases])
    x = np.array([c[2] for c in cases])
    out = [x[:, 0], x[:, 1], f[:, 0], f[:, 1], t[:, 0], t[:, 1]]
    if with_flag:
        out.append(np.array([c[3] for c in cases]))
    return out


def test_closest_on_segment_endpoint_clamp():
    xlat, xlng, flat, flng, tlat, tlng, is_start = _arrays(ENDPOINT_CASES, True)
    clat, clng = S.closest_on_segment(xlat, xlng, flat, flng, tlat, tlng)
    elat = np.where(is_start, flat, tlat)
    elng = np.where(is_start, flng, tlng)
    assert latlng_close(clat, clng, elat, elng).all()


def test_closest_on_segment_interior():
    xlat, xlng, flat, flng, tlat, tlng = _arrays(INTERIOR_CASES, False)
    clat, clng = S.closest_on_segment(xlat, xlng, flat, flng, tlat, tlng)
    assert not latlng_close(clat, clng, flat, flng).any()
    assert not latlng_close(clat, clng, tlat, tlng).any()
    d_c = D.haversine(xlat, xlng, clat, clng)
    assert (d_c < D.haversine(xlat, xlng, flat, flng)).all()
    assert (d_c < D.haversine(xlat, xlng, tlat, tlng)).all()


# approx variants: latlng_test.cc:125-195 — the two "too far for approx" rows
# are excluded exactly as the reference does.
APPROX_ENDPOINT_CASES = [
    c for c in ENDPOINT_CASES
    if c not in [
        ((50.0, 0.0), (90.0, 180.0), (39.0, 10.0), True),
        ((-26.293, 83.294), (63.181, -44.492), (10.135, -159.263), False),
    ]
]


def test_approx_closest_on_segment_endpoint_clamp():
    xlat, xlng, flat, flng, tlat, tlng, is_start = _arrays(APPROX_ENDPOINT_CASES, True)
    alng = D.lower_bound_distance_lng_degrees(xlat)
    clat, clng, _sq = S.approx_closest_on_segment(xlat, xlng, flat, flng, tlat, tlng, alng)
    elat = np.where(is_start, flat, tlat)
    elng = np.where(is_start, flng, tlng)
    assert latlng_close(clat, clng, elat, elng).all()


def test_approx_closest_on_segment_interior():
    xlat, xlng, flat, flng, tlat, tlng = _arrays(INTERIOR_CASES, False)
    alng = D.lower_bound_distance_lng_degrees(xlat)
    clat, clng, _sq = S.approx_closest_on_segment(xlat, xlng, flat, flng, tlat, tlng, alng)
    assert not latlng_close(clat, clng, flat, flng).any()
    assert not latlng_close(clat, clng, tlat, tlng).any()
    d_c = D.haversine(xlat, xlng, clat, clng)
    assert (d_c < D.haversine(xlat, xlng, flat, flng)).all()
    assert (d_c < D.haversine(xlat, xlng, tlat, tlng)).all()

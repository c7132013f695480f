"""Conformance: Google polyline codec vs test/polyline_format_test.cc goldens."""

import numpy as np
import pytest

from geo_ray.kernels import codec as C


def test_google_single_value():
    # polyline_format_test.cc:7-17: the official Google example value
    assert C.encode_deltas(np.array([round(-179.9832104 * 1e5)])).decode() == "`~oia@"
    lat, lng = C.decode_polyline("`~oia@")
    assert lat.tolist() == [-179.98321]
    assert lng.tolist() == [0.0]


def test_google_polyline():
    lat = np.array([38.5, 40.7, 43.252])
    lng = np.array([-120.2, -120.95, -126.453])
    enc = C.encode_polyline(lat, lng)
    assert enc == "_p~iF~ps|U_ulLnnqC_mqNvxq`@"
    dlat, dlng = C.decode_polyline(enc)
    np.testing.assert_allclose(dlat, lat, atol=1e-10)
    np.testing.assert_allclose(dlng, lng, atol=1e-10)


def test_precision_6_golden():
    lat = np.array([49.4859, 49.4858, 49.4859])
    lng = np.array([-119.588, -119.588, -119.591])
    enc = C.encode_polyline(lat, lng, precision=6)
    assert enc == "wckk}A~habcFfE?gEnzD"
    dlat, dlng = C.decode_polyline(enc, precision=6)
    np.testing.assert_allclose(dlat, lat, atol=1e-12)
    np.testing.assert_allclose(dlng, lng, atol=1e-12)


def test_precision_7_roundtrip():
    lat = np.array([49.4859, 49.4858, 49.4859])
    lng = np.array([-119.588, -119.588, -119.591])
    enc = C.encode_polyline(lat, lng, precision=7)
    dlat, dlng = C.decode_polyline(enc, precision=7)
    np.testing.assert_allclose(dlat, lat, atol=1e-12)
    np.testing.assert_allclose(dlng, lng, atol=1e-12)


def test_precision_bounds():
    with pytest.raises(ValueError):
        C.encode_polyline([0.0], [0.0], precision=8)


def test_batch_encode_matches_single():
    rng = np.random.default_rng(9)
    rows = []
    for _ in range(20):
        n = rng.integers(0, 30)
        rows.append((rng.uniform(-85, 85, n), rng.uniform(-180, 180, n)))
    lat_flat = np.concatenate([r[0] for r in rows])
    lng_flat = np.concatenate([r[1] for r in rows])
    offsets = np.concatenate([[0], np.cumsum([r[0].size for r in rows])])
    batch = C.encode_polylines_batch(lat_flat, lng_flat, offsets, precision=5)
    for (lat, lng), enc in zip(rows, batch):
        assert enc == C.encode_polyline(lat, lng, precision=5)
        dlat, dlng = C.decode_polyline(enc, precision=5)
        np.testing.assert_allclose(dlat, np.round(lat * 1e5) / 1e5, atol=6e-6)


def test_random_roundtrip_all_precisions():
    rng = np.random.default_rng(10)
    lat = rng.uniform(-90, 90, 100)
    lng = rng.uniform(-180, 180, 100)
    for p in range(8):
        scale = 10**p
        qlat = np.sign(lat) * np.floor(np.abs(lat) * scale + 0.5) / scale
        qlng = np.sign(lng) * np.floor(np.abs(lng) * scale + 0.5) / scale
        enc = C.encode_polyline(lat, lng, precision=p)
        dlat, dlng = C.decode_polyline(enc, precision=p)
        np.testing.assert_allclose(dlat, qlat, atol=1e-12)
        np.testing.assert_allclose(dlng, qlng, atol=1e-12)


def test_push_nonzero_diff_threshold_and_roundtrip():
    """push_nonzero_diff (polyline_format.h:41-58): points within the
    simplification threshold of the last kept point are dropped; the encoded
    stream round-trips to the kept points."""
    import numpy as np

    from geo_ray.kernels import codec as C

    lat = np.array([38.5, 38.500004, 40.7, 40.700009, 43.252])
    lng = np.array([-120.2, -120.200004, -120.95, -120.950009, -126.453])
    enc, kept = C.encode_polyline_nonzero(lat, lng, 5, simplification=1)
    # deltas of 0 or 1 tick (<= threshold) are dropped
    assert kept.tolist() == [True, False, True, False, True]
    dlat, dlng = C.decode_polyline(enc, 5)
    assert np.allclose(dlat, [38.5, 40.7, 43.252])
    assert np.allclose(dlng, [-120.2, -120.95, -126.453])


def test_push_nonzero_zero_threshold_matches_plain_encode_on_distinct():
    import numpy as np

    from geo_ray.kernels import codec as C

    lat = np.array([38.5, 40.7, 43.252])
    lng = np.array([-120.2, -120.95, -126.453])
    enc, kept = C.encode_polyline_nonzero(lat, lng, 5, 0)
    assert kept.all()
    # llrint vs llround agree on these values -> identical stream
    assert enc == C.encode_polyline(lat, lng, 5)

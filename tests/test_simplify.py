"""Conformance: simplify masks vs /root/reference/test/simplify_mask_test.cc."""

import numpy as np

from geo_ray.kernels import mercator as M
from geo_ray.kernels import simplify as S


def px2ll(x, y, z):
    return M.merc_to_latlng(M.pixel_to_merc_x(x, z, 4096), M.pixel_to_merc_y(y, z, 4096))


def line_from_pixels(pts, z):
    lat = []
    lng = []
    for x, y in pts:
        a, b = px2ll(x, y, z)
        lat.append(float(a))
        lng.append(float(b))
    return np.array(lat), np.array(lng)


def test_all_required():
    lat, lng = line_from_pixels([(0, 0), (50, 0), (100, 0)], 0)
    out = S.make_simplify_mask(lat, lng)
    assert len(out) == 21
    assert out[0].tolist() == [True, False, True]


def test_slight_deviation():
    lat, lng = line_from_pixels([(0, 0), (50, 1), (100, 0)], 0)
    out = S.make_simplify_mask(lat, lng)
    assert out[0].tolist() == [True, True, True]
    out2 = S.make_simplify_mask(lat, lng, pixel_precision=2)
    assert out2[0].tolist() == [True, False, True]


def test_recursion():
    lat, lng = line_from_pixels([(0, 0), (50, 1), (100, 0), (100, 100)], 0)
    out = S.make_simplify_mask(lat, lng, pixel_precision=2)
    assert len(out) == 21
    assert out[0].tolist() == [True, False, True, True]
    for z in range(1, 21):
        assert out[z].tolist() == [True, True, True, True]


def test_mid_level():
    lat, lng = line_from_pixels([(20, 0), (21, 25), (20, 50)], 10)
    out = S.make_simplify_mask(lat, lng)
    for z in range(0, 11):
        assert out[z].tolist() == [True, False, True], f"z={z}"
    for z in range(11, 21):
        assert out[z].tolist() == [True, True, True], f"z={z}"


def test_apply_mask():
    vec = np.array([0, 1, 2, 3])
    assert S.apply_simplify_mask([True, True, True, True], vec)[0].tolist() == [0, 1, 2, 3]
    assert S.apply_simplify_mask([True, False, False, True], vec)[0].tolist() == [0, 3]
    assert S.apply_simplify_mask([True, False, True, True], vec)[0].tolist() == [0, 2, 3]
    v7 = np.arange(7)
    assert S.apply_simplify_mask([True, False, False, False, False, True, True], v7)[0].tolist() == [0, 5, 6]
    assert S.apply_simplify_mask([True, False, True, True, False, False, True], v7)[0].tolist() == [0, 2, 3, 6]


def test_serialize_simple():
    data = S.serialize_simplify_mask([np.array([True, True])])
    assert len(data) == 9
    assert int(np.frombuffer(data[:4], np.uint32)[0]) == 0x1
    assert int(np.frombuffer(data[4:8], np.uint32)[0]) == 0x2
    assert data[8] == 0x3


def test_serialize_skip_identical():
    data = S.serialize_simplify_mask([np.array([True, True]), np.array([True, True])])
    assert len(data) == 9
    assert int(np.frombuffer(data[:4], np.uint32)[0]) == 0x2
    assert int(np.frombuffer(data[4:8], np.uint32)[0]) == 0x2
    assert data[8] == 0x3


def test_serialize_multibyte():
    m = np.array([True] * 8 + [False, True])
    data = S.serialize_simplify_mask([m])
    assert len(data) == 10
    assert int(np.frombuffer(data[:4], np.uint32)[0]) == 0x1
    assert int(np.frombuffer(data[4:8], np.uint32)[0]) == 10
    assert data[8] == 0xFF
    assert data[9] == 0x02


def test_serialize_apply():
    mask = [np.array([True, False, True])]
    data = S.serialize_simplify_mask(mask)
    got = S.read_simplify_mask(data, 0)
    vec = np.array([1, 2, 3])
    assert vec[got].tolist() == [1, 3]


def test_serialize_apply_complex():
    m0 = np.array([True, False, False, False, False, False, True, False, False, True])
    m1 = np.array([True, False, True, True, False, False, True, False, False, True])
    data = S.serialize_simplify_mask([m0, m1, m1])
    assert len(data) == 11
    vec = np.arange(10)
    assert vec[S.read_simplify_mask(data, 0)].tolist() == [0, 6, 9]
    assert vec[S.read_simplify_mask(data, 1)].tolist() == [0, 2, 3, 6, 9]
    assert vec[S.read_simplify_mask(data, 2)].tolist() == [0, 2, 3, 6, 9]


def test_simplify_pixels_single_level():
    x = np.array([0.0, 50.0, 100.0])
    y = np.array([0.0, 1.0, 0.0])
    assert S.simplify_pixels(x, y, 1).tolist() == [True, True, True]
    assert S.simplify_pixels(x, y, 2).tolist() == [True, False, True]


def test_simplify_degrees():
    lat = np.array([0.0, 0.001, 0.0, 1.0])
    lng = np.array([0.0, 0.5, 1.0, 1.0])
    slat, slng = S.simplify_degrees(lat, lng, 0.01)
    assert slat.tolist() == [0.0, 0.0, 1.0]
    slat2, _ = S.simplify_degrees(lat, lng, 1e-9)
    assert slat2.size == 4


def test_scalar_and_vector_dp_paths_identical(monkeypatch):
    """The scalar fast path must produce bit-identical masks to the
    vectorized path (same IEEE ops, same first-max tie-break)."""
    import numpy as np

    from geo_ray.kernels import simplify as S

    rng = np.random.default_rng(11)
    for _ in range(25):
        n = int(rng.integers(5, 120))
        lat = np.cumsum(rng.normal(0, 0.01, n)) + 48.0
        lng = np.cumsum(rng.normal(0, 0.01, n)) + 8.0
        monkeypatch.setattr(S, "_SCALAR_SPAN_CUTOFF", -1)  # force vectorized
        vec = S.make_simplify_mask(lat, lng)
        monkeypatch.setattr(S, "_SCALAR_SPAN_CUTOFF", 10**9)  # force scalar
        sca = S.make_simplify_mask(lat, lng)
        for a, b in zip(vec, sca):
            assert (a == b).all()


def test_batch_counts_match_per_line_dp():
    """The batched interval-frontier DP == the per-line stack DP, including
    duplicate-point (sq_len < eps) segments, exact-tie farthest points and
    lines that simplify to their endpoints."""
    rng = np.random.default_rng(7)
    n_lines, n_pts = 64, 24
    lat = np.cumsum(rng.normal(0, 0.002, (n_lines, n_pts)), axis=1)
    lng = np.cumsum(rng.normal(0, 0.002, (n_lines, n_pts)), axis=1)
    lat[0] = 0.0  # fully degenerate line (every segment sq_len < eps)
    lng[0] = 0.0
    lat[1, :] = np.linspace(0.0, 1.0, n_pts)  # collinear -> endpoints only
    lng[1, :] = 0.0
    lat[2, 5:9] = lat[2, 5]  # run of duplicate interior points
    lng[2, 5:9] = lng[2, 5]
    lat[3] = np.tile([0.0, 0.01], n_pts // 2)  # exact-tie farthest candidates
    lng[3] = np.arange(n_pts) * 0.001
    for tol in (1e-9, 0.0005, 0.005, 1.0):
        got = S.simplify_degrees_batch_counts(lat, lng, tol)
        want = np.array(
            [S.simplify_degrees(lat[i], lng[i], tol)[0].size for i in range(n_lines)],
            dtype=np.int64,
        )
        assert got.tolist() == want.tolist(), tol


def test_batch_counts_short_lines():
    assert S.simplify_degrees_batch_counts(
        np.zeros((3, 2)), np.zeros((3, 2)), 0.1
    ).tolist() == [2, 2, 2]
    assert S.simplify_degrees_batch_counts(
        np.zeros((0, 24)), np.zeros((0, 24)), 0.1
    ).tolist() == []


def test_batch_masks_match_per_line_dp():
    rng = np.random.default_rng(3)
    lat = np.cumsum(rng.normal(0, 0.002, (32, 24)), axis=1)
    lng = np.cumsum(rng.normal(0, 0.002, (32, 24)), axis=1)
    lat[0] = 0.0
    lng[0] = 0.0
    for tol in (1e-9, 0.0005, 1.0):
        got = S.simplify_degrees_batch_masks(lat, lng, tol)
        for i in range(32):
            slat, slng = S.simplify_degrees(lat[i], lng[i], tol)
            assert lat[i][got[i]].tolist() == slat.tolist(), (i, tol)
            assert lng[i][got[i]].tolist() == slng.tolist(), (i, tol)

"""Conformance: WebMercator projection vs /root/reference/test/webmercator_test.cc."""

import numpy as np
import pytest

from geo_ray.constants import MERC_MAX_LATITUDE, MERC_ORIGIN_SHIFT
from geo_ray.kernels import mercator as M


def test_latlng_to_pixel_256():
    # webmercator_test.cc:5-26 (tile size 256, zoom 0)
    mx, my = M.latlng_to_merc(0.0, 0.0)
    assert M.merc_to_pixel_x(mx, 0, 256) == 128
    assert M.merc_to_pixel_y(my, 0, 256) == 128

    mx, my = M.latlng_to_merc(MERC_MAX_LATITUDE, 180.0)
    assert M.merc_to_pixel_x(mx, 0, 256) == 256
    assert M.merc_to_pixel_y(my, 0, 256) == 0

    mx, my = M.latlng_to_merc(-MERC_MAX_LATITUDE, -180.0)
    assert M.merc_to_pixel_x(mx, 0, 256) == 0
    assert M.merc_to_pixel_y(my, 0, 256) == 256


def test_pixel_to_latlng_256():
    lat, lng = M.merc_to_latlng(M.pixel_to_merc_x(128, 0, 256), M.pixel_to_merc_y(128, 0, 256))
    assert float(lat) == pytest.approx(0.0, abs=1e-9)
    assert float(lng) == pytest.approx(0.0, abs=1e-9)

    lat, lng = M.merc_to_latlng(M.pixel_to_merc_x(256, 0, 256), M.pixel_to_merc_y(0, 0, 256))
    assert float(lat) == pytest.approx(MERC_MAX_LATITUDE)
    assert float(lng) == pytest.approx(180.0)

    lat, lng = M.merc_to_latlng(M.pixel_to_merc_x(0, 0, 256), M.pixel_to_merc_y(256, 0, 256))
    assert float(lat) == pytest.approx(-MERC_MAX_LATITUDE)
    assert float(lng) == pytest.approx(-180.0)


def test_latlng_to_merc_values():
    # webmercator_test.cc:53-70
    mx, my = M.latlng_to_merc(50.0, 30.0)
    assert float(mx) == pytest.approx(3339584.7238)
    assert float(my) == pytest.approx(6446275.84102)

    mx, my = M.latlng_to_merc(MERC_MAX_LATITUDE, 180.0)
    assert float(mx) == pytest.approx(MERC_ORIGIN_SHIFT)
    assert float(my) == pytest.approx(MERC_ORIGIN_SHIFT)

    mx, my = M.latlng_to_merc(-MERC_MAX_LATITUDE, -180.0)
    assert float(mx) == pytest.approx(-MERC_ORIGIN_SHIFT)
    assert float(my) == pytest.approx(-MERC_ORIGIN_SHIFT)


def test_merc_to_latlng_values():
    lat, lng = M.merc_to_latlng(3339584.7238, 6446275.84102)
    assert float(lat) == pytest.approx(50.0)
    assert float(lng) == pytest.approx(30.0)


def test_reversible():
    # webmercator_test.cc:91-117 (tile size 4096)
    for px, py in [(0, 0), (50, 0), (50, 1), (50, 2), (100, 0), (1000, 0)]:
        ma = (M.pixel_to_merc_x(px, 0), M.pixel_to_merc_y(py, 0))
        lat, lng = M.merc_to_latlng(*ma)
        mb = M.latlng_to_merc(lat, lng)
        assert float(ma[0]) == pytest.approx(float(mb[0]))
        assert float(ma[1]) == pytest.approx(float(mb[1]))
        oa = M.merc_to_pixel(ma[0], ma[1], 0)
        ob = M.merc_to_pixel(mb[0], mb[1], 0)
        assert abs(int(oa[0]) - px) <= 1 and abs(int(oa[1]) - py) <= 1
        assert abs(int(ob[0]) - px) <= 1 and abs(int(ob[1]) - py) <= 1


def test_map_size():
    # webmercator_test.cc:119-135
    for z in range(21):
        assert M.map_size(z) == (2**z) * 4096
    assert M.map_size(19) < 2**32 - 1
    assert M.map_size(20) - 1 == 2**32 - 1
    assert M.map_size(21) > 2**32 - 1


def test_zoom_levels_corners():
    # webmercator_test.cc:137-156
    for z in range(21):
        mx, my = M.latlng_to_merc(MERC_MAX_LATITUDE, -180.0)
        px, py = M.merc_to_pixel(mx, my, z)
        assert int(px) == 0 and int(py) == 0
        mx, my = M.latlng_to_merc(-MERC_MAX_LATITUDE, 180.0)
        px, py = M.merc_to_pixel(mx, my, z)
        assert int(px) == M.map_size(z) and int(py) == M.map_size(z)


def test_vectorized_matches_scalar():
    rng = np.random.default_rng(5)
    lat = rng.uniform(-85, 85, 128)
    lng = rng.uniform(-180, 180, 128)
    px, py = M.latlng_to_pixel(lat, lng, 14)
    for i in range(0, 128, 17):
        sx, sy = M.latlng_to_pixel(lat[i], lng[i], 14)
        assert int(sx) == px[i] and int(sy) == py[i]

"""fixed_latlng quantization conformance (fixed_latlng.h:10-30)."""

import numpy as np

from geo_ray.kernels import fixed


def test_round_half_away_from_zero():
    # .5 ticks: std::round goes away from zero, unlike banker's rounding
    vals = np.array([0.00000005, -0.00000005, 0.00000015, -0.00000015])
    assert fixed.double_to_fix(vals).tolist() == [1, -1, 2, -2]


def test_roundtrip_within_half_tick():
    rng = np.random.default_rng(3)
    c = rng.uniform(-180, 180, 10_000)
    fx = fixed.double_to_fix(c)
    back = fixed.fix_to_double(fx)
    assert np.abs(back - c).max() <= 0.5 / fixed.COORDINATE_PRECISION + 1e-12
    assert fx.dtype == np.int32


def test_exact_values():
    assert fixed.double_to_fix(49.8726016) == 498726016
    assert fixed.fix_to_double(498726016) == 49.8726016

"""Geodesy constants shared by every kernel.

Values mirror the reference library's constants so conformance tests pin
identical numerics (reference: include/geo/constants.h:6-9,
include/geo/webmercator.h:154-156).
"""

import math

PI = math.pi
EARTH_RADIUS_M = 6371000.0
EPSILON = 1e-9
# meters per degree of latitude on the sphere (R * pi / 180)
APPROX_DISTANCE_LAT_DEGREES = EARTH_RADIUS_M * PI / 180.0

# WebMercator (EPSG:900913) sphere
MERC_EARTH_RADIUS = 6378137.0
MERC_ORIGIN_SHIFT = PI * MERC_EARTH_RADIUS
MERC_MAX_LATITUDE = 85.0511287798

# latlng equality tolerance (reference: include/geo/latlng.h:22-27)
LATLNG_EQ_EPS = 100 * 2.220446049250313e-16

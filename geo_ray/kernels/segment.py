"""Closest-point-on-segment kernels (vectorized over rows of
(point, segment_from, segment_to) triples).

Reference semantics:
- ``closest_on_segment``        -> src/latlng.cc:111-146 (+ get_angle :98-109):
  project to WebMercator, clamp to an endpoint when the angle at that endpoint
  is >= 90 deg, else law-of-sines interior projection.
- ``approx_closest_on_segment`` -> src/latlng.cc:148-193: planar closest point
  in a locally scaled equirectangular frame, returns (point, squared-dist);
  handles antimeridian wrap the same (and only the same) way the reference does.
"""

from __future__ import annotations

import numpy as np

from geo_ray.constants import APPROX_DISTANCE_LAT_DEGREES, EPSILON, PI
from geo_ray.kernels.mercator import latlng_to_merc, merc_to_latlng


def _xy_eq(ax, ay, bx, by):
    return (np.abs(ax - bx) < EPSILON) & (np.abs(ay - by) < EPSILON)


def closest_on_segment(lat, lng, from_lat, from_lng, to_lat, to_lng):
    """Per-row closest point on segment [from, to] to point (lat, lng).

    Returns (closest_lat, closest_lng) float64 arrays.
    """
    xx, xy_ = latlng_to_merc(lat, lng)
    fx, fy = latlng_to_merc(from_lat, from_lng)
    tx, ty = latlng_to_merc(to_lat, to_lng)

    seg_dx = tx - fx
    seg_dy = ty - fy
    seg_len = np.sqrt(seg_dx * seg_dx + seg_dy * seg_dy)

    sv_x = xx - fx
    sv_y = xy_ - fy
    ev_x = tx - xx
    ev_y = ty - xy_

    with np.errstate(divide="ignore", invalid="ignore"):
        sv_len = np.sqrt(sv_x * sv_x + sv_y * sv_y)
        rel_start = (seg_dx * sv_x + seg_dy * sv_y) / (seg_len * sv_len)
        rel_end = (seg_dx * ev_x + seg_dy * ev_y) / (
            seg_len * np.sqrt(ev_x * ev_x + ev_y * ev_y)
        )
        # get_angle: rel >= 1-eps -> 0; rel <= -1+eps -> "180" (>= pi/2 either way)
        start_angle = np.where(
            rel_start >= 1 - EPSILON,
            0.0,
            np.where(rel_start <= -1 + EPSILON, PI, np.arccos(np.clip(rel_start, -1, 1))),
        )
        end_angle = np.where(
            rel_end >= 1 - EPSILON,
            0.0,
            np.where(rel_end <= -1 + EPSILON, PI, np.arccos(np.clip(rel_end, -1, 1))),
        )
        beta = PI / 2.0 - start_angle
        seg_offset = sv_len * np.sin(beta)
        proj_x = fx + seg_offset * seg_dx / seg_len
        proj_y = fy + seg_offset * seg_dy / seg_len

    interior_lat, interior_lng = merc_to_latlng(proj_x, proj_y)

    half_pi = PI / 2.0  # to_rad(90.0)
    deg_lat = np.asarray(lat, dtype=np.float64)
    deg_lng = np.asarray(lng, dtype=np.float64)

    out_lat = np.where(end_angle >= half_pi, to_lat, interior_lat)
    out_lng = np.where(end_angle >= half_pi, to_lng, interior_lng)
    out_lat = np.where(start_angle >= half_pi, from_lat, out_lat)
    out_lng = np.where(start_angle >= half_pi, from_lng, out_lng)
    # degenerate segment -> from (latlng.cc:124-126)
    out_lat = np.where(seg_len < EPSILON, from_lat, out_lat)
    out_lng = np.where(seg_len < EPSILON, from_lng, out_lng)
    # x coincides (in merc, epsilon-tolerant) with an endpoint -> x itself
    coincide = _xy_eq(xx, xy_, fx, fy) | _xy_eq(xx, xy_, tx, ty)
    out_lat = np.where(coincide, deg_lat, out_lat)
    out_lng = np.where(coincide, deg_lng, out_lng)
    return out_lat, out_lng


def approx_closest_on_segment(lat, lng, from_lat, from_lng, to_lat, to_lng, approx_lng_deg):
    """Per-row approximate closest point; returns (lat, lng, squared_dist_m2)."""
    lat = np.asarray(lat, dtype=np.float64)
    lng = np.asarray(lng, dtype=np.float64)

    def to_xy(p_lat, p_lng):
        xdiff = np.asarray(p_lng, dtype=np.float64) - lng
        x = np.where(xdiff > 180.0, 360.0 - np.abs(xdiff), xdiff) * approx_lng_deg
        y = (np.asarray(p_lat, dtype=np.float64) - lat) * APPROX_DISTANCE_LAT_DEGREES
        return x, y

    px, py = 0.0 * lat, 0.0 * lat  # to_approx_xy(x, x) == (0, 0)
    fx, fy = to_xy(from_lat, from_lng)
    tx, ty = to_xy(to_lat, to_lng)

    seg_x = tx - fx
    seg_y = ty - fy
    sq_len = seg_x * seg_x + seg_y * seg_y
    dot_from = (px - fx) * seg_x + (py - fy) * seg_y
    dot_to = (px - tx) * (fx - tx) + (py - ty) * (fy - ty)

    with np.errstate(divide="ignore", invalid="ignore"):
        pos_x = (fx * dot_to + tx * dot_from) / sq_len
        pos_y = (fy * dot_to + ty * dot_from) / sq_len
    xcoord = pos_x / approx_lng_deg + lng
    interior_lat = pos_y / APPROX_DISTANCE_LAT_DEGREES + lat
    interior_lng = np.where(xcoord > 180.0, xcoord - 360.0, xcoord)
    interior_sq = (px - pos_x) ** 2 + (py - pos_y) ** 2

    sq_from = (px - fx) ** 2 + (py - fy) ** 2
    sq_to = (px - tx) ** 2 + (py - ty) ** 2

    out_lat = interior_lat.copy()
    out_lng = np.asarray(interior_lng).copy()
    out_sq = interior_sq.copy()

    m_to = dot_to < 0.0
    out_lat[m_to] = np.broadcast_to(to_lat, out_lat.shape)[m_to]
    out_lng[m_to] = np.broadcast_to(to_lng, out_lng.shape)[m_to]
    out_sq[m_to] = sq_to[m_to]

    m_from = (dot_from < 0.0) | (sq_len < EPSILON)
    out_lat[m_from] = np.broadcast_to(from_lat, out_lat.shape)[m_from]
    out_lng[m_from] = np.broadcast_to(from_lng, out_lng.shape)[m_from]
    out_sq[m_from] = sq_from[m_from]

    m_coin_f = _xy_eq(px, py, fx, fy)
    m_coin_t = _xy_eq(px, py, tx, ty)
    m_coin = m_coin_f | m_coin_t
    out_lat[m_coin] = lat[m_coin] if lat.shape else lat
    out_lng[m_coin] = lng[m_coin] if lng.shape else lng
    out_sq[m_coin_f] = sq_from[m_coin_f]
    out_sq[m_coin_t & ~m_coin_f] = sq_to[m_coin_t & ~m_coin_f]
    return out_lat, out_lng, out_sq


def distance_to_polyline(lat, lng, line_lat, line_lng):
    """Min-distance candidate of ONE point set against ONE polyline.

    Vectorized over points x segments. Returns
    (distance_m, best_lat, best_lng, segment_idx) — the reference's
    ``polyline_candidate`` (include/geo/polyline.h:68-96).
    """
    from geo_ray.kernels.distance import haversine

    lat = np.atleast_1d(np.asarray(lat, dtype=np.float64))
    lng = np.atleast_1d(np.asarray(lng, dtype=np.float64))
    line_lat = np.asarray(line_lat, dtype=np.float64)
    line_lng = np.asarray(line_lng, dtype=np.float64)
    n_seg = line_lat.size - 1
    n_pts = lat.size

    best_d = np.full(n_pts, np.inf)
    best_lat = np.zeros(n_pts)
    best_lng = np.zeros(n_pts)
    best_seg = np.zeros(n_pts, dtype=np.int64)
    for s in range(n_seg):
        c_lat, c_lng = closest_on_segment(
            lat, lng, line_lat[s], line_lng[s], line_lat[s + 1], line_lng[s + 1]
        )
        d = haversine(lat, lng, c_lat, c_lng)
        m = d < best_d
        best_d[m] = d[m]
        best_lat[m] = np.broadcast_to(c_lat, d.shape)[m]
        best_lng[m] = np.broadcast_to(c_lng, d.shape)[m]
        best_seg[m] = s
    return best_d, best_lat, best_lng, best_seg

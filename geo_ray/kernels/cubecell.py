"""S2-STYLE cube-face cell index (public cube-map construction).

The missing sibling of the quadkey (:mod:`cell`) and geohash
(:mod:`geohash`) indexes: project the unit-sphere embedding onto the
enclosing cube, pick the dominant-axis FACE (6 of them), quantize the
in-face (u, v) coordinates at a quadtree level, and interleave — a
hierarchical spherical cell id with no polar singularity (every face cell
has comparable area, the property S2 is chosen for). This is deliberately
NOT Google S2: S2 orders cells along a Hilbert curve and warps (u, v) with
a quadratic projection; here the face-local order is Morton and (u, v) is
the raw gnomonic coordinate — the hierarchy (prefix = ancestor) and the
equal-area-ish face split are preserved, the traversal order is not.

Cell layout at ``level`` L: ``face * 4^L + morton(iu, iv)`` — a parent id
is a 2-bit right shift of its children, same algebra as cell_prefix.
"""

from __future__ import annotations

import numpy as np

from geo_ray.kernels.cell import _spread_bits16
from geo_ray.kernels.distance import xyz


def cube_face_uv(lat, lng):
    """(face 0..5, u, v) per point: face = 2*axis + (major < 0), axis by
    dominant |coordinate| with ties resolved x >= y >= z — the exact
    comparison chain the SQL twin mirrors; u, v = the two minor coordinates
    divided by the SIGNED major (gnomonic, in [-1, 1])."""
    x, y, z = xyz(lat, lng)
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    is_x = (ax >= ay) & (ax >= az)
    is_y = (~is_x) & (ay >= az)
    major = np.where(is_x, x, np.where(is_y, y, z))
    axis = np.where(is_x, 0, np.where(is_y, 1, 2)).astype(np.int64)
    u = np.where(is_x, y, x) / major
    v = np.where(is_x, z, np.where(is_y, z, y)) / major
    face = axis * 2 + (major < 0)
    return face.astype(np.int64), u, v


def cube_cell(lat, lng, level: int = 12) -> np.ndarray:
    """int64 cube-face cell id at ``level`` (<= 16): face * 4^L + Morton."""
    assert 0 <= level <= 16
    face, u, v = cube_face_uv(lat, lng)
    n = 1 << level
    iu = np.minimum(np.maximum(np.floor((u + 1.0) / 2.0 * float(n)), 0.0), n - 1).astype(
        np.int64
    )
    iv = np.minimum(np.maximum(np.floor((v + 1.0) / 2.0 * float(n)), 0.0), n - 1).astype(
        np.int64
    )
    m = _spread_bits16(iu.astype(np.uint32)).astype(np.int64) | (
        _spread_bits16(iv.astype(np.uint32)).astype(np.int64) << np.int64(1)
    )
    return face * np.int64(1 << (2 * level)) + m


def cube_cell_parent(cell: np.ndarray, level: int, parent_level: int) -> np.ndarray:
    """Ancestor cell id: the face survives, the Morton part right-shifts."""
    assert 0 <= parent_level <= level
    cell = np.asarray(cell, dtype=np.int64)
    face = cell >> np.int64(2 * level)
    m = (cell & np.int64((1 << (2 * level)) - 1)) >> np.int64(2 * (level - parent_level))
    return face * np.int64(1 << (2 * parent_level)) + m

"""Hybrid geographic clustering, float32 arithmetic.

Mirror of the reference's ``cluster_nearby`` (src/cluster_nearby.cc:174-234):

1. single-linkage pass (:59-107): per-point scan over earlier points with a
   bounding-box prefilter (gis.stackexchange formula, :42-56) + exact float32
   haversine (:32-40); merges rewrite labels.
2. per-SL-cluster complete-linkage refinement (:109-172): iterative
   max-linkage merge until no qualifying pair remains; groups of size < 3
   short-circuit (:203-208).

All distance arithmetic stays in float32 to preserve the reference's numeric
behavior. The scan quirks of the C++ (the "nearest pair" scan actually keeps
the LAST qualifying lower-triangle entry) are reproduced deliberately.
"""

from __future__ import annotations

import numpy as np

NO_CLUSTER = np.uint32(0xFFFFFFFF)
_EARTH_F = np.float32(6371000.0)
_PI_F = np.float32(np.pi)


def _gc_distance_f(lat1, lng1, lat2, lng2):
    """Float32 haversine (cluster_nearby.cc:32-40)."""
    f = np.float32
    to_rad = lambda deg: deg * _PI_F / f(180.0)  # noqa: E731
    u = np.sin((to_rad(lat2) - to_rad(lat1)) / f(2.0), dtype=np.float32)
    v = np.sin((to_rad(lng2) - to_rad(lng1)) / f(2.0), dtype=np.float32)
    s = u * u + np.cos(to_rad(lat1), dtype=np.float32) * np.cos(to_rad(lat2), dtype=np.float32) * v * v
    return f(2.0) * _EARTH_F * np.arcsin(np.sqrt(s, dtype=np.float32), dtype=np.float32)


def _bounding_box_f(lat, lng, dist):
    f = np.float32
    offset_lat = (dist / _EARTH_F) * f(180.0) / _PI_F
    offset_lng = (dist / (_EARTH_F * np.cos(lat * _PI_F / f(180.0), dtype=np.float32))) * f(180.0) / _PI_F
    return lat + offset_lat, lat - offset_lat, lng + offset_lng, lng - offset_lng


def _single_linkage(lat, lng, max_dist):
    n = lat.size
    clusters = np.full(n, NO_CLUSTER, dtype=np.uint32)
    for i in range(n):
        lat_max, lat_min, lng_max, lng_min = _bounding_box_f(lat[i], lng[i], max_dist)
        prev_lat = lat[:i]
        prev_lng = lng[:i]
        in_box = (
            (prev_lat >= lat_min)
            & (prev_lat <= lat_max)
            & (prev_lng >= lng_min)
            & (prev_lng <= lng_max)
        )
        if not in_box.any():
            continue
        cand = np.flatnonzero(in_box)
        d = _gc_distance_f(lat[i], lng[i], prev_lat[cand], prev_lng[cand])
        cand = cand[d <= max_dist]
        if cand.size == 0:
            continue
        clusters[i] = i
        for j in cand:
            old = clusters[j]
            clusters[j] = i
            if old != NO_CLUSTER:
                clusters[clusters == old] = i
    unset = clusters == NO_CLUSTER
    clusters[unset] = np.arange(n, dtype=np.uint32)[unset]
    return clusters


def _complete_linkage_reference(lat, lng, max_dist):
    """Literal mirror of make_complete_linkage_clusters (cluster_nearby.cc:109-172).

    O(n^2) matrix rebuild per merge (O(n^3) total) — kept as the conformance
    reference; the incremental variant below is output-identical and is what
    runs in production paths."""
    n = lat.size
    if n == 0:
        raise ValueError("make_complete_linkage_clusters: empty coords")
    clusters = np.arange(n, dtype=np.uint32)
    # precompute the pairwise float32 distance matrix once (pure function of coords)
    dmat = _gc_distance_f(lat[:, None], lng[:, None], lat[None, :], lng[None, :])
    lowest = np.float32(np.finfo(np.float32).min)
    iu, ju = np.tril_indices(n, -1)  # row-major: same order as the C++ scan
    pair_d = dmat[iu, ju]
    while (clusters != clusters[0]).any():
        distances = np.full((n, n), lowest, dtype=np.float32)
        # complete linkage: max member distance per (cluster_i, cluster_j)
        ci_all = clusters[iu]
        cj_all = clusters[ju]
        diff = ci_all != cj_all
        np.maximum.at(distances, (ci_all[diff], cj_all[diff]), pair_d[diff])
        # reference scan: keeps the LAST lower-triangle entry with
        # 0 <= distance <= max_dist (cluster_nearby.cc:146-159)
        dl = distances[iu, ju]
        qual = np.flatnonzero((dl >= 0) & (dl <= max_dist))
        if qual.size == 0:
            break
        k = qual[-1]
        ci = clusters[iu[k]]
        cj = clusters[ju[k]]
        clusters[clusters == ci] = cj
    return clusters


def _complete_linkage(lat, lng, max_dist):
    """Incremental complete linkage, output-identical to the reference mirror.

    Maintains the label-indexed max-distance matrix M across merges instead
    of rebuilding it from all point pairs: merging cluster c into d folds row
    c into row d and column c into column d (max-wise), clears row/col c and
    M[d, d] — exactly the matrix the rebuild would produce, including the
    reference's asymmetric write positions (a pair (i > j) writes at
    (label[i], label[j]), which can land in either triangle). The merge-pick
    scan (LAST lower-triangle entry with 0 <= D <= max_dist) is unchanged.
    O(n^2) per merge for the scan, O(n) for the update.
    """
    n = lat.size
    if n == 0:
        raise ValueError("make_complete_linkage_clusters: empty coords")
    clusters = np.arange(n, dtype=np.uint32)
    if n == 1:
        return clusters
    dmat = _gc_distance_f(lat[:, None], lng[:, None], lat[None, :], lng[None, :])
    lowest = np.float32(np.finfo(np.float32).min)
    # initial M: labels == point indices, pairs (i > j) write at (i, j)
    m = np.full((n, n), lowest, dtype=np.float32)
    il, jl = np.tril_indices(n, -1)
    m[il, jl] = dmat[il, jl]
    tril_mask = np.zeros((n, n), dtype=bool)
    tril_mask[il, jl] = True
    while (clusters != clusters[0]).any():
        qual = tril_mask & (m >= 0) & (m <= max_dist)
        flat = np.flatnonzero(qual.ravel())
        if flat.size == 0:
            break
        k = int(flat[-1])  # row-major last == reference's last tril scan hit
        ci = np.uint32(k // n)
        cj = np.uint32(k % n)
        # fold c := ci into d := cj (same direction as the reference merge)
        c, d = int(ci), int(cj)
        np.maximum(m[d, :], m[c, :], out=m[d, :])
        np.maximum(m[:, d], m[:, c], out=m[:, d])
        m[c, :] = lowest
        m[:, c] = lowest
        m[d, d] = lowest
        clusters[clusters == c] = d
    return clusters


def cluster_nearby(lat, lng, max_dist: float):
    """Cluster labels (uint32) for coordinate arrays; float32 semantics."""
    lat = np.asarray(lat, dtype=np.float32)
    lng = np.asarray(lng, dtype=np.float32)
    n = lat.size
    if n == 0:
        return np.zeros(0, dtype=np.uint32)
    max_dist = np.float32(max_dist)

    sl = _single_linkage(lat, lng, max_dist)

    order = np.lexsort((np.arange(n), sl))  # sorted (sl_cluster, index) pairs
    clusters = np.arange(n, dtype=np.uint32)

    start = 0
    while start < n:
        end = start
        while end < n and sl[order[end]] == sl[order[start]]:
            end += 1
        members = order[start:end]
        if members.size < 3:
            clusters[members] = members[0]
        else:
            cl = _complete_linkage(lat[members], lng[members], max_dist)
            for i in range(members.size):
                clusters[members[i]] = clusters[members[cl[i]]]
        start = end
    return clusters

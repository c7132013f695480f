"""kNN / radius join stages (point_rtree semantics, src/point_rtree.cc).

The reference's queries return (distance, index) pairs sorted ascending
(point_rtree.cc:34, :46). Two Ray realizations per SURVEY.md §3.2:

- ``KnnAgainstQueries`` — broadcast the SMALL query side (e.g. a few thousand
  probe centers) into every task; each batch of the big point set computes a
  chord-haversine distance block (xyz embedding, include/geo/xyz.h) against
  all queries and emits per-batch PARTIAL top-k / radius matches. A final tiny
  ``groupby(query_id)`` (k rows per batch per query) finishes the top-k —
  the pre-aggregate-before-shuffle pattern.
- cell co-partition (for large-x-large): both sides keyed by quadkey cell,
  probe side exploded to its neighbor-ring cell cover
  (geo_ray.kernels.cell.neighbor_cells), per-group refine, keep-min dedup.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from geo_ray.kernels import distance as dist_k


class KnnAgainstQueries:
    """map_batches class: partial top-k of each batch against broadcast queries.

    Output rows: (query_id, doc_id, pt_idx, dist_m) — at most k per
    (query, batch); finish with groupby(query_id).map_groups(top-k).
    """

    def __init__(self, query_ids, query_lat, query_lng, k: int = 5):
        self.qid = np.asarray(query_ids, dtype=np.int64)
        self.qx, self.qy, self.qz = dist_k.xyz(
            np.asarray(query_lat, dtype=np.float64), np.asarray(query_lng, dtype=np.float64)
        )
        self.k = k

    def _chord_sq(self, lat, lng):
        px, py, pz = dist_k.xyz(lat, lng)
        # (n_queries, n_points) squared chord matrix
        return (
            (self.qx[:, None] - px[None, :]) ** 2
            + (self.qy[:, None] - py[None, :]) ** 2
            + (self.qz[:, None] - pz[None, :]) ** 2
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        lat = batch["lat"].to_numpy()
        lng = batch["lng"].to_numpy()
        d2 = self._chord_sq(lat, lng)
        k = min(self.k, lat.size)
        part = np.argpartition(d2, k - 1, axis=1)[:, :k] if k < lat.size else np.tile(
            np.arange(lat.size), (self.qid.size, 1)
        )
        rows = part.ravel()
        qrep = np.repeat(self.qid, part.shape[1])
        d = 2.0 * dist_k.EARTH_RADIUS_M * np.arcsin(
            np.sqrt(d2[np.repeat(np.arange(self.qid.size), part.shape[1]), rows])
        )
        out = batch.take(pa.array(rows))
        out = out.append_column("query_id", pa.array(qrep))
        return out.append_column("dist_m", pa.array(d))


class RadiusAgainstQueries:
    """map_batches class: all (query, point) pairs with dist in [min_r, max_r).

    Mirrors in_radius_with_distance's boundary semantics
    (point_rtree.cc:27-30: keep dist >= min_radius AND dist < max_radius).
    """

    def __init__(self, query_ids, query_lat, query_lng, min_radius: float, max_radius: float):
        self.qid = np.asarray(query_ids, dtype=np.int64)
        self.qx, self.qy, self.qz = dist_k.xyz(
            np.asarray(query_lat, dtype=np.float64), np.asarray(query_lng, dtype=np.float64)
        )
        self.min_r = min_radius
        self.max_r = max_radius

    def __call__(self, batch: pa.Table) -> pa.Table:
        lat = batch["lat"].to_numpy()
        lng = batch["lng"].to_numpy()
        px, py, pz = dist_k.xyz(lat, lng)
        d2 = (
            (self.qx[:, None] - px[None, :]) ** 2
            + (self.qy[:, None] - py[None, :]) ** 2
            + (self.qz[:, None] - pz[None, :]) ** 2
        )
        d = 2.0 * dist_k.EARTH_RADIUS_M * np.arcsin(np.sqrt(d2))
        qi, pi = np.nonzero((d >= self.min_r) & (d < self.max_r))
        out = batch.take(pa.array(pi))
        out = out.append_column("query_id", pa.array(self.qid[qi]))
        return out.append_column("dist_m", pa.array(d[qi, pi]))


def finish_topk(b, k: int = 5):
    """Arrow block finisher (no pandas round trip): segments its partition
    by query_id with ONE lexsort and keeps the k smallest
    (dist_m, doc_id, pt_idx) rows per query; any extra columns ride along."""
    import pyarrow as pa

    from geo_ray.stages.agg import np_col

    if b.num_rows == 0:
        return b
    q = np_col(b, "query_id")
    d = np_col(b, "dist_m", dtype=np.float64)
    order = np.lexsort((np_col(b, "pt_idx"), np_col(b, "doc_id"), d, q))
    qs = q[order]
    starts = np.flatnonzero(np.concatenate([[True], qs[1:] != qs[:-1]]))
    rank = np.arange(qs.size, dtype=np.int64) - np.repeat(
        starts, np.diff(np.concatenate([starts, [qs.size]]))
    )
    return b.take(pa.array(order[rank < k]))

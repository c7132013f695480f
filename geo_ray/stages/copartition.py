"""Cell co-partition realizations of the spatial joins (SURVEY.md §3.1/§3.2).

The broadcast realizations (PipJoiner / KnnAgainstQueries) hold the small
side in every task; these shuffle realizations co-partition BOTH sides by the
z8 quadkey cell — the configuration for polygon/query sets too large to
broadcast. Both sides are tagged and unioned into one dataset, grouped by a
COARSE bucket of the cell key (per-real-cell map_groups would pay per-group
Python overhead), and refined vectorized within the bucket. Results are
bit-identical to the broadcast realizations (same kernels, same dedup rules),
which the oracle SQL and tests pin.

Partitioning assumptions (documented per SURVEY.md §2.6):
- PIP: a polygon's z8 bbox cell cover contains the cell of every point inside
  it, so co-partitioning by cell loses no pairs; a (point, polygon) pair can
  meet in only ONE cell (the point's), so no output dedup is needed.
- kNN: the probe's cell cover is the ±`radius`-buffered box of the query
  (box.h:50-70 buffering semantics); equality with global kNN holds when the
  k-th neighbor lies within `radius` — callers pick the radius, and the
  radius-bounded result is itself the reference's in_radius + top-k form.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from geo_ray.kernels import cell as cell_k
from geo_ray.kernels import distance as dist_k
from geo_ray.kernels import pip as pip_k
from geo_ray.sources import derive

N_BUCKETS = 64

POINT_SIDE = 0
BUILD_SIDE = 1


def cell_of_points(lat: np.ndarray, lng: np.ndarray, zoom: int = 8) -> np.ndarray:
    x, y = cell_k.cell_at_zoom(lat, lng, zoom)
    return cell_k.hash_from_xy(x, y).astype(np.int64)


def cover_cells_of_boxes(min_lat, min_lng, max_lat, max_lng, zoom: int = 8):
    """Ragged z8 cell cover of each bbox -> (row_of, cell) arrays."""
    x0, y0 = cell_k.cell_at_zoom(np.asarray(min_lat), np.asarray(min_lng), zoom)
    x1, y1 = cell_k.cell_at_zoom(np.asarray(max_lat), np.asarray(max_lng), zoom)
    lox, hix = np.minimum(x0, x1), np.maximum(x0, x1)
    loy, hiy = np.minimum(y0, y1), np.maximum(y0, y1)
    nx = (hix - lox + 1).astype(np.int64)
    ny = (hiy - loy + 1).astype(np.int64)
    counts = nx * ny
    total = int(counts.sum())
    row_of = np.repeat(np.arange(counts.size, dtype=np.int64), counts)
    local = np.arange(total, dtype=np.int64) - np.repeat(np.cumsum(counts) - counts, counts)
    cx = lox[row_of] + local % nx[row_of]
    cy = loy[row_of] + local // nx[row_of]
    return row_of, cell_k.hash_from_xy(cx, cy).astype(np.int64)


# ---------------------------------------------------------------------------
# PIP co-partition
# ---------------------------------------------------------------------------

UNION_SCHEMA = pa.schema(
    [
        ("cell", pa.int64()),
        ("side", pa.int8()),
        ("doc_id", pa.int64()),
        ("pt_idx", pa.int64()),
        ("lat", pa.float64()),
        ("lng", pa.float64()),
        ("area_id", pa.int64()),
    ]
)


def tag_points(batch: pa.Table, zoom: int = 8) -> pa.Table:
    lat = batch["lat"].to_numpy()
    lng = batch["lng"].to_numpy()
    n = batch.num_rows
    return pa.table(
        {
            "cell": pa.array(cell_of_points(lat, lng, zoom)),
            "side": pa.array(np.full(n, POINT_SIDE, dtype=np.int8)),
            "doc_id": pa.array(batch["doc_id"].to_numpy().astype(np.int64)),
            "pt_idx": pa.array(batch["pt_idx"].to_numpy().astype(np.int64)),
            "lat": pa.array(lat),
            "lng": pa.array(lng),
            "area_id": pa.array(np.full(n, -1, dtype=np.int64)),
        },
        schema=UNION_SCHEMA,
    )


def polygon_side_table(polygons=None, zoom: int = 8) -> pa.Table:
    """Build-side rows: one per (cover cell, polygon)."""
    if polygons is None:
        polygons = derive.polygons_arrays()
    min_lat = np.array([p[1].min() for p in polygons])
    min_lng = np.array([p[2].min() for p in polygons])
    max_lat = np.array([p[1].max() for p in polygons])
    max_lng = np.array([p[2].max() for p in polygons])
    row_of, cells = cover_cells_of_boxes(min_lat, min_lng, max_lat, max_lng, zoom)
    ids = np.array([p[0] for p in polygons], dtype=np.int64)[row_of]
    n = cells.size
    return pa.table(
        {
            "cell": pa.array(cells),
            "side": pa.array(np.full(n, BUILD_SIDE, dtype=np.int8)),
            "doc_id": pa.array(np.full(n, -1, dtype=np.int64)),
            "pt_idx": pa.array(np.full(n, -1, dtype=np.int64)),
            "lat": pa.array(np.zeros(n)),
            "lng": pa.array(np.zeros(n)),
            "area_id": pa.array(ids),
        },
        schema=UNION_SCHEMA,
    )


def add_bucket(batch: pa.Table, hot_cells=None, n_salt: int = 8) -> pa.Table:
    """Coarse shuffle key, with SALT for known-hot cells: point rows of a hot
    cell spread over ``n_salt`` sub-buckets by doc_id, while BUILD rows
    (polygons/probes) are replicated to every salt so each sub-bucket still
    sees the full candidate set — results are identical to unsalted, one
    dense urban cell no longer serializes on one reducer."""
    cell = batch["cell"].to_numpy()
    side = batch["side"].to_numpy()
    bucket = (cell % N_BUCKETS).astype(np.int64)
    if hot_cells is None or len(hot_cells) == 0:
        return batch.append_column("bucket", pa.array(bucket))
    hot = np.isin(cell, hot_cells)
    salt_base = N_BUCKETS + (cell % N_BUCKETS) * n_salt
    pt_salt = (batch["doc_id"].to_numpy() % n_salt).astype(np.int64)
    is_pt = side == POINT_SIDE
    out_rows = [np.flatnonzero(~hot)]
    out_buckets = [bucket[~hot]]
    hp = np.flatnonzero(hot & is_pt)
    out_rows.append(hp)
    out_buckets.append(salt_base[hp] + pt_salt[hp])
    hb = np.flatnonzero(hot & ~is_pt)  # build rows: replicate across salts
    out_rows.append(np.repeat(hb, n_salt))
    out_buckets.append(
        np.repeat(salt_base[hb], n_salt) + np.tile(np.arange(n_salt, dtype=np.int64), hb.size)
    )
    idx = np.concatenate(out_rows)
    out = batch.take(pa.array(idx))
    return out.append_column("bucket", pa.array(np.concatenate(out_buckets)))


_RINGS = None


def _ring_registry():
    """Ring table resolved ONCE per worker process and cached — map_groups
    re-invokes the UDF per group, so the registry build must not live inside
    it. At scale the same memo holds a ``ray.get`` of a broadcast ring-table
    ref instead of the fixture build (swap-in point; same call shape)."""
    global _RINGS
    if _RINGS is None:
        _RINGS = {k: (lat, lng) for k, lat, lng in derive.polygons_arrays()}
    return _RINGS


def pip_refine_bucket(group):
    """map_groups: refine (point, polygon) candidates that share a cell.

    Ring geometry comes from the worker-cached registry (``_ring_registry``)."""
    import pandas as pd

    rings = _ring_registry()
    side = group["side"].to_numpy()
    polys = group[side == BUILD_SIDE]
    pts = group[side == POINT_SIDE]
    if len(polys) == 0 or len(pts) == 0:
        return pd.DataFrame({"doc_id": [], "pt_idx": [], "area_id": []}).astype(np.int64)
    pcell = pts["cell"].to_numpy()
    plat = pts["lat"].to_numpy()
    plng = pts["lng"].to_numpy()
    out_doc, out_pt, out_area = [], [], []
    # candidate cells = cells that carry at least one polygon row (few)
    for cell_val, sub in polys.groupby("cell"):
        m = pcell == cell_val
        if not m.any():
            continue
        idx = np.flatnonzero(m)
        for area in np.unique(sub["area_id"].to_numpy()):
            r_lat, r_lng = rings[int(area)]
            inside = pip_k.points_in_ring(plat[idx], plng[idx], r_lat, r_lng)
            hit = idx[inside]
            out_doc.append(pts["doc_id"].to_numpy()[hit])
            out_pt.append(pts["pt_idx"].to_numpy()[hit])
            out_area.append(np.full(hit.size, area, dtype=np.int64))
    if not out_doc:
        return pd.DataFrame({"doc_id": [], "pt_idx": [], "area_id": []}).astype(np.int64)
    return pd.DataFrame(
        {
            "doc_id": np.concatenate(out_doc),
            "pt_idx": np.concatenate(out_pt),
            "area_id": np.concatenate(out_area),
        }
    )


def pip_join_copartition(points_ds, polygons=None, zoom: int = 8, salt_threshold: int | None = None):
    """points Dataset (doc_id, pt_idx, lat, lng) -> (doc_id, pt_idx, area_id)
    via the cell-keyed shuffle join. With ``salt_threshold``, a sampling pass
    counts points per cell and rows of cells at/above the threshold are
    salt-split (build side replicated per salt) — output is identical."""
    import ray.data as rd

    tagged = points_ds.map_batches(
        tag_points, fn_kwargs={"zoom": zoom}, batch_format="pyarrow", zero_copy_batch=True
    )
    hot_cells = None
    if salt_threshold is not None:
        from geo_ray.stages import agg

        def partial_counts(b: pa.Table) -> pa.Table:
            u, c = np.unique(b["cell"].to_numpy(), return_counts=True)
            return pa.table({"cell": pa.array(u), "n": pa.array(c.astype(np.int64))})

        # threshold applied ON-CLUSTER: the driver receives only the hot
        # set, never the full distinct-cell histogram (unbounded at scale)
        hot_cells = agg.hot_keys(
            tagged.map_batches(partial_counts, batch_format="pyarrow"),
            "cell",
            "n",
            salt_threshold,
        )
    build = rd.from_arrow(polygon_side_table(polygons, zoom))
    both = tagged.union(build).map_batches(
        add_bucket, fn_kwargs={"hot_cells": hot_cells}, batch_format="pyarrow"
    )
    from geo_ray.stages.agg import hash_bucket_apply

    return hash_bucket_apply(both, "bucket", pip_refine_bucket)


# ---------------------------------------------------------------------------
# kNN co-partition
# ---------------------------------------------------------------------------


def probe_side_table(query_ids, qlat, qlng, radius_m: float, zoom: int = 8) -> pa.Table:
    """Probe rows: one per (cover cell of the ±radius box, query). Buffering
    uses the reference's box::extend meter scaling (box.h:50-70):
    111000 m/deg lat, 111200*cos(lat) m/deg lng."""
    qlat = np.asarray(qlat, dtype=np.float64)
    qlng = np.asarray(qlng, dtype=np.float64)
    dlat = radius_m / 111000.0
    dlng = radius_m / (111200.0 * np.cos(np.radians(qlat)))
    row_of, cells = cover_cells_of_boxes(qlat - dlat, qlng - dlng, qlat + dlat, qlng + dlng, zoom)
    ids = np.asarray(query_ids, dtype=np.int64)[row_of]
    n = cells.size
    return pa.table(
        {
            "cell": pa.array(cells),
            "side": pa.array(np.full(n, BUILD_SIDE, dtype=np.int8)),
            "doc_id": pa.array(ids),  # query_id rides in doc_id slot
            "pt_idx": pa.array(np.full(n, -1, dtype=np.int64)),
            "lat": pa.array(qlat[row_of]),
            "lng": pa.array(qlng[row_of]),
            "area_id": pa.array(np.full(n, -1, dtype=np.int64)),
        },
        schema=UNION_SCHEMA,
    )


def knn_refine_bucket(group, k: int = 5):
    """map_groups: per (query, cell) partial top-k among the cell's points.

    Cells partition the points, so a point meets a query in exactly one group;
    the global finish is a tiny groupby(query_id) top-k."""
    import pandas as pd

    side = group["side"].to_numpy()
    probes = group[side == BUILD_SIDE]
    pts = group[side == POINT_SIDE]
    empty = pd.DataFrame({"query_id": [], "doc_id": [], "pt_idx": [], "dist_m": []})
    if len(probes) == 0 or len(pts) == 0:
        return empty
    pcell = pts["cell"].to_numpy()
    out = []
    for cell_val, sub in probes.groupby("cell"):
        m = pcell == cell_val
        if not m.any():
            continue
        idx = np.flatnonzero(m)
        d = dist_k.haversine(
            sub["lat"].to_numpy()[:, None],
            sub["lng"].to_numpy()[:, None],
            pts["lat"].to_numpy()[idx][None, :],
            pts["lng"].to_numpy()[idx][None, :],
        )
        kk = min(k, idx.size)
        part = np.argpartition(d, kk - 1, axis=1)[:, :kk] if kk < idx.size else np.tile(
            np.arange(idx.size), (len(sub), 1)
        )
        qi = np.repeat(sub["doc_id"].to_numpy(), part.shape[1])
        pi = idx[part.ravel()]
        out.append(
            pd.DataFrame(
                {
                    "query_id": qi,
                    "doc_id": pts["doc_id"].to_numpy()[pi],
                    "pt_idx": pts["pt_idx"].to_numpy()[pi],
                    "dist_m": d[np.repeat(np.arange(len(sub)), part.shape[1]), part.ravel()],
                }
            )
        )
    return pd.concat(out, ignore_index=True) if out else empty


def knn_copartition(points_ds, query_ids, qlat, qlng, k: int = 5, radius_m: float = 50000.0, zoom: int = 8, hot_cells=None):
    """Cell co-partitioned kNN: returns (query_id, doc_id, pt_idx, dist_m),
    k smallest per query among points within ``radius_m`` of the query.
    ``hot_cells`` salt-splits dense cells' points (probes replicate per salt;
    per-salt partial top-k rows all reach the same final groupby(query_id),
    so the result is unchanged)."""
    import ray.data as rd

    tagged = points_ds.map_batches(
        tag_points, fn_kwargs={"zoom": zoom}, batch_format="pyarrow", zero_copy_batch=True
    )
    probes = rd.from_arrow(probe_side_table(query_ids, qlat, qlng, radius_m, zoom))
    both = tagged.union(probes).map_batches(
        add_bucket, fn_kwargs={"hot_cells": hot_cells}, batch_format="pyarrow"
    )
    from geo_ray.stages.agg import hash_bucket_apply

    partial = hash_bucket_apply(both, "bucket", lambda g: knn_refine_bucket(g, k))
    from geo_ray.stages import knn as knn_st

    return partial.groupby("query_id").map_groups(
        lambda g: knn_st.finish_topk(g, k), batch_format="pyarrow"
    )

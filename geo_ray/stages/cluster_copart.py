"""Distributed ``cluster_nearby`` via cell co-partition (SURVEY.md §2 #48).

The reference algorithm (src/cluster_nearby.cc:174-234) is sequential:
single-linkage components over float32-haversine edges <= max_dist, then a
complete-linkage refinement per SL component. Its SL PARTITION is the
connected components of a deterministic pairwise predicate, which makes the
distributed plan exact, not approximate:

1. Duplicate every point into its z-cell plus the 8 neighbor cells (halo).
   The zoom is computed so the cell ground size stays >= max_dist at every
   latitude up to the ±85° mercator clamp (``safe_zoom``), so every edge of
   the SL graph has both endpoints co-resident in at least one cell.
2. Per cell, run the reference's SL pass over the cell's points sorted by
   GLOBAL id — the pair predicate (bbox prefilter + float32 haversine) is
   direction-dependent, and global-order sorting preserves each pair's
   evaluation direction, so the local edge set is a subset of the global one
   and their union over cells is exactly the global edge set.
3. Union-find over the emitted (representative, member) pairs merges local
   components into the global SL partition. (Driver-side here — the pair
   list is one row per duplicated clustered point; at corpus scale this
   becomes iterative min-label propagation, same fixed point.)
4. Group by final SL component and run the reference's complete-linkage
   refinement per component, members again sorted by global id so the
   sequential scan order (and thus the exact merge sequence) is reproduced.

Output: a canonical partition — each point labeled with the MINIMUM global id
of its final cluster — which equals canonicalizing the sequential algorithm's
labels (tests pin this against kernels.cluster.cluster_nearby run globally).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from geo_ray.kernels import cluster as cluster_k
from geo_ray.kernels import mercator as merc_k

N_BUCKETS = 32


def _cell_xy(lat, lng, zoom):
    px, py = merc_k.latlng_to_pixel(lat, lng, zoom, 1)
    return px.astype(np.int64), py.astype(np.int64)


def explode_halo(batch: pa.Table, zoom: int = 12) -> pa.Table:
    """One row per (point, cell in 3x3 neighborhood): (cell, gid, lat, lng).

    gid is the point's global id (caller-provided int64). Halo duplication is
    the classic 9x blowup; a production variant duplicates only points within
    max_dist of their cell border (the predicate is a cheap pixel-offset
    test) — the 9x form keeps this reference implementation simple.
    """
    lat = batch["lat"].to_numpy()
    lng = batch["lng"].to_numpy()
    gid = batch["gid"].to_numpy().astype(np.int64)
    cx, cy = _cell_xy(lat, lng, zoom)
    n = lat.size
    span = 1 << zoom
    out_cell = np.empty(n * 9, dtype=np.int64)
    k = 0
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            x = (cx + dx) % span  # wrap antimeridian
            y = np.clip(cy + dy, 0, span - 1)
            out_cell[k * n : (k + 1) * n] = x * span + y
            k += 1
    idx = np.tile(np.arange(n, dtype=np.int64), 9)
    return pa.table(
        {
            "cell": pa.array(out_cell),
            "gid": pa.array(gid[idx]),
            "lat": pa.array(lat[idx]),
            "lng": pa.array(lng[idx]),
            "bucket": pa.array((out_cell % N_BUCKETS).astype(np.int64)),
        }
    )


def sl_pairs_bucket(group, max_dist: float):
    """map_groups over coarse buckets: per real cell, the reference SL pass;
    emit (rep=min gid of local component, gid) pairs for clustered points."""
    import pandas as pd

    cell = group["cell"].to_numpy()
    gid = group["gid"].to_numpy()
    lat = group["lat"].to_numpy()
    lng = group["lng"].to_numpy()
    order = np.lexsort((gid, cell))
    cell, gid, lat, lng = cell[order], gid[order], lat[order], lng[order]
    starts = np.flatnonzero(np.concatenate([[True], cell[1:] != cell[:-1]]))
    ends = np.concatenate([starts[1:], [cell.size]])
    reps, members = [], []
    for s, e in zip(starts, ends):
        # drop duplicate gids (a point can land in a cell via several
        # neighbors' halos only across cells, but be safe)
        g = gid[s:e]
        keep = np.ones(g.size, dtype=bool)
        keep[1:] = g[1:] != g[:-1]
        g, la, ln = g[keep], lat[s:e][keep], lng[s:e][keep]
        if g.size < 2:
            continue
        sl = cluster_k._single_linkage(la.astype(np.float32), ln.astype(np.float32), np.float32(max_dist))
        # clustered points: label != own index means joined; group by label
        lab_order = np.argsort(sl, kind="mergesort")
        sl_s = sl[lab_order]
        g_s = g[lab_order]
        c_starts = np.flatnonzero(np.concatenate([[True], sl_s[1:] != sl_s[:-1]]))
        c_ends = np.concatenate([c_starts[1:], [sl_s.size]])
        for cs, ce in zip(c_starts, c_ends):
            if ce - cs < 2:
                continue
            mem = g_s[cs:ce]
            reps.append(np.full(mem.size, mem.min(), dtype=np.int64))
            members.append(mem)
    if not reps:
        return pd.DataFrame(
            {"rep": np.array([], dtype=np.int64), "gid": np.array([], dtype=np.int64)}
        )
    return pd.DataFrame({"rep": np.concatenate(reps), "gid": np.concatenate(members)})


def union_find(pairs_rep: np.ndarray, pairs_gid: np.ndarray) -> dict[int, int]:
    """gid -> global SL component representative (min gid in component)."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:
            parent[x], x = root, parent[x]
        return root

    for r, g in zip(pairs_rep.tolist(), pairs_gid.tolist()):
        rr, rg = find(r), find(g)
        if rr != rg:
            # union by min id keeps representatives canonical
            lo, hi = (rr, rg) if rr < rg else (rg, rr)
            parent[hi] = lo
    return {g: find(g) for g in set(pairs_gid.tolist()) | set(pairs_rep.tolist())}


def cl_refine_bucket(group, max_dist: float):
    """map_groups over comp buckets: reference CL refinement per component
    (members sorted by gid = the sequential scan order); emit final labels
    canonicalized to the min gid of each final cluster."""
    import pandas as pd

    comp = group["comp"].to_numpy()
    gid = group["gid"].to_numpy()
    lat = group["lat"].to_numpy().astype(np.float32)
    lng = group["lng"].to_numpy().astype(np.float32)
    order = np.lexsort((gid, comp))
    comp, gid, lat, lng = comp[order], gid[order], lat[order], lng[order]
    starts = np.flatnonzero(np.concatenate([[True], comp[1:] != comp[:-1]]))
    ends = np.concatenate([starts[1:], [comp.size]])
    out_gid, out_lab = [], []
    for s, e in zip(starts, ends):
        g = gid[s:e]
        if e - s < 3:  # cluster_nearby.cc:203-208 short-circuit
            out_gid.append(g)
            out_lab.append(np.full(g.size, g.min(), dtype=np.int64))
            continue
        cl = cluster_k._complete_linkage(lat[s:e], lng[s:e], np.float32(max_dist))
        lab = np.empty(g.size, dtype=np.int64)
        for lbl in np.unique(cl):
            m = cl == lbl
            lab[m] = g[m].min()
        out_gid.append(g)
        out_lab.append(lab)
    return pd.DataFrame({"gid": np.concatenate(out_gid), "cluster_rep": np.concatenate(out_lab)})


def safe_zoom(max_dist: float, max_abs_lat: float = 85.0511287798) -> int:
    """Largest zoom whose cell ground size stays >= max_dist at every
    latitude up to the mercator clamp — the halo-correctness precondition
    (mercator cell ground size = 40075016.7 * cos(lat) / 2^z meters)."""
    import math

    width_at_clamp = 40075016.686 * math.cos(math.radians(max_abs_lat))
    z = int(math.floor(math.log2(max(2.0, width_at_clamp / max_dist))))
    return max(0, min(20, z))


def cluster_copartition(points_ds, max_dist: float = 500.0, zoom: int | None = None):
    """points Dataset (gid, lat, lng) -> (gid, cluster_rep) canonical
    partition equal to the sequential reference run (see module docstring)."""
    import ray
    import ray.data as rd

    if zoom is None:
        zoom = safe_zoom(max_dist)
    halo = points_ds.map_batches(
        explode_halo, fn_kwargs={"zoom": zoom}, batch_format="pyarrow", zero_copy_batch=True
    )
    pairs = halo.groupby("bucket").map_groups(
        lambda g: sl_pairs_bucket(g, max_dist), batch_format="pandas"
    ).to_pandas()
    if pairs.empty or "rep" not in pairs.columns:
        comp_of = {}
    else:
        comp_of = union_find(pairs["rep"].to_numpy(np.int64), pairs["gid"].to_numpy(np.int64))
    comp_ref = ray.put(comp_of)

    def attach_comp(batch: pa.Table) -> pa.Table:
        mapping = ray.get(comp_ref)
        gid = batch["gid"].to_numpy().astype(np.int64)
        comp = np.array([mapping.get(int(g), int(g)) for g in gid], dtype=np.int64)
        t = batch.append_column("comp", pa.array(comp))
        return t.append_column("cbucket", pa.array((comp % N_BUCKETS).astype(np.int64)))

    with_comp = points_ds.map_batches(attach_comp, batch_format="pyarrow", zero_copy_batch=True)
    return with_comp.groupby("cbucket").map_groups(
        lambda g: cl_refine_bucket(g, max_dist), batch_format="pandas"
    )

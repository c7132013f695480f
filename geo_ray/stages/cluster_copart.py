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
3. Distributed connected components over the emitted (representative, member)
   pairs merge local components into the global SL partition: alternating
   large-star/small-star min-label contraction (``cc_minlabel``), every round
   a coarse-bucket groupby — the pair list never funnels through the driver,
   only a (count, hash-sum) convergence scalar does. The converged star set
   (member -> component-min-gid) is the compact broadcast lookup used to
   label points via ``np.searchsorted``.
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


def explode_halo(batch: pa.Table, zoom: int = 12, max_dist: float | None = None) -> pa.Table:
    """One row per (point, cell it must be co-resident in): (cell, gid, lat, lng).

    gid is the point's global id (caller-provided int64). With
    ``max_dist=None`` this is the classic unconditional 9x halo blowup (kept
    as the pytest cross-check). With ``max_dist`` set, a point is duplicated
    into a neighbor cell ONLY when a strict lower bound on its ground
    distance to the shared border is <= max_dist — the cheap pixel-offset
    test (VERDICT r2 item 6). Correctness: any pair within max_dist is
    either same-cell (always co-resident) or in adjacent cells, and each
    member is then within max_dist of the shared border, so both still land
    in a common cell; the lower bound uses the cell's MINIMUM mercator
    ground scale (cos at the cell's far-from-equator edge), so it can only
    over-duplicate, never miss. At safe_zoom (cell size >= max_dist) the
    duplication factor drops from 9x to ~(1 + 4*max_dist/cell_size).
    """
    lat = batch["lat"].to_numpy()
    lng = batch["lng"].to_numpy()
    gid = batch["gid"].to_numpy().astype(np.int64)
    n = lat.size
    span = 1 << zoom
    mx, my = merc_k.latlng_to_merc(lat, lng)
    res = float(merc_k.resolution(np.asarray(zoom), 1))
    msize = float(merc_k.map_size(np.asarray(zoom), 1))
    vx = (mx + merc_k.MERC_ORIGIN_SHIFT) / res
    vy = msize - (my + merc_k.MERC_ORIGIN_SHIFT) / res
    cx = np.trunc(vx).astype(np.int64)
    cy = merc_k._round_half_away(vy).astype(np.int64)
    if max_dist is None:
        near_w = near_e = near_n = near_s = np.ones(n, dtype=bool)
    else:
        # minimum ground meters per cell unit anywhere in this cell: res *
        # cos(lat) is the local mercator scale and cos is smallest at the
        # cell's y edge farther from the equator (vy in [cy-0.5, cy+0.5])
        lat_lo = merc_k.merc_to_latlng(0.0, (msize - (cy - 0.5)) * res - merc_k.MERC_ORIGIN_SHIFT)[0]
        lat_hi = merc_k.merc_to_latlng(0.0, (msize - (cy + 0.5)) * res - merc_k.MERC_ORIGIN_SHIFT)[0]
        cos_min = np.minimum(np.cos(np.radians(lat_lo)), np.cos(np.radians(lat_hi)))
        scale_min = np.maximum(res * cos_min, 1e-9)
        thr = max_dist * 1.01  # float32-predicate + sphere-radius slack
        near_w = (vx - cx) * scale_min <= thr
        near_e = (cx + 1.0 - vx) * scale_min <= thr
        near_n = (vy - (cy - 0.5)) * scale_min <= thr  # toward smaller y
        near_s = ((cy + 0.5) - vy) * scale_min <= thr
    masks = {
        (-1, -1): near_w & near_n, (-1, 0): near_w, (-1, 1): near_w & near_s,
        (0, -1): near_n, (0, 0): np.ones(n, dtype=bool), (0, 1): near_s,
        (1, -1): near_e & near_n, (1, 0): near_e, (1, 1): near_e & near_s,
    }
    cells, idxs = [], []
    base = np.arange(n, dtype=np.int64)
    for (dx, dy), m in masks.items():
        sel = base[m] if max_dist is not None else base
        x = (cx[sel] + dx) % span  # wrap antimeridian
        y = np.clip(cy[sel] + dy, 0, span - 1)
        cells.append(x * span + y)
        idxs.append(sel)
    out_cell = np.concatenate(cells)
    idx = np.concatenate(idxs)
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


def _star_bucket(df, mode: str):
    """Vectorized per-bucket star operation over MANY nodes at once.

    ``large``: input rows are BOTH orientations (u, v); for each u, with
    m = min(neighbors ∪ {u}), emit (v, m) for every neighbor v > u.
    ``small``: input rows are oriented (hi, lo); for each hi, with
    m = min(lo neighbors), emit (lo, m) for lo != m plus (hi, m).
    Both emit only (x, y) with x > y; output is deduped within the bucket.
    This is the alternating large-star/small-star connected-components
    formulation (Kiveris et al., 'Connected Components in MapReduce and
    Beyond', 2014) — the classic distributed min-label contraction.
    Arrow block fn (no pandas round trip in the per-round hot path).
    """
    from geo_ray.stages.agg import np_col

    empty = pa.table({"u": pa.array([], pa.int64()), "v": pa.array([], pa.int64())})
    if df.num_rows == 0:
        return empty
    u = np_col(df, "u")
    v = np_col(df, "v")
    order = np.lexsort((v, u))
    u, v = u[order], v[order]
    keep = np.ones(u.size, dtype=bool)
    keep[1:] = (u[1:] != u[:-1]) | (v[1:] != v[:-1])
    u, v = u[keep], v[keep]
    starts = np.flatnonzero(np.concatenate([[True], u[1:] != u[:-1]]))
    counts = np.diff(np.concatenate([starts, [u.size]]))
    m = np.minimum.reduceat(v, starts)
    if mode == "large":
        m = np.minimum(m, u[starts])
        mrep = np.repeat(m, counts)
        sel = v > u
        out_u, out_v = v[sel], mrep[sel]
    else:
        mrep = np.repeat(m, counts)
        sel = v != mrep
        out_u = np.concatenate([v[sel], u[starts]])
        out_v = np.concatenate([mrep[sel], m])
    order = np.lexsort((out_v, out_u))
    out_u, out_v = out_u[order], out_v[order]
    if out_u.size == 0:
        return empty
    keep = np.ones(out_u.size, dtype=bool)
    keep[1:] = (out_u[1:] != out_u[:-1]) | (out_v[1:] != out_v[:-1])
    return pa.table({"u": pa.array(out_u[keep]), "v": pa.array(out_v[keep])})


def _edge_checksum(ds) -> tuple[int, int]:
    """(n_edges, 64-bit hash-sum) of an edge Dataset — a driver-side SCALAR
    convergence probe (no edge row ever reaches the driver)."""
    import pandas as pd  # noqa: F401

    def partial(b: pa.Table) -> pa.Table:
        u = b["u"].to_numpy().astype(np.uint64)
        v = b["v"].to_numpy().astype(np.uint64)
        with np.errstate(over="ignore"):
            h = (u * np.uint64(0x9E3779B97F4A7C15) ^ v) * np.uint64(1099511628211)
        return pa.table(
            {
                "n": pa.array([u.size], pa.int64()),
                "hsum": pa.array([int(h.sum(dtype=np.uint64) & np.uint64((1 << 63) - 1))], pa.int64()),
            }
        )

    parts = ds.map_batches(partial, batch_format="pyarrow", batch_size=None).to_pandas()
    return int(parts["n"].sum()), int(parts["hsum"].sum() & ((1 << 63) - 1))


def cc_minlabel(pairs_ds, max_rounds: int = 32):
    """Distributed connected components over a (rep, gid) edge Dataset.

    Alternating large-star / small-star rounds, each a coarse-bucket
    ``groupby().map_groups`` (vectorized over all nodes of the bucket), until
    the oriented edge set reaches a fixpoint — at which point every edge is
    (member, component-min-gid). Returns the star-edge Dataset ``(u, v)``
    with ``v`` = component representative; nodes absent from it are their own
    component. The pair list NEVER funnels through the driver — only a
    (count, hash-sum) scalar probe per round.
    """

    def both_orient(b: pa.Table) -> pa.Table:
        u = b["u"].to_numpy().astype(np.int64)
        v = b["v"].to_numpy().astype(np.int64)
        ou = np.concatenate([u, v])
        ov = np.concatenate([v, u])
        return pa.table(
            {
                "u": pa.array(ou),
                "v": pa.array(ov),
                "b": pa.array((ou % N_BUCKETS).astype(np.int64)),
            }
        )

    def hi_bucket(b: pa.Table) -> pa.Table:
        u = b["u"].to_numpy().astype(np.int64)
        return pa.table(
            {"u": b["u"], "v": b["v"], "b": pa.array((u % N_BUCKETS).astype(np.int64))}
        )

    edges = pairs_ds
    prev = None
    for _ in range(max_rounds):
        ls_in = edges.map_batches(both_orient, batch_format="pyarrow", zero_copy_batch=True)
        from geo_ray.stages.agg import hash_bucket_apply

        ls = hash_bucket_apply(ls_in, "b", lambda g: _star_bucket(g, "large"), batch_format="pyarrow")
        ss_in = ls.map_batches(hi_bucket, batch_format="pyarrow", zero_copy_batch=True)
        edges = hash_bucket_apply(ss_in, "b", lambda g: _star_bucket(g, "small"), batch_format="pyarrow").materialize()
        cur = _edge_checksum(edges)
        if cur == prev:
            return edges
        prev = cur
    raise RuntimeError("cc_minlabel did not converge")


# Edge sets at or below this count are resolved in ONE reducer task (a
# single constant-key groupby — off-driver, one shuffle) instead of paying
# 2+ star-contraction rounds of fixed Ray-op overhead; larger sets iterate
# cc_minlabel. 5M edges ~ 80 MB — trivially one worker's heap.
SINGLE_TASK_EDGE_LIMIT = 5_000_000


def resolve_components(edges_ds):
    """(u, v) edge Dataset -> star Dataset (member, component-min root).

    Size-gated plan: small edge lists fold to a single reducer task running
    union-find (the classic small-side single-reducer finish — never the
    driver); big ones run the log-round star contraction (:func:`cc_minlabel`).
    Identical output either way (pytest-pinned)."""
    edges_ds = edges_ds.materialize()
    if edges_ds.count() > SINGLE_TASK_EDGE_LIMIT:
        return cc_minlabel(edges_ds)

    def const_key(b: pa.Table) -> pa.Table:
        return b.append_column("b", pa.array(np.zeros(b.num_rows, dtype=np.int64)))

    def uf_group(df):
        import pandas as pd

        mp = union_find(df["v"].to_numpy(np.int64), df["u"].to_numpy(np.int64))
        items = [(g, r) for g, r in mp.items() if g != r]
        if not items:
            return pd.DataFrame(
                {"u": np.array([], dtype=np.int64), "v": np.array([], dtype=np.int64)}
            )
        u, v = zip(*items)
        return pd.DataFrame({"u": np.array(u, dtype=np.int64), "v": np.array(v, dtype=np.int64)})

    from geo_ray.stages.agg import hash_bucket_apply

    return hash_bucket_apply(
        edges_ds.map_batches(const_key, batch_format="pyarrow", zero_copy_batch=True),
        "b",
        uf_group,
        num_blocks=1,
    )


def union_find(pairs_rep: np.ndarray, pairs_gid: np.ndarray) -> dict[int, int]:
    """gid -> global SL component representative (min gid in component).
    Runs inside the single-reducer task of :func:`resolve_components` (and as
    the sequential cross-check for cc_minlabel tests) — never on the driver."""
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


# Star maps at or below this row count broadcast to workers (ray.put of two
# sorted arrays + searchsorted — one object-store copy, no extra shuffle);
# larger maps attach through a gid-keyed co-partition join so the driver never
# materializes them (VERDICT r2 item 4). 5M rows ~ 80 MB.
BROADCAST_NODE_LIMIT = 5_000_000


def _attach_components_shuffle(points_ds, stars):
    """gid-keyed co-partition join: stars (side 0) and points (side 1) hash to
    the same bucket on gid; each bucket labels its points via searchsorted
    over its own star slice. The star map never leaves the object store."""
    def star_side(b) -> pa.Table:
        if "u" not in b.column_names or b.num_rows == 0:
            return pa.table(
                {
                    "gid": pa.array([], pa.int64()),
                    "comp": pa.array([], pa.int64()),
                    "lat": pa.array([], pa.float64()),
                    "lng": pa.array([], pa.float64()),
                    "side": pa.array([], pa.int64()),
                    "jbucket": pa.array([], pa.int64()),
                }
            )
        u = b["u"].to_numpy().astype(np.int64)
        v = b["v"].to_numpy().astype(np.int64)
        z = np.zeros(u.size, dtype=np.float64)
        return pa.table(
            {
                "gid": pa.array(u),
                "comp": pa.array(v),
                "lat": pa.array(z),
                "lng": pa.array(z),
                "side": pa.array(np.zeros(u.size, dtype=np.int64)),
                "jbucket": pa.array(u % N_BUCKETS),
            }
        )

    def point_side(b: pa.Table) -> pa.Table:
        gid = b["gid"].to_numpy().astype(np.int64)
        return pa.table(
            {
                "gid": pa.array(gid),
                "comp": pa.array(gid),  # default: own component
                "lat": b["lat"].cast(pa.float64()),
                "lng": b["lng"].cast(pa.float64()),
                "side": pa.array(np.ones(gid.size, dtype=np.int64)),
                "jbucket": pa.array(gid % N_BUCKETS),
            }
        )

    def attach_bucket(g):
        import pandas as pd

        side = g["side"].to_numpy()
        stars_g = g[side == 0]
        pts = g[side == 1]
        gid = pts["gid"].to_numpy(np.int64)
        comp = pts["comp"].to_numpy(np.int64).copy()
        nodes = stars_g["gid"].to_numpy(np.int64)
        if nodes.size:
            order = np.argsort(nodes, kind="mergesort")
            nodes = nodes[order]
            roots = stars_g["comp"].to_numpy(np.int64)[order]
            pos = np.searchsorted(nodes, gid)
            pos_c = np.minimum(pos, nodes.size - 1)
            hit = nodes[pos_c] == gid
            comp[hit] = roots[pos_c[hit]]
        return pd.DataFrame(
            {
                "gid": gid,
                "lat": pts["lat"].to_numpy(),
                "lng": pts["lng"].to_numpy(),
                "comp": comp,
            }
        )

    from geo_ray.stages.agg import hash_bucket_apply

    both = stars.map_batches(star_side, batch_format="pyarrow").union(
        points_ds.map_batches(point_side, batch_format="pyarrow", zero_copy_batch=True)
    )
    return hash_bucket_apply(both, "jbucket", attach_bucket)


def cluster_copartition(
    points_ds,
    max_dist: float = 500.0,
    zoom: int | None = None,
    broadcast_limit: int | None = None,
    full_halo: bool = False,
):
    """points Dataset (gid, lat, lng) -> (gid, cluster_rep) canonical
    partition equal to the sequential reference run (see module docstring).

    ``full_halo=True`` forces the unconditional 9x halo (the pytest
    cross-check for the default border-only duplication)."""
    import ray

    if zoom is None:
        zoom = safe_zoom(max_dist)
    if broadcast_limit is None:
        broadcast_limit = BROADCAST_NODE_LIMIT
    halo = points_ds.map_batches(
        explode_halo,
        fn_kwargs={"zoom": zoom, "max_dist": None if full_halo else max_dist},
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    from geo_ray.stages.agg import hash_bucket_apply

    pairs = hash_bucket_apply(halo, "bucket", lambda g: sl_pairs_bucket(g, max_dist))

    def as_edges(b) -> pa.Table:
        if "rep" not in b.column_names:
            return pa.table({"u": pa.array([], pa.int64()), "v": pa.array([], pa.int64())})
        return pa.table(
            {
                "u": b["gid"].cast(pa.int64()),
                "v": b["rep"].cast(pa.int64()),
            }
        )

    stars = resolve_components(pairs.map_batches(as_edges, batch_format="pyarrow")).materialize()
    # The converged star set (member -> component-min-gid) is one row per
    # CLUSTERED point — usually far smaller than the input. Small maps
    # broadcast (ray.put + searchsorted); past the gate they attach through a
    # gid-keyed shuffle join and never touch the driver.
    if stars.count() > broadcast_limit:
        with_comp = _attach_components_shuffle(points_ds, stars)
    else:
        mp = stars.to_pandas()
        if "u" in mp.columns and len(mp):
            nodes = mp["u"].to_numpy(np.int64)
            roots = mp["v"].to_numpy(np.int64)
        else:  # no SL pair anywhere: every point is its own component
            nodes = np.zeros(0, dtype=np.int64)
            roots = np.zeros(0, dtype=np.int64)
        order = np.argsort(nodes, kind="mergesort")
        comp_ref = ray.put((nodes[order], roots[order]))

        def attach_comp(batch: pa.Table) -> pa.Table:
            nodes, roots = ray.get(comp_ref)
            gid = batch["gid"].to_numpy().astype(np.int64)
            if nodes.size:
                pos = np.searchsorted(nodes, gid)
                pos_c = np.minimum(pos, nodes.size - 1)
                hit = nodes[pos_c] == gid
                comp = np.where(hit, roots[pos_c], gid)
            else:
                comp = gid
            return batch.append_column("comp", pa.array(comp))

        with_comp = points_ds.map_batches(
            attach_comp, batch_format="pyarrow", zero_copy_batch=True
        )

    def add_cbucket(b: pa.Table) -> pa.Table:
        comp = b["comp"].to_numpy().astype(np.int64)
        return b.append_column("cbucket", pa.array((comp % N_BUCKETS).astype(np.int64)))

    with_comp = with_comp.map_batches(add_cbucket, batch_format="pyarrow", zero_copy_batch=True)
    return hash_bucket_apply(
        with_comp, "cbucket", lambda g: cl_refine_bucket(g, max_dist)
    )

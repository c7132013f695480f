"""Distributed clustering == sequential reference algorithm (partition-exact)."""

import numpy as np
import pyarrow.parquet as pq
import pytest

from geo_ray.kernels import cluster as cluster_k
from geo_ray.sources import derive

SF = "/root/testdata/sf0.001"


def _global_partition(gid, lat, lng, max_dist=2000.0):
    """Sequential cluster_nearby canonicalized: gid -> min gid of cluster."""
    order = np.argsort(gid, kind="mergesort")
    g, la, ln = gid[order], lat[order], lng[order]
    labels = cluster_k.cluster_nearby(la, ln, max_dist)
    rep = np.empty(g.size, dtype=np.int64)
    for lbl in np.unique(labels):
        m = labels == lbl
        rep[m] = g[m].min()
    return dict(zip(g.tolist(), rep.tolist()))


def test_cluster_copart_matches_sequential(ray_session):
    from geo_ray.pipelines import queries as Q

    out = Q.q_cluster_copart(SF).to_pandas()
    got = dict(zip(out["gid"].astype(np.int64), out["cluster_rep"].astype(np.int64)))

    doc = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id"])["doc_id"].to_numpy()
    d_rep, pt_idx, lat, lng = derive.derive_points(np.sort(doc.astype(np.int64)))
    gid = d_rep * 8 + pt_idx
    want = _global_partition(gid, lat, lng)

    assert len(got) == len(want)
    assert got == want
    # sanity: clustering is non-trivial on this data
    n_clustered = sum(1 for g, r in want.items() if sum(1 for x in want.values() if x == r) > 1)
    assert n_clustered > 10


def test_cc_minlabel_matches_union_find(ray_session):
    """Distributed star-contraction CC == sequential union-find on random
    edge sets, including long chains (multi-round convergence)."""
    import pandas as pd
    import ray.data as rd

    from geo_ray.stages import cluster_copart as cc

    rng = np.random.default_rng(7)
    cases = []
    # random sparse graph over sparse large ids
    ids = rng.choice(10**9, size=200, replace=False).astype(np.int64)
    e_u = rng.choice(ids, 150)
    e_v = rng.choice(ids, 150)
    cases.append((e_u, e_v))
    # a long chain: worst case for naive propagation
    chain = np.sort(rng.choice(10**6, size=64, replace=False)).astype(np.int64)
    cases.append((chain[:-1], chain[1:]))
    # self loops + duplicates
    cases.append((np.array([5, 5, 7, 9]), np.array([5, 7, 7, 11])))

    for e_u, e_v in cases:
        ds = rd.from_pandas(pd.DataFrame({"u": e_u.astype(np.int64), "v": e_v.astype(np.int64)}))
        stars = cc.cc_minlabel(ds).to_pandas()
        got = dict(zip(stars["u"].astype(int), stars["v"].astype(int)))
        want = cc.union_find(e_u.astype(np.int64), e_v.astype(np.int64))
        all_nodes = set(e_u.tolist()) | set(e_v.tolist())
        for n in all_nodes:
            assert got.get(n, n) == want.get(n, n), (n, got.get(n, n), want.get(n, n))


def test_resolve_components_paths_agree(ray_session):
    """Single-reducer path == star-contraction path on the same edge set."""
    import pandas as pd
    import ray.data as rd

    from geo_ray.stages import cluster_copart as cc

    rng = np.random.default_rng(11)
    ids = rng.choice(10**8, size=300, replace=False).astype(np.int64)
    e_u = rng.choice(ids, 220)
    e_v = rng.choice(ids, 220)
    ds = rd.from_pandas(pd.DataFrame({"u": e_u, "v": e_v}))
    small = cc.resolve_components(ds).to_pandas()
    big = cc.cc_minlabel(rd.from_pandas(pd.DataFrame({"u": e_u, "v": e_v}))).to_pandas()
    m_small = dict(zip(small["u"].astype(int), small["v"].astype(int)))
    m_big = dict(zip(big["u"].astype(int), big["v"].astype(int)))
    nodes = set(e_u.tolist()) | set(e_v.tolist())
    for n in nodes:
        assert m_small.get(n, n) == m_big.get(n, n)


def test_cluster_copart_no_pairs(ray_session):
    """Points too far apart to cluster: every point is its own component."""
    import pandas as pd
    import ray.data as rd

    from geo_ray.stages.cluster_copart import cluster_copartition

    pts = pd.DataFrame(
        {
            "gid": np.arange(5, dtype=np.int64),
            "lat": np.array([0.0, 10.0, 20.0, 30.0, 40.0]),
            "lng": np.array([0.0, 10.0, 20.0, 30.0, 40.0]),
        }
    )
    out = cluster_copartition(rd.from_pandas(pts), max_dist=100.0).to_pandas()
    got = dict(zip(out["gid"].astype(int), out["cluster_rep"].astype(int)))
    assert got == {i: i for i in range(5)}


def _derived_points_df():
    import pandas as pd

    doc = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id"])["doc_id"].to_numpy()
    d_rep, pt_idx, lat, lng = derive.derive_points(np.sort(doc.astype(np.int64)))
    return pd.DataFrame({"gid": d_rep * 8 + pt_idx, "lat": lat, "lng": lng})


def test_border_halo_matches_full_halo(ray_session):
    """Border-only halo duplication == unconditional 9x halo (partition-exact),
    and the halo row count actually shrinks (VERDICT r2 item 6)."""
    import pyarrow as pa
    import ray.data as rd

    from geo_ray.stages import cluster_copart as cc

    pts = _derived_points_df()
    border = cc.cluster_copartition(rd.from_pandas(pts), max_dist=2000.0).to_pandas()
    full = cc.cluster_copartition(
        rd.from_pandas(pts), max_dist=2000.0, full_halo=True
    ).to_pandas()
    m_border = dict(zip(border["gid"].astype(int), border["cluster_rep"].astype(int)))
    m_full = dict(zip(full["gid"].astype(int), full["cluster_rep"].astype(int)))
    assert m_border == m_full and len(m_border) == len(pts)

    batch = pa.table(
        {"gid": pts["gid"].to_numpy(), "lat": pts["lat"].to_numpy(), "lng": pts["lng"].to_numpy()}
    )
    zoom = cc.safe_zoom(2000.0)
    n_full = cc.explode_halo(batch, zoom=zoom, max_dist=None).num_rows
    n_border = cc.explode_halo(batch, zoom=zoom, max_dist=2000.0).num_rows
    assert n_full == 9 * len(pts)
    assert len(pts) <= n_border < 0.5 * n_full


def test_component_attach_shuffle_join_matches_broadcast(ray_session):
    """broadcast_limit=0 forces the gid-keyed shuffle join for the component
    map; output must equal the broadcast path (VERDICT r2 item 4)."""
    import ray.data as rd

    from geo_ray.stages import cluster_copart as cc

    pts = _derived_points_df()
    bc = cc.cluster_copartition(rd.from_pandas(pts), max_dist=2000.0).to_pandas()
    sj = cc.cluster_copartition(
        rd.from_pandas(pts), max_dist=2000.0, broadcast_limit=0
    ).to_pandas()
    m_bc = dict(zip(bc["gid"].astype(int), bc["cluster_rep"].astype(int)))
    m_sj = dict(zip(sj["gid"].astype(int), sj["cluster_rep"].astype(int)))
    assert m_bc == m_sj and len(m_sj) == len(pts)

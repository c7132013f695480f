"""Distributed triangle counting over an undirected pair graph.

Node-iterator with DEGREE ORIENTATION (the standard shuffle-friendly plan):
orient every edge from its (degree, node)-smaller endpoint to the larger,
generate wedges only at each node's out-neighborhood — out-degree is bounded
by O(sqrt(m)) under this orientation, so the wedge fan-out (the quadratic
step) cannot blow up on hub nodes — then verify each wedge's closing edge
with a pair-key co-partition. Every stage is a bucketed vectorized pass;
nothing materializes on the driver.

Feeds on the embedding near-dup pair graph here, but any (u, v) edge table
works. All helpers follow the hash_bucket_apply contract: a block holds all
rows of each of its keys, many keys at once, segmented vectorized inside.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from geo_ray.stages.agg import np_col


def edge_slots(batch: pa.Table) -> pa.Table:
    """(u, v) edges -> two node-keyed slot rows per edge: (node, other)."""
    u = batch["u"].to_numpy().astype(np.int64)
    v = batch["v"].to_numpy().astype(np.int64)
    return pa.table(
        {
            "node": pa.array(np.concatenate([u, v])),
            "other": pa.array(np.concatenate([v, u])),
        }
    )


def attach_degrees(group):
    """Node-bucket over edge slots: the bucket holds EVERY slot of each of
    its nodes, so a node's degree is simply its run length — no separate
    degree groupby or carrier-row union. Emits (node, other, deg)."""
    node = np_col(group, "node")
    if node.size == 0:
        return pa.table(
            {
                "node": pa.array([], pa.int64()),
                "other": pa.array([], pa.int64()),
                "deg": pa.array([], pa.int64()),
            }
        )
    other = np_col(group, "other")
    order = np.argsort(node, kind="mergesort")
    node, other = node[order], other[order]
    starts = np.flatnonzero(np.concatenate([[True], node[1:] != node[:-1]]))
    lens = np.diff(np.concatenate([starts, [node.size]]))
    deg = np.repeat(lens, lens)
    return pa.table(
        {"node": pa.array(node), "other": pa.array(other), "deg": pa.array(deg)}
    )


def orient_edges(group):
    """Edge-key bucket: the two annotated slots of each edge meet; emit the
    edge directed from the (degree, node)-smaller endpoint, carrying the
    destination's order key for wedge sorting.

    Robust to messy edge tables: duplicate edges collapse to one directed
    edge (first (edge_key, node) slot wins — deg is a function of node, so
    duplicates carry equal payloads) and self-loops (a single distinct slot
    per key) are dropped, matching the standard triangle-count convention.
    Without this, positional [0::2]/[1::2] pairing over runs like
    [u,u,v,v] would silently mis-pair (u,u)/(v,v)."""
    ek = np_col(group, "edge_key")
    empty = pa.table(
        {
            "src": pa.array([], pa.int64()),
            "dst": pa.array([], pa.int64()),
            "dst_deg": pa.array([], pa.int64()),
        }
    )
    if ek.size == 0:
        return empty
    node = np_col(group, "node")
    deg = np_col(group, "deg")
    order = np.lexsort((node, ek))
    ek, node, deg = ek[order], node[order], deg[order]
    keep = np.concatenate([[True], (ek[1:] != ek[:-1]) | (node[1:] != node[:-1])])
    ek, node, deg = ek[keep], node[keep], deg[keep]
    starts = np.flatnonzero(np.concatenate([[True], ek[1:] != ek[:-1]]))
    lens = np.diff(np.concatenate([starts, [ek.size]]))
    if not (lens == 2).all():
        # drop self-loops (1 distinct slot); >2 distinct nodes per key is a
        # pack_pair_keys collision and must never pass silently
        if (lens > 2).any():
            raise ValueError("edge_key collision: >2 distinct nodes share a key")
        pair = np.repeat(lens == 2, lens)
        ek, node, deg = ek[pair], node[pair], deg[pair]
        if ek.size == 0:
            return empty
    a, b = node[0::2], node[1::2]
    da, db = deg[0::2], deg[1::2]
    a_first = (da < db) | ((da == db) & (a < b))
    src = np.where(a_first, a, b)
    dst = np.where(a_first, b, a)
    dst_deg = np.where(a_first, db, da)
    return pa.table(
        {"src": pa.array(src), "dst": pa.array(dst), "dst_deg": pa.array(dst_deg)}
    )


def gen_wedges(group):
    """Src bucket: per source, all ordered pairs of out-neighbors — the
    candidate closing edges, each carrying its witness apex."""
    src = np_col(group, "src")
    empty = pa.table(
        {
            "w1": pa.array([], pa.int64()),
            "w2": pa.array([], pa.int64()),
            "apex": pa.array([], pa.int64()),
        }
    )
    if src.size == 0:
        return empty
    dst = np_col(group, "dst")
    dd = np_col(group, "dst_deg")
    order = np.lexsort((dst, dd, src))
    src, dst, dd = src[order], dst[order], dd[order]
    starts = np.flatnonzero(np.concatenate([[True], src[1:] != src[:-1]]))
    lens = np.diff(np.concatenate([starts, [src.size]]))
    w1, w2, apex = [], [], []
    for s, ln in zip(starts[lens >= 2], lens[lens >= 2]):
        d = dst[s : s + ln]  # sorted by (deg, node) — the orientation order
        iu, ju = np.triu_indices(ln, 1)
        w1.append(d[iu])
        w2.append(d[ju])
        apex.append(np.full(iu.size, src[s]))
    if not w1:
        return empty
    return pa.table(
        {
            "w1": pa.array(np.concatenate(w1)),
            "w2": pa.array(np.concatenate(w2)),
            "apex": pa.array(np.concatenate(apex)),
        }
    )


def close_wedges(group):
    """Pair-key bucket of directed edges (kind 0) and wedge candidates
    (kind 1): every candidate whose key has an edge row closes a triangle —
    emit per-corner PARTIAL counts (np.unique over the three corner slots),
    so the final shuffle carries one row per (node, bucket) instead of
    three rows per triangle (corner volume is 3x the triangle count, which
    dwarfs the node count on dense duplicate clusters)."""
    empty = pa.table(
        {"vec_id": pa.array([], pa.int64()), "n_partial": pa.array([], pa.int64())}
    )
    pk = np_col(group, "pair_key")
    if pk.size == 0:
        return empty
    kind = np_col(group, "kind")
    w1 = np_col(group, "w1")
    w2 = np_col(group, "w2")
    apex = np_col(group, "apex")
    order = np.lexsort((kind, pk))
    pk, kind, w1, w2, apex = pk[order], kind[order], w1[order], w2[order], apex[order]
    starts = np.flatnonzero(np.concatenate([[True], pk[1:] != pk[:-1]]))
    lens = np.diff(np.concatenate([starts, [pk.size]]))
    has_edge = kind[starts] == 0
    out = []
    for s, ln in zip(starts[has_edge], lens[has_edge]):
        c = slice(s, s + ln)
        m = kind[c] == 1
        if m.any():
            out.append(
                np.concatenate([w1[c][m], w2[c][m], apex[c][m]])
            )
    if not out:
        return empty
    u, cnt = np.unique(np.concatenate(out), return_counts=True)
    return pa.table({"vec_id": pa.array(u), "n_partial": pa.array(cnt.astype(np.int64))})


def _mix_bucket(k: np.ndarray, nb: int) -> np.ndarray:
    h = (k.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(33)
    return (h % np.uint64(nb)).astype(np.int64)


def pagerank(
    edges_ds,
    nodes_ds,
    n_nodes: int,
    iters: int = 3,
    d: float = 0.85,
    num_blocks: int | None = None,
):
    """Simplified distributed PageRank (dangling mass absorbed) over a
    directed (src, dst) edge Dataset — the iterative-dataflow composition of
    the join family. Per round: a src-keyed tagged_inner_join attaches the
    current rank to edges (measured the cheap part), and ONE fused node-hash
    co-partition both sums the per-dst contribution partials and writes the
    new rank — the nodes ride the same shuffle as zero-contribution rows, so
    rank sinks get (1-d)/N with no separate left join, and no sort-based
    groupby ever runs (Ray's sort groupby on a wide key domain measured
    ~20 s/round at 4M edge rows vs ~2 s for the hash-bucket path). Rank
    lives as a Dataset end to end; driver state is the ``n_nodes`` scalar.

    Ranks are FIXED-POINT int64 nanos (rn = rank * 1e9): per-edge
    contributions are exact integer floor divisions ``rn // deg`` and the
    per-dst reduce is an exact int64 sum, so the result is independent of
    summation order — a float reduce here diverges from a SQL twin whenever
    a contribution sum lands within reassociation noise (~1e-16) of a
    0.5e-9 rounding boundary (ADVICE r4), and the error compounds across
    rounds. The only float ops left (init division, ``base + d * s``
    finish, final ``rn / 1e9``) are single IEEE expressions mirrored
    op-for-op by the SQL twins, hence bit-deterministic on both sides.
    Returns a (node, r) Dataset, r = rn / 1e9."""
    from geo_ray.kernels import fixed as fixed_k
    from geo_ray.stages.agg import combine_sums, default_num_blocks, hash_bucket_apply
    from geo_ray.stages.join import tagged_inner_join

    if num_blocks is None:
        # shuffle width tracks the DATA, not the cluster: every sort-based
        # exchange here has a per-block fixed cost on both sides, and a 3-
        # round iteration pays it ~3x per extra block — a toy graph at the
        # cluster-wide width spends its whole wall clock on it (measured
        # 18.2s -> ~8s at sf0.1 with data-sized widths). Callers should pass
        # a MATERIALIZED edge Dataset so the count is free.
        rows = max(int(edges_ds.count()), n_nodes)
        num_blocks = max(1, min(default_num_blocks(), (rows + 99_999) // 100_000))
    nb = num_blocks

    def deg_part(b: pa.Table) -> pa.Table:
        u, c = np.unique(np_col(b, "src"), return_counts=True)
        return pa.table(
            {
                "src": pa.array(u),
                "n_part": pa.array(c.astype(np.int64)),
                "bucket": pa.array(_mix_bucket(u, nb)),
            }
        )

    deg = hash_bucket_apply(
        edges_ds.map_batches(deg_part, batch_format="pyarrow"),
        "bucket",
        lambda b: combine_sums(b, "src", "n_part").rename_columns(["src", "deg"]),
        num_blocks=nb,
        batch_format="pyarrow",
    )
    edges_deg = tagged_inner_join(
        edges_ds, deg, left_key="src", right_key="src", right_cols=["deg"], num_buckets=nb
    ).materialize()

    r0n = np.int64(fixed_k.round_half_away(1e9 / n_nodes, 0))
    base_nano = (1.0 - d) * 1e9 / n_nodes

    def init_rank(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": b["node"].cast(pa.int64()),
                "rn": pa.array(np.full(b.num_rows, r0n, dtype=np.int64)),
            }
        )

    ranks = nodes_ds.map_batches(init_rank, batch_format="pyarrow").materialize()
    node_rows = ranks.select_columns(["node"]).map_batches(
        lambda b: pa.table(
            {
                "node": b["node"],
                "s_part": pa.array(np.zeros(b.num_rows, dtype=np.int64)),
                "bucket": pa.array(_mix_bucket(np_col(b, "node"), nb)),
            }
        ),
        batch_format="pyarrow",
    ).materialize()

    def contrib_part(b: pa.Table) -> pa.Table:
        dst = np_col(b, "dst")
        c = np_col(b, "rn") // np_col(b, "deg")  # exact integer contribution
        order = np.argsort(dst, kind="mergesort")
        dst, c = dst[order], c[order]
        uk, starts = np.unique(dst, return_index=True)
        return pa.table(
            {
                "node": pa.array(uk),
                "s_part": pa.array(
                    np.add.reduceat(c, starts) if uk.size else np.array([], np.int64)
                ),
                "bucket": pa.array(_mix_bucket(uk, nb)),
            }
        )

    def update_bucket(b: pa.Table) -> pa.Table:
        # every node of this bucket has at least its zero row, so the
        # combined sums cover all nodes; finish the rank in place
        t = combine_sums(b, "node", "s_part")
        s = t["s_part"].to_numpy().astype(np.float64)
        return pa.table(
            {
                "node": t["node"],
                "rn": pa.array(
                    fixed_k.round_half_away(base_nano + d * s, 0).astype(np.int64)
                ),
            }
        )

    for _ in range(iters):
        j = tagged_inner_join(
            edges_deg, ranks, left_key="src", right_key="node", right_cols=["rn"],
            num_buckets=nb,
        )
        ranks = hash_bucket_apply(
            node_rows.union(j.map_batches(contrib_part, batch_format="pyarrow")),
            "bucket",
            update_bucket,
            num_blocks=nb,
            batch_format="pyarrow",
        ).materialize()

    def finish(b: pa.Table) -> pa.Table:
        return pa.table(
            {"node": b["node"], "r": pa.array(np_col(b, "rn").astype(np.float64) / 1e9)}
        )

    return ranks.map_batches(finish, batch_format="pyarrow")

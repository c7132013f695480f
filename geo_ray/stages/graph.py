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
    import pandas as pd

    node = group["node"].to_numpy(np.int64)
    if node.size == 0:
        return pd.DataFrame(
            {
                "node": np.array([], dtype=np.int64),
                "other": np.array([], dtype=np.int64),
                "deg": np.array([], dtype=np.int64),
            }
        )
    other = group["other"].to_numpy(np.int64)
    order = np.argsort(node, kind="mergesort")
    node, other = node[order], other[order]
    starts = np.flatnonzero(np.concatenate([[True], node[1:] != node[:-1]]))
    lens = np.diff(np.concatenate([starts, [node.size]]))
    deg = np.repeat(lens, lens)
    return pd.DataFrame({"node": node, "other": other, "deg": deg})


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
    import pandas as pd

    ek = group["edge_key"].to_numpy(np.int64)
    empty = pd.DataFrame(
        {
            "src": np.array([], dtype=np.int64),
            "dst": np.array([], dtype=np.int64),
            "dst_deg": np.array([], dtype=np.int64),
        }
    )
    if ek.size == 0:
        return empty
    node = group["node"].to_numpy(np.int64)
    deg = group["deg"].to_numpy(np.int64)
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
    return pd.DataFrame({"src": src, "dst": dst, "dst_deg": dst_deg})


def gen_wedges(group):
    """Src bucket: per source, all ordered pairs of out-neighbors — the
    candidate closing edges, each carrying its witness apex."""
    import pandas as pd

    src = group["src"].to_numpy(np.int64)
    empty = pd.DataFrame(
        {
            "w1": np.array([], dtype=np.int64),
            "w2": np.array([], dtype=np.int64),
            "apex": np.array([], dtype=np.int64),
        }
    )
    if src.size == 0:
        return empty
    dst = group["dst"].to_numpy(np.int64)
    dd = group["dst_deg"].to_numpy(np.int64)
    order = np.lexsort((dst, dd, src))
    src, dst, dd = src[order], dst[order], dd[order]
    starts = np.flatnonzero(np.concatenate([[True], src[1:] != src[:-1]]))
    lens = np.diff(np.concatenate([starts, [src.size]]))
    out = []
    for s, ln in zip(starts[lens >= 2], lens[lens >= 2]):
        d = dst[s : s + ln]  # sorted by (deg, node) — the orientation order
        iu, ju = np.triu_indices(ln, 1)
        out.append(
            pd.DataFrame({"w1": d[iu], "w2": d[ju], "apex": np.full(iu.size, src[s])})
        )
    if not out:
        return empty
    return pd.concat(out, ignore_index=True)


def close_wedges(group):
    """Pair-key bucket of directed edges (kind 0) and wedge candidates
    (kind 1): every candidate whose key has an edge row closes a triangle —
    emit its three corners."""
    import pandas as pd

    empty = pd.DataFrame({"vec_id": np.array([], dtype=np.int64)})
    pk = group["pair_key"].to_numpy(np.int64)
    if pk.size == 0:
        return empty
    kind = group["kind"].to_numpy(np.int64)
    w1 = group["w1"].to_numpy(np.int64)
    w2 = group["w2"].to_numpy(np.int64)
    apex = group["apex"].to_numpy(np.int64)
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
    return pd.DataFrame({"vec_id": np.concatenate(out)})

"""Triangle-counting stages on crafted graphs where the answer is known."""

import numpy as np
import pandas as pd
import pyarrow as pa


def _count(edges_uv, nb=5):
    """Run the full stage chain locally over one synthetic edge list."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    from geo_ray.pipelines.queries import mix32_np
    from geo_ray.stages import graph as g
    from geo_ray.stages.agg import hash_bucket_apply
    from geo_ray.stages.dedup import pack_pair_keys

    u, v = (np.array(x, dtype=np.int64) for x in zip(*edges_uv))
    edges = rd.from_arrow(pa.table({"u": pa.array(u), "v": pa.array(v)}))
    slots = edges.map_batches(g.edge_slots, batch_format="pyarrow")

    def nbucket(b):
        return b.append_column(
            "bucket", pa.array(mix32_np(b["node"].to_numpy()) % np.int64(nb))
        )

    annotated = hash_bucket_apply(
        slots.map_batches(nbucket, batch_format="pyarrow"), "bucket", g.attach_degrees,
        num_blocks=nb,
    )

    def ebucket(b):
        node = b["node"].to_numpy(zero_copy_only=False).astype(np.int64)
        other = b["other"].to_numpy(zero_copy_only=False).astype(np.int64)
        ek = pack_pair_keys(np.minimum(node, other), np.maximum(node, other))
        t = pa.table({"edge_key": pa.array(ek), "node": pa.array(node), "deg": b["deg"]})
        return t.append_column("bucket", pa.array(mix32_np(ek) % np.int64(nb)))

    directed = hash_bucket_apply(
        annotated.map_batches(ebucket, batch_format="pyarrow"), "bucket", g.orient_edges,
        num_blocks=nb,
    ).materialize()

    def sbucket(b):
        return b.append_column(
            "bucket",
            pa.array(mix32_np(b["src"].to_numpy(zero_copy_only=False).astype(np.int64)) % np.int64(nb)),
        )

    wedges = hash_bucket_apply(
        directed.map_batches(sbucket, batch_format="pyarrow"), "bucket", g.gen_wedges,
        num_blocks=nb,
    )

    def edge_side(b):
        src = b["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        dst = b["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        z = np.zeros(src.size, dtype=np.int64)
        return pa.table(
            {
                "pair_key": pa.array(pack_pair_keys(src, dst)),
                "kind": pa.array(z),
                "w1": pa.array(z),
                "w2": pa.array(z),
                "apex": pa.array(z),
            }
        )

    def cand_side(b):
        w1 = b["w1"].to_numpy(zero_copy_only=False).astype(np.int64)
        w2 = b["w2"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "pair_key": pa.array(pack_pair_keys(w1, w2)),
                "kind": pa.array(np.ones(w1.size, dtype=np.int64)),
                "w1": pa.array(w1),
                "w2": pa.array(w2),
                "apex": b["apex"].cast(pa.int64()),
            }
        )

    def pbucket(b):
        return b.append_column(
            "bucket", pa.array(mix32_np(b["pair_key"].to_numpy()) % np.int64(nb))
        )

    tagged = (
        directed.map_batches(edge_side, batch_format="pyarrow")
        .union(wedges.map_batches(cand_side, batch_format="pyarrow"))
        .map_batches(pbucket, batch_format="pyarrow")
    )
    corners = hash_bucket_apply(tagged, "bucket", g.close_wedges, num_blocks=nb)
    # close_wedges emits per-corner PARTIAL counts (one row per node per
    # bucket), so the final reduce is a Sum, mirroring q_dup_triangles
    df = corners.groupby("vec_id").aggregate(Sum("n_partial", alias_name="n")).to_pandas()
    return dict(zip(df["vec_id"], df["n"])) if len(df) else {}


def test_k4_every_node_in_three_triangles(ray_session):
    k4 = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]
    assert _count(k4) == {0: 3, 1: 3, 2: 3, 3: 3}


def test_path_and_star_have_no_triangles(ray_session):
    assert _count([(0, 1), (1, 2), (2, 3)]) == {}
    assert _count([(9, 1), (9, 2), (9, 3), (9, 4)]) == {}


def test_random_graph_matches_brute_force(ray_session):
    rng = np.random.default_rng(11)
    n = 40
    edges = sorted(
        {(int(a), int(b)) for a, b in rng.integers(0, n, (220, 2)) if a < b}
    )
    got = _count(edges, nb=7)
    es = set(edges)
    want = {}
    for a, b in edges:
        for c in range(n):
            if c > b and (a, c) in es and (b, c) in es:
                for x in (a, b, c):
                    want[x] = want.get(x, 0) + 1
    assert got == want


def test_duplicate_edges_and_self_loops_tolerated(ray_session):
    """orient_edges collapses duplicate edges (either direction) to one
    directed edge and drops self-loops, so triangle counts match the
    simple-graph answer instead of silently mis-pairing slot runs."""
    k4 = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]
    messy = k4 + [(0, 1), (1, 0), (2, 2), (3, 3), (2, 3)]
    assert _count(messy) == {0: 3, 1: 3, 2: 3, 3: 3}

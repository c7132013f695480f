"""Volume stress for degree-oriented triangle counting.

    python tools/stress_graph.py --edges 5000000 [--cpus 32]

Builds a deterministic random graph (mix32 endpoints, a heavy-tailed hub
block mixed in so the degree orientation actually has hubs to defuse), runs
the full slots -> degree-run attach -> orient -> wedge -> close plan, and
reports wall time, triangle count and the straggler ratio of the wedge
stage — the number the degree orientation exists to bound on hubs
(correctness is pinned by tests/test_graph.py against brute force).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyarrow as pa


def synth_edges(m: int, n_nodes: int, shards: int):
    """Deterministic edge list: 90% uniform random pairs, 10% incident to a
    small hub set (power-ish skew). Self-loops dropped, duplicates fine
    (deduped downstream)."""
    from geo_ray.pipelines.queries import mix32_np

    import ray.data as rd

    per = m // shards

    def build(b: pa.Table) -> pa.Table:
        s = b["shard"].to_numpy()
        idx = np.repeat(s * per, per) + np.tile(np.arange(per, dtype=np.int64), len(s))
        u = mix32_np(idx, seed=5) % n_nodes
        v = mix32_np(idx, seed=6) % n_nodes
        hub = mix32_np(idx, seed=7) % 10 == 0
        v = np.where(hub, mix32_np(idx, seed=8) % 64, v)  # 64 hub nodes
        lo, hi = np.minimum(u, v), np.maximum(u, v)
        keep = lo != hi
        return pa.table({"u": pa.array(lo[keep]), "v": pa.array(hi[keep])})

    ds = rd.from_arrow(pa.table({"shard": pa.array(np.arange(shards, dtype=np.int64))}))
    return ds.repartition(shards).map_batches(build, batch_format="pyarrow")


def count_triangles(edges, nb: int = 64):
    """Full distributed plan over a (u, v) edge Dataset (u < v, may contain
    duplicates — deduped in the first co-partition). Returns the per-node
    triangle membership Dataset."""
    import pyarrow.compute as pc  # noqa: F401
    from ray.data.aggregate import Sum

    from geo_ray.pipelines.queries import mix32_np
    from geo_ray.stages import graph as g
    from geo_ray.stages.agg import coalesce_for_shuffle, hash_bucket_apply
    from geo_ray.stages.dedup import pack_pair_keys

    def dedup_edges(grp):
        import pandas as pd

        k = grp["ek"].to_numpy(np.int64)
        u = np.unique(k)
        return pd.DataFrame(
            {"u": (u >> np.int64(32)).astype(np.int64), "v": (u & np.int64(0xFFFFFFFF)).astype(np.int64)}
        )

    def ekey(b: pa.Table) -> pa.Table:
        ek = pack_pair_keys(b["u"].to_numpy(), b["v"].to_numpy())
        t = pa.table({"ek": pa.array(ek)})
        return t.append_column("bucket", pa.array(mix32_np(ek) % np.int64(nb)))

    edges = hash_bucket_apply(
        edges.map_batches(ekey, batch_format="pyarrow"), "bucket", dedup_edges, num_blocks=nb
    ).materialize()
    slots = edges.map_batches(g.edge_slots, batch_format="pyarrow")

    def nbucket(b: pa.Table) -> pa.Table:
        return b.append_column(
            "bucket", pa.array(mix32_np(b["node"].to_numpy()) % np.int64(nb))
        )

    annotated = hash_bucket_apply(
        slots.map_batches(nbucket, batch_format="pyarrow"), "bucket", g.attach_degrees,
        num_blocks=nb,
    )

    def ebucket(b: pa.Table) -> pa.Table:
        node = b["node"].to_numpy(zero_copy_only=False).astype(np.int64)
        other = b["other"].to_numpy(zero_copy_only=False).astype(np.int64)
        ek = pack_pair_keys(np.minimum(node, other), np.maximum(node, other))
        t = pa.table({"edge_key": pa.array(ek), "node": pa.array(node), "deg": b["deg"]})
        return t.append_column("bucket", pa.array(mix32_np(ek) % np.int64(nb)))

    directed = hash_bucket_apply(
        annotated.map_batches(ebucket, batch_format="pyarrow"), "bucket", g.orient_edges,
        num_blocks=nb,
    ).materialize()

    def sbucket(b: pa.Table) -> pa.Table:
        return b.append_column(
            "bucket",
            pa.array(
                mix32_np(b["src"].to_numpy(zero_copy_only=False).astype(np.int64)) % np.int64(nb)
            ),
        )

    wedges = hash_bucket_apply(
        directed.map_batches(sbucket, batch_format="pyarrow"), "bucket", g.gen_wedges,
        num_blocks=nb,
    )

    def edge_side(b: pa.Table) -> pa.Table:
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

    def cand_side(b: pa.Table) -> pa.Table:
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

    def pbucket(b: pa.Table) -> pa.Table:
        return b.append_column(
            "bucket", pa.array(mix32_np(b["pair_key"].to_numpy()) % np.int64(nb))
        )

    tagged = (
        directed.map_batches(edge_side, batch_format="pyarrow")
        .union(wedges.map_batches(cand_side, batch_format="pyarrow"))
        .map_batches(pbucket, batch_format="pyarrow")
    )
    corners = hash_bucket_apply(
        tagged, "bucket", g.close_wedges, num_blocks=nb, batch_format="pyarrow"
    )
    # close_wedges emits per-corner PARTIAL counts; Sum them (Count over
    # rows would count partials, not corners)
    return coalesce_for_shuffle(corners).groupby("vec_id").aggregate(
        Sum("n_partial", alias_name="n_triangles")
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--edges", type=int, default=5_000_000)
    ap.add_argument("--nodes", type=int, default=1_000_000)
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("RAY_GRAFT_CPUS", 32)))
    ap.add_argument("--shards", type=int, default=64)
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.cpus, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    t0 = time.time()
    edges = synth_edges(args.edges, args.nodes, args.shards)
    out = count_triangles(edges).materialize()
    wall = time.time() - t0
    stats = out.stats()
    total = 0
    nodes_in_triangles = out.count()
    for b in out.iter_batches(batch_format="pyarrow"):
        total += int(np.sum(b["n_triangles"].to_numpy()))
    import re

    m = re.search(
        r"MapBatches\(gen_wedges\).*?Remote wall time: (\S+) min, (\S+) max, (\S+) mean",
        stats,
        re.S,
    )
    straggler = "n/a"
    if m:
        def _sec(x):
            if x.endswith("us"):
                return float(x[:-2]) / 1e6
            if x.endswith("ms"):
                return float(x[:-2]) / 1e3
            return float(x[:-1])
        mx, mean = _sec(m.group(2)), _sec(m.group(3))
        straggler = round(mx / mean, 1) if mean else "n/a"
    print(
        f"edges={args.edges} wall={wall:.1f}s rate={args.edges/wall:,.0f} edges/s "
        f"triangles={total // 3} nodes_in_triangles={nodes_in_triangles} "
        f"wedge_straggler_ratio={straggler}"
    )
    ray.shutdown()


if __name__ == "__main__":
    main()

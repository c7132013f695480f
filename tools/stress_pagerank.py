"""Volume stress for the iterative distributed PageRank.

    python tools/stress_pagerank.py --edges 2000000 --nodes 500000 [--cpus 32]

Builds the same deterministic hub-skewed random graph as the triangle
stress, runs 3 PageRank rounds through stages/graph.pagerank (the
tagged-join composition), and reports wall time, edge throughput per round
and rank-mass conservation. At the 500-node bench graph the wall is
per-stage fixed cost x 9 shuffle stages; this shows the same plan amortizing
at volume (correctness is pinned by tests/test_round4_ops.py against a
sequential numpy iteration and the DuckDB twin).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyarrow as pa


def synth_edges(m: int, n_nodes: int, shards: int = 64):
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
        keep = u != v
        u, v = u[keep], v[keep]
        return pa.table(
            {"src": pa.array(np.concatenate([u, v])), "dst": pa.array(np.concatenate([v, u]))}
        )

    ds = rd.from_arrow(pa.table({"shard": pa.array(np.arange(shards, dtype=np.int64))}))
    return ds.repartition(shards).map_batches(build, batch_format="pyarrow")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--edges", type=int, default=2_000_000)
    ap.add_argument("--nodes", type=int, default=500_000)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("RAY_GRAFT_CPUS", 32)))
    args = ap.parse_args()

    import ray
    import ray.data as rd

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.cpus, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from geo_ray.stages import graph as graph_st

    edges = synth_edges(args.edges, args.nodes).materialize()
    nodes = rd.from_arrow(
        pa.table({"node": pa.array(np.arange(args.nodes, dtype=np.int64))})
    ).repartition(32).materialize()
    t0 = time.time()
    ranks = graph_st.pagerank(edges, nodes, args.nodes, iters=args.iters)
    n = ranks.count()
    wall = time.time() - t0
    mass = 0.0
    for b in ranks.iter_batches(batch_format="pyarrow"):
        mass += float(np.sum(b["r"].to_numpy()))
    directed = 2 * args.edges  # both directions
    print(
        f"edges={args.edges} nodes={args.nodes} iters={args.iters} wall={wall:.1f}s "
        f"rows={n} rank_mass={mass:.4f} (<= 1; dangling absorbed) "
        f"edge_contribs/s={directed * args.iters / wall:,.0f}"
    )
    assert n == args.nodes
    ray.shutdown()


if __name__ == "__main__":
    main()

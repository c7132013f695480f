"""Volume stress for distributed connected components (star contraction).

    python tools/stress_cc.py --groups 30000 --size 50 [--cpus 32]

Synthesizes a graph with KNOWN components: ``groups`` node groups of
``size`` consecutive ids, chain edges guaranteeing connectivity inside each
group plus deterministic extra intra-group edges (≈2x chain volume, so the
total clears SINGLE_TASK_EDGE_LIMIT and exercises the large/small-star
rounds, not the single-reducer fallback). The expected answer is analytic —
every node's component root is its group's min id — so the check is a
vectorized exact compare of all N labels, no union-find needed.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyarrow as pa


def synth_edges(groups: int, size: int, shards: int | None = None):
    import math

    import ray.data as rd

    if shards is None:  # every group must land in exactly one shard
        shards = math.gcd(groups, 64)
    per = groups // shards

    def build(b: pa.Table) -> pa.Table:
        s = b["id"].to_numpy().astype(np.int64)
        g = np.repeat(s * per, per) + np.tile(np.arange(per, dtype=np.int64), len(s))
        base = np.repeat(g * size, size - 1) + np.tile(
            np.arange(size - 1, dtype=np.int64), g.size
        )
        chain_u, chain_v = base, base + 1
        # deterministic extra intra-group edges: node i -> group_base + mix(i)%size
        h = (base.view(np.uint64) * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(33)
        grp_base = (base // size) * size
        xtra_v = grp_base + (h % np.uint64(size)).astype(np.int64)
        sel = xtra_v != base
        return pa.table(
            {
                "u": pa.array(np.concatenate([chain_u, base[sel]])),
                "v": pa.array(np.concatenate([chain_v, xtra_v[sel]])),
            }
        )

    ds = rd.from_arrow(pa.table({"id": pa.array(np.arange(shards, dtype=np.int64))}))
    return ds.repartition(shards).map_batches(build, batch_format="pyarrow")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--groups", type=int, default=30_000)
    ap.add_argument("--size", type=int, default=50)
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("RAY_GRAFT_CPUS", 32)))
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.cpus, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from geo_ray.stages.cluster_copart import cc_minlabel

    edges = synth_edges(args.groups, args.size).materialize()
    n_edges = edges.count()
    n_nodes = args.groups * args.size
    t0 = time.time()
    stars = cc_minlabel(edges).materialize()
    wall = time.time() - t0
    got = np.full(n_nodes, -1, dtype=np.int64)
    for b in stars.iter_batches(batch_format="pyarrow"):
        u = b["u"].to_numpy().astype(np.int64)
        got[u] = b["v"].to_numpy().astype(np.int64)
    own = got == -1  # nodes absent from the star set are their own root
    got[own] = np.flatnonzero(own)
    want = (np.arange(n_nodes, dtype=np.int64) // args.size) * args.size
    bad = int((got != want).sum())
    assert bad == 0, f"{bad} wrong labels"
    print(
        f"nodes={n_nodes:,} edges={n_edges:,} components={args.groups:,} "
        f"wall={wall:.1f}s rate={n_edges / wall:,.0f} edges/s all-labels-exact OK"
    )
    ray.shutdown()


if __name__ == "__main__":
    main()

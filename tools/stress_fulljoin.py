"""Volume stress for the FULL OUTER shuffle join (stages/join.tagged_full_join).

    python tools/stress_fulljoin.py --rows 10000000 [--cpus 32]

Synthesizes two deterministic per-key pre-aggregate tables with partial key
overlap (left keys 0..K-1, right keys K//3..K+K//3-1 — a third of each side
is orphaned), runs the single-co-partition full join, and checks the exact
row accounting the semantics imply:

    rows == |matched keys| + |left-only keys| + |right-only keys|
    sum(l_val) == left total,  sum(r_val) == right total  (fills are 0)

so every input row's value survives exactly once through matches and both
orphan directions.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyarrow as pa


def synth(n_keys: int, lo: int, col: str, shards: int = 64):
    import ray.data as rd

    per = n_keys // shards

    def build(b: pa.Table) -> pa.Table:
        s = b["id"].to_numpy().astype(np.int64)
        k = np.repeat(s * per, per) + np.tile(np.arange(per, dtype=np.int64), len(s)) + lo
        return pa.table({"k": pa.array(k), col: pa.array(k % 1000 + 1)})

    ds = rd.from_arrow(pa.table({"id": pa.array(np.arange(shards, dtype=np.int64))}))
    return ds.repartition(shards).map_batches(build, batch_format="pyarrow")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=10_000_000)
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("RAY_GRAFT_CPUS", 32)))
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.cpus, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from ray.data.aggregate import Sum

    from geo_ray.stages.join import tagged_full_join

    K = args.rows
    off = K // 3
    left = synth(K, 0, "l_val").materialize()
    right = synth(K, off, "r_val").materialize()
    t0 = time.time()
    j = tagged_full_join(
        left, right, left_key="k", right_key="k", right_cols=["r_val"],
        right_fill={"r_val": 0}, left_fill={"l_val": 0},
    )
    out = j.aggregate(Sum("l_val"), Sum("r_val"))
    n = j.count()
    wall = time.time() - t0
    # keys are unique per side: matched = K - off, orphans = off each side
    want_rows = (K - off) + off + off
    want = lambda lo_: int((np.arange(lo_, lo_ + K, dtype=np.int64) % 1000).sum()) + K  # noqa: E731
    assert n == want_rows, (n, want_rows)
    assert out["sum(l_val)"] == want(0), out
    assert out["sum(r_val)"] == want(off), out
    print(
        f"rows={K:,} x2 full-outer wall={wall:.1f}s out_rows={n:,} "
        f"(matched {K - off:,} + {2 * off:,} orphans) rate={2 * K / wall:,.0f} rows/s "
        f"value-conservation OK"
    )
    ray.shutdown()


if __name__ == "__main__":
    main()

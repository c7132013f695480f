"""Volume stress for the multi-level-grid segment-crossing join on
LOCAL-EXTENT geometry — the realistic regime (roads/trajectories), where
segments home at fine grid levels and the grid spreads the work, unlike the
derive corpus whose global-span segments make the pair count inherently
quadratic.

    python tools/stress_segjoin.py --segments 1000000 [--cpus 32]

Generates N deterministic short segments (a few hundred meters) scattered
around the 8 derive cities and runs the full explode -> salted bucket ->
canonical-cell crossing-count plan. Reports wall time, throughput,
crossing-pair volume and the straggler ratio (max task wall / mean) — the
number the salting exists to bound. ``--invariance`` re-runs the count with
a different bucket fan-out and asserts the per-segment results are
identical (the canonical-cell rule makes the output partitioning-proof).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyarrow as pa


def synth_segments(n: int, shards: int):
    """Deterministic short segments around the derive cities: shard task s
    builds rows [s*per, (s+1)*per) from pure doc-index arithmetic."""
    from geo_ray.pipelines.queries import mix32_np
    from geo_ray.sources.derive import CITIES

    import ray.data as rd

    per = n // shards
    city_lat = np.array([c[0] for c in CITIES])
    city_lng = np.array([c[1] for c in CITIES])

    def build(b: pa.Table) -> pa.Table:
        s = b["shard"].to_numpy()
        idx = (
            np.repeat(s * per, per)
            + np.tile(np.arange(per, dtype=np.int64), len(s))
        )
        h1 = mix32_np(idx)
        h2 = mix32_np(idx, seed=1)
        h3 = mix32_np(idx, seed=2)
        city = h1 % 8
        # anchor jittered ~±0.05 deg around the city, segment ~±0.005 deg long
        ax = city_lng[city] + ((h2 % 100000) - 50000) * 1e-6
        ay = city_lat[city] + ((h3 % 100000) - 50000) * 1e-6
        bx = ax + ((mix32_np(idx, seed=3) % 10000) - 5000) * 1e-6
        by = ay + ((mix32_np(idx, seed=4) % 10000) - 5000) * 1e-6
        to_i = lambda v: np.round(v * 1e6).astype(np.int64)  # noqa: E731
        return pa.table(
            {
                "doc_id": pa.array(idx),
                "seg_idx": pa.array(np.ones(idx.size, dtype=np.int64)),
                "ax": pa.array(to_i(ax)),
                "ay": pa.array(to_i(ay)),
                "bx": pa.array(to_i(bx)),
                "by": pa.array(to_i(by)),
            }
        )

    ds = rd.from_arrow(pa.table({"shard": pa.array(np.arange(shards, dtype=np.int64))}))
    return ds.repartition(shards).map_batches(build, batch_format="pyarrow")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--segments", type=int, default=1_000_000)
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("RAY_GRAFT_CPUS", 32)))
    ap.add_argument("--shards", type=int, default=64)
    ap.add_argument("--invariance", action="store_true",
                    help="re-run with a different bucket fan-out and compare")
    ap.add_argument("--points", action="store_true",
                    help="also run the intersection-POINTS stage and check its "
                         "row count equals the pair count")
    args = ap.parse_args()

    import ray
    import ray.data as rd

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.cpus, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from ray.data.aggregate import Sum

    from geo_ray.pipelines.queries import mix32_np
    from geo_ray.stages import segjoin
    from geo_ray.stages.agg import coalesce_for_shuffle, hash_bucket_apply

    t0 = time.time()
    segs = synth_segments(args.segments, args.shards).materialize()
    active = segjoin.active_home_levels(segs)
    print(f"active home levels: {sorted(active)}")
    cells = segs.map_batches(
        segjoin.explode_cover_cells,
        fn_kwargs={"active_levels": active},
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    def counted(nb: int):
        def add_bucket(b: pa.Table) -> pa.Table:
            c = b["cell"].to_numpy()
            return b.append_column("bucket", pa.array(mix32_np(c) % np.int64(nb)))

        bucketed = cells.map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)
        partials = hash_bucket_apply(bucketed, "bucket", segjoin.cell_crossing_counts, num_blocks=nb)
        return (
            coalesce_for_shuffle(partials)
            .groupby(["doc_id", "seg_idx"])
            .aggregate(Sum("n_partial", alias_name="n_cross"))
            .materialize()
        )

    out = counted(64)
    wall = time.time() - t0
    stats = out.stats()
    n_rows = out.count()
    total_crossings = 0
    for b in out.iter_batches(batch_format="pyarrow"):
        total_crossings += int(np.sum(b["n_cross"].to_numpy()))
    # straggler ratio of the crossing stage from the stats dump
    import re

    m = re.search(
        r"MapBatches\(cell_crossing_counts\).*?Remote wall time: (\S+) min, (\S+) max, (\S+) mean",
        stats,
        re.S,
    )
    def _sec(x):
        return float(x[:-2]) / (1000.0 if x.endswith("ms") else 1.0) if x.endswith(("ms",)) else (
            float(x[:-2]) / 1e6 if x.endswith("us") else float(x[:-1]))

    straggler = "n/a"
    if m:
        mx, mean = _sec(m.group(2)), _sec(m.group(3))
        straggler = round(mx / mean, 1) if mean else "n/a"
    print(
        f"segments={args.segments} wall={wall:.1f}s rate={args.segments/wall:,.0f} segs/s "
        f"segments_with_crossings={n_rows} crossing_pairs={total_crossings // 2} "
        f"straggler_ratio={straggler}"
    )
    if args.invariance:
        alt = counted(17).to_pandas().sort_values(["doc_id", "seg_idx"]).reset_index(drop=True)
        ref = out.to_pandas().sort_values(["doc_id", "seg_idx"]).reset_index(drop=True)
        assert ref.equals(alt), "bucket fan-out changed the crossing counts!"
        print("invariance: counts identical at 64-way and 17-way bucketing")
    if args.points:
        def add_bucket64(b: pa.Table) -> pa.Table:
            c = b["cell"].to_numpy()
            return b.append_column("bucket", pa.array(mix32_np(c) % np.int64(64)))

        t1 = time.time()
        pts = hash_bucket_apply(
            cells.map_batches(add_bucket64, batch_format="pyarrow", zero_copy_batch=True),
            "bucket",
            segjoin.cell_crossing_points,
            num_blocks=64,
            batch_format="pyarrow",
        ).materialize()
        pwall = time.time() - t1
        n_pts = pts.count()
        m = re.search(
            r"MapBatches\(cell_crossing_points\).*?Remote wall time: (\S+) min, (\S+) max, (\S+) mean",
            pts.stats(),
            re.S,
        )
        pstrag = "n/a"
        if m:
            mx, mean = _sec(m.group(2)), _sec(m.group(3))
            pstrag = round(mx / mean, 1) if mean else "n/a"
        assert n_pts == total_crossings // 2, (n_pts, total_crossings // 2)
        print(
            f"points: intersection_rows={n_pts} (== pair count) wall={pwall:.1f}s "
            f"rate={n_pts/pwall:,.0f} pts/s straggler_ratio={pstrag}"
        )
    ray.shutdown()


if __name__ == "__main__":
    main()

"""Multi-zoom tile-assembly job — second ``ray job submit`` entrypoint.

    ray job submit --working-dir . -- python jobs/tiles_job.py \
        --sf-dir /root/testdata/sf0.01 --out /tmp/tiles_out --zooms 6 10 14

One resumable partition per zoom level (the reference's tiles are stored
partitioned by zoom; simplify masks make each zoom's geometry independent),
with per-partition lineage + metrics via the shared checkpoint machinery.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_tiles(sf_dir: str):
    import pyarrow as pa

    from geo_ray.stages import tiling

    def build(frags):
        import ray.data as rd

        parts = []
        for f in frags:
            z = f.params["zoom"]
            ds = tiling.tile_pipeline(sf_dir, zoom=z, salt_threshold=f.params.get("salt"))

            def tag(b: pa.Table, part=f.part_id) -> pa.Table:
                return b.append_column("part_id", pa.array([part] * b.num_rows))

            parts.append(ds.map_batches(tag, batch_format="pyarrow"))
        out = parts[0]
        for p in parts[1:]:
            out = out.union(p)
        return out

    return build


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--out", required=True)
    ap.add_argument("--zooms", type=int, nargs="+", default=[6, 10, 14])
    ap.add_argument("--salt-threshold", type=int, default=None)
    ap.add_argument("--max-units", type=int, default=None)
    ap.add_argument("--num-cpus", type=int, default=None)
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        kw = {"num_cpus": args.num_cpus} if args.num_cpus else {}
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"), include_dashboard=False, **kw)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from geo_ray.state.checkpoint import Fragment, run_resumable

    fragments = [
        Fragment(
            part_id=f"z{z}",
            input_files=[f"{args.sf_dir}/documents.parquet"],
            params={"zoom": z, "salt": args.salt_threshold},
        )
        for z in args.zooms
    ]
    summary = run_resumable(
        fragments,
        build_tiles(args.sf_dir),
        args.out,
        unit_size=1,  # one zoom per unit: a crashed run resumes at zoom granularity
        max_units=args.max_units,
    )
    print(json.dumps(summary))
    ray.shutdown()


if __name__ == "__main__":
    main()

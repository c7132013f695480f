"""Flagship PIP-join + tile-assignment job — the ``ray job submit`` entrypoint.

    ray job submit --working-dir . -- python jobs/flagship_job.py \
        --sf-dir /root/testdata/sf0.001 --out /tmp/flagship_out --shards 8

Resumable: re-submitting after a failure skips partitions already recorded in
``<out>/_manifest.jsonl`` (per-partition lineage + metrics; see
geo_ray/state/checkpoint.py). Each shard k processes a deterministic slice of
the (optionally replicated) documents table, so output partitioning is stable
across runs.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_unit(sf_dir: str, replicate_per_shard: int):
    """Returns a builder closure: fragments -> Dataset with part_id column."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from geo_ray.stages import cells, pip_join, spans

    def build(frags):
        shard_ids = [f.params["shard"] for f in frags]
        ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])

        def shard_replicate(batch: pa.Table) -> pa.Table:
            # copy the batch once per fragment shard, tagging part_id; doc_id
            # offset per shard keeps derived geometry distinct (see
            # spans.replicate_docs for the stride convention)
            out = []
            for s in shard_ids:
                b = spans.replicate_docs(batch, factor=replicate_per_shard, stride=10_000_000)
                ids = b["doc_id"].to_numpy().astype(np.int64) + s * 1_000_000_000
                b = b.set_column(0, "doc_id", pa.array(ids))
                out.append(b.append_column("part_id", pa.array([f"shard{s}"] * b.num_rows)))
            return pa.concat_tables(out)

        ds = ds.map_batches(shard_replicate, batch_format="pyarrow", zero_copy_batch=True)
        ds = ds.map_batches(
            spans.explode_points,
            fn_kwargs={"keep_columns": ("doc_id", "part_id")},
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        ds = ds.map_batches(cells.assign_cells, batch_format="pyarrow", zero_copy_batch=True)
        ds = ds.map_batches(cells.assign_tiles, batch_format="pyarrow", zero_copy_batch=True)
        ds = ds.map_batches(pip_join.pip_join_batch, batch_format="pyarrow", zero_copy_batch=True)
        return ds.select_columns(["part_id", "doc_id", "pt_idx", "area_id", "tile_x", "tile_y"])

    return build


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--out", required=True)
    ap.add_argument("--shards", type=int, default=8)
    ap.add_argument("--replicate", type=int, default=1)
    ap.add_argument("--unit-size", type=int, default=4)
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
            part_id=f"shard{s}",
            input_files=[f"{args.sf_dir}/documents.parquet"],
            params={"shard": s},
        )
        for s in range(args.shards)
    ]
    summary = run_resumable(
        fragments,
        build_unit(args.sf_dir, args.replicate),
        args.out,
        unit_size=args.unit_size,
        max_units=args.max_units,
    )
    print(json.dumps(summary))
    ray.shutdown()


if __name__ == "__main__":
    main()

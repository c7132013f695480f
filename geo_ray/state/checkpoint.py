"""Checkpoint-resumable partitioned pipeline runs.

Design (SURVEY.md §4 "Checkpoint / resume"): the input corpus is split into
FRAGMENTS (at scale: one Lance/Parquet file or row-group each; in the sandbox
a deterministic shard of the replicated documents table). Fragments are
processed in UNITS of ``unit_size`` — one Ray Data streaming execution per
unit, so intra-unit parallelism uses the whole cluster while lost work on
failure is bounded by one unit. Each fragment's output lands in its own
partition directory ``out_dir/part_id=<id>/`` (deterministic name → safe to
re-run), and a manifest row with lineage + metrics is recorded only AFTER the
write returns; on resume, partitions with manifest rows are skipped and
orphan partition directories (partial writes) are deleted and redone.
"""

from __future__ import annotations

import os
import shutil
import time
from dataclasses import dataclass, field
from typing import Callable

from geo_ray.state.manifest import Manifest

# Stamped into every manifest row; completed() filters on it, so bumping
# this (REQUIRED whenever an output-affecting kernel changes, e.g. the r2
# blake2b text-hash switch) makes resumed runs rebuild stale partitions
# instead of silently mixing two algorithm versions in one artifact.
KERNEL_VERSION = "geo_ray-r2-blake2b16"


@dataclass
class Fragment:
    """One resumable input partition."""

    part_id: str
    input_files: list[str]
    # free-form args passed to the pipeline builder (e.g. replicate shard no.)
    params: dict = field(default_factory=dict)


def run_resumable(
    fragments: list[Fragment],
    build: "Callable[[list[Fragment]], object]",
    out_dir: str,
    *,
    unit_size: int = 8,
    max_units: int | None = None,
) -> dict:
    """Process ``fragments`` through ``build`` with checkpoint-resume.

    ``build(frags)`` must return a ``ray.data.Dataset`` whose rows carry a
    ``part_id`` string column mapping every row to its fragment. The dataset
    is written hive-partitioned by ``part_id`` under ``out_dir``; per-fragment
    row counts are taken from the written files' metadata (no extra pass).

    Returns a summary dict with per-unit metrics. ``max_units`` limits how
    many units run this call (used by tests to simulate a crash mid-run).
    """
    manifest = Manifest(os.path.join(out_dir, "_manifest.jsonl"))
    done = manifest.completed(KERNEL_VERSION)
    stale = manifest.completed() - done  # recorded by a different kernel version

    # clean partial partitions that never reached the manifest
    if os.path.isdir(out_dir):
        for name in os.listdir(out_dir):
            if name.startswith("part_id="):
                pid = name.split("=", 1)[1]
                if pid in stale:
                    shutil.rmtree(os.path.join(out_dir, name))
                    continue
                if pid not in done:
                    shutil.rmtree(os.path.join(out_dir, name))

    todo = [f for f in fragments if f.part_id not in done]
    units = [todo[i : i + unit_size] for i in range(0, len(todo), unit_size)]
    if max_units is not None:
        units = units[:max_units]

    summary = {"skipped": len(fragments) - len(todo), "units": 0, "rows_out": 0}
    for unit in units:
        t0 = time.perf_counter()
        ds = build(unit)
        ds.write_parquet(out_dir, partition_cols=["part_id"])
        wall = time.perf_counter() - t0
        counts = _partition_row_counts(out_dir, [f.part_id for f in unit])
        for frag in unit:
            manifest.record(
                frag.part_id,
                stage="resumable_write",
                input_fragments=frag.input_files,
                params=frag.params,
                rows_out=counts.get(frag.part_id, 0),
                unit_wall_s=round(wall, 3),
                kernel_version=KERNEL_VERSION,
                output=os.path.join(out_dir, f"part_id={frag.part_id}"),
            )
            summary["rows_out"] += counts.get(frag.part_id, 0)
        summary["units"] += 1
    summary["completed_total"] = len(manifest.completed())
    return summary


def _partition_row_counts(out_dir: str, part_ids: list[str]) -> dict[str, int]:
    """Row counts per written partition from parquet footers (metadata-only)."""
    import pyarrow.parquet as pq

    out = {}
    for pid in part_ids:
        pdir = os.path.join(out_dir, f"part_id={pid}")
        n = 0
        if os.path.isdir(pdir):
            for fn in os.listdir(pdir):
                if fn.endswith(".parquet"):
                    n += pq.ParquetFile(os.path.join(pdir, fn)).metadata.num_rows
        out[pid] = n
    return out

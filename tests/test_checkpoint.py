"""Checkpoint-resume: manifest lineage, partial-partition cleanup, idempotence."""

import os
import shutil

import pyarrow.parquet as pq
import pytest

from geo_ray.state.checkpoint import Fragment, run_resumable
from geo_ray.state.manifest import Manifest

SF = "/root/testdata/sf0.001"


def _fragments(n):
    return [
        Fragment(part_id=f"shard{s}", input_files=[f"{SF}/documents.parquet"], params={"shard": s})
        for s in range(n)
    ]


def _build(frags):
    import sys

    sys.path.insert(0, "/root/repo/jobs")
    from flagship_job import build_unit

    return build_unit(SF, 1)(frags)


@pytest.fixture
def out_dir(tmp_path):
    return str(tmp_path / "out")


def test_crash_then_resume_completes_all(ray_session, out_dir):
    s1 = run_resumable(_fragments(4), _build, out_dir, unit_size=2, max_units=1)
    assert s1["units"] == 1 and s1["completed_total"] == 2
    s2 = run_resumable(_fragments(4), _build, out_dir, unit_size=2)
    assert s2["skipped"] == 2 and s2["completed_total"] == 4
    # every fragment exactly once in the manifest
    entries = Manifest(os.path.join(out_dir, "_manifest.jsonl")).entries()
    assert sorted(e["part_id"] for e in entries) == [f"shard{s}" for s in range(4)]
    # lineage + metrics fields present
    for e in entries:
        assert e["input_fragments"] == [f"{SF}/documents.parquet"]
        assert e["rows_out"] > 0 and e["kernel_version"]


def test_partial_partition_cleaned_and_rerun(ray_session, out_dir):
    run_resumable(_fragments(2), _build, out_dir, unit_size=2)
    rows_before = pq.read_table(os.path.join(out_dir, "part_id=shard1")).num_rows
    # simulate a crash that wrote partition files but never reached the
    # manifest: drop shard1's manifest row, corrupt its directory
    mpath = os.path.join(out_dir, "_manifest.jsonl")
    lines = [l for l in open(mpath) if '"shard1"' not in l]
    open(mpath, "w").writelines(lines)
    shutil.rmtree(os.path.join(out_dir, "part_id=shard1"))
    os.makedirs(os.path.join(out_dir, "part_id=shard1"))
    s = run_resumable(_fragments(2), _build, out_dir, unit_size=2)
    assert s["skipped"] == 1 and s["units"] == 1
    rows_after = pq.read_table(os.path.join(out_dir, "part_id=shard1")).num_rows
    assert rows_after == rows_before


def test_resume_noop_when_done(ray_session, out_dir):
    run_resumable(_fragments(2), _build, out_dir, unit_size=2)
    s = run_resumable(_fragments(2), _build, out_dir, unit_size=2)
    assert s["skipped"] == 2 and s["units"] == 0


def test_tiles_job_resume(ray_session, tmp_path):
    """Multi-zoom tiles job: one resumable partition per zoom."""
    import subprocess
    import sys

    sys.path.insert(0, "/root/repo/jobs")
    import json as _json

    from geo_ray.state.checkpoint import Fragment, run_resumable
    from tiles_job import build_tiles

    out = str(tmp_path / "tiles")
    frags = [
        Fragment(part_id=f"z{z}", input_files=[f"{SF}/documents.parquet"], params={"zoom": z, "salt": None})
        for z in (6, 10)
    ]
    s1 = run_resumable(frags, build_tiles(SF), out, unit_size=1, max_units=1)
    assert s1["completed_total"] == 1
    s2 = run_resumable(frags, build_tiles(SF), out, unit_size=1)
    assert s2["skipped"] == 1 and s2["completed_total"] == 2
    import pyarrow.parquet as pq

    for z in (6, 10):
        assert pq.read_table(os.path.join(out, f"part_id=z{z}")).num_rows > 0


def test_dedup_job_unit_and_resume(ray_session, tmp_path):
    """The dedup-signature job builder writes partitioned output + manifest
    and a re-run skips all finished partitions."""
    import sys

    sys.path.insert(0, "/root/repo")
    from geo_ray.state.checkpoint import Fragment, run_resumable
    from jobs.dedup_job import build_unit

    out = str(tmp_path / "dedup_out")
    frags = [
        Fragment(
            part_id=f"shard{s}",
            input_files=["/root/testdata/sf0.001/documents.parquet"],
            params={"shard": s, "n_shards": 4},
        )
        for s in range(4)
    ]
    s1 = run_resumable(frags, build_unit("/root/testdata/sf0.001"), out, unit_size=2)
    assert s1["completed_total"] == 4 and s1["rows_out"] == 500
    s2 = run_resumable(frags, build_unit("/root/testdata/sf0.001"), out, unit_size=2)
    assert s2["skipped"] == 4 and s2["rows_out"] == 0


def test_stale_kernel_version_partitions_rebuild(ray_session, tmp_path):
    """Partitions recorded under a different kernel version are NOT skipped
    on resume — they are cleaned and rebuilt (no silent mixing of two
    algorithm versions in one artifact)."""
    import json
    import sys

    sys.path.insert(0, "/root/repo")
    from geo_ray.state.checkpoint import Fragment, run_resumable
    from jobs.dedup_job import build_unit

    out = str(tmp_path / "o")
    frags = [
        Fragment(
            part_id=f"shard{s}",
            input_files=["/root/testdata/sf0.001/documents.parquet"],
            params={"shard": s, "n_shards": 2},
        )
        for s in range(2)
    ]
    s1 = run_resumable(frags, build_unit("/root/testdata/sf0.001"), out, unit_size=2)
    assert s1["completed_total"] == 2

    # tamper: pretend one partition was written by an older kernel
    mpath = f"{out}/_manifest.jsonl"
    lines = [json.loads(line) for line in open(mpath)]
    lines[0]["kernel_version"] = "geo_ray-r1"
    with open(mpath, "w") as f:
        for e in lines:
            f.write(json.dumps(e) + "\n")

    s2 = run_resumable(frags, build_unit("/root/testdata/sf0.001"), out, unit_size=2)
    assert s2["skipped"] == 1  # only the current-version partition skips
    assert s2["rows_out"] > 0  # the stale one was rebuilt


def test_ann_index_job_build_query_and_resume(ray_session, tmp_path):
    """Persisted IVF index: crash-resume completes the build, and the
    centroid-pruned query path over the artifact returns exactly the
    corpus-scan IVF pipeline's answer."""
    import pandas as pd

    from geo_ray.pipelines import queries as Q
    from geo_ray.state.checkpoint import Fragment, run_resumable
    from jobs.ann_index_job import build_unit, query_index

    out = str(tmp_path / "ivf_index")
    frags = [
        Fragment(
            part_id=f"shard{s}",
            input_files=[f"{SF}/embeddings.parquet"],
            params={"shard": s, "n_shards": 4},
        )
        for s in range(4)
    ]
    s1 = run_resumable(frags, build_unit(SF), out, unit_size=2, max_units=1)
    assert s1["units"] == 1  # simulated crash after the first unit
    s2 = run_resumable(frags, build_unit(SF), out, unit_size=2)
    assert s2["skipped"] == 2 and s2["completed_total"] == 4

    got = (
        query_index(out)
        .to_pandas()
        .sort_values(["query_id", "vec_id"])
        .reset_index(drop=True)
    )
    want = (
        Q.q_ivf_topk(SF)
        .to_pandas()
        .sort_values(["query_id", "vec_id"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[want.columns.tolist()], want)

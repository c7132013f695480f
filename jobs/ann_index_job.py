"""Persisted IVF index build — the ``ray job submit`` entrypoint that turns
the embedding table into an on-disk ANN index artifact, plus the query path
that serves top-k from it.

    ray job submit --working-dir . -- python jobs/ann_index_job.py \
        --sf-dir /root/testdata/sf0.001 --out /tmp/ivf_index --shards 8

Build: each resumable fragment owns a deterministic vec_id slice, assigns its
vectors to the nearest coarse centroid (stages/ann.ivf_assign — the same
deterministic quantizer the oracled IVF queries use), sorts by centroid so
parquet row groups cluster by list, and writes one hive partition per shard
with lineage + row counts in ``<out>/_manifest.jsonl``. Re-submitting after a
crash skips finished partitions (geo_ray/state/checkpoint.py) — the property
that makes a 10^12-vector index build restartable.

Query: ``query_index(out_dir)`` reads ONLY rows whose centroid is in the
probe plan (predicate pushed into the parquet scan, so clustered row groups
skip), scores batches against the broadcast query matrix, and finishes with
a tiny per-query top-k — identical results to the corpus-scan IVF pipeline
(pytest-pinned against ``q_ivf_topk``).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_unit(sf_dir: str):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    def build(frags):
        shard_ids = [f.params["shard"] for f in frags]
        n_shards = frags[0].params["n_shards"]
        ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])

        def assign(batch: pa.Table) -> pa.Table:
            from geo_ray.stages import ann

            vec_id = batch["vec_id"].to_numpy().astype(np.int64)
            own = np.isin(vec_id % n_shards, shard_ids)
            if not own.any():
                return pa.table(
                    {
                        "part_id": pa.array([], pa.string()),
                        "vec_id": pa.array([], pa.int64()),
                        "centroid_id": pa.array([], pa.int64()),
                        "embedding": pa.array([], batch["embedding"].type),
                    }
                )
            b = batch.filter(pa.array(own))
            b = ann.ivf_assign(b)
            order = pa.compute.sort_indices(b["centroid_id"])
            b = b.take(order)
            vec_id = b["vec_id"].to_numpy().astype(np.int64)
            part = np.char.add("shard", (vec_id % n_shards).astype("U20"))
            return pa.table(
                {
                    "part_id": pa.array(part.tolist()),
                    "vec_id": b["vec_id"],
                    "centroid_id": b["centroid_id"],
                    "embedding": b["embedding"],
                }
            )

        return ds.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)

    return build


def query_index(out_dir: str, n_queries: int = 8, k: int = 10, nprobe: int = 4):
    """Serve IVF top-k from the persisted index: centroid-pruned scan +
    per-batch partial top-k + tiny grouped finish. Returns a Dataset with
    (query_id, vec_id, cos_sim) — same schema/values as ``q_ivf_topk``."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from geo_ray.stages import ann

    probe = ann.probe_centroids(n_queries, 16, nprobe)
    probed_ids = sorted({int(c) for row in probe for c in row})
    import pyarrow.dataset as pads

    ds = rd.read_parquet(
        out_dir,
        columns=["vec_id", "centroid_id", "embedding"],
        filter=pads.field("centroid_id").isin(probed_ids),
    )
    q = ann.query_matrix(n_queries)
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)

    def score(batch: pa.Table) -> pa.Table:
        v = ann._embeddings_to_matrix(batch["embedding"])
        norms = np.sqrt((v * v).sum(axis=1))
        norms[norms == 0] = 1.0
        vn = v / norms[:, None]
        cent = batch["centroid_id"].to_numpy()
        vec_ids = batch["vec_id"].to_numpy()
        out_q, out_v, out_s = [], [], []
        for qid in range(n_queries):
            m = np.isin(cent, probe[qid])
            if not m.any():
                continue
            idx = np.flatnonzero(m)
            cos = vn[idx] @ qn[qid]
            kk = min(k, idx.size)
            top = np.argpartition(-cos, kk - 1)[:kk] if kk < idx.size else np.arange(idx.size)
            out_q.append(np.full(top.size, qid, dtype=np.int64))
            out_v.append(vec_ids[idx[top]].astype(np.int64))
            out_s.append(cos[top])
        if not out_q:
            return pa.table(
                {
                    "query_id": pa.array([], pa.int64()),
                    "vec_id": pa.array([], pa.int64()),
                    "cos_sim": pa.array([], pa.float64()),
                }
            )
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q)),
                "vec_id": pa.array(np.concatenate(out_v)),
                "cos_sim": pa.array(np.concatenate(out_s)),
            }
        )

    scored = ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)
    return scored.groupby("query_id").map_groups(
        lambda g: ann.finish_ann_topk(g, k), batch_format="pyarrow"
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--out", required=True)
    ap.add_argument("--shards", type=int, default=8)
    ap.add_argument("--unit-size", type=int, default=4)
    ap.add_argument("--max-units", type=int, default=None)
    ap.add_argument("--num-cpus", type=int, default=None)
    ap.add_argument("--query", action="store_true", help="also run the query path")
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
            input_files=[f"{args.sf_dir}/embeddings.parquet"],
            params={"shard": s, "n_shards": args.shards},
        )
        for s in range(args.shards)
    ]
    summary = run_resumable(
        fragments,
        build_unit(args.sf_dir),
        args.out,
        unit_size=args.unit_size,
        max_units=args.max_units,
    )
    if args.query:
        summary["query_rows"] = query_index(args.out).count()
    print(json.dumps(summary))
    ray.shutdown()


if __name__ == "__main__":
    main()

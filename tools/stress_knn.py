"""Volume stress for the sharded exact cosine kNN-graph self-join.

    python tools/stress_knn.py --vectors 100000 [--chunks 8] [--cpus 32]

Synthesizes N deterministic 64-dim embeddings, writes them as a partitioned
parquet corpus under /tmp (the shard matrices load from storage once per
stage instance, never broadcast), runs the blocked no-broadcast top-3 plan
(stages/ann.KnnGraphChunk -> probe-keyed merge), and reports wall time, GEMM
throughput and the row invariant (N probes x 3 neighbors). ``--invariance``
re-runs a 20k-vector prefix at two shard counts and asserts equality — the
partial-top-k-under-total-order associativity proof at volume.
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyarrow as pa

DIM = 64


def synth_corpus(n: int, out_dir: str, shards: int = 32):
    """Deterministic embeddings: vec[i, j] from a mix of (i, j), unit-ish."""
    import ray.data as rd

    from geo_ray.pipelines.queries import mix32_np

    per = n // shards

    def build(b: pa.Table) -> pa.Table:
        s = b["id"].to_numpy().astype(np.int64)
        idx = np.repeat(s * per, per) + np.tile(np.arange(per, dtype=np.int64), len(s))
        base = idx[:, None] * np.int64(DIM) + np.arange(DIM, dtype=np.int64)[None, :]
        v = ((mix32_np(base.ravel()) % 2001) - 1000).astype(np.float32) / 1000.0
        v = v.reshape(idx.size, DIM)
        emb = pa.FixedSizeListArray.from_arrays(pa.array(v.ravel()), DIM).cast(
            pa.list_(pa.float32())
        )
        return pa.table({"vec_id": pa.array(idx), "embedding": emb})

    ds = rd.from_arrow(pa.table({"id": pa.array(np.arange(shards, dtype=np.int64))}))
    ds = ds.repartition(shards).map_batches(build, batch_format="pyarrow")
    if os.path.exists(out_dir):
        shutil.rmtree(out_dir)
    ds.write_parquet(out_dir)


def shard_layout(path: str, n_chunks: int) -> str:
    """Hash-sharded hive layout (shard=<c>/ dirs) for the worker-side shard
    loads — mirrors queries._knn_shard_layout for the synthetic corpus."""
    import ray.data as rd

    out = f"{path}_shards{n_chunks}"
    if os.path.isdir(out):
        shutil.rmtree(out)

    def add_shard(b: pa.Table) -> pa.Table:
        v = b["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return b.append_column("shard", pa.array(v % np.int64(n_chunks)))

    rd.read_parquet(path, columns=["vec_id", "embedding"]).map_batches(
        add_shard, batch_format="pyarrow"
    ).write_parquet(out, partition_cols=["shard"])
    return out


def knn_graph_over(path: str, k: int, n_chunks: int, probe_blocks: int = 64):
    import functools

    import ray
    import ray.data as rd

    from geo_ray.pipelines.queries import mix32_np
    from geo_ray.stages import ann as ann_st
    from geo_ray.stages.agg import default_num_blocks, hash_bucket_apply

    shards = shard_layout(path, n_chunks)
    load = ray.remote(ann_st.load_knn_shard)
    refs = [load.remote(c, n_chunks, shards, True) for c in range(n_chunks)]
    ds = rd.read_parquet(path, columns=["vec_id", "embedding"]).repartition(probe_blocks)
    parts = None
    for c in range(n_chunks):
        p = ds.map_batches(
            functools.partial(ann_st.knn_probe_fn, shard_ref=refs[c], k=k),
            batch_format="pyarrow",
        )
        parts = p if parts is None else parts.union(p)
    nb = default_num_blocks()

    def add_bucket(b: pa.Table) -> pa.Table:
        v = b["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return b.append_column("bucket", pa.array(mix32_np(v) % np.int64(nb)))

    return hash_bucket_apply(
        parts.map_batches(add_bucket, batch_format="pyarrow"),
        "bucket",
        lambda g: ann_st.merge_knn_bucket(g, k),
        num_blocks=nb,
        batch_format="pyarrow",
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--vectors", type=int, default=100_000)
    ap.add_argument("--chunks", type=int, default=8)
    ap.add_argument("--k", type=int, default=3)
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("RAY_GRAFT_CPUS", 32)))
    ap.add_argument("--invariance", action="store_true")
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.cpus, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    corpus = "/tmp/knn_stress_corpus"
    synth_corpus(args.vectors, corpus)
    t0 = time.time()
    out = knn_graph_over(corpus, args.k, args.chunks).materialize()
    wall = time.time() - t0
    n = out.count()
    flops = 2.0 * args.vectors * args.vectors * DIM
    assert n == args.vectors * args.k, (n, args.vectors * args.k)
    print(
        f"vectors={args.vectors} chunks={args.chunks} wall={wall:.1f}s "
        f"rows={n} (== N*k) gemm={flops/wall/1e9:.1f} GFLOP/s "
        f"pairs/s={args.vectors*args.vectors/wall:,.0f}"
    )
    if args.invariance:
        small = "/tmp/knn_stress_small"
        synth_corpus(20_000, small)
        a = knn_graph_over(small, args.k, 4).to_pandas().sort_values(
            ["vec_id", "rank"]).reset_index(drop=True)
        b = knn_graph_over(small, args.k, 8).to_pandas().sort_values(
            ["vec_id", "rank"]).reset_index(drop=True)
        assert a.equals(b), "shard count changed the kNN graph!"
        print("invariance: 20k-vector graph identical at 4 and 8 shards")
    ray.shutdown()


if __name__ == "__main__":
    main()

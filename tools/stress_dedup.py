"""Volume stress for the round-3 dedup family — evidence that the
distributed shapes hold far beyond bench scale.

    python tools/stress_dedup.py --replicate 1024 [--mode apply|ngram]

- ``apply``: EXACT corpus replication (every text appears in all shards, so
  at R shards the loser set is ~R-1/R of the corpus — the worst case the
  old collect+broadcast plan would ship to the driver). Runs the same
  hash -> losers -> tagged_anti_join plan as ``dedup_filtered_docs`` and
  checks the invariant: survivors == number of DISTINCT texts in the base
  corpus (smallest doc_id wins globally, so exactly one copy survives per
  text across all shards).
- ``ngram``: shard-perturbed texts (a shard token prepended) through the
  banded n-gram Jaccard plan — band keys never group whole languages, so
  wall-time should scale with corpus volume, not group size.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyarrow as pa


def replicated_docs(sf_dir: str, replicate: int, perturb: bool):
    import pyarrow.parquet as pq
    import ray
    import ray.data as rd

    base = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    base_ref = ray.put(base)
    n_base = base.num_rows  # shard s owns doc_ids [s*n_base, (s+1)*n_base)

    def expand(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = ray.get(base_ref)
        out = []
        for s in b["id"].to_pylist():
            doc_id = pc.add(t["doc_id"], pa.scalar(s * n_base, pa.int64()))
            text = (
                pc.binary_join_element_wise(pa.array([f"s{s}"] * n_base), t["text"], " ")
                if perturb
                else t["text"]
            )
            out.append(pa.table({"doc_id": doc_id, "text": text}))
        return pa.concat_tables(out)

    return rd.range(replicate, override_num_blocks=min(replicate, 256)).map_batches(
        expand, batch_format="pyarrow", batch_size=4
    ), n_base


def run_apply(sf_dir: str, replicate: int) -> dict:
    import duckdb

    from geo_ray.kernels import strhash
    from geo_ray.stages.agg import hash_bucket_apply
    from geo_ray.stages.join import tagged_anti_join

    ds, n_base = replicated_docs(sf_dir, replicate, perturb=False)

    def hash_stage(b: pa.Table) -> pa.Table:
        h1, h2, lens = strhash.text_hashes_arrow(b["text"])
        return pa.table(
            {
                "h1": pa.array(h1),
                "h2": pa.array(h2),
                "len": pa.array(lens),
                "doc_id": b["doc_id"],
                "bucket": pa.array(h1 % np.int64(64)),
            }
        )

    def losers_bucket(g):
        import pandas as pd

        h1 = g["h1"].to_numpy()
        h2 = g["h2"].to_numpy()
        ln = g["len"].to_numpy()
        doc = g["doc_id"].to_numpy()
        order = np.lexsort((doc, ln, h2, h1))
        h1, h2, ln, doc = h1[order], h2[order], ln[order], doc[order]
        first = np.ones(doc.size, dtype=bool)
        first[1:] = (h1[1:] != h1[:-1]) | (h2[1:] != h2[:-1]) | (ln[1:] != ln[:-1])
        return pd.DataFrame({"doc_id": doc[~first]})

    t0 = time.time()
    hashed = ds.map_batches(hash_stage, batch_format="pyarrow", zero_copy_batch=True)
    losers = hash_bucket_apply(hashed, "bucket", losers_bucket)
    docs = ds.map_batches(
        lambda b: b.select(["doc_id"]), batch_format="pyarrow", zero_copy_batch=True
    )
    survivors = tagged_anti_join(docs, losers, probe_key="doc_id").count()
    wall = time.time() - t0
    want = duckdb.sql(
        f"SELECT COUNT(DISTINCT text) FROM read_parquet('{sf_dir}/documents.parquet')"
    ).fetchone()[0]
    return {
        "mode": "apply",
        "docs": n_base * replicate,
        "survivors": survivors,
        "expected": want,
        "invariant_ok": survivors == want,
        "wall_sec": round(wall, 1),
        "docs_per_sec": round(n_base * replicate / wall),
    }


def run_ngram(sf_dir: str, replicate: int) -> dict:
    """Each shard is its OWN (lang, source) group — shard count multiplies
    the group count while every group keeps the base corpus's dup
    structure, so the banded plan must scale linearly in shards (a whole
    corpus of near-identical shards would be a quadratically-paired
    workload, which no plan can make linear)."""
    from geo_ray.pipelines import queries as Q

    ds, n_base = replicated_docs(sf_dir, replicate, perturb=False)

    def add_groups(b: pa.Table) -> pa.Table:
        n = b.num_rows
        shard = b["doc_id"].to_numpy().astype(np.int64) // n_base
        return b.append_column("lang", pa.array(["en"] * n)).append_column(
            "source", pa.array(np.char.add("src", shard.astype("U20")).tolist())
        )

    t0 = time.time()
    rows = Q.ngram_banded_pairs(ds.map_batches(add_groups, batch_format="pyarrow")).count()
    wall = time.time() - t0
    return {
        "mode": "ngram",
        "docs": n_base * replicate,
        "pair_rows": rows,
        "wall_sec": round(wall, 1),
        "docs_per_sec": round(n_base * replicate / wall),
    }


def main():
    import json

    import ray

    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--replicate", type=int, default=1024)
    ap.add_argument("--mode", choices=["apply", "ngram"], default="apply")
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    args = ap.parse_args()
    if not ray.is_initialized():
        ray.init(
            address="local", num_cpus=args.cpus, include_dashboard=False, logging_level="ERROR"
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    fn = run_apply if args.mode == "apply" else run_ngram
    print(json.dumps(fn(args.sf_dir, args.replicate)))
    ray.shutdown()


if __name__ == "__main__":
    main()

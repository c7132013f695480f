"""Round-4 ops, each pinned against an independent brute-force derivation at
sf0.001 (the DuckDB oracles cover sf0.01; these pin semantics against a
second, non-SQL computation)."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def test_segment_revenue_matches_pandas_merge_chain(ray_session):
    """Two chained tagged_inner_joins + exact-cents rollup must equal the
    single-process pandas merge chain bit-for-bit (exact integer cents, so
    no float-order tolerance is needed)."""
    from geo_ray.kernels import fixed as fixed_k
    from geo_ray.pipelines import queries as Q

    got = (
        Q.q_segment_revenue(SF)
        .to_pandas()
        .sort_values("c_mktsegment")
        .reset_index(drop=True)
    )

    li = pq.read_table(
        f"{SF}/lineitem.parquet", columns=["l_orderkey", "l_extendedprice", "l_discount"]
    ).to_pandas()
    orders = pq.read_table(f"{SF}/orders.parquet", columns=["o_orderkey", "o_custkey"]).to_pandas()
    cust = pq.read_table(
        f"{SF}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    ).to_pandas()
    li["rev"] = np.rint(li["l_extendedprice"].to_numpy() * 100).astype(np.int64) * np.rint(
        (1.0 - li["l_discount"].to_numpy()) * 100
    ).astype(np.int64)
    j = li.merge(orders, left_on="l_orderkey", right_on="o_orderkey").merge(
        cust, left_on="o_custkey", right_on="c_custkey"
    )
    rows = []
    for seg, g in j.groupby("c_mktsegment"):
        rev = g["rev"].to_numpy()
        total = float(int((rev // 1_000_000).sum())) * 1e6 + float(int((rev % 1_000_000).sum()))
        rows.append(
            {
                "c_mktsegment": seg,
                "n_items": np.int64(len(g)),
                "revenue": fixed_k.round_half_away(np.array([total / 10000.0]), 2)[0],
            }
        )
    want = pd.DataFrame(rows).sort_values("c_mktsegment").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)


def test_knn_graph_matches_brute_force(ray_session):
    """Sharded partial-top-k merge must equal the single-matrix global top-3
    under the shared (cos6 DESC, neighbor ASC) order, for every shard count."""
    from geo_ray.kernels import fixed as fixed_k
    from geo_ray.pipelines import queries as Q

    t = pq.read_table(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    vid = t["vec_id"].to_numpy().astype(np.int64)
    order = np.argsort(vid, kind="mergesort")
    vid = vid[order]
    v = np.stack([np.asarray(e, dtype=np.float64) for e in t["embedding"].to_pylist()])[order]
    vn = v / np.linalg.norm(v, axis=1, keepdims=True)
    cos6 = fixed_k.round_half_away(vn @ vn.T, 6)
    np.fill_diagonal(cos6, -np.inf)
    top = np.argsort(-cos6, axis=1, kind="stable")[:, :3]
    want = pd.DataFrame(
        {
            "vec_id": np.repeat(vid, 3),
            "neighbor_id": vid[top.ravel()],
            "cos_sim": cos6[np.repeat(np.arange(vid.size), 3), top.ravel()],
            "rank": np.tile(np.arange(1, 4, dtype=np.int64), vid.size),
        }
    )
    for n_chunks in (1, 4):
        got = (
            Q.q_knn_graph(SF, k=3, n_chunks=n_chunks)
            .to_pandas()
            .sort_values(["vec_id", "rank"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, want)


def test_pack_bucket_greedy_semantics():
    """Direct unit pin of the packing recurrence including the oversized-doc
    path (no oversized docs exist in the sf corpora: max 99 < 256)."""
    from geo_ray.stages.text import pack_bucket

    df = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4, 5, 6, 10, 11],
            "lang": ["en"] * 6 + ["de"] * 2,
            "source": ["a"] * 6 + ["a"] * 2,
            "chunk_id": [0] * 6 + [0] * 2,
            "n_tokens": [100, 100, 100, 300, 10, 250, 5, 5],
        }
    )
    out = pack_bucket(df, budget=256).sort_values(
        ["lang", "source", "window_id"]
    ).reset_index(drop=True)
    # en: [100,100]=w0, [100]=w1 (300 breaks), [300]=w2 oversized alone,
    #     [10]+[250] -> 10 then 250 breaks -> w3=[10], w4=[250]
    want = pd.DataFrame(
        {
            "lang": ["de", "en", "en", "en", "en", "en"],
            "source": ["a"] * 6,
            "chunk_id": np.zeros(6, dtype=np.int64),
            "window_id": np.array([0, 0, 1, 2, 3, 4], dtype=np.int64),
            "n_docs": np.array([2, 2, 1, 1, 1, 1], dtype=np.int64),
            "n_tokens": np.array([10, 200, 100, 300, 10, 250], dtype=np.int64),
        }
    )
    pd.testing.assert_frame_equal(out, want)


def test_sequence_packing_partition_invariant(ray_session):
    """The distributed result equals a single-process pack of the whole
    corpus — the micro-partition key makes packing independent of Ray's
    physical partitioning."""
    import pyarrow as pa

    from geo_ray.pipelines import queries as Q
    from geo_ray.stages.text import pack_bucket, pack_prepare

    docs = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text", "lang", "source"])
    want = (
        pack_bucket(pack_prepare(docs).to_pandas())
        .sort_values(["lang", "source", "chunk_id", "window_id"])
        .reset_index(drop=True)
    )
    got = (
        Q.q_sequence_packing(SF)
        .to_pandas()
        .sort_values(["lang", "source", "chunk_id", "window_id"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)


def test_winsorized_stats_match_numpy_brute(ray_session):
    """Exact rank semantics against a direct sorted-array computation."""
    from geo_ray.kernels import fixed as fixed_k
    from geo_ray.pipelines import queries as Q

    ev = pq.read_table(f"{SF}/events.parquet", columns=["event_type", "value"]).to_pandas()
    ev["c"] = np.rint(ev["value"].to_numpy() * 100).astype(np.int64)
    rows = []
    for et, g in ev.groupby("event_type"):
        c = np.sort(g["c"].to_numpy())
        n = c.size
        k = n // 20
        lo_t, hi_t = c[k], c[n - k - 1]
        rows.append(
            {
                "event_type": et,
                "n_events": np.int64(n),
                "wins_mean": fixed_k.round_half_away(
                    np.array([int(np.clip(c, lo_t, hi_t).sum()) / (100.0 * n)]), 4
                )[0],
                "trim_mean": fixed_k.round_half_away(
                    np.array([int(c[k : n - k].sum()) / (100.0 * (n - 2 * k))]), 4
                )[0],
            }
        )
    want = pd.DataFrame(rows).sort_values("event_type").reset_index(drop=True)
    got = (
        Q.q_winsorized_stats(SF)
        .to_pandas()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)


def test_training_shuffle_deterministic_permutation(ray_session):
    """The epoch shuffle is a reproducible permutation: every doc exactly
    once, positions 1..len contiguous per shard, equal to the single-process
    unsigned-hash ranking, and bit-identical across runs."""
    from geo_ray.pipelines import queries as Q

    docs = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id"])["doc_id"].to_numpy()
    h = docs.astype(np.int64).view(np.uint64) * np.uint64(6364136223846793005) + np.uint64(
        1442695040888963407
    )
    shard = (h % np.uint64(64)).astype(np.int64)
    order = np.lexsort((docs, h, shard))
    sh_s = shard[order]
    starts = np.flatnonzero(np.concatenate([[True], sh_s[1:] != sh_s[:-1]]))
    pos = (
        np.arange(sh_s.size, dtype=np.int64)
        - np.repeat(starts, np.diff(np.concatenate([starts, [sh_s.size]])))
        + 1
    )
    want = pd.DataFrame(
        {"doc_id": docs[order].astype(np.int64), "shard": sh_s, "pos": pos}
    ).sort_values(["shard", "pos"]).reset_index(drop=True)
    got1 = (
        Q.q_training_shuffle(SF).to_pandas().sort_values(["shard", "pos"]).reset_index(drop=True)
    )
    got2 = (
        Q.q_training_shuffle(SF).to_pandas().sort_values(["shard", "pos"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got1, want)
    pd.testing.assert_frame_equal(got2, got1)
    assert sorted(got1["doc_id"]) == sorted(docs.tolist())


def test_dup_pagerank_matches_sequential(ray_session):
    """Distributed iterative PR == single-process numpy iteration with the
    same fixed-point nano-rank arithmetic, over the same IVF-bucketed edge
    set (integer contribution sums make the answer order-independent)."""
    from geo_ray.kernels import fixed as fixed_k
    from geo_ray.pipelines import queries as Q
    from geo_ray.stages import ann as ann_st

    path = f"{SF}/embeddings.parquet"
    t = pq.read_table(path, columns=["vec_id", "embedding"])
    pairs = ann_st.neardup_bucket(ann_st.ivf_assign(t), 0.25).to_pandas()
    vid = np.sort(t["vec_id"].to_numpy().astype(np.int64))
    idx = {v: i for i, v in enumerate(vid)}
    n = vid.size
    src = np.concatenate([pairs["vec_a"], pairs["vec_b"]]).astype(np.int64)
    dst = np.concatenate([pairs["vec_b"], pairs["vec_a"]]).astype(np.int64)
    si = np.array([idx[v] for v in src])
    di = np.array([idx[v] for v in dst])
    deg = np.zeros(n, dtype=np.int64)
    np.add.at(deg, si, 1)
    rn = np.full(n, np.int64(fixed_k.round_half_away(1e9 / n, 0)))
    base_nano = (1.0 - 0.85) * 1e9 / n
    for _ in range(3):
        s = np.zeros(n, dtype=np.int64)
        np.add.at(s, di, rn[si] // deg[si])
        rn = fixed_k.round_half_away(base_nano + 0.85 * s.astype(np.float64), 0).astype(
            np.int64
        )
    want = pd.DataFrame({"vec_id": vid, "pagerank": rn.astype(np.float64) / 1e9})
    got = (
        Q.q_dup_pagerank(SF)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)


def test_countmin_point_estimates_never_undercount(ray_session):
    """CM property: min over rows of C[j][h_j(u)] >= u's true count for
    every user, with equality when no collision lands in some row."""
    from geo_ray.pipelines import queries as Q

    got = Q.q_event_countmin(SF).to_pandas()
    counters = {}
    for r in got.itertuples():
        counters[(int(r.row_id), int(r.slot))] = int(r.n)
    uid = pq.read_table(f"{SF}/events.parquet", columns=["user_id"])["user_id"].to_numpy()
    uid = uid.astype(np.int64)
    true = {int(u): int(c) for u, c in zip(*np.unique(uid, return_counts=True))}
    n_exact = 0
    for u, tc in true.items():
        est = min(
            counters.get(
                (j, int(Q.mix32_np(np.array([u]), seed=j)[0] % Q._CM_W)), 0
            )
            for j in range(1, Q._CM_D + 1)
        )
        assert est >= tc, (u, est, tc)
        n_exact += est == tc
    assert n_exact > 0  # at this load factor some users must be collision-free

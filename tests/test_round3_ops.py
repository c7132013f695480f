"""Round-3 analytics ops: gaps, outliers, stratified top-k sample, tile
stencil smoothing, vocabulary stats — each pinned against an independent
brute-force / reference computation at sf0.001 (the DuckDB oracles cover
sf0.01; these pin the semantics against a second, non-SQL derivation and
partitioning invariance)."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def test_event_gaps_matches_pandas_brute(ray_session):
    from geo_ray.pipelines import queries as Q

    got = (
        Q.q_event_gaps(SF).to_pandas().sort_values("user_id").reset_index(drop=True)
    )
    ev = pq.read_table(f"{SF}/events.parquet", columns=["user_id", "ts"]).to_pandas()
    ev["us"] = ev["ts"].astype("datetime64[us]").astype(np.int64)
    rows = []
    for uid, g in ev.groupby("user_id"):
        d = np.diff(np.sort(g["us"].to_numpy()))
        rows.append(
            {
                "user_id": uid,
                "n_gaps": len(d),
                "sum_gap_us": int(d.sum()) if len(d) else 0,
                "max_gap_us": int(d.max()) if len(d) else 0,
            }
        )
    want = pd.DataFrame(rows).sort_values("user_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got.astype(want.dtypes.to_dict()), want)


def test_value_outliers_thresholds_partition_invariant(ray_session):
    """The flagged set must be identical to a single-process exact-integer
    computation — proves the (quot, rem) moment split introduces no float
    drift under Ray's arbitrary partitioning."""
    from geo_ray.pipelines import queries as Q

    got = Q.q_value_outliers(SF).to_pandas()
    ev = pq.read_table(f"{SF}/events.parquet").to_pandas()
    cents = np.round(ev["value"].to_numpy() * 100.0).astype(np.int64)
    flagged = set()
    for et in ev["event_type"].unique():
        m = (ev["event_type"] == et).to_numpy()
        c = cents[m]
        mean = float(int(c.sum())) / len(c)
        var = float(sum(int(x) * int(x) for x in c)) / len(c) - mean * mean
        lim = mean + 2.0 * np.sqrt(max(var, 0.0))
        flagged |= set(ev["event_id"].to_numpy()[m][c > lim].tolist())
    assert set(got["event_id"].astype(int)) == flagged


def test_group_sample_is_stratum_top5_and_deterministic(ray_session):
    from geo_ray.pipelines import queries as Q

    got = Q.q_group_sample(SF).to_pandas()
    docs = pq.read_table(
        f"{SF}/documents.parquet", columns=["doc_id", "lang", "source"]
    ).to_pandas()
    h = Q.mix32_np(docs["doc_id"].to_numpy())
    docs = docs.assign(h=h)
    want = (
        docs.sort_values(["h", "doc_id"])
        .groupby(["lang", "source"], sort=False)
        .head(5)[["lang", "source", "doc_id"]]
    )
    key = lambda df: sorted(map(tuple, df[["lang", "source", "doc_id"]].to_numpy()))
    assert key(got) == key(want)
    # deterministic across runs
    again = Q.q_group_sample(SF).to_pandas()
    assert key(again) == key(got)


def test_tile_density_smooth_matches_dense_convolution(ray_session):
    """Scatter-gather stencil == dense 3x3 box filter over the z8 grid."""
    from geo_ray.pipelines import queries as Q

    got = Q.q_tile_density_smooth(SF).to_pandas()
    counts = Q.q_tile_counts(SF).to_pandas()
    grid = np.zeros((256, 256), dtype=np.int64)
    for tid, n in zip(counts["tile_id"], counts["n_points"]):
        grid[tid // 100000, tid % 100000] = n
    p = np.pad(grid, 1)
    smooth = sum(
        p[1 + dx : 257 + dx, 1 + dy : 257 + dy] for dx in (-1, 0, 1) for dy in (-1, 0, 1)
    )
    want = {
        int(tx) * 100000 + int(ty): (int(smooth[tx, ty]), int(grid[tx, ty]))
        for tx, ty in zip(*np.nonzero(grid))
    }
    gotmap = {
        int(r.tile_id): (int(r.n_smooth), int(r.n_points)) for r in got.itertuples()
    }
    assert gotmap == want


def test_vocab_stats_matches_python_brute(ray_session):
    from geo_ray.pipelines import queries as Q

    got = Q.q_vocab_stats(SF).to_pandas().set_index("source")
    docs = pq.read_table(f"{SF}/documents.parquet", columns=["source", "text"]).to_pandas()
    for src, g in docs.groupby("source"):
        toks = [t for txt in g["text"] for t in txt.split()]
        assert int(got.loc[src, "n_tokens"]) == len(toks)
        assert int(got.loc[src, "n_distinct"]) == len(set(toks))
        assert abs(got.loc[src, "ttr"] - round(len(set(toks)) / len(toks), 6)) < 1e-9


def test_polygon_metrics_matches_fraction_shoelace(ray_session):
    """Exact-rational shoelace + independent edge-loop perimeter."""
    from fractions import Fraction

    from geo_ray.kernels import distance as dist_k
    from geo_ray.pipelines import queries as Q
    from geo_ray.sources import derive

    got = Q.q_polygon_metrics(SF).to_pandas().set_index("area_id")
    for k, ring in derive.many_polygons(200):
        n = len(ring)
        xs = [Fraction(round(lng * 1e6)) for _, lng in ring]
        ys = [Fraction(round(lat * 1e6)) for lat, _ in ring]
        area2 = abs(
            sum(xs[i] * ys[(i + 1) % n] - xs[(i + 1) % n] * ys[i] for i in range(n))
        )
        perim_mm = sum(
            round(
                float(
                    dist_k.haversine(
                        np.array([ring[i][0]]), np.array([ring[i][1]]),
                        np.array([ring[(i + 1) % n][0]]), np.array([ring[(i + 1) % n][1]]),
                    )[0]
                )
                * 1000.0
            )
            for i in range(n)
        )
        row = got.loc[k]
        assert int(row.n_vertices) == n
        assert int(row.area_udeg2) == int(area2)
        assert abs(row.perimeter_m - perim_mm / 1000.0) < 1e-9


def test_dup_degree_hist_matches_pair_brute(ray_session):
    from collections import Counter

    from geo_ray.pipelines import queries as Q

    got = {
        int(r.degree): int(r.n_vecs)
        for r in Q.q_dup_degree_hist(SF).to_pandas().itertuples()
    }
    pairs = Q.q_ivf_dup_pairs(SF).to_pandas()
    deg = Counter()
    for r in pairs.itertuples():
        deg[int(r.vec_a)] += 1
        deg[int(r.vec_b)] += 1
    want = Counter(deg.values())
    assert got == dict(want)


def test_kmeans_iterate_matches_single_process_lloyd(ray_session):
    """Two distributed Lloyd rounds == a sequential NumPy k-means with the
    same per-round 6-dp centroid rounding; round 1 equals ivf_centroid_means."""
    from geo_ray.kernels import fixed as fixed_k
    from geo_ray.pipelines import queries as Q
    from geo_ray.stages import ann as ann_st

    got = Q.q_kmeans_iterate(SF, iters=2).to_pandas()
    t = pq.read_table(f"{SF}/embeddings.parquet", columns=["embedding"])
    v = ann_st._embeddings_to_matrix(t["embedding"])
    norms = np.sqrt((v * v).sum(axis=1))
    norms[norms == 0] = 1.0
    vn = v / norms[:, None]
    cents = ann_st.query_matrix(16)
    for _ in range(2):
        cn = cents / np.linalg.norm(cents, axis=1, keepdims=True)
        assign = np.argmax(vn @ cn.T, axis=1)
        means = np.zeros((16, 64))
        np.add.at(means, assign, v)
        counts = np.bincount(assign, minlength=16)
        assert (counts > 0).all()
        cents = fixed_k.round_half_away(means / counts[:, None], 6)
    want = cents.ravel()
    got = got.sort_values(["centroid_id", "dim"])
    np.testing.assert_allclose(got["mean_v"].to_numpy(), want, atol=1e-9)

    # round 1 must equal the one-step ivf_centroid_means query
    one = Q.q_ivf_centroid_means(SF).to_pandas().sort_values(["centroid_id", "dim"])
    g1 = Q.q_kmeans_iterate(SF, iters=1).to_pandas().sort_values(["centroid_id", "dim"])
    np.testing.assert_allclose(
        g1["mean_v"].to_numpy(), one["mean_v"].to_numpy(), atol=1e-12
    )


def test_purchase_window_events_matches_pandas_brute(ray_session):
    """Interval-overlap join == brute-force per-user scan, incl. purchases
    whose window crosses an hour-bucket boundary (probe replication path)."""
    from geo_ray.pipelines import queries as Q

    got = (
        Q.q_purchase_window_events(SF)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    ev = pq.read_table(
        f"{SF}/events.parquet", columns=["event_id", "ts", "user_id", "event_type"]
    ).to_pandas()
    ev["us"] = ev["ts"].astype("datetime64[us]").astype(np.int64)
    rows = []
    for _, p in ev[ev["event_type"] == "purchase"].iterrows():
        same = ev[ev["user_id"] == p["user_id"]]
        n = int(((same["us"] >= p["us"]) & (same["us"] < p["us"] + 3_600_000_000)).sum())
        rows.append({"event_id": int(p["event_id"]), "n_in_window": n - 1})
    want = pd.DataFrame(rows).sort_values("event_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got.astype(np.int64), want.astype(np.int64))

def test_frequent_shingles_truncated_summaries_stay_exact(ray_session, monkeypatch, tmp_path):
    """Force the SpaceSaving truncation path on a skewed synthetic corpus
    (hot phrases + a long random tail wider than the capacity): the merged
    candidate superset guarantee plus the exact verify pass must still give
    the exact HAVING-count answer."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq_w

    from geo_ray.pipelines import queries as Q

    rng = np.random.default_rng(42)
    vocab = [f"w{i}" for i in range(60)]
    texts = ["hot0 hot1 hot2 hot3 " * 12 for _ in range(50)]
    texts += [" ".join(rng.choice(vocab, 40)) for _ in range(150)]
    tbl = pa.table(
        {
            "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
            "text": pa.array(texts),
        }
    )
    pq_w.write_table(tbl, f"{tmp_path}/documents.parquet")

    monkeypatch.setattr(Q, "_SS_CAPACITY", 64)
    monkeypatch.setattr(Q, "_FREQ_PHI", 0.01)
    got = (
        Q.q_frequent_shingles(str(tmp_path))
        .to_pandas()
        .sort_values("shingle")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{tmp_path}/documents.parquet'")
    want = (
        con.sql(
            """WITH toks AS (
  SELECT [t for t in string_split(text, ' ') if t <> ''] AS tk FROM documents
), sh AS (
  SELECT tk[i] || ' ' || tk[i + 1] || ' ' || tk[i + 2] AS shingle
  FROM (SELECT tk, unnest(range(1, len(tk) - 1)) AS i FROM toks)
), tot AS (SELECT COUNT(*) AS n FROM sh)
SELECT shingle, COUNT(*) AS cnt FROM sh GROUP BY shingle
HAVING COUNT(*) >= 0.01 * (SELECT n FROM tot)"""
        )
        .df()
        .sort_values("shingle")
        .reset_index(drop=True)
    )
    assert len(want) > 0  # skew actually produced heavy hitters
    pd.testing.assert_frame_equal(got, want)

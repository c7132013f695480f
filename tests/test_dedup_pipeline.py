"""Dedup pipeline guards: hash-first exact dedup equals text-groupby truth,
and the minhash pair key stays exact for doc_id >= 10^7 (the replicated-shard
id range — the r1 pair-key packing collided there)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def big_id_docs(tmp_path_factory):
    """A tiny documents table whose doc_ids live beyond 10^7, with exact
    duplicates and near-duplicates across the id gap."""
    base = (
        "alpha beta gamma delta epsilon zeta eta theta iota kappa "
        "lambda mu nu xi omicron pi rho sigma tau upsilon"
    )
    near = base.replace("theta", "THETA")  # one token differs -> high jaccard
    rows = [
        (3, base),
        (10_000_001, base),  # exact dup across the old pair-key boundary
        (10_000_002, near),  # near dup
        (25_000_007, "completely different text with its own tokens here now"),
        (25_000_008, base),
    ]
    df = pd.DataFrame(rows, columns=["doc_id", "text"])
    d = tmp_path_factory.mktemp("bigids")
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False), d / "documents.parquet")
    return str(d)


def test_minhash_pairs_big_doc_ids(ray_session, big_id_docs):
    from geo_ray.pipelines import queries as Q

    got = Q.q_minhash_pairs(big_id_docs).to_pandas()
    pairs = set(zip(got["doc_a"].astype(int), got["doc_b"].astype(int)))
    # exact duplicates must pair with est_jaccard 1.0 and EXACT ids
    assert (3, 10_000_001) in pairs
    assert (3, 25_000_008) in pairs
    assert (10_000_001, 25_000_008) in pairs
    for _, r in got.iterrows():
        assert int(r.doc_a) < int(r.doc_b)
        assert int(r.doc_a) in {3, 10_000_001, 10_000_002, 25_000_007, 25_000_008}
        assert int(r.doc_b) in {3, 10_000_001, 10_000_002, 25_000_007, 25_000_008}
    exact = got[(got.doc_a == 3) & (got.doc_b == 10_000_001)]
    assert float(exact.est_jaccard.iloc[0]) == 1.0


def test_minhash_pair_key_overflow_guard(ray_session, tmp_path):
    from geo_ray.pipelines import queries as Q

    df = pd.DataFrame(
        {"doc_id": [1 << 33, (1 << 33) + 1], "text": ["same text tokens here"] * 2}
    )
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False), tmp_path / "documents.parquet")
    with pytest.raises(Exception, match="2-column key|2\\^32|RayTaskError|ValueError"):
        Q.q_minhash_pairs(str(tmp_path)).to_pandas()


def test_exact_dedup_hash_first_equals_text_groupby(ray_session, tmp_path):
    from geo_ray.pipelines import queries as Q

    texts = ["aaa", "bbb", "aaa", "ccc", "bbb", "aaa", ""]
    df = pd.DataFrame({"doc_id": np.arange(7, dtype=np.int64) + 5, "text": texts})
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False), tmp_path / "documents.parquet")
    got = (
        Q.q_exact_dedup(str(tmp_path))
        .to_pandas()
        .sort_values("keep_doc_id")
        .reset_index(drop=True)
    )
    truth = (
        df.groupby("text", as_index=False)
        .agg(keep_doc_id=("doc_id", "min"), n_copies=("doc_id", "size"))
        .sort_values("keep_doc_id")[["keep_doc_id", "n_copies"]]
        .reset_index(drop=True)
    )
    assert got["keep_doc_id"].tolist() == truth["keep_doc_id"].tolist()
    assert got["n_copies"].tolist() == truth["n_copies"].tolist()


def test_ngram_lsh_prefilter_equals_allpairs(ray_session):
    """LSH-prefiltered n-gram Jaccard == the exact all-pairs scan, on both
    the sf0.01 corpus buckets and a synthetic duplicate-heavy bucket."""
    import pandas as pd

    from geo_ray.stages import dedup as dd

    # synthetic bucket: exact dups, near dups, and noise
    base = "zero one two three four five six seven eight nine ten eleven"
    texts = [base, base, base.replace("five", "FIVE"),
             "unrelated words entirely different content goes right here now",
             base.replace("two three", "2 3")]
    ids = np.array([11, 22, 33, 44, 55], dtype=np.int64)
    g = pd.DataFrame({"doc_id": ids, "text": texts})
    got = dd.ngram_jaccard_pairs(g, 3, 0.5)
    want = dd.ngram_allpairs_jaccard(ids, texts, 3, 0.5)
    assert [(int(r.doc_a), int(r.doc_b), float(r.jaccard)) for r in got.itertuples()] == want
    assert len(want) >= 3  # the synthetic bucket really has near-dup pairs

    # real corpus buckets at sf0.01
    docs = pq.read_table(
        "/root/testdata/sf0.01/documents.parquet",
        columns=["doc_id", "text", "lang", "source"],
    ).to_pandas()
    for (_, _), sub in docs.groupby(["lang", "source"]):
        got = dd.ngram_jaccard_pairs(sub, 3, 0.5)
        want = dd.ngram_allpairs_jaccard(
            sub["doc_id"].to_numpy(np.int64), sub["text"].to_numpy(), 3, 0.5
        )
        assert [(int(r.doc_a), int(r.doc_b), float(r.jaccard)) for r in got.itertuples()] == want


def test_simhash_dup_pairs_equals_allpairs(ray_session):
    """Banded SimHash near-dup == brute-force popcount scan (pigeonhole
    exactness at hamming <= 3), on sf0.01 plus synthetic near-identical docs."""
    from geo_ray.pipelines import queries as Q
    from geo_ray.stages import dedup as dd

    sf = "/root/testdata/sf0.01"
    got = Q.q_simhash_dup_pairs(sf).to_pandas()
    got_set = {
        (int(r.doc_a), int(r.doc_b), int(r.hamming)) for r in got.itertuples()
    }

    docs = pq.read_table(sf + "/documents.parquet", columns=["doc_id", "text"])
    t = dd.simhash64(docs)
    doc = t["doc_id"].to_numpy()
    sh = t["simhash"].to_numpy().view(np.uint64)
    want = set()
    x = sh[:, None] ^ sh[None, :]
    dist = np.zeros(x.shape, dtype=np.int64)
    for shift in range(0, 64, 8):
        byte = ((x >> np.uint64(shift)) & np.uint64(0xFF)).astype(np.uint8)
        dist += np.unpackbits(byte[..., None], axis=2).sum(axis=2, dtype=np.int64)
    iu, ju = np.triu_indices(doc.size, 1)
    m = dist[iu, ju] <= 3
    for a, b, d in zip(doc[iu[m]], doc[ju[m]], dist[iu, ju][m]):
        lo, hi = sorted((int(a), int(b)))
        want.add((lo, hi, int(d)))
    assert got_set == want


def test_hll_estimate_accuracy(ray_session):
    """The HLL registers produce estimates within the sketch's error bounds
    of the exact distinct counts (64 registers -> ~13% standard error)."""
    import duckdb

    from geo_ray.pipelines import queries as Q

    sf = "/root/testdata/sf0.01"
    regs = Q.q_user_distinct_hll(sf).to_pandas()
    exact = duckdb.sql(
        f"SELECT event_type, COUNT(DISTINCT user_id) AS n FROM '{sf}/events.parquet' GROUP BY 1"
    ).df()
    for r in exact.itertuples():
        sub = regs[regs.event_type == r.event_type]
        full = np.zeros(64, dtype=np.int64)
        full[sub.register.to_numpy(int)] = sub.max_rank.to_numpy(int)
        est = Q.hll_estimate(full)
        assert abs(est - r.n) / r.n < 0.35, (r.event_type, est, r.n)


def test_minhash_joined_equals_carried(ray_session):
    """The lean band shuffle + signature join-back produces exactly the
    carried-signature pipeline's pair set (both scales of fixture)."""
    from geo_ray.pipelines import queries as Q

    for sf in ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]:
        a = Q.q_minhash_pairs(sf).to_pandas()
        b = Q.q_minhash_pairs_joined(sf).to_pandas()
        ka = sorted(zip(a.doc_a.astype(int), a.doc_b.astype(int), a.est_jaccard))
        kb = sorted(zip(b.doc_a.astype(int), b.doc_b.astype(int), b.est_jaccard))
        assert ka == kb
        assert len(ka) > 0


def test_doc_dup_components_match_union_find(ray_session):
    """Component labels over the minhash pair graph == sequential union-find
    on the same pairs (min-id canonical form)."""
    from geo_ray.pipelines import queries as Q
    from geo_ray.stages.cluster_copart import union_find

    sf = "/root/testdata/sf0.01"
    pairs = Q.q_minhash_pairs(sf).to_pandas()
    got_df = Q.q_doc_dup_components(sf).to_pandas()
    got = dict(zip(got_df.doc_id.astype(int), got_df.component.astype(int)))
    want = union_find(pairs.doc_a.to_numpy(np.int64), pairs.doc_b.to_numpy(np.int64))
    nodes = set(pairs.doc_a.astype(int)) | set(pairs.doc_b.astype(int))
    assert nodes, "fixture corpus must have near-dup pairs"
    for n in nodes:
        assert got.get(n, n) == want.get(n, n)


def test_ngram_banded_pipeline_equals_allpairs(ray_session, tmp_path):
    """The banded-shuffle q_ngram_dup_groups == per-group all-pairs scan on a
    synthetic duplicate-heavy corpus spanning several (lang, source) groups —
    including a cross-group near-identical text pair that must NOT pair."""
    import pandas as pd
    import pyarrow as pa

    from geo_ray.pipelines import queries as Q
    from geo_ray.stages import dedup as dd

    base = "zero one two three four five six seven eight nine ten eleven"
    other = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    rows = []
    for i, (lang, src) in enumerate([("en", "web"), ("en", "book"), ("de", "web")]):
        rows += [
            (100 * i + 1, base, lang, src),
            (100 * i + 2, base, lang, src),
            (100 * i + 3, base.replace("five", "FIVE"), lang, src),
            (100 * i + 4, other, lang, src),
            (100 * i + 5, base.replace("two three", "2 3"), lang, src),
        ]
    df = pd.DataFrame(rows, columns=["doc_id", "text", "lang", "source"])
    sf = str(tmp_path)
    pa.parquet.write_table(pa.Table.from_pandas(df), f"{sf}/documents.parquet")

    got = Q.q_ngram_dup_groups(sf).to_pandas()
    got_set = (
        {(int(r.doc_a), int(r.doc_b), float(r.jaccard)) for r in got.itertuples()}
        if len(got)
        else set()
    )
    want = set()
    for (_, _), sub in df.groupby(["lang", "source"]):
        want |= set(
            map(
                tuple,
                dd.ngram_allpairs_jaccard(
                    sub["doc_id"].to_numpy(np.int64), sub["text"].to_numpy(), 3, 0.5
                ),
            )
        )
    assert len(want) >= 9  # three groups x >=3 near-dup pairs each
    assert got_set == want


def test_ngram_doc_shingles_match_scalar(ray_session):
    """Stored shingle blobs == _shingle_hashes per doc, and band generation
    from blobs == bands from batch_signatures."""
    import pyarrow as pa

    from geo_ray.stages import dedup as dd

    texts = [
        "the quick brown fox jumps over the lazy dog",
        "a b",
        "one two three one two three one two",
    ]
    t = pa.table(
        {
            "doc_id": pa.array([7, 8, 9], pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(["en", "en", "de"]),
            "source": pa.array(["web", "book", "web"]),
        }
    )
    out = dd.ngram_doc_shingles(t, 3)
    gkey, sh_flat, sh_offs = dd._parse_shing_blobs(out["shing"])
    for i, txt in enumerate(texts):
        want = dd._shingle_hashes(txt, 3)
        got = sh_flat[sh_offs[i] : sh_offs[i + 1]]
        assert np.array_equal(got, want), i
    assert gkey[0] == dd.hash_str64("en|web")
    assert gkey[2] == dd.hash_str64("de|web")
    sigs_blob = dd._signatures_from_flat(sh_flat, sh_offs)
    sigs_text = dd.batch_signatures(texts, 3)
    assert np.array_equal(sigs_blob, sigs_text)

"""ANN / near-dup family: IVF-bucketed near-dup recall contract vs brute."""

import numpy as np
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def test_ivf_dup_pairs_subset_of_brute_with_equal_sims(ray_session):
    """ivf_dup_pairs == embed_dup_pairs restricted to same-centroid pairs,
    with bit-equal rounded cosines (the documented recall contract)."""
    from geo_ray.pipelines import queries as Q
    from geo_ray.stages import ann as ann_st

    brute = Q.q_embed_dup_pairs(SF).to_pandas()
    ivf = Q.q_ivf_dup_pairs(SF).to_pandas()

    t = pq.read_table(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    assigned = ann_st.ivf_assign(t)
    cent = dict(
        zip(
            assigned["vec_id"].to_numpy().astype(int).tolist(),
            assigned["centroid_id"].to_numpy().astype(int).tolist(),
        )
    )
    want = {
        (int(r.vec_a), int(r.vec_b)): float(r.cos_sim)
        for r in brute.itertuples()
        if cent[int(r.vec_a)] == cent[int(r.vec_b)]
    }
    got = {(int(r.vec_a), int(r.vec_b)): float(r.cos_sim) for r in ivf.itertuples()}
    assert got == want
    # and every ivf pair is a brute pair (subset relation)
    brute_pairs = set(zip(brute.vec_a.astype(int), brute.vec_b.astype(int)))
    assert set(got) <= brute_pairs

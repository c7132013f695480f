"""As-of join semantics: inclusive equal-time match, deterministic tie-break,
unmatched-left drop, multi-key buckets."""

import numpy as np
import pandas as pd
import pytest


@pytest.fixture()
def rd(ray_session):
    import ray.data

    return ray.data


def _join(rd, left, right):
    from geo_ray.stages import asof

    out = asof.asof_join(
        rd.from_pandas(left),
        rd.from_pandas(right),
        "k",
        "t",
        "k",
        "t",
        ["lid"],
        ["rid"],
        right_tiebreak="rid",
    ).to_pandas()
    return {
        int(l): (int(r), int(rt))
        for l, r, rt in zip(out["l_lid"], out["r_rid"], out["r_t"])
    }


def test_asof_core_semantics(rd):
    left = pd.DataFrame(
        {
            "k": [1, 1, 1, 2, 3],
            "t": [10, 5, 4, 7, 9],
            "lid": [100, 101, 102, 103, 104],
        }
    )
    right = pd.DataFrame(
        {
            "k": [1, 1, 2, 2, 9],
            "t": [5, 8, 7, 6, 1],
            "rid": [200, 201, 202, 203, 204],
        }
    )
    got = _join(rd, left, right)
    # lid 100 (k=1, t=10): latest right <= 10 is t=8 -> rid 201
    # lid 101 (k=1, t=5): INCLUSIVE equal-time match -> rid 200
    # lid 102 (k=1, t=4): nothing at or before -> dropped
    # lid 103 (k=2, t=7): equal-time rid 202 beats t=6 rid 203
    # lid 104 (k=3): no right side -> dropped
    assert got == {100: (201, 8), 101: (200, 5), 103: (202, 7)}


def test_asof_tiebreak_max_id(rd):
    left = pd.DataFrame({"k": [4], "t": [100], "lid": [1]})
    right = pd.DataFrame({"k": [4, 4, 4], "t": [50, 50, 50], "rid": [7, 9, 8]})
    got = _join(rd, left, right)
    assert got == {1: (9, 50)}


def test_asof_matches_pandas_merge_asof(rd):
    rng = np.random.default_rng(3)
    left = pd.DataFrame(
        {
            "k": rng.integers(0, 40, 500),
            "t": rng.integers(0, 10_000, 500),
            "lid": np.arange(500),
        }
    )
    right = pd.DataFrame(
        {
            "k": rng.integers(0, 40, 300),
            "t": rng.integers(0, 10_000, 300),
            "rid": np.arange(300),
        }
    )
    # make (k, t) unique on the right so pandas merge_asof (which keeps the
    # last row at equal keys) agrees with our max-tiebreak deterministically
    right = right.drop_duplicates(["k", "t"]).reset_index(drop=True)
    got = _join(rd, left, right)
    want_df = pd.merge_asof(
        left.sort_values("t", kind="mergesort"),
        right.sort_values("t", kind="mergesort"),
        on="t",
        by="k",
        direction="backward",
        allow_exact_matches=True,
    )
    want = {
        int(r.lid): (int(r.rid), None)
        for r in want_df.itertuples()
        if not np.isnan(r.rid)
    }
    assert set(got) == set(want)
    for lid, (rid, _) in got.items():
        assert want[lid][0] == rid


def test_asof_salted_identical(rd):
    """Hot-key salting (left rows spread, right rows replicated per salt)
    produces bit-identical results to the unsalted join."""
    from geo_ray.stages import asof

    rng = np.random.default_rng(5)
    # key 7 is hot: half of all left rows
    k_left = np.where(rng.random(600) < 0.5, 7, rng.integers(0, 20, 600))
    left = pd.DataFrame(
        {"k": k_left, "t": rng.integers(0, 5_000, 600), "lid": np.arange(600)}
    )
    right = pd.DataFrame(
        {
            "k": rng.integers(0, 20, 200),
            "t": rng.integers(0, 5_000, 200),
            "rid": np.arange(200),
        }
    ).drop_duplicates(["k", "t"]).reset_index(drop=True)

    def run(**kw):
        out = asof.asof_join(
            rd.from_pandas(left), rd.from_pandas(right),
            "k", "t", "k", "t", ["lid"], ["rid"], right_tiebreak="rid", **kw
        ).to_pandas()
        return sorted(zip(out["l_lid"].astype(int), out["r_rid"].astype(int)))

    plain = run()
    salted = run(hot_keys=np.array([7]), n_salt=4)
    assert plain == salted and len(plain) > 100

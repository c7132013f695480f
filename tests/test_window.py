"""stages/window.global_ranks: distributed ordered ranking vs pandas.

The hard cases are all about block boundaries: a group fully inside one
block, a group straddling one edge, and a giant group spanning MANY whole
blocks (middle blocks are single-group). The fixture forces tiny blocks so a
4-CPU session still produces dozens of boundaries.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from geo_ray.stages.window import _boundary_maps, _summary, global_ranks


def _expected(df, group_cols, order_cols, ascending):
    df = df.sort_values(
        group_cols + order_cols, ascending=[True] * len(group_cols) + ascending
    ).reset_index(drop=True)
    df["rn"] = df.groupby(group_cols).cumcount() + 1
    df["n_group"] = df.groupby(group_cols)[order_cols[0]].transform("size")
    return df


def _run(ray_session, df, group_cols, order_cols, descending, blocks=24):
    import ray.data as rd

    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)).repartition(blocks)
    out = global_ranks(ds, group_cols, order_cols, descending=descending).to_pandas()
    return out


@pytest.mark.parametrize("seed", [0, 7])
def test_global_ranks_random(ray_session, seed):
    rng = np.random.RandomState(seed)
    n = 5000
    df = pd.DataFrame(
        {
            "g": rng.randint(0, 12, n),  # some groups far larger than a block
            "v": rng.randint(0, 50, n).astype(np.float64),
            "id": np.arange(n, dtype=np.int64),
        }
    )
    out = _run(ray_session, df, ["g"], ["v", "id"], [True, False])
    exp = _expected(df, ["g"], ["v", "id"], [False, True])
    merged = out.sort_values(["g", "v", "id"], ascending=[True, False, True]).reset_index(drop=True)
    assert (merged["rn"].to_numpy() == exp["rn"].to_numpy()).all()
    assert (merged["n_group"].to_numpy() == exp["n_group"].to_numpy()).all()


def test_global_ranks_single_giant_group(ray_session):
    n = 3000
    df = pd.DataFrame(
        {"g": np.zeros(n, dtype=np.int64), "v": np.arange(n)[::-1].astype(np.int64)}
    )
    out = _run(ray_session, df, ["g"], ["v"], [False], blocks=16)
    out = out.sort_values("v").reset_index(drop=True)
    assert (out["rn"].to_numpy() == np.arange(1, n + 1)).all()
    assert (out["n_group"].to_numpy() == n).all()


def test_boundary_maps_span_many_blocks():
    # blocks: [A..A][A..A][A,B][B][B,C] — A spans 2.5 blocks, B 1.5
    def blk(groups):
        t = pa.table({"g": pa.array(groups), "v": pa.array(range(len(groups)))})
        return _summary(t, ["g"], ["g", "v"])

    s = [blk(["A"] * 4), blk(["A"] * 4), blk(["A", "B", "B"]), blk(["B"] * 3), blk(["B", "C"])]
    offsets, totals = _boundary_maps(s)
    assert offsets == [0, 4, 8, 2, 5]
    assert totals[("A",)] == 9
    assert totals[("B",)] == 6
    assert totals[("C",)] == 1


def test_global_ranks_string_groups(ray_session):
    df = pd.DataFrame(
        {
            "g": ["x", "y", "x", "z", "y", "x"],
            "v": [3.0, 1.0, 2.0, 9.0, 0.5, 1.0],
            "id": np.arange(6, dtype=np.int64),
        }
    )
    out = _run(ray_session, df, ["g"], ["v", "id"], [False, False], blocks=3)
    exp = _expected(df, ["g"], ["v", "id"], [True, True])
    m = out.sort_values(["g", "v", "id"]).reset_index(drop=True)
    assert (m["rn"].to_numpy() == exp["rn"].to_numpy()).all()
    assert (m["n_group"].to_numpy() == exp["n_group"].to_numpy()).all()


def test_semi_join_matches_pandas(ray_session):
    import ray.data as rd

    from geo_ray.stages.join import tagged_semi_join

    rng = np.random.RandomState(3)
    probe = pd.DataFrame(
        {
            "k1": rng.randint(0, 40, 500).astype(np.int64),
            "k2": rng.randint(0, 3, 500).astype(np.int64),
            "payload": rng.randint(0, 10**6, 500).astype(np.int64),
        }
    )
    match = pd.DataFrame(
        {
            "a": rng.randint(0, 40, 200).astype(np.int64),
            "b": rng.randint(0, 3, 200).astype(np.int64),
        }
    )
    out = tagged_semi_join(
        rd.from_pandas(probe).repartition(7),
        rd.from_pandas(match).repartition(5),
        ["k1", "k2"],
        ["a", "b"],
        num_buckets=8,
    ).to_pandas()
    keys = set(zip(match["a"], match["b"]))
    exp = probe[[(r.k1, r.k2) in keys for r in probe.itertuples()]]
    got = out.sort_values(["k1", "k2", "payload"]).reset_index(drop=True)
    exp = exp.sort_values(["k1", "k2", "payload"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got[["k1", "k2", "payload"]], exp[["k1", "k2", "payload"]])

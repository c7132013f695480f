"""Broadcast hash join: vectorized probe, dimension semantics."""

import numpy as np
import pyarrow as pa
import pytest

from geo_ray.stages.join import BroadcastHashJoin


def _build(tmp_path, rows):
    import pyarrow.parquet as pq

    path = str(tmp_path / "dim.parquet")
    pq.write_table(pa.table(rows), path)
    return path


def test_inner_join_matches(tmp_path):
    path = _build(tmp_path, {"k": pa.array([10, 20, 30], pa.int64()), "name": ["a", "b", "c"]})
    j = BroadcastHashJoin("k", path=path)
    probe = pa.table({"k": pa.array([20, 99, 10, 30, 20], pa.int64()), "v": [1, 2, 3, 4, 5]})
    out = j(probe)
    assert out["k"].to_pylist() == [20, 10, 30, 20]  # 99 dropped (inner)
    assert out["name"].to_pylist() == ["b", "a", "c", "b"]
    assert out["v"].to_pylist() == [1, 3, 4, 5]


def test_probe_key_rename(tmp_path):
    path = _build(tmp_path, {"k": pa.array([1, 2], pa.int64()), "x": [10, 20]})
    j = BroadcastHashJoin("k", path=path, probe_key="fk")
    out = j(pa.table({"fk": pa.array([2, 1], pa.int64())}))
    assert out["x"].to_pylist() == [20, 10]


def test_duplicate_build_keys_rejected(tmp_path):
    path = _build(tmp_path, {"k": pa.array([1, 1], pa.int64()), "x": [1, 2]})
    with pytest.raises(ValueError, match="duplicate"):
        BroadcastHashJoin("k", path=path)


def test_empty_probe(tmp_path):
    path = _build(tmp_path, {"k": pa.array([1], pa.int64()), "x": [9]})
    out = BroadcastHashJoin("k", path=path)(pa.table({"k": pa.array([], pa.int64())}))
    assert out.num_rows == 0 and "x" in out.column_names


def test_tagged_anti_join_matches_set_difference(ray_session):
    import numpy as np
    import ray.data as rd

    from geo_ray.stages.join import tagged_anti_join

    rng = np.random.default_rng(11)
    probe_keys = rng.choice(1000, size=400, replace=False).astype(np.int64)
    ex_keys = rng.choice(1000, size=300, replace=True).astype(np.int64)
    probe = rd.from_arrow(
        pa.table(
            {
                "k": pa.array(probe_keys),
                "name": pa.array([f"n{v}" for v in probe_keys]),
            }
        )
    )
    exclude = rd.from_arrow(pa.table({"ek": pa.array(ex_keys)}))
    out = tagged_anti_join(probe, exclude, probe_key="k", exclude_key="ek").to_pandas()
    want = sorted(set(probe_keys.tolist()) - set(ex_keys.tolist()))
    assert sorted(out["k"].tolist()) == want
    # carried column survives and stays aligned
    assert all(n == f"n{k}" for k, n in zip(out["k"], out["name"]))


def test_tagged_anti_join_empty_exclude(ray_session):
    import numpy as np
    import ray.data as rd

    from geo_ray.stages.join import tagged_anti_join

    probe = rd.from_arrow(pa.table({"k": pa.array(np.arange(10, dtype=np.int64))}))
    exclude = rd.from_arrow(pa.table({"k": pa.array([], pa.int64())}))
    out = tagged_anti_join(probe, exclude, probe_key="k").to_pandas()
    assert sorted(out["k"].tolist()) == list(range(10))


def test_tagged_anti_join_multikey(ray_session):
    import numpy as np
    import ray.data as rd

    from geo_ray.stages.join import tagged_anti_join

    # pairs that collide on each single column but not the tuple must survive
    probe = rd.from_arrow(
        pa.table(
            {
                "a": pa.array([1, 1, 2, 3], pa.int64()),
                "b": pa.array([10, 11, 10, 30], pa.int64()),
                "tag": pa.array(["w", "x", "y", "z"]),
            }
        )
    )
    exclude = rd.from_arrow(
        pa.table({"a": pa.array([1, 9], pa.int64()), "b": pa.array([10, 30], pa.int64())})
    )
    out = tagged_anti_join(probe, exclude, probe_key=["a", "b"]).to_pandas()
    got = sorted(zip(out["a"], out["b"], out["tag"]))
    assert got == [(1, 11, "x"), (2, 10, "y"), (3, 30, "z")]


def test_cross_snapshot_dedup_with_real_dups(ray_session, tmp_path):
    import duckdb
    import numpy as np

    from geo_ray.pipelines import queries as Q

    # texts 0..19 for even ids; odd ids reuse an even text when i % 3 == 0
    ids = list(range(40))
    texts = []
    for i in ids:
        if i % 2 == 1 and i % 3 == 0:
            texts.append(f"text {(i + 1) % 20}")  # collides with an even doc
        else:
            texts.append(f"text {i}")
    tbl = pa.table({"doc_id": pa.array(ids, pa.int64()), "text": pa.array(texts)})
    import pyarrow.parquet as pq

    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    got = sorted(Q.q_cross_snapshot_dedup(str(tmp_path)).to_pandas()["doc_id"].tolist())
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{tmp_path}/documents.parquet'")
    want = sorted(r[0] for r in con.sql(Q.SQL_CROSS_SNAPSHOT_DEDUP).fetchall())
    assert got == want
    assert len(got) < 20  # some odd docs actually got excluded


def test_tagged_inner_join_matches_pandas_merge(ray_session):
    """N:M multiplicity, missing keys on either side, payload carry — the
    shuffle inner join must equal a pandas merge exactly."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from geo_ray.stages.join import tagged_inner_join

    rng = np.random.default_rng(3)
    left = pd.DataFrame(
        {
            "k": rng.integers(0, 40, 300),
            "lv": rng.integers(0, 1000, 300),
            "name": [f"l{i%7}" for i in range(300)],
        }
    )
    right = pd.DataFrame(
        {
            "rk": rng.integers(10, 60, 120),
            "rv": rng.integers(0, 1000, 120),
        }
    )
    got = (
        tagged_inner_join(
            rd.from_arrow(pa.Table.from_pandas(left)),
            rd.from_arrow(pa.Table.from_pandas(right)),
            left_key="k",
            right_key="rk",
            right_cols=["rv"],
            num_buckets=7,
        )
        .to_pandas()
        .sort_values(["k", "lv", "name", "rv"], kind="mergesort")
        .reset_index(drop=True)
    )
    want = (
        left.merge(right, left_on="k", right_on="rk", how="inner")
        .drop(columns=["rk"])
        .sort_values(["k", "lv", "name", "rv"], kind="mergesort")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[["k", "lv", "name", "rv"]].astype({"k": "int64", "lv": "int64", "rv": "int64"}),
        want[["k", "lv", "name", "rv"]].astype({"k": "int64", "lv": "int64", "rv": "int64"}),
    )


def test_tagged_inner_join_salted_hot_keys_identical(ray_session):
    """A hot key owning half the left side: the salted plan (hot left rows
    spread over sub-buckets, hot right rows replicated) must be
    output-identical to the unsalted join."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from geo_ray.stages.join import tagged_inner_join

    rng = np.random.default_rng(9)
    k = np.where(rng.random(400) < 0.5, 7, rng.integers(0, 50, 400))
    left = pd.DataFrame({"k": k, "lv": np.arange(400, dtype=np.int64)})
    right = pd.DataFrame(
        {"rk": rng.integers(0, 50, 150), "rv": rng.integers(0, 99, 150)}
    )

    def run(hot):
        return (
            tagged_inner_join(
                rd.from_arrow(pa.Table.from_pandas(left)),
                rd.from_arrow(pa.Table.from_pandas(right)),
                left_key="k",
                right_key="rk",
                right_cols=["rv"],
                num_buckets=11,
                hot_keys=hot,
                n_salt=4,
            )
            .to_pandas()
            .sort_values(["k", "lv", "rv"], kind="mergesort")
            .reset_index(drop=True)
        )

    plain = run(None)
    salted = run(np.array([7], dtype=np.int64))
    assert len(plain) > 0
    pd.testing.assert_frame_equal(plain, salted)


def test_hot_left_rows_salt_per_row():
    """The salt for a hot key's left rows must vary per ROW (key mixed with
    row index), not per key — otherwise every row of the hot key lands in
    one salted sub-bucket and the skew survives salting."""
    import numpy as np

    from geo_ray.stages.join import _mix_keys

    kn = np.full(512, 7, dtype=np.int64)  # one hot key, many rows
    salt = (_mix_keys([kn, np.arange(512, dtype=np.int64)]) % np.uint64(8)).astype(np.int64)
    counts = np.bincount(salt, minlength=8)
    assert (counts > 0).all(), counts  # spread over all 8 sub-buckets
    assert counts.max() < 512  # and not concentrated in one


def test_null_join_keys_rejected(ray_session):
    """NULL keys never equi-join in SQL; the NaN->int64 round-trip would
    fabricate a key, so both shuffle joins refuse them loudly."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pytest
    import ray.data as rd

    from geo_ray.stages.join import tagged_anti_join, tagged_inner_join

    left = rd.from_arrow(
        pa.table({"k": pa.array([1, None, 3], pa.int64()), "lv": pa.array([10, 20, 30])})
    )
    right = rd.from_arrow(
        pa.table({"rk": pa.array([1, 3], pa.int64()), "rv": pa.array([5, 6])})
    )
    with pytest.raises(Exception, match="null values in join key"):
        tagged_inner_join(
            left, right, left_key="k", right_key="rk", right_cols=["rv"], num_buckets=4
        ).materialize()
    with pytest.raises(Exception, match="null values in join key"):
        tagged_anti_join(left, right, "k", exclude_key="rk", num_buckets=4).materialize()


def test_tagged_left_join_matches_pandas_left_merge(ray_session):
    """Unmatched left rows appear exactly once with the fill values; matched
    rows expand to full right multiplicity — equal to pandas' left merge."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from geo_ray.stages.join import tagged_left_join

    rng = np.random.RandomState(7)
    left = pd.DataFrame(
        {"k": rng.randint(0, 40, 300), "payload": np.arange(300, dtype=np.int64)}
    )
    right = pd.DataFrame(
        {"rk": rng.randint(20, 60, 150), "val": rng.randint(0, 1000, 150).astype(np.int64)}
    )
    got = (
        tagged_left_join(
            rd.from_arrow(pa.Table.from_pandas(left)).repartition(5),
            rd.from_arrow(pa.Table.from_pandas(right)).repartition(4),
            left_key="k",
            right_key="rk",
            right_cols=["val"],
            fill={"val": -1},
            num_buckets=8,
        )
        .to_pandas()
        .sort_values(["k", "payload", "val"])
        .reset_index(drop=True)
    )
    want = left.merge(right, left_on="k", right_on="rk", how="left").drop(columns=["rk"])
    want["val"] = want["val"].fillna(-1).astype(np.int64)
    want = want.sort_values(["k", "payload", "val"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got[["k", "payload", "val"]], want, check_dtype=True)


def test_tagged_full_join_matches_pandas_outer_merge(ray_session):
    """Matched keys expand to full multiplicity; unmatched LEFT rows carry
    the right fill; unmatched RIGHT rows carry the left fill — equal to
    pandas' outer merge with both-side orphans present by construction."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from geo_ray.stages.join import tagged_full_join

    rng = np.random.RandomState(11)
    left = pd.DataFrame(
        {"k": rng.randint(0, 40, 200), "payload": np.arange(200, dtype=np.int64)}
    )
    right = pd.DataFrame(
        {"rk": rng.randint(20, 60, 120), "val": rng.randint(0, 1000, 120).astype(np.int64)}
    )
    got = (
        tagged_full_join(
            rd.from_arrow(pa.Table.from_pandas(left)).repartition(5),
            rd.from_arrow(pa.Table.from_pandas(right)).repartition(4),
            left_key="k",
            right_key="rk",
            right_cols=["val"],
            right_fill={"val": -1},
            left_fill={"payload": -7},
            num_buckets=8,
        )
        .to_pandas()
        .sort_values(["k", "payload", "val"])
        .reset_index(drop=True)
    )
    want = left.merge(right, left_on="k", right_on="rk", how="outer")
    want["k"] = want["k"].fillna(want["rk"]).astype(np.int64)
    want = want.drop(columns=["rk"])
    want["val"] = want["val"].fillna(-1).astype(np.int64)
    want["payload"] = want["payload"].fillna(-7).astype(np.int64)
    want = want.sort_values(["k", "payload", "val"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got[["k", "payload", "val"]], want, check_dtype=True)
    # both orphan directions genuinely present
    assert (got["payload"] == -7).any() and (got["val"] == -1).any()

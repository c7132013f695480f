"""hash_bucket_apply's key-repartition path (HASH_SHUFFLE mode) must produce
the same results as the default sort-based path."""

import numpy as np
import pytest


@pytest.fixture()
def hash_shuffle_ctx(ray_session):
    from ray.data import DataContext
    from ray.data.context import ShuffleStrategy

    ctx = DataContext.get_current()
    prev = ctx.shuffle_strategy
    ctx.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
    yield ctx
    ctx.shuffle_strategy = prev


def test_hash_mode_equals_sort_mode(ray_session, hash_shuffle_ctx):
    from ray.data.context import ShuffleStrategy

    from geo_ray.pipelines import queries as Q

    sf = "/root/testdata/sf0.001"

    def run(q):
        return (
            q(sf)
            .to_pandas()
            .sort_values(lambda_cols)
            .reset_index(drop=True)
        )

    # sessions pipeline through hash mode
    lambda_cols = ["user_id"]
    hash_res = run(Q.q_event_sessions)
    hash_shuffle_ctx.shuffle_strategy = ShuffleStrategy.SORT_SHUFFLE_PULL_BASED
    sort_res = run(Q.q_event_sessions)
    assert hash_res.equals(sort_res)
    assert len(hash_res) > 0

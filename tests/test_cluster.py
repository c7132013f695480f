"""cluster_nearby fixtures (untested upstream; FIXTURES.md §5.i).

The kernel mirrors src/cluster_nearby.cc with float32 arithmetic; these
fixtures pin single-linkage chaining + complete-linkage splitting behavior.
"""

import numpy as np

from geo_ray.kernels import distance as D
from geo_ray.kernels.cluster import cluster_nearby


def test_empty_and_singleton():
    assert cluster_nearby([], [], 100.0).size == 0
    assert cluster_nearby([50.0], [8.0], 100.0).tolist() == [0]


def test_two_near_points_cluster():
    # ~111 m apart at the equator
    labels = cluster_nearby([0.0, 0.001], [0.0, 0.0], 200.0)
    assert labels[0] == labels[1]


def test_two_far_points_separate():
    labels = cluster_nearby([0.0, 1.0], [0.0, 0.0], 200.0)
    assert labels[0] != labels[1]


def test_chain_splits_by_complete_linkage():
    # three points in a line, consecutive ~111m apart, ends ~222m apart:
    # single linkage chains all three; complete linkage (max pairwise 222m)
    # must split for max_dist=150.
    lats = [0.0, 0.001, 0.002]
    lngs = [0.0, 0.0, 0.0]
    d02 = float(D.haversine(lats[0], 0, lats[2], 0))
    assert d02 > 150.0
    labels = cluster_nearby(lats, lngs, 150.0)
    # the middle point joins one of its neighbors; the far pair must differ
    assert labels[0] != labels[2]


def test_triangle_under_max_dist_single_cluster():
    # equilateral-ish triangle with all pairs < max_dist: one cluster
    lats = [0.0, 0.001, 0.0005]
    lngs = [0.0, 0.0, 0.0008]
    labels = cluster_nearby(lats, lngs, 200.0)
    assert len(set(labels.tolist())) == 1


def test_two_groups():
    lats = [0.0, 0.0002, 0.0001, 5.0, 5.0002]
    lngs = [0.0, 0.0, 0.0001, 5.0, 5.0]
    labels = cluster_nearby(lats, lngs, 100.0)
    assert labels[0] == labels[1] == labels[2]
    assert labels[3] == labels[4]
    assert labels[0] != labels[3]


def test_labels_are_valid_indices():
    rng = np.random.default_rng(21)
    lats = rng.uniform(49.0, 49.01, 40)
    lngs = rng.uniform(8.0, 8.01, 40)
    labels = cluster_nearby(lats, lngs, 300.0)
    assert labels.dtype == np.uint32
    assert (labels < 40).all()


def test_incremental_complete_linkage_equals_reference():
    """The O(n^2)-update complete linkage must reproduce the literal mirror
    bit-for-bit, including the last-qualifying-entry merge-order quirk."""
    import numpy as np

    from geo_ray.kernels import cluster as C

    rng = np.random.default_rng(123)
    for _ in range(40):
        n = int(rng.integers(1, 30))
        centers = rng.uniform(-60, 60, (max(1, n // 6), 2))
        pick = rng.integers(0, len(centers), n)
        lat = (centers[pick, 0] + rng.normal(0, 0.01, n)).astype(np.float32)
        lng = (centers[pick, 1] + rng.normal(0, 0.01, n)).astype(np.float32)
        for md in (200.0, 1500.0):
            a = C._complete_linkage_reference(lat, lng, np.float32(md))
            b = C._complete_linkage(lat, lng, np.float32(md))
            assert (a == b).all()

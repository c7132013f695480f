"""Reference point_rtree behavioral cases (test/point_rtree_test.cc:7-41)
ported against the engine's radius/kNN stages — same landmarks, same ids,
same distance ordering.
"""

import numpy as np
import pyarrow as pa

from geo_ray.stages.knn import KnnAgainstQueries, RadiusAgainstQueries

# Hauptbahnhof, Luisenplatz, Algo Offices (point_rtree_test.cc:10-12)
POINTS = pa.table(
    {
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "pt_idx": pa.array([0, 0, 0], pa.int64()),
        "lat": pa.array([49.8726016, 49.8728246, 49.8780513]),
        "lng": pa.array([8.6310396, 8.6512529, 8.6547033]),
    }
)
MENSA = (49.8756276, 8.6577833)


def _radius(min_r, max_r):
    stage = RadiusAgainstQueries([7], [MENSA[0]], [MENSA[1]], float(min_r), float(max_r))
    out = stage(POINTS)
    return out["doc_id"].to_pylist(), out["dist_m"].to_numpy()


def test_finds_algo():
    """in_radius(mensa, 450) -> exactly Algo Offices (id 2)."""
    ids, _ = _radius(0, 450)
    assert ids == [2]


def test_finds_lui():
    """in_radius(mensa, 450, 1000) -> exactly Luisenplatz (id 1)."""
    ids, _ = _radius(450, 1000)
    assert ids == [1]


def test_finds_all_ordered():
    """in_radius_with_distance(mensa, 10000): ids (2, 1, 0) by ascending
    distance (point_rtree_test.cc:31-40)."""
    ids, dist = _radius(0, 10000)
    order = np.argsort(dist, kind="mergesort")
    assert [ids[i] for i in order] == [2, 1, 0]
    d = dist[order]
    assert d[0] <= d[1] <= d[2]


def test_nearest_matches_radius_order():
    """nearest(mensa, 2) == the two closest by the same ordering."""
    stage = KnnAgainstQueries([7], [MENSA[0]], [MENSA[1]], k=2)
    out = stage(POINTS)
    g = sorted(zip(out["dist_m"].to_numpy(), out["doc_id"].to_pylist()))
    assert [i for _, i in g] == [2, 1]

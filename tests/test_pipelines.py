"""End-to-end pipeline tests over sf0.001 (single shared Ray session).

Covers: span synthesis + the per-row span-sequence invariant (input_hint),
flagship join output vs an independent driver-side oracle, and the broadcast
actor-pool PIP join vs the task-based path.
"""

import numpy as np
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def ray_data(ray_session):
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    return ray_session


def test_span_sequence_invariant(ray_data):
    """spans (kind, text, media_ref, order) must survive the pipeline unchanged."""
    from geo_ray.pipelines import flagship as fl
    from geo_ray.stages import cells

    ds = fl.documents_with_spans(SF)
    # push the payload through two more geometry stages (per-doc point derive)
    def enrich(b):
        import pyarrow as pa

        doc = b["doc_id"].to_numpy()
        return b.append_column("n_geo", pa.array((doc % 4).astype(np.int64)))

    out = ds.map_batches(enrich, batch_format="pyarrow", zero_copy_batch=True)
    got = out.to_pandas().sort_values("doc_id").reset_index(drop=True)

    # independent reconstruction of the expected span sequence
    src = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"]).to_pandas()
    src = src.sort_values("doc_id").reset_index(drop=True)
    assert (got["doc_id"].to_numpy() == src["doc_id"].to_numpy()).all()
    for i in range(0, len(src), 37):
        doc_id = int(src["doc_id"][i])
        spans = got["spans"][i]
        expected_kinds = ["text"] + (["image"] if doc_id % 3 == 0 else []) + ["geo"] * (doc_id % 4)
        assert [s["kind"] for s in spans] == expected_kinds
        assert spans[0]["text"] == src["text"][i]
        assert [s["offset"] for s in spans] == list(range(len(spans)))
        for s in spans[1:]:
            assert s["text"] == ""


def test_flagship_matches_driver_side_oracle(ray_data):
    from geo_ray.kernels import pip as pip_k
    from geo_ray.kernels import tile as tile_k
    from geo_ray.pipelines import queries as Q
    from geo_ray.sources import derive

    got = Q.q_flagship(SF).to_pandas()
    doc_ids = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id"])["doc_id"].to_numpy()
    d, i, lat, lng = derive.derive_points(doc_ids)
    rows = []
    for k, rlat, rlng in derive.polygons_arrays():
        m = pip_k.points_in_ring(lat, lng, rlat, rlng)
        tx, ty = tile_k.latlng_tile(lat[m], lng[m], 14)
        for dd, ii, x, y in zip(d[m], i[m], tx, ty):
            rows.append((dd, ii, k, x, y))
    want = sorted(rows)
    got_rows = sorted(
        zip(got["doc_id"], got["pt_idx"], got["area_id"], got["tile_x"], got["tile_y"])
    )
    assert got_rows == want
    assert len(got_rows) > 0


def test_actor_pool_pip_join_matches_task_path(ray_data):
    from geo_ray.pipelines import flagship as fl

    task_out = fl.flagship(SF, use_actors=False).to_pandas()
    actor_out = fl.flagship(SF, use_actors=True, concurrency=2).to_pandas()
    key = ["doc_id", "pt_idx", "area_id"]
    a = task_out[key].sort_values(key).reset_index(drop=True)
    b = actor_out[key].sort_values(key).reset_index(drop=True)
    assert a.equals(b)


def test_knn_partial_topk_is_exact(ray_data):
    """Partial per-batch top-k + grouped finish == global top-k."""
    from geo_ray.kernels import distance as dist_k
    from geo_ray.pipelines import queries as Q
    from geo_ray.sources import derive

    got = Q.q_knn_cities(SF).to_pandas()
    doc_ids = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id"])["doc_id"].to_numpy()
    d, i, lat, lng = derive.derive_points(doc_ids)
    for qid, (qlat, qlng) in enumerate(derive.CITIES):
        dist = dist_k.haversine(qlat, qlng, lat, lng)
        order = np.lexsort((i, d, dist))[:5]
        want = sorted(zip(d[order], i[order]))
        g = got[got["query_id"] == qid]
        assert sorted(zip(g["doc_id"], g["pt_idx"])) == want


def test_replicate_docs_distinct_geometry(ray_data):
    import pyarrow as pa

    from geo_ray.stages import spans as spans_st

    b = pa.table({"doc_id": pa.array([1, 2], type=pa.int64()), "text": pa.array(["a", "b"])})
    out = spans_st.replicate_docs(b, factor=3)
    assert out.num_rows == 6
    ids = out["doc_id"].to_numpy()
    assert len(set(ids.tolist())) == 6
    assert (ids[:2] == [1, 2]).all()


def test_fused_flagship_matches_staged(ray_session):
    from geo_ray.pipelines import flagship as fl

    staged = (
        fl.flagship("/root/testdata/sf0.001")
        .select_columns(["doc_id", "pt_idx", "area_id", "tile_x", "tile_y"])
        .to_pandas()
        .sort_values(["doc_id", "pt_idx", "area_id"])
        .reset_index(drop=True)
    )
    fused = (
        fl.flagship_fused("/root/testdata/sf0.001")
        .select_columns(["doc_id", "pt_idx", "area_id", "tile_x", "tile_y"])
        .to_pandas()
        .sort_values(["doc_id", "pt_idx", "area_id"])
        .reset_index(drop=True)
    )
    assert staged.equals(fused)


def test_sharded_read_matches_replicate(ray_session):
    from geo_ray.pipelines import flagship as fl

    a = sorted(fl.doc_ids_dataset("/root/testdata/sf0.001", 1).to_pandas()["doc_id"])
    b = sorted(fl.doc_ids_dataset("/root/testdata/sf0.001", 4).to_pandas()["doc_id"])
    assert len(b) == 4 * len(a)
    assert b[: len(a)] == a  # shard 0 is the original corpus


def test_salted_pip_copartition_identical(ray_session):
    from geo_ray.pipelines import queries as Q
    from geo_ray.stages import copartition as cp

    plain = (
        cp.pip_join_copartition(Q.points_ds("/root/testdata/sf0.001"))
        .to_pandas()
        .sort_values(["doc_id", "pt_idx", "area_id"])
        .reset_index(drop=True)
    )
    salted = (
        cp.pip_join_copartition(Q.points_ds("/root/testdata/sf0.001"), salt_threshold=5)
        .to_pandas()
        .sort_values(["doc_id", "pt_idx", "area_id"])
        .reset_index(drop=True)
    )
    assert len(plain) > 0
    assert plain.equals(salted)


def test_salted_knn_copartition_identical(ray_session):
    import numpy as np

    from geo_ray.pipelines import queries as Q
    from geo_ray.sources import derive
    from geo_ray.stages import copartition as cp

    qlat = np.array([c[0] for c in derive.CITIES])
    qlng = np.array([c[1] for c in derive.CITIES])

    def run(hot):
        out = cp.knn_copartition(
            Q.points_ds("/root/testdata/sf0.001"), np.arange(8), qlat, qlng, k=5, hot_cells=hot
        )
        return (
            out.to_pandas()
            .sort_values(["query_id", "doc_id", "pt_idx"])
            .reset_index(drop=True)
        )

    plain = run(None)
    # salt every city's own cell — the densest cells by construction
    cx, cy = __import__("geo_ray.kernels.cell", fromlist=["cell_at_zoom"]).cell_at_zoom(qlat, qlng, 8)
    from geo_ray.kernels.cell import hash_from_xy

    hot = hash_from_xy(cx, cy).astype("int64")
    salted = run(hot)
    assert len(plain) == 40
    assert plain.equals(salted)


def test_flagship_spans_driven_equals_arithmetic(ray_session):
    """The spans-driven flagship (explode from the spans struct, invariant
    asserted in-pipeline) emits exactly the arithmetic-derive flagship rows."""
    from geo_ray.pipelines import flagship as fl

    cols = ["doc_id", "pt_idx", "area_id", "tile_x", "tile_y"]
    a = (
        fl.flagship_spans(SF)
        .select_columns(cols)
        .to_pandas()
        .sort_values(cols)
        .reset_index(drop=True)
    )
    b = (
        fl.flagship(SF)
        .select_columns(cols)
        .to_pandas()
        .sort_values(cols)
        .reset_index(drop=True)
    )
    assert a.equals(b)
    assert len(a) > 0


def test_span_invariant_check_rejects_tampering(ray_session):
    import pyarrow as pa

    from geo_ray.pipelines import flagship as fl
    from geo_ray.stages import spans as sp

    docs = fl.documents_with_spans(SF).take_batch(64, batch_format="pyarrow")
    pts = sp.explode_points_from_spans(docs)
    # untampered passes and drops the carried columns
    out = sp.verify_span_invariant(pts)
    assert "media_ref" not in out.column_names
    # tampered offset -> in-pipeline assertion fires
    bad = pts.set_column(
        pts.schema.get_field_index("span_offset"),
        "span_offset",
        pa.array(pts["span_offset"].to_numpy() + 1),
    )
    try:
        sp.verify_span_invariant(bad)
        raise SystemExit("should have raised")
    except AssertionError:
        pass
    # tampered media_ref -> fires too
    refs = pts["media_ref"].to_pylist()
    refs[0] = "geo://999999999"
    bad2 = pts.set_column(
        pts.schema.get_field_index("media_ref"), "media_ref", pa.array(refs)
    )
    try:
        sp.verify_span_invariant(bad2)
        raise SystemExit("should have raised")
    except AssertionError:
        pass


def test_point_pairs_within_matches_brute_force(ray_session):
    """Cell-halo within-distance self-join == O(n^2) haversine scan,
    exactly once per pair (the home-cell canonical rule)."""
    import numpy as np
    import pyarrow.parquet as pq

    from geo_ray.kernels import distance as dist_k
    from geo_ray.kernels import fixed as fixed_k
    from geo_ray.pipelines import queries as Q
    from geo_ray.sources import derive

    SF = "/root/testdata/sf0.001"
    R = 5000.0
    got = (
        Q.q_point_pairs_within(SF, R)
        .to_pandas()
        .sort_values(["gid_a", "gid_b"])
        .reset_index(drop=True)
    )
    doc_ids = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id"])["doc_id"].to_numpy()
    d, i, lat, lng = derive.derive_points(doc_ids)
    gid = d * 4 + i
    order = np.argsort(gid)
    gid, lat, lng = gid[order], lat[order], lng[order]
    iu, ju = np.triu_indices(gid.size, 1)
    dist = dist_k.haversine(lat[iu], lng[iu], lat[ju], lng[ju])
    m = dist <= R
    want = sorted(zip(gid[iu[m]], gid[ju[m]], fixed_k.round_half_away(dist[m], 3)))
    assert [tuple(r) for r in got.to_numpy()] == [
        (int(a), int(b), float(x)) for a, b, x in want
    ]
    assert len(want) > 0  # the fixture corpus must actually exercise pairs

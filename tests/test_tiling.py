"""Tile-assembly pipeline (§3.3): explode correctness, determinism, salting."""

import numpy as np
import pyarrow as pa
import pytest

from geo_ray.kernels import codec as codec_k
from geo_ray.kernels import simplify as simp_k
from geo_ray.kernels import tile as tile_k
from geo_ray.stages import tiling

SF = "/root/testdata/sf0.001"


def test_lines_to_tile_rows_cover_and_encoding():
    batch = pa.table({"doc_id": pa.array([5, 9, 13], type=pa.int64())})
    out = tiling.lines_to_tile_rows(batch, zoom=10)
    assert set(out.column_names) == {"tile_key", "tile_x", "tile_y", "doc_id", "enc"}
    # every row's tile must lie inside its line's bbox tile range
    for d in (5, 9, 13):
        lat, lng = tiling.derive_walks(np.array([d]))
        x0, y0, x1, y1 = tile_k.tile_range_of_box(
            lat.min(axis=1), lng.min(axis=1), lat.max(axis=1), lng.max(axis=1), 10
        )
        rows = out.filter(pa.compute.equal(out["doc_id"], d))
        tx = rows["tile_x"].to_numpy()
        ty = rows["tile_y"].to_numpy()
        assert tx.size == (x1[0] - x0[0] + 1) * (y1[0] - y0[0] + 1)
        assert (tx >= x0[0]).all() and (tx <= x1[0]).all()
        assert (ty >= y0[0]).all() and (ty <= y1[0]).all()
        # the encoded string decodes to the mask-simplified walk
        masks = simp_k.make_simplify_mask(lat[0], lng[0])
        keep = masks[10]
        dlat, dlng = codec_k.decode_polyline(rows["enc"][0].as_py(), 5)
        assert np.allclose(dlat, np.round(lat[0][keep], 5), atol=1e-5)
        assert np.allclose(dlng, np.round(lng[0][keep], 5), atol=1e-5)


def test_tile_pipeline_deterministic(ray_session):
    a = tiling.tile_pipeline(SF, zoom=10).to_pandas().sort_values("tile_key").reset_index(drop=True)
    b = tiling.tile_pipeline(SF, zoom=10).to_pandas().sort_values("tile_key").reset_index(drop=True)
    assert a.equals(b)
    assert (a["n_lines"] >= 1).all()
    assert a["payload"].str.len().gt(0).all()


def test_salted_equals_unsalted(ray_session):
    a = tiling.tile_pipeline(SF, zoom=10).to_pandas().sort_values("tile_key").reset_index(drop=True)
    s = (
        tiling.tile_pipeline(SF, zoom=10, salt_threshold=2)
        .to_pandas()
        .sort_values("tile_key")
        .reset_index(drop=True)
    )
    assert a.equals(s[a.columns])


def test_raster_boundary_matches_brute_force(ray_session):
    """Distributed probe-miss boundary == numpy brute force over the
    occupied-tile set (out-of-grid neighbors count as open)."""
    import numpy as np
    import pyarrow.parquet as pq

    from geo_ray.kernels import tile as tile_k
    from geo_ray.pipelines import queries as Q
    from geo_ray.sources import derive

    SF = "/root/testdata/sf0.001"
    got = Q.q_raster_boundary(SF).to_pandas().sort_values(["tile_x", "tile_y"]).reset_index(drop=True)
    doc_ids = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id"])["doc_id"].to_numpy()
    _, _, lat, lng = derive.derive_points(doc_ids)
    tx, ty = tile_k.latlng_tile(lat, lng, 10)
    occ = {}
    for x, y in zip(tx.tolist(), ty.tolist()):
        occ[(x, y)] = occ.get((x, y), 0) + 1
    want = []
    for (x, y), n in occ.items():
        open_sides = sum(
            (x + dx, y + dy) not in occ for dx, dy in ((1, 0), (-1, 0), (0, 1), (0, -1))
        )
        if open_sides:
            want.append((x, y, n, open_sides))
    want.sort()
    assert [tuple(r) for r in got[["tile_x", "tile_y", "n_points", "n_open_sides"]].to_numpy()] == want
    assert ((got["maxx_m"] > got["minx_m"]) & (got["maxy_m"] > got["miny_m"])).all()

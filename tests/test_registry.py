"""Kernel registry: the user-extension surface."""

import pyarrow as pa
import pytest

from geo_ray import registry


def test_builtins_registered():
    assert {"explode_points", "assign_cells", "assign_tiles", "minhash_bands"} <= set(
        registry.names()
    )


def test_register_and_apply(ray_session):
    import ray.data as rd

    if "double_ids" not in registry.names():

        @registry.kernel("double_ids")
        def double_ids(batch: pa.Table, factor: int = 2) -> pa.Table:
            import numpy as np

            v = batch["id"].to_numpy() * factor
            return pa.table({"id": pa.array(v)})

    ds = rd.range(5)
    out = registry.apply(ds, "double_ids", factor=3).to_pandas()
    assert sorted(out["id"]) == [0, 3, 6, 9, 12]


def test_duplicate_rejected():
    with pytest.raises(ValueError, match="already registered"):
        registry.register("assign_cells", lambda b: b)


def test_unknown_kernel():
    with pytest.raises(KeyError, match="unknown kernel"):
        registry.get("nope")


def test_pipeline_via_registry(ray_session):
    """The flagship's narrow stages composed purely by name."""
    import ray.data as rd

    ds = rd.read_parquet("/root/testdata/sf0.001/documents.parquet", columns=["doc_id"])
    for name in ("explode_points", "assign_cells", "assign_tiles"):
        ds = registry.apply(ds, name)
    out = ds.to_pandas()
    assert {"doc_id", "pt_idx", "lat", "lng", "cell", "tile_key"} <= set(out.columns)
    assert len(out) == 750

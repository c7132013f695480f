"""Flagship pipeline: documents -> spans -> points -> cells -> PIP join -> tiles.

This is the SURVEY.md §3.1 + §3.3 flow, Ray-Data-native: every stage is a
vectorized ``map_batches`` over zero-copy Arrow batches; the polygon side is
broadcast (``ray.put`` once, compiled per actor in ``PipJoiner.__init__``);
no full materialization — callers consume the returned Dataset by writing or
aggregating.
"""

from __future__ import annotations

import ray.data as rd

from geo_ray.stages import cells, pip_join, spans


def read_documents(sf_dir: str, columns=("doc_id", "text")) -> "rd.Dataset":
    return rd.read_parquet(f"{sf_dir}/documents.parquet", columns=list(columns))


def doc_ids_dataset(sf_dir: str, replicate: int = 1):
    """documents doc_id column, optionally amplified for scale runs via
    SHARD-PARALLEL reads: one task per replicate-shard range, each reading
    the (small, page-cached) documents file itself — the same access pattern
    as a real multi-file corpus, with no serial read+split head in front of
    the pipeline."""
    if replicate <= 1:
        return read_documents(sf_dir, columns=("doc_id",))
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    path = f"{sf_dir}/documents.parquet"

    def shard_read(batch: pa.Table) -> pa.Table:
        ks = batch["id"].to_numpy().astype(np.int64)
        doc = pq.read_table(path, columns=["doc_id"])["doc_id"].to_numpy().astype(np.int64)
        n = doc.size
        out = np.tile(doc, ks.size) + np.repeat(ks * 10_000_000, n)
        return pa.table({"doc_id": pa.array(out)})

    return rd.range(replicate, override_num_blocks=min(replicate, 256)).map_batches(
        shard_read, batch_format="pyarrow"
    )


def points_dataset(sf_dir: str, replicate: int = 1, cell_zoom: int = 8, tile_zoom: int = 14):
    """documents -> derived geo points with cell + tile assignment."""
    ds = doc_ids_dataset(sf_dir, replicate)
    ds = ds.map_batches(spans.explode_points, batch_format="pyarrow", zero_copy_batch=True)
    ds = ds.map_batches(
        cells.assign_cells, fn_kwargs={"zoom": cell_zoom}, batch_format="pyarrow",
        zero_copy_batch=True,
    )
    ds = ds.map_batches(
        cells.assign_tiles, fn_kwargs={"zoom": tile_zoom}, batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return ds


_FIXTURE_INDEX = None


def flagship_fused_batch(batch, cell_zoom: int = 8, tile_zoom: int = 14):
    """One-pass fused kernel: doc_id batch -> final join rows.

    Same kernels as the staged pipeline (explode -> cells -> tiles -> PIP)
    but without materializing an Arrow table between stages — on a
    bandwidth-limited host the staged chain's intermediate tables are ~2x
    extra memory traffic. Output is identical to the staged pipeline."""
    import numpy as np
    import pyarrow as pa

    from geo_ray.kernels import cell as cell_k
    from geo_ray.kernels import tile as tile_k
    from geo_ray.sources import derive

    global _FIXTURE_INDEX
    if _FIXTURE_INDEX is None:
        _FIXTURE_INDEX = pip_join.CompiledPolygons()  # once per worker process

    doc_id = batch["doc_id"].to_numpy().astype(np.int64)
    d_rep, pt_idx, lat, lng = derive.derive_points(doc_id)
    cell = cell_k.tile_hash_32(lat, lng).astype(np.int64)  # the spatial index
    rows, areas = _FIXTURE_INDEX.lookup(lat, lng)
    lat, lng = lat[rows], lng[rows]
    tx, ty = tile_k.latlng_tile(lat, lng, tile_zoom)
    return pa.table(
        {
            "doc_id": pa.array(d_rep[rows]),
            "pt_idx": pa.array(pt_idx[rows]),
            "cell": pa.array(cell[rows]),
            "area_id": pa.array(areas),
            "tile_x": pa.array(tx.astype(np.int64)),
            "tile_y": pa.array(ty.astype(np.int64)),
        }
    )


def flagship(sf_dir: str, replicate: int = 1, use_actors: bool = False, concurrency=(2, 8)):
    """Full PIP-join + tile-assignment pipeline; returns the join Dataset.

    ``use_actors=True`` runs the join as an actor pool with a broadcast
    compiled polygon index (the at-scale configuration); the default
    task-based form avoids actor-pool startup latency on tiny inputs.
    """
    ds = points_dataset(sf_dir, replicate=replicate)
    if use_actors:
        import ray

        ref = ray.put(None)  # built-in fixture polygons; swap for a real table ref
        ds = ds.map_batches(
            pip_join.PipJoiner,
            fn_constructor_kwargs={"polygons_ref": ref},
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=64 * 1024,
            concurrency=concurrency,
        )
    else:
        ds = ds.map_batches(
            pip_join.pip_join_batch, batch_format="pyarrow", zero_copy_batch=True
        )
    return ds


def flagship_fused(sf_dir: str, replicate: int = 1):
    """The fused-kernel flagship: identical rows to flagship(), one UDF."""
    # batch_size=None = whole zero-copy block per call: Ray's batch slicer
    # re-concatenates chunks for any fixed batch_size (measured 23s vs 190s
    # at batch_size=65536 for the same job); block size is set by the input
    # sharding instead.
    return doc_ids_dataset(sf_dir, replicate).map_batches(
        flagship_fused_batch, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )


def documents_with_spans(sf_dir: str) -> "rd.Dataset":
    """documents + synthesized interleaved spans payload (input_hint shape)."""
    ds = read_documents(sf_dir, columns=("doc_id", "text"))
    return ds.map_batches(spans.synthesize_spans, batch_format="pyarrow", zero_copy_batch=True)


def flagship_spans(sf_dir: str, cell_zoom: int = 8, tile_zoom: int = 14):
    """The spans-DRIVEN flagship: geo points are exploded from the ACTUAL
    spans struct column (kind == 'geo' entries of the interleaved payload),
    carried through cell assignment, the PIP join and tile assignment, and
    the span-sequence invariant (offset order + media_ref identity per row)
    is asserted IN-PIPELINE on the join output before the carried span
    columns are dropped. Output rows are identical to the arithmetic-derive
    ``flagship()`` (same oracle)."""
    ds = documents_with_spans(sf_dir)
    ds = ds.map_batches(
        spans.explode_points_from_spans, batch_format="pyarrow", zero_copy_batch=True
    )
    ds = ds.map_batches(
        cells.assign_cells, fn_kwargs={"zoom": cell_zoom}, batch_format="pyarrow",
        zero_copy_batch=True,
    )
    ds = ds.map_batches(
        cells.assign_tiles, fn_kwargs={"zoom": tile_zoom}, batch_format="pyarrow",
        zero_copy_batch=True,
    )
    ds = ds.map_batches(pip_join.pip_join_batch, batch_format="pyarrow", zero_copy_batch=True)
    return ds.map_batches(
        spans.verify_span_invariant, batch_format="pyarrow", zero_copy_batch=True
    )

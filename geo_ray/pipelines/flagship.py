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


def points_dataset(sf_dir: str, replicate: int = 1, cell_zoom: int = 8, tile_zoom: int = 14):
    """documents -> derived geo points with cell + tile assignment."""
    ds = read_documents(sf_dir, columns=("doc_id",))
    if replicate > 1:
        ds = ds.map_batches(
            spans.replicate_docs, fn_kwargs={"factor": replicate}, batch_format="pyarrow"
        )
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


def documents_with_spans(sf_dir: str) -> "rd.Dataset":
    """documents + synthesized interleaved spans payload (input_hint shape)."""
    ds = read_documents(sf_dir, columns=("doc_id", "text"))
    return ds.map_batches(spans.synthesize_spans, batch_format="pyarrow", zero_copy_batch=True)

"""User-extension surface: a named registry of batch kernels (SURVEY §2.6).

The reference's extension points are C++ templates; the engine's are plain
callables ``fn(pa.Table, **kwargs) -> pa.Table``. Registering one makes it
addressable by name in pipeline specs::

    from geo_ray import registry

    @registry.kernel("my_op")
    def my_op(batch, factor=2): ...

    ds = registry.apply(ds, "my_op", factor=3)   # zero-copy map_batches

Built-in stages self-register below, so ``registry.names()`` is the runtime
operator catalog.
"""

from __future__ import annotations

from collections.abc import Callable

_KERNELS: dict[str, Callable] = {}


def kernel(name: str):
    """Decorator: register a batch kernel under ``name``."""

    def deco(fn: Callable) -> Callable:
        register(name, fn)
        return fn

    return deco


def register(name: str, fn: Callable) -> None:
    if name in _KERNELS and _KERNELS[name] is not fn:
        raise ValueError(f"kernel {name!r} already registered")
    _KERNELS[name] = fn


def get(name: str) -> Callable:
    try:
        return _KERNELS[name]
    except KeyError:
        raise KeyError(f"unknown kernel {name!r}; known: {sorted(_KERNELS)}") from None


def names() -> list[str]:
    return sorted(_KERNELS)


def apply(ds, name: str, *, batch_size=None, **kwargs):
    """``ds.map_batches(get(name), **kwargs)`` with the engine defaults
    (zero-copy Arrow batches, whole-block batch size)."""
    return ds.map_batches(
        get(name),
        fn_kwargs=kwargs,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
    )


def _register_builtins() -> None:
    from geo_ray.stages import cells, media, spans, text
    from geo_ray.stages.dedup import minhash_bands, simhash64
    from geo_ray.stages.graph import edge_slots
    from geo_ray.stages.segjoin import doc_segments, explode_cover_cells
    from geo_ray.stages.tiling import lines_to_tile_rows

    for name, fn in {
        "doc_segments": doc_segments,
        "segment_cover_cells": explode_cover_cells,
        "edge_slots": edge_slots,
        "synthesize_spans": spans.synthesize_spans,
        "explode_points": spans.explode_points,
        "assign_cells": cells.assign_cells,
        "assign_tiles": cells.assign_tiles,
        "token_count": text.token_count,
        "quality_score": text.quality_score,
        "stopword_hits": text.stopword_hits,
        "lang_id": text.lang_id,
        "fingerprint": text.fingerprint,
        "minhash_bands": minhash_bands,
        "simhash64": simhash64,
        "extract_media_spans": media.extract_media_spans,
        "fetch_media_payloads": media.fetch_payloads,
        "media_resize_plan": media.resize_plan,
        "lines_to_tile_rows": lines_to_tile_rows,
    }.items():
        register(name, fn)


_register_builtins()

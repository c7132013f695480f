"""Span synthesis + geo-point explosion stages (map_batches callables).

The driving table shape (BASELINE.json ``input_hint``) is
``doc_id:string-ish, spans:list<struct<kind,text,media_ref,offset>>``. The
sandbox ``documents`` parquet has no spans column, so ``synthesize_spans``
builds it deterministically from ``doc_id`` + ``text`` (pure arithmetic — no
RNG), giving every pipeline a real interleaved text+media payload to carry.

Per-row invariant (SURVEY.md §1.3): the span sequence (kind, text, media_ref,
order) is attached once and NEVER rewritten by later stages — geometry columns
are derived (from doc_id, geo_ray.sources.derive) and appended, the spans
column passes through Arrow batches zero-copy.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from geo_ray.sources import derive

SPAN_TYPE = pa.struct(
    [
        ("kind", pa.string()),
        ("text", pa.string()),
        ("media_ref", pa.string()),
        ("offset", pa.int32()),
    ]
)


def synthesize_spans(batch: pa.Table) -> pa.Table:
    """documents(doc_id, text, ...) -> + spans list<struct<kind,text,media_ref,offset>>.

    Layout per doc: span 0 = the text payload; doc_id % 3 == 0 docs get one
    image span; then one geo span per derived point (doc_id % 4 of them).
    Fully vectorized (NumPy/Arrow); no Python per-row loop.
    """
    doc_id = batch["doc_id"].to_numpy().astype(np.int64)
    n = doc_id.size
    has_img = (doc_id % 3 == 0).astype(np.int64)
    n_geo = doc_id % 4
    counts = 1 + has_img + n_geo
    offsets = np.concatenate([[0], np.cumsum(counts)])
    total = int(offsets[-1])

    row_of = np.repeat(np.arange(n, dtype=np.int64), counts)
    pos = np.arange(total, dtype=np.int64) - np.repeat(offsets[:-1], counts)

    is_text = pos == 0
    is_img = (pos == 1) & (has_img[row_of] == 1)
    is_geo = ~is_text & ~is_img

    kind = np.where(is_text, "text", np.where(is_img, "image", "geo"))
    doc_str = doc_id[row_of].astype("U20")
    media = np.where(
        is_img,
        np.char.add("media://img/", doc_str),
        np.where(is_geo, np.char.add("geo://", doc_str), ""),
    )

    text_col = batch["text"].to_numpy(zero_copy_only=False)
    texts = np.where(is_text, text_col[row_of], "")

    struct = pa.StructArray.from_arrays(
        [
            pa.array(kind, type=pa.string()),
            pa.array(texts, type=pa.string()),
            pa.array(media, type=pa.string()),
            pa.array(pos.astype(np.int32), type=pa.int32()),
        ],
        fields=list(SPAN_TYPE),
    )
    spans = pa.ListArray.from_arrays(pa.array(offsets, type=pa.int32()), struct)
    return batch.append_column("spans", spans)


def explode_points(batch: pa.Table, keep_columns=("doc_id",)) -> pa.Table:
    """One output row per derived geo point: (doc_id, pt_idx, lat, lng).

    Geometry is derived from doc_id (geo_ray.sources.derive) — the spans
    payload is not consulted or rewritten; pass-through columns are gathered
    with an Arrow ``take`` (payload stays Arrow, never Python objects).
    """
    doc_id = batch["doc_id"].to_numpy().astype(np.int64)
    n_pts = doc_id % 4
    take_idx = np.repeat(np.arange(doc_id.size, dtype=np.int64), n_pts)
    d_rep, pt_idx, lat, lng = derive.derive_points(doc_id)
    cols = {
        "doc_id": pa.array(d_rep),
        "pt_idx": pa.array(pt_idx),
        "lat": pa.array(lat),
        "lng": pa.array(lng),
    }
    for name in keep_columns:
        if name != "doc_id" and name in batch.column_names:
            cols[name] = pc.take(batch[name].combine_chunks(), pa.array(take_idx))
    return pa.table(cols)


def explode_points_from_spans(batch: pa.Table, check: bool = True) -> pa.Table:
    """One output row per GEO SPAN of the interleaved spans payload:
    (doc_id, pt_idx, lat, lng, span_offset, media_ref).

    This is the spans-DRIVEN explode (the north-rule contract: points are
    *carried by spans*): geo rows come from scanning the actual
    ``spans`` struct column for ``kind == 'geo'`` entries — fully vectorized
    off the list offsets and the struct children — not from arithmetic on
    doc_id. ``pt_idx`` is the 1-based rank of the geo span within its
    document (list order); coordinates are the deterministic geocode of
    (doc_id, pt_idx). ``span_offset``/``media_ref`` carry the span identity
    through the pipeline so the span-sequence invariant can be asserted on
    the JOIN OUTPUT (``verify_span_invariant``).

    ``check=True`` asserts the per-doc geo span count matches the payload
    contract (doc_id % 4) at explode time.
    """
    spans_col = batch["spans"]
    if isinstance(spans_col, pa.ChunkedArray):
        spans_col = spans_col.combine_chunks()
    offs = np.asarray(spans_col.offsets).astype(np.int64)
    flat = spans_col.flatten()
    is_geo = np.asarray(pc.equal(flat.field("kind"), "geo"))
    n = batch.num_rows
    doc_id = batch["doc_id"].to_numpy().astype(np.int64)
    counts = np.diff(offs)
    doc_of = np.repeat(np.arange(n, dtype=np.int64), counts)
    geo_sel = np.flatnonzero(is_geo)
    cg = np.concatenate([[0], np.cumsum(is_geo)])
    per_doc_geo = (cg[offs[1:]] - cg[offs[:-1]]).astype(np.int64)
    if check and not (per_doc_geo == doc_id % 4).all():
        raise AssertionError("span-sequence invariant violated: geo span count != doc_id % 4")
    starts = np.concatenate([[0], np.cumsum(per_doc_geo)[:-1]])
    nz = per_doc_geo > 0
    pt_idx = (
        np.arange(geo_sel.size, dtype=np.int64)
        - np.repeat(starts[nz], per_doc_geo[nz])
        + 1
    )
    d_rep = doc_id[doc_of[geo_sel]]
    lat, lng = derive.point_coords(d_rep, pt_idx)
    span_offset = np.asarray(flat.field("offset"))[geo_sel].astype(np.int64)
    media_ref = pc.take(flat.field("media_ref"), pa.array(geo_sel))
    return pa.table(
        {
            "doc_id": pa.array(d_rep),
            "pt_idx": pa.array(pt_idx),
            "lat": pa.array(lat),
            "lng": pa.array(lng),
            "span_offset": pa.array(span_offset),
            "media_ref": media_ref,
        }
    )


def verify_span_invariant(batch: pa.Table, drop: bool = True) -> pa.Table:
    """Assert per-row span-sequence identity on a (join-output) batch that
    carried ``span_offset``/``media_ref`` from ``explode_points_from_spans``:
    the media_ref must still be the geo ref of its OWN document, and the
    span offset must equal the span's position in the synthesized layout
    (text span, optional image span, then geo spans in pt_idx order). With
    ``drop=True`` the carried columns are removed after the check, restoring
    the plain join schema."""
    doc_id = batch["doc_id"].to_numpy().astype(np.int64)
    pt_idx = batch["pt_idx"].to_numpy().astype(np.int64)
    span_offset = batch["span_offset"].to_numpy().astype(np.int64)
    want_offset = 1 + (doc_id % 3 == 0).astype(np.int64) + (pt_idx - 1)
    if not (span_offset == want_offset).all():
        raise AssertionError("span-sequence invariant violated: span offset order")
    want_ref = np.char.add("geo://", doc_id.astype("U20"))
    got_ref = batch["media_ref"].to_numpy(zero_copy_only=False).astype("U32")
    if not (got_ref == want_ref).all():
        raise AssertionError("span-sequence invariant violated: media_ref identity")
    if drop:
        batch = batch.drop_columns(["span_offset", "media_ref"])
    return batch


def replicate_docs(batch: pa.Table, factor: int, stride: int = 10_000_000) -> pa.Table:
    """Deterministically amplify a documents batch ``factor``x for scale tests:
    copy k gets doc_id + k*stride (distinct ids -> distinct derived geometry)."""
    if factor <= 1:
        return batch
    n = batch.num_rows
    idx = np.tile(np.arange(n, dtype=np.int64), factor)
    out = batch.take(pa.array(idx))
    doc_id = out["doc_id"].to_numpy().astype(np.int64).copy()
    doc_id += np.repeat(np.arange(factor, dtype=np.int64) * stride, n)
    return out.set_column(out.schema.get_field_index("doc_id"), "doc_id", pa.array(doc_id))

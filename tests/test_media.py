"""Media stages: stub payload format, vectorized decode, actor-pool plumbing."""

import numpy as np
import pyarrow as pa
import pytest

from geo_ray.stages import media

DOCS = pa.table({"doc_id": pa.array([0, 3, 6, 9, 300, 999], type=pa.int64())})


def _decoded(batch=DOCS):
    spans = media.extract_media_spans(batch)
    with_payload = media.fetch_payloads(spans)
    return spans, with_payload, media.MediaDecoder()(with_payload)


def test_extract_media_spans_layout():
    spans = media.extract_media_spans(DOCS)
    # doc_id % 3 == 0 docs carry exactly one image span at position 1
    assert spans["doc_id"].to_pylist() == [0, 3, 6, 9, 300, 999]
    assert spans["span_idx"].to_pylist() == [1] * 6
    assert spans["media_ref"][0].as_py() == "media://img/0"


def test_payload_roundtrip_header():
    _, wp, out = _decoded()
    doc = np.array([0, 3, 6, 9, 300, 999])
    w, h, c = media.media_dims(doc)
    assert (out["width"].to_numpy() == w).all()
    assert (out["height"].to_numpy() == h).all()
    assert (out["channels"].to_numpy() == c).all()
    # payload dropped, histogram sums to pixel count
    assert "payload" not in out.column_names
    hist = np.stack([np.asarray(x) for x in out["byte_hist"].to_pylist()])
    assert (hist.sum(axis=1) == media.PIXEL_BYTES).all()
    # histogram matches a scalar recount for one row
    payload = wp["payload"][1].as_py()
    pix = np.frombuffer(payload[media.HEADER_LEN :], dtype=np.uint8)
    assert (hist[1] == np.bincount(pix >> 5, minlength=8)).all()


def test_bad_magic_raises():
    spans = media.extract_media_spans(DOCS)
    wp = media.fetch_payloads(spans)
    bad = wp.set_column(
        wp.schema.get_field_index("payload"),
        "payload",
        pa.array([b"XXXX" + b"\x00" * 5] * wp.num_rows, type=pa.binary()),
    )
    with pytest.raises(ValueError, match="magic"):
        media.MediaDecoder()(bad)


def test_unavailable_backend_raises():
    with pytest.raises((NotImplementedError, ValueError)):
        media.MediaDecoder(backend="ffmpeg")


def test_resize_plan_aspect():
    _, _, out = _decoded()
    planned = media.resize_plan(out, max_side=128)
    tw = planned["target_w"].to_numpy()
    th = planned["target_h"].to_numpy()
    assert (np.maximum(tw, th) <= 128).all()
    # no upscale: dims <= originals
    assert (tw <= planned["width"].to_numpy()).all()


def test_actor_pool_decode(ray_session):
    """The at-scale form: map_batches(MediaDecoder, concurrency=N) — class
    passed (not instance), __init__ once per actor."""
    import ray.data as rd

    ds = rd.from_arrow(DOCS)
    ds = ds.map_batches(media.extract_media_spans, batch_format="pyarrow")
    ds = ds.map_batches(media.fetch_payloads, batch_format="pyarrow")
    ds = ds.map_batches(
        media.MediaDecoder,
        fn_constructor_kwargs={"backend": "stub"},
        batch_format="pyarrow",
        concurrency=2,
        batch_size=4,
    )
    out = ds.to_pandas()
    assert len(out) == 6 and {"width", "height", "channels"} <= set(out.columns)

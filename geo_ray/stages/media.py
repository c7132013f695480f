"""Multimodal media stages: opaque binary payloads + actor-pool decode.

Images/audio/video are opaque ``binary`` columns with typed metadata; decode /
feature-extract run as an ACTOR-POOL ``map_batches`` stage (model/codec load
happens once per actor in ``__init__``). The container has no image/audio
libraries, so the real decoder backends raise ``NotImplementedError`` and the
default backend is a deterministic STUB format:

    payload = b"FIMG" + uint16le width + uint16le height + uint8 channels
              + pixel bytes (deterministic per media_ref)

with width = 64 + doc_id % 192, height = 64 + doc_id % 128, channels =
1 + doc_id % 3 — arithmetic on purpose, so the decode output has an exact SQL
oracle. The Ray-side plumbing (schema, batch size, actor signature, zero-copy
binary columns, output layout) is real and tested.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

MAGIC = b"FIMG"
HEADER_LEN = 9  # 4 magic + 2 width + 2 height + 1 channels
PIXEL_BYTES = 247  # keep payloads small but non-trivial


def media_dims(doc_id: np.ndarray):
    """The stub format's deterministic dimensions (the SQL-oracle contract)."""
    doc_id = np.asarray(doc_id, dtype=np.int64)
    width = 64 + doc_id % 192
    height = 64 + doc_id % 128
    channels = 1 + doc_id % 3
    return width, height, channels


def extract_media_spans(batch: pa.Table) -> pa.Table:
    """documents(+spans) -> one row per media span: (doc_id, span_idx,
    media_ref). Mirrors spans.synthesize_spans' layout (docs with
    doc_id % 3 == 0 carry one image span at span position 1)."""
    doc_id = batch["doc_id"].to_numpy().astype(np.int64)
    has = doc_id % 3 == 0
    docs = doc_id[has]
    refs = np.char.add("media://img/", docs.astype("U20"))
    return pa.table(
        {
            "doc_id": pa.array(docs),
            "span_idx": pa.array(np.ones(docs.size, dtype=np.int32)),
            "media_ref": pa.array(refs.tolist(), type=pa.string()),
        }
    )


def fetch_payloads(batch: pa.Table) -> pa.Table:
    """Materialize the opaque binary payload per media_ref (at scale this is
    the object-storage read; here the deterministic stub bytes)."""
    doc_id = batch["doc_id"].to_numpy().astype(np.int64)
    w, h, c = media_dims(doc_id)
    n = doc_id.size
    # vectorized payload build: fixed-size (HEADER_LEN + PIXEL_BYTES) rows
    buf = np.zeros((n, HEADER_LEN + PIXEL_BYTES), dtype=np.uint8)
    buf[:, 0:4] = np.frombuffer(MAGIC, dtype=np.uint8)
    buf[:, 4] = w & 0xFF
    buf[:, 5] = (w >> 8) & 0xFF
    buf[:, 6] = h & 0xFF
    buf[:, 7] = (h >> 8) & 0xFF
    buf[:, 8] = c
    # deterministic pixels: (doc_id*31 + i*7) mod 256
    i = np.arange(PIXEL_BYTES, dtype=np.int64)
    buf[:, HEADER_LEN:] = ((doc_id[:, None] * 31 + i[None, :] * 7) % 256).astype(np.uint8)
    flat = buf.reshape(-1)
    offsets = pa.array(np.arange(n + 1, dtype=np.int32) * (HEADER_LEN + PIXEL_BYTES))
    payload = pa.BinaryArray.from_buffers(
        pa.binary(), n, [None, offsets.buffers()[1], pa.py_buffer(flat.tobytes())]
    )
    return batch.append_column("payload", payload)


class MediaDecoder:
    """Actor-pool stage: parse/decode media payloads, emit typed metadata +
    a small feature vector. ``backend="stub"`` parses the FIMG header and
    computes an 8-bin byte histogram of the pixel bytes; real backends
    (``"pil"``, ``"ffmpeg"``) raise NotImplementedError unless their import
    succeeds (they are not in this container).
    """

    def __init__(self, backend: str = "stub"):
        self.backend = backend
        if backend == "pil":
            try:
                from PIL import Image  # noqa: F401
            except ImportError as e:  # pragma: no cover - not in container
                raise NotImplementedError("PIL backend unavailable in this environment") from e
        elif backend == "ffmpeg":  # pragma: no cover
            raise NotImplementedError("ffmpeg backend unavailable in this environment")
        elif backend != "stub":
            raise ValueError(f"unknown backend {backend!r}")

    def __call__(self, batch: pa.Table) -> pa.Table:
        payload = batch["payload"].combine_chunks()
        n = len(payload)
        offs = np.frombuffer(payload.buffers()[1], dtype=np.int32)[
            payload.offset : payload.offset + n + 1
        ]
        data = np.frombuffer(payload.buffers()[2], dtype=np.uint8)
        # header parse, vectorized over fixed offsets
        base = offs[:-1].astype(np.int64)
        magic_ok = (
            (data[base] == MAGIC[0])
            & (data[base + 1] == MAGIC[1])
            & (data[base + 2] == MAGIC[2])
            & (data[base + 3] == MAGIC[3])
        )
        if not magic_ok.all():
            raise ValueError("bad media payload magic")
        width = data[base + 4].astype(np.int64) | (data[base + 5].astype(np.int64) << 8)
        height = data[base + 6].astype(np.int64) | (data[base + 7].astype(np.int64) << 8)
        channels = data[base + 8].astype(np.int64)
        # 8-bin histogram feature over the pixel bytes (vectorized bincount)
        lens = (offs[1:] - offs[:-1]).astype(np.int64) - HEADER_LEN
        pix_idx = np.repeat(base + HEADER_LEN, lens) + (
            np.arange(int(lens.sum()), dtype=np.int64)
            - np.repeat(np.cumsum(lens) - lens, lens)
        )
        row_of = np.repeat(np.arange(n, dtype=np.int64), lens)
        bins = data[pix_idx] >> 5
        hist = np.zeros((n, 8), dtype=np.int64)
        np.add.at(hist, (row_of, bins), 1)
        feat = pa.FixedSizeListArray.from_arrays(pa.array(hist.reshape(-1)), 8)
        out = batch.drop_columns(["payload"])
        out = out.append_column("width", pa.array(width))
        out = out.append_column("height", pa.array(height))
        out = out.append_column("channels", pa.array(channels))
        return out.append_column("byte_hist", feat)


def resize_plan(batch: pa.Table, max_side: int = 128) -> pa.Table:
    """Typed-metadata resize stage (stub): compute target dims preserving
    aspect ratio — the real kernel would transform pixels; the plumbing
    (schema in/out) is what's exercised here."""
    w = batch["width"].to_numpy()
    h = batch["height"].to_numpy()
    scale = np.minimum(1.0, max_side / np.maximum(w, h))
    # floor(x+0.5), not np.round: half-away-from-zero like SQL ROUND (banker's
    # rounding would diverge from the DuckDB oracle on exact .5 scales)
    tw = np.maximum(1, np.floor(w * scale + 0.5)).astype(np.int64)
    th = np.maximum(1, np.floor(h * scale + 0.5)).astype(np.int64)
    return batch.append_column("target_w", pa.array(tw)).append_column("target_h", pa.array(th))

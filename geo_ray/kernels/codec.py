"""Google encoded-polyline codec, precisions 0-7, vectorized.

Reference semantics (include/geo/polyline_format.h):
- encode ``push``: ``llround(coord * 10^p)`` absolute values, delta + zig-zag +
  5-bit groups offset by 63 (:30-39, :60-81). llround = half away from zero.
- ``push_nonzero_diff`` uses ``llrint`` (round half to even) and drops deltas
  within a simplification threshold (:41-58).
- decode (:114-146): little-endian 5-bit chunks, continuation bit 0x20; an odd
  trailing group yields a 0 longitude delta (read on an empty range returns 0).

Conformance: golden strings from test/polyline_format_test.cc.
"""

from __future__ import annotations

import numpy as np


def _llround(v: np.ndarray) -> np.ndarray:
    """C llround: round half away from zero -> int64."""
    return (np.sign(v) * np.floor(np.abs(v) + 0.5)).astype(np.int64)


def _llrint(v: np.ndarray) -> np.ndarray:
    """C llrint under default rounding: round half to even -> int64."""
    return np.rint(v).astype(np.int64)


def _zigzag(v: np.ndarray) -> np.ndarray:
    v = v.astype(np.int64)
    return np.bitwise_xor(np.left_shift(v, 1), np.right_shift(v, 63)).astype(np.uint64)


def _unzigzag(u: np.ndarray) -> np.ndarray:
    u = u.astype(np.uint64)
    return np.where(
        np.bitwise_and(u, np.uint64(1)).astype(bool),
        np.bitwise_not(np.right_shift(u, np.uint64(1)).astype(np.int64)),
        np.right_shift(u, np.uint64(1)).astype(np.int64),
    )


def encode_deltas(deltas: np.ndarray) -> bytes:
    """Encode an int64 delta array into the 5-bit varint byte stream."""
    tmp = _zigzag(np.asarray(deltas, dtype=np.int64))
    n = tmp.size
    if n == 0:
        return b""
    # chunk count per value (>= 1)
    lens = np.ones(n, dtype=np.int64)
    rest = np.right_shift(tmp, np.uint64(5))
    while rest.any():
        lens[rest != 0] += 1
        rest = np.right_shift(rest, np.uint64(5))
    max_len = int(lens.max())
    chars = np.zeros((n, max_len), dtype=np.uint8)
    t = tmp.copy()
    for k in range(max_len):
        curr = np.bitwise_and(t, np.uint64(0x1F))
        rest = np.right_shift(t, np.uint64(5))
        chars[:, k] = (np.where(rest != 0, np.bitwise_or(curr, np.uint64(0x20)), curr) + np.uint64(63)).astype(np.uint8)
        t = rest
    mask = np.arange(max_len)[None, :] < lens[:, None]
    return chars[mask].tobytes()


def encode_polyline(lat, lng, precision: int = 5) -> str:
    """Encode one polyline (coordinate arrays) to a string."""
    if not 0 <= precision <= 7:
        raise ValueError("unsupported precision for polyline encoder. supported are [0, 7]")
    scale = 10**precision
    lat_i = _llround(np.asarray(lat, dtype=np.float64) * scale)
    lng_i = _llround(np.asarray(lng, dtype=np.float64) * scale)
    deltas = np.empty(lat_i.size * 2, dtype=np.int64)
    deltas[0::2] = np.diff(lat_i, prepend=np.int64(0))
    deltas[1::2] = np.diff(lng_i, prepend=np.int64(0))
    return encode_deltas(deltas).decode("ascii")


def decode_deltas(data: bytes) -> np.ndarray:
    """Decode the 5-bit varint byte stream into an int64 delta array."""
    arr = np.frombuffer(data.encode("ascii") if isinstance(data, str) else data, dtype=np.uint8)
    if arr.size == 0:
        return np.zeros(0, dtype=np.int64)
    raw = arr.astype(np.uint64) - np.uint64(63)
    is_end = np.bitwise_and(raw, np.uint64(0x20)) == 0
    starts = np.concatenate([[0], np.flatnonzero(is_end)[:-1] + 1])
    pos = np.arange(raw.size, dtype=np.int64) - np.repeat(starts, np.diff(np.concatenate([starts, [raw.size]])))
    chunk = np.left_shift(np.bitwise_and(raw, np.uint64(0x1F)), (np.uint64(5) * pos.astype(np.uint64)))
    groups = np.add.reduceat(chunk.view(np.int64), starts).view(np.uint64)
    return _unzigzag(groups)


def decode_polyline(s, precision: int = 5):
    """Decode a string to (lat, lng) float64 arrays."""
    scale = 10**precision
    vals = decode_deltas(s)
    if vals.size % 2 == 1:
        vals = np.concatenate([vals, np.zeros(1, dtype=np.int64)])
    lat = np.cumsum(vals[0::2]).astype(np.float64) / scale
    lng = np.cumsum(vals[1::2]).astype(np.float64) / scale
    return lat, lng


def encode_polylines_batch(lat_values, lng_values, offsets, precision: int = 5):
    """Encode many polylines (list columns: flat values + offsets) -> list[str].

    The delta/zigzag/varint stage runs vectorized over ALL vertices at once;
    only the final per-row byte-slicing is a Python loop.
    """
    if not 0 <= precision <= 7:
        raise ValueError("unsupported precision for polyline encoder. supported are [0, 7]")
    scale = 10**precision
    offsets = np.asarray(offsets, dtype=np.int64)
    lat_i = _llround(np.asarray(lat_values, dtype=np.float64) * scale)
    lng_i = _llround(np.asarray(lng_values, dtype=np.float64) * scale)
    n_pts = lat_i.size
    if n_pts == 0:
        return ["" for _ in range(offsets.size - 1)]
    dlat = np.diff(lat_i, prepend=np.int64(0))
    dlng = np.diff(lng_i, prepend=np.int64(0))
    starts = offsets[:-1]
    valid = starts < offsets[1:]
    dlat[starts[valid]] = lat_i[starts[valid]]  # each row restarts from (0, 0)
    dlng[starts[valid]] = lng_i[starts[valid]]
    deltas = np.empty(n_pts * 2, dtype=np.int64)
    deltas[0::2] = dlat
    deltas[1::2] = dlng

    tmp = _zigzag(deltas)
    lens = np.ones(tmp.size, dtype=np.int64)
    rest = np.right_shift(tmp, np.uint64(5))
    while rest.any():
        lens[rest != 0] += 1
        rest = np.right_shift(rest, np.uint64(5))
    max_len = int(lens.max())
    chars = np.zeros((tmp.size, max_len), dtype=np.uint8)
    t = tmp.copy()
    for k in range(max_len):
        curr = np.bitwise_and(t, np.uint64(0x1F))
        rest = np.right_shift(t, np.uint64(5))
        chars[:, k] = (np.where(rest != 0, np.bitwise_or(curr, np.uint64(0x20)), curr) + np.uint64(63)).astype(np.uint8)
        t = rest
    mask = np.arange(max_len)[None, :] < lens[:, None]
    flat = chars[mask]  # all bytes, row-major by delta value
    # byte offset of each delta value, then of each row
    byte_starts = np.concatenate([[0], np.cumsum(lens)])
    out = []
    for i in range(offsets.size - 1):
        b0 = byte_starts[2 * offsets[i]]
        b1 = byte_starts[2 * offsets[i + 1]]
        out.append(flat[b0:b1].tobytes().decode("ascii"))
    return out


def encode_polyline_nonzero(lat, lng, precision: int = 5, simplification: int = 0):
    """``push_nonzero_diff`` encode (polyline_format.h:41-58): quantize with
    llrint (round half to even — note ``push`` uses llround instead), keep a
    point only when either quantized delta to the last KEPT point exceeds
    ``simplification``, encode the kept deltas. The encoder state starts at
    (0, 0), so even the first point is subject to the threshold — faithful to
    the reference. Returns (encoded_string, kept_mask)."""
    scale = 10.0 ** precision
    qlat = _llrint(np.asarray(lat, dtype=np.float64) * scale)
    qlng = _llrint(np.asarray(lng, dtype=np.float64) * scale)
    n = qlat.size
    kept = np.zeros(n, dtype=bool)
    deltas = []
    last_lat = 0
    last_lng = 0
    for i in range(n):  # data-dependent running state: inherently sequential
        dlat = int(qlat[i]) - last_lat
        dlng = int(qlng[i]) - last_lng
        if abs(dlat) > simplification or abs(dlng) > simplification:
            deltas.append(dlat)
            deltas.append(dlng)
            last_lat = int(qlat[i])
            last_lng = int(qlng[i])
            kept[i] = True
    enc = encode_deltas(np.asarray(deltas, dtype=np.int64)) if deltas else b""
    return enc.decode("ascii"), kept

"""Vectorized string hashing for the dedup / fingerprint stages.

FNV-1a (64-bit) over UTF-8 bytes, computed for a whole batch of tokens at once
by looping over byte COLUMNS of a fixed-width ``S``-dtype matrix instead of
over tokens — max-token-width iterations of full-width NumPy ops, never a
Python loop per token. Bit-identical to the scalar definition

    h = 14695981039346656037
    for b in token_bytes: h = ((h ^ b) * 1099511628211) mod 2^64
"""

from __future__ import annotations

import numpy as np

FNV_OFFSET = np.uint64(14695981039346656037)
FNV_PRIME = np.uint64(1099511628211)


def fnv1a_bytes(tokens: list[bytes]) -> np.ndarray:
    """FNV-1a 64 of each byte string (vectorized across tokens)."""
    n = len(tokens)
    if n == 0:
        return np.zeros(0, dtype=np.uint64)
    mat = np.array(tokens, dtype="S")  # zero-padded fixed-width byte matrix
    width = mat.dtype.itemsize
    view = mat.view(np.uint8).reshape(n, width)
    # UTF-8 text tokens contain no interior NUL: length = count of non-zero.
    lens = np.count_nonzero(view, axis=1)
    h = np.full(n, FNV_OFFSET, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for col in range(width):
            active = col < lens
            nh = (h ^ view[:, col].astype(np.uint64)) * FNV_PRIME
            h = np.where(active, nh, h)
    return h


def token_hashes_arrow(col, min_tokens: int = 0):
    """Arrow-native variant of :func:`batch_token_hashes`: tokenize with
    ``pc.utf8_split_whitespace`` and hash straight off the flat string buffer
    — zero Python work per token. Same (hashes, offsets) contract and the
    same FNV-1a values."""
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    toks = pc.utf8_split_whitespace(col)
    # drop empty tokens at text edges (pc keeps ""; Python .split() does not)
    flat = toks.flatten()
    doc_counts = np.asarray(toks.value_lengths(), dtype=np.int64)
    voffs = np.frombuffer(flat.buffers()[1], dtype=np.int32)[
        flat.offset : flat.offset + len(flat) + 1
    ].astype(np.int64)
    vbuf = np.frombuffer(flat.buffers()[2], dtype=np.uint8) if flat.buffers()[2] else np.zeros(0, np.uint8)
    lens = np.diff(voffs)
    nonempty = lens > 0
    if not nonempty.all():
        # recompute per-doc counts excluding empty tokens
        doc_of = np.repeat(np.arange(doc_counts.size), doc_counts)
        doc_counts = np.bincount(doc_of[nonempty], minlength=doc_counts.size)
        voffs_keep = voffs[:-1][nonempty]
        lens = lens[nonempty]
    else:
        voffs_keep = voffs[:-1]
    t = lens.size
    if t == 0:
        hashes = np.zeros(0, dtype=np.uint64)
    else:
        w = int(lens.max())
        mat = np.zeros((t, w), dtype=np.uint8)
        byte_row = np.repeat(np.arange(t, dtype=np.int64), lens)
        byte_col = np.arange(int(lens.sum()), dtype=np.int64) - np.repeat(
            np.cumsum(lens) - lens, lens
        )
        src = np.repeat(voffs_keep, lens) + byte_col
        mat[byte_row, byte_col] = vbuf[src]
        h = np.full(t, FNV_OFFSET, dtype=np.uint64)
        with np.errstate(over="ignore"):
            for cidx in range(w):
                active = cidx < lens
                nh = (h ^ mat[:, cidx].astype(np.uint64)) * FNV_PRIME
                h = np.where(active, nh, h)
        hashes = h
    offsets = np.zeros(doc_counts.size + 1, dtype=np.int64)
    np.cumsum(doc_counts, out=offsets[1:])
    if min_tokens:
        short = doc_counts < min_tokens
        if short.any():
            pad = (min_tokens - doc_counts[short]).astype(np.int64)
            # insert FNV_OFFSET (hash of "") at the end of each short doc's run
            ins_pos = np.repeat(offsets[1:][short], pad)
            hashes = np.insert(hashes, ins_pos, FNV_OFFSET)
            doc_counts = doc_counts.copy()
            doc_counts[short] = min_tokens
            offsets = np.zeros(doc_counts.size + 1, dtype=np.int64)
            np.cumsum(doc_counts, out=offsets[1:])
    return hashes, offsets


def text_hashes_arrow(col):
    """Two independent 64-bit hashes of each FULL string: the 128-bit
    BLAKE2b digest of its UTF-8 bytes split into two little-endian words,
    computed over zero-copy memoryview slices of the Arrow data buffer.
    Used by hash-first exact dedup so the shuffle key is (h1, h2, len)
    instead of the full text — a pair collision over the 128-bit digest is
    ~2^-128, negligible at any corpus size.

    One C-speed digest call per DOCUMENT (not per byte position): the
    earlier vectorized-FNV suffix loop paid one NumPy dispatch per byte
    position of the LONGEST string, so a single 1 MB document degraded the
    whole batch; BLAKE2b streams each string's bytes in C regardless of
    length. Returns (h1:int64-view, h2:int64-view, lens:int64).
    """
    import hashlib

    import pyarrow as pa

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        z = np.zeros(0, dtype=np.int64)
        return z, z.copy(), z.copy()
    off_dtype = np.int64 if pa.types.is_large_string(col.type) else np.int32
    offs = np.frombuffer(col.buffers()[1], dtype=off_dtype)[
        col.offset : col.offset + n + 1
    ].astype(np.int64)
    data = col.buffers()[2]
    view = memoryview(data) if data is not None else memoryview(b"")
    lens = np.diff(offs)
    h1 = np.empty(n, dtype=np.uint64)
    h2 = np.empty(n, dtype=np.uint64)
    blake2b = hashlib.blake2b
    from_bytes = int.from_bytes
    for i in range(n):
        d = blake2b(view[offs[i] : offs[i + 1]], digest_size=16).digest()
        h1[i] = from_bytes(d[:8], "little")
        h2[i] = from_bytes(d[8:], "little")
    if col.null_count:
        # A null slot has zero-width offsets and would hash like '' — fold the
        # validity bitmap into the key by flipping its len to -1 (ADVICE r2),
        # keeping NULL and '' distinct while all NULLs still group together,
        # matching SQL GROUP BY text semantics.
        nulls = col.is_null().to_numpy(zero_copy_only=False)
        lens = np.where(nulls, np.int64(-1), lens)
    return h1.view(np.int64), h2.view(np.int64), lens


def batch_token_hashes(texts: list[str], min_tokens: int = 0):
    """Whitespace-tokenize every text and hash all tokens in one pass.

    Returns ``(hashes, offsets)``: ``hashes[offsets[i]:offsets[i+1]]`` are the
    FNV-1a hashes of document i's tokens, in order. Documents with fewer than
    ``min_tokens`` tokens are right-padded with the empty-string hash
    (= FNV_OFFSET), matching the scalar shingle path's padding.
    """
    tok_lists = [t.split() for t in texts]
    if min_tokens:
        tok_lists = [
            tl if len(tl) >= min_tokens else tl + [""] * (min_tokens - len(tl))
            for tl in tok_lists
        ]
    counts = np.array([len(tl) for tl in tok_lists], dtype=np.int64)
    offsets = np.zeros(counts.size + 1, dtype=np.int64)
    np.cumsum(counts, out=offsets[1:])
    flat = [tok.encode("utf-8") for tl in tok_lists for tok in tl]
    hashes = fnv1a_bytes(flat)
    # empty-string tokens hash to FNV_OFFSET; np.array(dtype='S') gives them
    # length 0 so the column loop never touches them — already correct.
    return hashes, offsets


def shingle_hashes_flat(token_hashes: np.ndarray, offsets: np.ndarray, k: int = 3):
    """Rolling k-shingle hashes over per-document token-hash runs.

    Polynomial combine ``h = (((th[j]*P + th[j+1])*P + ...)`` with
    P = FNV_PRIME mod 2^64 — identical to the scalar shingle definition.
    Requires every document to have >= k tokens (use ``min_tokens=k`` in
    :func:`batch_token_hashes`). Returns ``(shingles, sh_offsets)`` flat.
    """
    counts = np.diff(offsets)
    if counts.size and counts.min() < k:
        raise ValueError("pad documents to >= k tokens first")
    sh_counts = counts - k + 1
    sh_offsets = np.zeros(counts.size + 1, dtype=np.int64)
    np.cumsum(sh_counts, out=sh_offsets[1:])
    # global rolling combine, then drop windows that cross document borders
    n = token_hashes.size
    if n == 0:
        return np.zeros(0, dtype=np.uint64), sh_offsets
    with np.errstate(over="ignore"):
        out = np.zeros(n - k + 1, dtype=np.uint64)
        for j in range(k):
            out = out * FNV_PRIME + token_hashes[j : n - k + 1 + j]
    # valid window starts per doc (ragged-index trick, no Python loop):
    # starts = offsets[doc] + (global_shingle_pos - sh_offsets[doc])
    total = int(sh_offsets[-1])
    local = np.arange(total, dtype=np.int64) - np.repeat(sh_offsets[:-1], sh_counts)
    starts = np.repeat(offsets[:-1], sh_counts) + local
    return out[starts], sh_offsets

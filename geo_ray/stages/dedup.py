"""Deduplication stages: exact, MinHash+LSH, SimHash, n-gram Jaccard.

All signature computation is per-batch vectorized NumPy; candidate generation
is the LSH band trick (shingle -> minhash -> band -> bucket groupby) so the
wide step shuffles only (band_key, doc_id, signature) rows — never full texts.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

N_HASH = 64
N_BANDS = 16  # 4 rows per band
_ROWS = N_HASH // N_BANDS
_MERSENNE = np.uint64((1 << 61) - 1)


def _shingle_hashes(text: str, k: int = 3):
    """64-bit hashes of word k-shingles (multiply-xor of token hashes)."""
    toks = text.split()
    if len(toks) < k:
        toks = toks + [""] * (k - len(toks))
    th = np.array(
        [hash_str64(t) for t in toks], dtype=np.uint64
    )
    n = len(toks) - k + 1
    with np.errstate(over="ignore"):
        out = np.zeros(n, dtype=np.uint64)
        for j in range(k):
            out = out * np.uint64(1099511628211) + th[j : j + n]
    return np.unique(out)


def hash_str64(s: str) -> int:
    """Deterministic 64-bit FNV-1a string hash (process-independent)."""
    h = 14695981039346656037
    for b in s.encode("utf-8"):
        h = ((h ^ b) * 1099511628211) & 0xFFFFFFFFFFFFFFFF
    return h


_A = None
_B = None


def _coeffs():
    global _A, _B
    if _A is None:
        rng = np.random.default_rng(12345)
        _A = rng.integers(1, (1 << 61) - 1, N_HASH, dtype=np.uint64) | np.uint64(1)
        _B = rng.integers(0, (1 << 61) - 1, N_HASH, dtype=np.uint64)
    return _A, _B


def minhash_signature(shingles: np.ndarray) -> np.ndarray:
    """64 minhash values of a shingle-hash set (universal hashing mod 2^61-1)."""
    a, b = _coeffs()
    s = shingles.astype(np.uint64) & _MERSENNE
    with np.errstate(over="ignore"):
        # (a*s + b) mod 2^64 is a fine universal-ish family for minhash
        vals = a[None, :] * s[:, None] + b[None, :]
    return vals.min(axis=0)


def minhash_bands(batch: pa.Table) -> pa.Table:
    """documents -> one row per (band, doc): (band_key, doc_id, sig binary).

    band_key packs (band_id, band_hash) into one int64 groupby key; ``sig``
    carries the full signature for downstream verification without re-reading
    the corpus.
    """
    doc_ids = batch["doc_id"].to_numpy()
    texts = batch["text"].to_pylist()
    n = len(texts)
    sigs = np.zeros((n, N_HASH), dtype=np.uint64)
    for i, t in enumerate(texts):
        sigs[i] = minhash_signature(_shingle_hashes(t))
    band_keys = np.zeros((n, N_BANDS), dtype=np.int64)
    with np.errstate(over="ignore"):
        for b in range(N_BANDS):
            chunk = sigs[:, b * _ROWS : (b + 1) * _ROWS]
            h = np.full(n, 14695981039346656037, dtype=np.uint64)
            for r in range(_ROWS):
                h = (h ^ chunk[:, r]) * np.uint64(1099511628211)
            band_keys[:, b] = ((h & np.uint64((1 << 56) - 1)) | (np.uint64(b) << np.uint64(56))).view(
                np.int64
            )
    out_doc = np.repeat(doc_ids, N_BANDS)
    out_key = band_keys.ravel()
    sig_bytes = [sigs[i].tobytes() for i in range(n) for _ in range(N_BANDS)]
    return pa.table(
        {
            "band_key": pa.array(out_key),
            "doc_id": pa.array(out_doc),
            "sig": pa.array(sig_bytes, type=pa.binary()),
        }
    )


def bucket_pairs(group, threshold: float = 0.6):
    """map_groups: emit verified candidate pairs from one LSH bucket.

    Jaccard is estimated from the carried minhash signatures (the at-scale
    verification path — texts never shuffle)."""
    import pandas as pd

    g = group.sort_values("doc_id")
    ids = g["doc_id"].to_numpy()
    if ids.size < 2:
        return pd.DataFrame({"doc_a": [], "doc_b": [], "est_jaccard": []})
    sigs = np.stack([np.frombuffer(s, dtype=np.uint64) for s in g["sig"]])
    # unique docs only (a doc can land in a bucket once per band)
    _, first = np.unique(ids, return_index=True)
    ids = ids[first]
    sigs = sigs[first]
    if ids.size < 2:
        return pd.DataFrame({"doc_a": [], "doc_b": [], "est_jaccard": []})
    iu, ju = np.triu_indices(ids.size, 1)
    est = (sigs[iu] == sigs[ju]).mean(axis=1)
    keep = est >= threshold
    return pd.DataFrame(
        {
            "doc_a": ids[iu[keep]],
            "doc_b": ids[ju[keep]],
            "est_jaccard": np.round(est[keep], 3),
        }
    )


def simhash64(batch: pa.Table) -> pa.Table:
    """64-bit SimHash over whitespace tokens (unweighted)."""
    doc_ids = batch["doc_id"].to_numpy()
    out = np.zeros(len(doc_ids), dtype=np.uint64)
    for i, t in enumerate(batch["text"].to_pylist()):
        toks = set(t.split())
        if not toks:
            continue
        hs = np.array([hash_str64(tok) for tok in toks], dtype=np.uint64)
        bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(
            np.int64
        )
        vote = (2 * bits - 1).sum(axis=0)
        out[i] = np.sum((vote > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64))
    return pa.table({"doc_id": batch["doc_id"], "simhash": pa.array(out.view(np.int64))})


def ngram_jaccard_pairs(group, n: int = 3, threshold: float = 0.5):
    """map_groups: exact word n-gram Jaccard for all pairs in one group."""
    import pandas as pd

    ids = group["doc_id"].to_numpy()
    sets = [set(map(int, _shingle_hashes(t, n))) for t in group["text"]]
    rows = []
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            inter = len(sets[i] & sets[j])
            union = len(sets[i] | sets[j])
            jac = inter / union if union else 0.0
            if jac >= threshold:
                a, b = sorted((int(ids[i]), int(ids[j])))
                rows.append((a, b, round(jac, 3)))
    return pd.DataFrame(rows, columns=["doc_a", "doc_b", "jaccard"])

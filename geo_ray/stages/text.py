"""Text-analysis stages for large-scale corpus pipelines (vectorized).

All counting is done with Arrow's RE2 engine (``pyarrow.compute``) so the
DuckDB oracle (also RE2 via ``regexp_extract_all``) counts identically.
"""

from __future__ import annotations

import numpy as np

from geo_ray.kernels import fixed as fixed_k
import pyarrow as pa
import pyarrow.compute as pc

STOPWORDS = {
    "en": ["the", "of", "and", "to", "in"],
    "de": ["der", "die", "und", "das", "ist"],
    "es": ["el", "la", "de", "que", "y"],
    "fr": ["le", "la", "et", "les", "des"],
}


def _word_alt(words) -> str:
    return r"\b(" + "|".join(words) + r")\b"


def token_count(batch: pa.Table) -> pa.Table:
    """Whitespace token count per document (\\S+ runs)."""
    n = pc.count_substring_regex(batch["text"], r"\S+")
    return pa.table({"doc_id": batch["doc_id"], "n_tokens": pc.cast(n, pa.int64())})


def quality_score(batch: pa.Table) -> pa.Table:
    """Cheap quality features: chars, tokens, punctuation, mean token length."""
    text = batch["text"]
    n_chars = pc.cast(pc.utf8_length(text), pa.int64())
    n_tokens = pc.cast(pc.count_substring_regex(text, r"\S+"), pa.int64())
    n_punct = pc.cast(pc.count_substring_regex(text, r"[.!?,;:]"), pa.int64())
    nc = n_chars.to_numpy()
    nt = np.maximum(n_tokens.to_numpy(), 1)
    mean_tok = fixed_k.round_half_away((nc - (nt - 1)) / nt, 6)  # chars minus single spaces
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_chars": n_chars,
            "n_tokens": n_tokens,
            "n_punct": n_punct,
            "mean_token_len": pa.array(mean_tok),
        }
    )


def stopword_hits(batch: pa.Table) -> pa.Table:
    """Per-language stopword hit counts (the language-ID signal)."""
    cols = {"doc_id": batch["doc_id"]}
    for lang, words in STOPWORDS.items():
        c = pc.count_substring_regex(batch["text"], _word_alt(words))
        cols[f"n_{lang}"] = pc.cast(c, pa.int64())
    return pa.table(cols)


def lang_id(batch: pa.Table) -> pa.Table:
    """Argmax language prediction from stopword hits (ties -> lexicographic)."""
    hits = stopword_hits(batch)
    mat = np.stack([hits[f"n_{lang}"].to_numpy() for lang in sorted(STOPWORDS)], axis=1)
    langs = np.array(sorted(STOPWORDS))
    pred = langs[np.argmax(mat, axis=1)]
    pred = np.where(mat.max(axis=1) == 0, "und", pred)
    return pa.table({"doc_id": batch["doc_id"], "lang_pred": pa.array(pred.tolist())})


def fingerprint(batch: pa.Table) -> pa.Table:
    """64-bit polynomial rolling hash of the whole text — doc fingerprint.

    h = sum(byte_i * P^(n-1-i)) mod 2^64, vectorized per row (cumprod wraps).
    """
    base = np.uint64(1099511628211)
    col = batch["text"].combine_chunks()
    buf = np.frombuffer(col.buffers()[2], dtype=np.uint8) if col.buffers()[2] else np.zeros(0, np.uint8)
    offs = np.frombuffer(col.buffers()[1], dtype=np.int32)
    out = np.zeros(batch.num_rows, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for i in range(batch.num_rows):
            arr = buf[offs[i] : offs[i + 1]].astype(np.uint64)
            if arr.size == 0:
                continue
            pw = np.concatenate(
                [[np.uint64(1)], np.cumprod(np.full(arr.size - 1, base, dtype=np.uint64))]
            )
            out[i] = (arr * pw[::-1]).sum(dtype=np.uint64)
    return pa.table(
        {"doc_id": batch["doc_id"], "fingerprint": pa.array(out.view(np.int64))}
    )

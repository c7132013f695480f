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

    h = sum(byte_i * P^(n-1-i)) mod 2^64, computed in ONE vectorized pass
    over the batch's flat Arrow byte buffer: a P-power table up to the max
    doc length (uint64 cumprod wraps mod 2^64), each byte multiplied by the
    power of its distance from its doc's end, summed per doc with
    ``np.add.reduceat`` (which also wraps). No per-row Python.
    """
    base = np.uint64(1099511628211)
    col = batch["text"].combine_chunks()
    n = batch.num_rows
    buf = np.frombuffer(col.buffers()[2], dtype=np.uint8) if col.buffers()[2] else np.zeros(0, np.uint8)
    off_dtype = np.int64 if pa.types.is_large_string(col.type) else np.int32
    offs = np.frombuffer(col.buffers()[1], dtype=off_dtype)[
        col.offset : col.offset + n + 1
    ].astype(np.int64)
    out = np.zeros(n, dtype=np.uint64)
    lens = np.diff(offs)
    total = int(offs[-1] - offs[0])
    if total:
        with np.errstate(over="ignore"):
            maxlen = int(lens.max())
            pw = np.empty(maxlen, dtype=np.uint64)
            pw[0] = 1
            if maxlen > 1:
                np.cumprod(np.full(maxlen - 1, base, dtype=np.uint64), out=pw[1:])
            # exponent of each byte = (doc_end - 1 - global_pos)
            pos = np.arange(int(offs[0]), int(offs[-1]), dtype=np.int64)
            exp = np.repeat(offs[1:] - 1, lens) - pos
            terms = buf[int(offs[0]) : int(offs[-1])].astype(np.uint64) * pw[exp]
            starts = (offs[:-1] - offs[0]).astype(np.int64)
            nonempty = lens > 0
            # reduceat needs strictly valid start indices; empty docs keep 0
            sums = np.add.reduceat(terms, starts[nonempty])
            out[nonempty] = sums
    return pa.table(
        {"doc_id": batch["doc_id"], "fingerprint": pa.array(out.view(np.int64))}
    )


def repetition_score(batch: pa.Table) -> pa.Table:
    """Within-document repetition (a Gopher/RefinedWeb-style quality
    signal): 1 - distinct_tokens/total_tokens per doc over whitespace
    tokens, 0.0 for token-free docs. One Arrow tokenize+hash pass for the
    whole batch (FNV-1a token identity, ~2^-64 per-pair collision), distinct
    counts via a lexsort first-occurrence mask — no per-row Python."""
    from geo_ray.kernels import fixed as fixed_k
    from geo_ray.kernels import strhash

    n = batch.num_rows
    th, offs = strhash.token_hashes_arrow(batch["text"])
    tot = np.diff(offs)
    uniq = np.zeros(n, dtype=np.int64)
    if th.size:
        doc_of = np.repeat(np.arange(n, dtype=np.int64), tot)
        order = np.lexsort((th, doc_of))
        d, h = doc_of[order], th[order]
        first = np.ones(h.size, dtype=bool)
        first[1:] = (d[1:] != d[:-1]) | (h[1:] != h[:-1])
        uniq = np.bincount(d[first], minlength=n).astype(np.int64)
    ratio = np.zeros(n, dtype=np.float64)
    nz = tot > 0
    ratio[nz] = 1.0 - uniq[nz] / tot[nz].astype(np.float64)
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_tokens": pa.array(tot.astype(np.int64)),
            "n_distinct": pa.array(uniq),
            "rep_ratio": pa.array(fixed_k.round_half_away(ratio, 6)),
        }
    )


def doc_ngram_hashes(batch: pa.Table, k: int = 3):
    """Word k-gram shingle hashes for every document with >= k tokens.

    Returns ``(keep, shingles, sh_offsets)``: ``keep`` marks the batch rows
    that produced shingle runs (token count >= k), ``shingles`` is the flat
    uint64 shingle-hash array over those rows, ``sh_offsets`` its per-kept-doc
    offsets. Identity is the FNV polynomial over FNV-1a token hashes
    (:func:`geo_ray.kernels.strhash.shingle_hashes_flat`), so equal word
    k-grams hash equal across batches, tables and rounds."""
    from geo_ray.kernels import strhash

    th, offs = strhash.token_hashes_arrow(batch["text"])
    counts = np.diff(offs)
    keep = counts >= k
    kept = counts[keep]
    offs2 = np.zeros(kept.size + 1, dtype=np.int64)
    np.cumsum(kept, out=offs2[1:])
    th2 = th[np.repeat(keep, counts)] if counts.size else th[:0]
    sh, sh_offs = strhash.shingle_hashes_flat(th2, offs2, k)
    return keep, sh, sh_offs


def benchmark_ngram_partial(batch: pa.Table, k: int = 3) -> pa.Table:
    """Per-batch DISTINCT word-k-gram hashes of a benchmark corpus — the
    build side of the contamination check. Output rows are bounded by the
    batch's distinct gram count; the final union happens on the tiny
    collected result (benchmark suites are small by definition)."""
    _, sh, _ = doc_ngram_hashes(batch, k)
    return pa.table({"h": pa.array(np.unique(sh).view(np.int64))})


class ContaminationCount:
    """Count benchmark n-gram occurrences per corpus document.

    The benchmark fingerprint set (sorted uint64 shingle hashes, built once
    from the held-out suite) is fetched from the object store ONCE per
    actor/task in ``__init__`` and probed with ``searchsorted`` per batch —
    a pure broadcast-map, no shuffle. A position counts as a hit when its
    word k-gram appears anywhere in the benchmark set."""

    def __init__(self, bench_ref, k: int = 3):
        import ray

        self.bench = ray.get(bench_ref) if not isinstance(bench_ref, np.ndarray) else bench_ref
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        keep, sh, sh_offs = doc_ngram_hashes(batch, self.k)
        hits = np.zeros(n, dtype=np.int64)
        if sh.size and self.bench.size:
            pos = np.searchsorted(self.bench, sh)
            ok = (pos < self.bench.size) & (self.bench[np.minimum(pos, self.bench.size - 1)] == sh)
            # cast before reduceat: np.add over bools is logical OR, not a sum
            oki = ok.astype(np.int64)
            per_kept = np.add.reduceat(oki, sh_offs[:-1]) if sh_offs.size > 1 else oki[:0]
            hits[keep] = per_kept
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_hits": pa.array(hits),
                "contaminated": pa.array((hits > 0).astype(np.int64)),
            }
        )


class CurationFilter:
    """Fused corpus-curation map: token stats + repetition + contamination
    probe + text-hash keys in ONE tokenize pass per batch.

    Emits only the documents that pass the quality gates, carrying
    ``(h1, h2, len)`` BLAKE2b text-hash keys so the downstream exact-dedup
    groupby shuffles 32-byte keys + a few scalars, never text. This is the
    production corpus-curation shape: all per-doc signals are map-side, the
    single wide step is the dedup groupby over survivors."""

    def __init__(
        self,
        bench_ref,
        k: int = 3,
        min_tokens: int = 20,
        max_tokens: int = 90,
        max_rep: float = 0.6,
        max_hit_frac: float = 0.5,
    ):
        import ray

        self.bench = ray.get(bench_ref) if not isinstance(bench_ref, np.ndarray) else bench_ref
        self.k = k
        self.min_tokens = min_tokens
        self.max_tokens = max_tokens
        self.max_rep = max_rep
        self.max_hit_frac = max_hit_frac

    def __call__(self, batch: pa.Table) -> pa.Table:
        from geo_ray.kernels import strhash

        n = batch.num_rows
        th, offs = strhash.token_hashes_arrow(batch["text"])
        tot = np.diff(offs)
        # distinct tokens per doc (repetition signal), same as repetition_score
        uniq = np.zeros(n, dtype=np.int64)
        if th.size:
            doc_of = np.repeat(np.arange(n, dtype=np.int64), tot)
            order = np.lexsort((th, doc_of))
            d, h = doc_of[order], th[order]
            first = np.ones(h.size, dtype=bool)
            first[1:] = (d[1:] != d[:-1]) | (h[1:] != h[:-1])
            uniq = np.bincount(d[first], minlength=n).astype(np.int64)
        rep = np.zeros(n, dtype=np.float64)
        nz = tot > 0
        rep[nz] = 1.0 - uniq[nz] / tot[nz].astype(np.float64)
        # contamination hits from the SAME token hashes
        hits = np.zeros(n, dtype=np.int64)
        keep_sh = tot >= self.k
        if keep_sh.any() and self.bench.size:
            kept = tot[keep_sh]
            offs2 = np.zeros(kept.size + 1, dtype=np.int64)
            np.cumsum(kept, out=offs2[1:])
            sh, sh_offs = strhash.shingle_hashes_flat(th[np.repeat(keep_sh, tot)], offs2, self.k)
            pos = np.searchsorted(self.bench, sh)
            ok = (pos < self.bench.size) & (self.bench[np.minimum(pos, self.bench.size - 1)] == sh)
            oki = ok.astype(np.int64)
            hits[keep_sh] = np.add.reduceat(oki, sh_offs[:-1]) if sh_offs.size > 1 else oki[:0]
        # contamination gate is a FRACTION of gram positions, so the
        # threshold's meaning is stable as corpus and benchmark sizes grow
        n_pos = np.maximum(tot - self.k + 1, 1)
        frac = hits / n_pos.astype(np.float64)
        passed = (
            (tot >= self.min_tokens)
            & (tot <= self.max_tokens)
            & (rep <= self.max_rep)
            & (frac <= self.max_hit_frac)
        )
        sub = batch.filter(pa.array(passed))
        h1, h2, lens = strhash.text_hashes_arrow(sub["text"])
        return pa.table(
            {
                "doc_id": sub["doc_id"],
                "lang": sub["lang"],
                "source": sub["source"],
                "n_tokens": pa.array(tot[passed].astype(np.int64)),
                "h1": pa.array(h1),
                "h2": pa.array(h2),
                "len": pa.array(lens),
            }
        )


PACK_BUDGET = 256  # tokens per training window
PACK_CHUNK = 100  # doc_ids per deterministic packing micro-partition


def pack_prepare(batch: pa.Table, chunk: int = PACK_CHUNK) -> pa.Table:
    """documents -> the tiny packing-input rows: (doc_id, lang, source,
    chunk_id, n_tokens). The text column DIES here — only integer token
    counts and small group keys ride the shuffle. chunk_id = doc_id//chunk
    bounds every packing task to at most ``chunk`` docs deterministically,
    independent of stratum skew (a 100 TB (lang, source) stratum never
    becomes one task)."""
    n = pc.cast(pc.count_substring_regex(batch["text"], r"\S+"), pa.int64())
    doc = batch["doc_id"].to_numpy().astype(np.int64)
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "lang": batch["lang"],
            "source": batch["source"],
            "chunk_id": pa.array(doc // np.int64(chunk)),
            "n_tokens": n,
        }
    )


def pack_bucket(df, budget: int = PACK_BUDGET):
    """Greedy first-fit-in-order sequence packing within each
    (lang, source, chunk_id) micro-partition: docs in doc_id order
    accumulate into a window until adding the next doc would exceed
    ``budget`` (an oversized doc gets its own window). Output one row per
    WINDOW: (lang, source, chunk_id, window_id, n_docs, n_tokens).

    The recurrence is inherently sequential, but only over the bounded
    micro-partition, and it touches five ints per doc — the string work
    happened upstream in pack_prepare."""
    import pandas as pd

    if len(df) == 0:
        return pd.DataFrame(
            {
                "lang": pd.Series([], dtype=object),
                "source": pd.Series([], dtype=object),
                "chunk_id": np.array([], dtype=np.int64),
                "window_id": np.array([], dtype=np.int64),
                "n_docs": np.array([], dtype=np.int64),
                "n_tokens": np.array([], dtype=np.int64),
            }
        )
    df = df.sort_values(["lang", "source", "chunk_id", "doc_id"], kind="mergesort")
    lang = df["lang"].to_numpy()
    source = df["source"].to_numpy()
    ck = df["chunk_id"].to_numpy()
    tok = df["n_tokens"].to_numpy()
    n = len(df)
    new_run = np.concatenate(
        [[True], (lang[1:] != lang[:-1]) | (source[1:] != source[:-1]) | (ck[1:] != ck[:-1])]
    )
    w = np.empty(n, dtype=np.int64)
    cum = 0
    wid = 0
    b = int(budget)
    tl = tok.tolist()
    nr = new_run.tolist()
    for i in range(n):
        if nr[i]:
            wid = 0
            cum = 0
        t = tl[i]
        if cum > 0 and cum + t > b:
            wid += 1
            cum = 0
        cum += t
        w[i] = wid
    run_id = np.cumsum(new_run) - 1
    key = run_id * np.int64(1 << 20) | w  # window_id < 2^20 per micro-partition
    uk, starts, counts = np.unique(key, return_index=True, return_counts=True)
    return pd.DataFrame(
        {
            "lang": lang[starts],
            "source": source[starts],
            "chunk_id": ck[starts],
            "window_id": uk & np.int64((1 << 20) - 1),
            "n_docs": counts.astype(np.int64),
            "n_tokens": np.add.reduceat(tok, starts).astype(np.int64),
        }
    )

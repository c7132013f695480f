"""Vectorized string hashing == scalar definitions, bit for bit."""

import numpy as np

from geo_ray.kernels import strhash
from geo_ray.stages import dedup

TEXTS = [
    "the quick brown fox jumps over the lazy dog",
    "",
    "one",
    "a b c d e f g a b c",
    "unicode tést über straße tokens here",
    "  leading and   multiple   spaces  ",
]


def test_fnv1a_bytes_matches_scalar():
    toks = [t.encode("utf-8") for text in TEXTS for t in text.split()]
    got = strhash.fnv1a_bytes(toks)
    want = np.array([dedup.hash_str64(t.decode()) for t in toks], dtype=np.uint64)
    assert (got == want).all()


def test_fnv1a_empty_token_is_offset_basis():
    assert strhash.fnv1a_bytes([b""])[0] == strhash.FNV_OFFSET


def test_batch_token_hashes_offsets():
    h, offs = strhash.batch_token_hashes(TEXTS)
    counts = [len(t.split()) for t in TEXTS]
    assert list(np.diff(offs)) == counts
    assert h.size == sum(counts)


def test_shingle_hashes_match_scalar():
    h, offs = strhash.batch_token_hashes(TEXTS, min_tokens=3)
    sh, sh_offs = strhash.shingle_hashes_flat(h, offs, k=3)
    for i, text in enumerate(TEXTS):
        want = dedup._shingle_hashes(text, 3)  # scalar path returns unique
        got = np.unique(sh[sh_offs[i] : sh_offs[i + 1]])
        assert (got == want).all(), text


def test_batch_signatures_match_scalar():
    sigs = dedup.batch_signatures(TEXTS)
    for i, t in enumerate(TEXTS):
        want = dedup.minhash_signature(dedup._shingle_hashes(t))
        assert (sigs[i] == want).all(), t


def test_text_hashes_arrow_matches_scalar():
    import hashlib

    import pyarrow as pa

    col = pa.chunked_array([pa.array(TEXTS[:3]), pa.array(TEXTS[3:])])
    h1, h2, lens = strhash.text_hashes_arrow(col)
    want_len = [len(t.encode("utf-8")) for t in TEXTS]
    assert lens.tolist() == want_len
    for i, t in enumerate(TEXTS):
        d = hashlib.blake2b(t.encode("utf-8"), digest_size=16).digest()
        assert int(np.uint64(h1[i])) == int.from_bytes(d[:8], "little")
        assert int(np.uint64(h2[i])) == int.from_bytes(d[8:], "little")


def test_text_hashes_arrow_distinguishes_texts():
    import pyarrow as pa

    texts = ["abc", "abd", "abc ", "", "abcabc"]
    h1, h2, _ = strhash.text_hashes_arrow(pa.array(texts))
    keys = set(zip(h1.tolist(), h2.tolist()))
    assert len(keys) == len(texts)


def test_text_hashes_arrow_null_vs_empty():
    """NULL text and '' must not conflate (ADVICE r2): len=-1 sentinel for
    nulls keeps them a distinct key while all NULLs still group together."""
    import pyarrow as pa

    col = pa.array(["", None, "a", None, ""], type=pa.string())
    h1, h2, lens = strhash.text_hashes_arrow(col)
    assert lens[0] == 0 and lens[4] == 0
    assert lens[1] == -1 and lens[3] == -1
    # same (h1, h2) for the two NULLs -> they group together
    assert (h1[1], h2[1]) == (h1[3], h2[3])
    # key tuples differ between NULL and ''
    assert (h1[0], h2[0], lens[0]) != (h1[1], h2[1], lens[1])


def test_fingerprint_matches_scalar_definition():
    """Vectorized flat-buffer fingerprint == scalar Horner h = h*P + byte
    mod 2^64, including empty docs and a sliced (offset != 0) column."""
    import random
    import string

    import pyarrow as pa

    from geo_ray.stages.text import fingerprint

    rng = random.Random(3)
    texts = ["", "a", "hello world", ""] + [
        "".join(rng.choices(string.printable, k=rng.randint(0, 300))) for _ in range(50)
    ] + [""]

    def scalar(t: str) -> int:
        h = 0
        for b in t.encode("utf-8"):
            h = (h * 1099511628211 + b) % 2**64
        return h - 2**64 if h >= 2**63 else h

    tbl = pa.table({"doc_id": pa.array(range(len(texts))), "text": pa.array(texts)})
    got = fingerprint(tbl)["fingerprint"].to_pylist()
    assert got == [scalar(t) for t in texts]
    sl = tbl.slice(3, 30)
    assert fingerprint(sl)["fingerprint"].to_pylist() == [scalar(t) for t in texts[3:33]]

"""Contamination-check guards: the broadcast n-gram probe counts exactly the
positions whose word k-gram appears in the benchmark slice, matching a
brute-force Python string-gram count (hash identity == string identity)."""

import numpy as np
import pyarrow as pa

from geo_ray.stages import text as text_st


def _grams(text: str, k: int = 3):
    toks = text.split()
    return [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]


def test_contamination_matches_bruteforce():
    bench_texts = [
        "red green blue red green blue yellow",
        "one two three four",
        "xx yy",  # < k tokens: contributes no grams
    ]
    corpus = [
        (1, "red green blue is a palette"),          # 1 hit at position 0
        (2, "one two three four five"),              # grams 0 and 1 hit
        (3, "nothing shared here at all"),           # 0 hits
        (4, "xx yy"),                                # < k tokens: 0 hits
        (5, "green blue red green blue yellow end"), # positions 1,2 hit
        (6, ""),                                     # empty
    ]
    bench_batch = pa.table({"doc_id": [10, 11, 12], "text": bench_texts})
    part = text_st.benchmark_ngram_partial(bench_batch)
    bench = np.unique(part["h"].to_numpy().view(np.uint64))

    bench_strs = set(g for t in bench_texts for g in _grams(t))
    batch = pa.table(
        {"doc_id": [c[0] for c in corpus], "text": [c[1] for c in corpus]}
    )
    got = text_st.ContaminationCount(bench, k=3)(batch)
    want = [sum(g in bench_strs for g in _grams(t)) for _, t in corpus]
    assert got["n_hits"].to_pylist() == want
    assert got["contaminated"].to_pylist() == [int(w > 0) for w in want]
    assert got["doc_id"].to_pylist() == [c[0] for c in corpus]


def test_contamination_empty_bench():
    batch = pa.table({"doc_id": [1], "text": ["some words in a document"]})
    got = text_st.ContaminationCount(np.zeros(0, np.uint64), k=3)(batch)
    assert got["n_hits"].to_pylist() == [0]


def test_curation_filter_gates_and_dedup_keys():
    import ray
    import ray.data as rd

    bench_batch = pa.table({"doc_id": [100], "text": ["spark data engine spark data engine"]})
    part = text_st.benchmark_ngram_partial(bench_batch)
    bench = np.unique(part["h"].to_numpy().view(np.uint64))

    long_ok = " ".join(f"w{i}" for i in range(30))
    repetitive = " ".join(["dup"] * 30)
    contaminated = "spark data engine " * 10  # every gram hits
    rows = [
        (1, long_ok, "en", "srcA"),
        (2, "too short", "en", "srcA"),
        (3, repetitive, "en", "srcA"),           # rep_ratio ~0.97 -> dropped
        (4, contaminated.strip(), "en", "srcA"), # hit_frac 1.0 -> dropped
        (5, long_ok, "en", "srcB"),              # exact dup of 1
    ]
    batch = pa.table(
        {
            "doc_id": [r[0] for r in rows],
            "text": [r[1] for r in rows],
            "lang": [r[2] for r in rows],
            "source": [r[3] for r in rows],
        }
    )
    f = text_st.CurationFilter(bench, k=3, min_tokens=20, max_tokens=90,
                               max_rep=0.6, max_hit_frac=0.5)
    out = f(batch)
    assert out["doc_id"].to_pylist() == [1, 5]
    # identical texts -> identical dedup keys; groupby would keep doc 1
    assert out["h1"].to_pylist()[0] == out["h1"].to_pylist()[1]
    assert out["h2"].to_pylist()[0] == out["h2"].to_pylist()[1]
    assert out["len"].to_pylist()[0] == out["len"].to_pylist()[1]

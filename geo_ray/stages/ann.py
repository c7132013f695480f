"""Similarity search over embedding columns.

- ``CosineTopK``: brute-force cosine top-k — the exactness baseline. The query
  matrix is broadcast (built in ``__init__``, once per actor/task); each batch
  computes one GEMM against the L2-normalized query block and emits per-batch
  PARTIAL top-k rows, finished by a tiny groupby (same pattern as the kNN
  join: pre-aggregate before the shuffle).
- ``ivf_assign``: the scale path — assign each vector to its nearest coarse
  centroid so a probe only scans matching partitions (cell-keyed layout).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from geo_ray.kernels import fixed as fixed_k

EMBED_DIM = 64


def query_matrix(n_queries: int = 8, dim: int = EMBED_DIM) -> np.ndarray:
    """Deterministic query vectors: q[qid, j] = ((j*37 + qid*11) % 19 - 9) / 10."""
    q = np.arange(n_queries)[:, None] * 11 + np.arange(dim)[None, :] * 37
    return ((q % 19) - 9) / 10.0


def _embeddings_to_matrix(col) -> np.ndarray:
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    return flat.reshape(len(arr), -1)


class CosineTopK:
    def __init__(self, n_queries: int = 8, k: int = 10):
        self.q = query_matrix(n_queries)
        self.qn = self.q / np.linalg.norm(self.q, axis=1, keepdims=True)
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        v = _embeddings_to_matrix(batch["embedding"])
        norms = np.sqrt((v * v).sum(axis=1))
        norms[norms == 0] = 1.0
        cos = (v / norms[:, None]) @ self.qn.T  # (n, n_queries)
        k = min(self.k, v.shape[0])
        top = np.argpartition(-cos, k - 1, axis=0)[:k]  # (k, n_queries)
        vec_ids = batch["vec_id"].to_numpy()
        nq = self.q.shape[0]
        qid = np.repeat(np.arange(nq, dtype=np.int64), k)
        rows = top.T.ravel()
        return pa.table(
            {
                "query_id": pa.array(qid),
                "vec_id": pa.array(vec_ids[rows]),
                "cos_sim": pa.array(cos[rows, np.repeat(np.arange(nq), k)]),
            }
        )


def finish_ann_topk(b: pa.Table, k: int = 10) -> pa.Table:
    """Arrow block finisher (no pandas round trip): segments by query_id
    with one lexsort, keeps the top-k (cos_sim DESC, vec_id ASC) rows per
    query, then rounds the survivors' cos_sim to 6 dp."""
    from geo_ray.stages.agg import np_col

    if b.num_rows == 0:
        return b
    q = np_col(b, "query_id")
    v = np_col(b, "vec_id")
    c = np_col(b, "cos_sim", dtype=np.float64)
    order = np.lexsort((v, -c, q))
    qs = q[order]
    starts = np.flatnonzero(np.concatenate([[True], qs[1:] != qs[:-1]]))
    rank = np.arange(qs.size, dtype=np.int64) - np.repeat(
        starts, np.diff(np.concatenate([starts, [qs.size]]))
    )
    t = b.take(pa.array(order[rank < k]))
    return t.set_column(
        t.schema.get_field_index("cos_sim"),
        "cos_sim",
        pa.array(fixed_k.round_half_away(np_col(t, "cos_sim", dtype=np.float64), 6)),
    )


def ivf_assign(batch: pa.Table, n_centroids: int = 16) -> pa.Table:
    """Assign each embedding to its nearest (cosine) deterministic centroid —
    the coarse-quantizer partitioning step of an IVF index."""
    cents = query_matrix(n_centroids)
    cn = cents / np.linalg.norm(cents, axis=1, keepdims=True)
    v = _embeddings_to_matrix(batch["embedding"])
    norms = np.sqrt((v * v).sum(axis=1))
    norms[norms == 0] = 1.0
    sim = (v / norms[:, None]) @ cn.T
    return batch.append_column("centroid_id", pa.array(np.argmax(sim, axis=1).astype(np.int64)))


class CosineNearDup:
    """Embedding-cosine near-duplicate pairs: each batch GEMMs against the
    broadcast full normalized matrix and emits (vec_a < vec_b) pairs with
    cos_sim >= tau. Broadcast once per actor/task (`matrix_ref` from
    ``ray.put``, or built from the small parquet at ``path``); the brute-force
    baseline of the near-dup family — the scale path buckets by IVF centroid
    (``ivf_assign``) and runs this within buckets.
    """

    def __init__(self, tau: float = 0.4, matrix_ref=None, path: str | None = None):
        self.tau = tau
        if matrix_ref is not None:
            import ray

            ids, mat = ray.get(matrix_ref)
        else:
            import pyarrow.parquet as pq

            t = pq.read_table(path, columns=["vec_id", "embedding"])
            ids = t["vec_id"].to_numpy()
            mat = _embeddings_to_matrix(t["embedding"])
        norms = np.sqrt((mat * mat).sum(axis=1))
        norms[norms == 0] = 1.0
        self.ids = np.asarray(ids, dtype=np.int64)
        self.mat = mat / norms[:, None]

    def __call__(self, batch: pa.Table) -> pa.Table:
        v = _embeddings_to_matrix(batch["embedding"])
        norms = np.sqrt((v * v).sum(axis=1))
        norms[norms == 0] = 1.0
        cos = (v / norms[:, None]) @ self.mat.T  # (batch, all)
        bid = batch["vec_id"].to_numpy().astype(np.int64)
        keep = fixed_k.round_half_away(cos, 6) >= self.tau
        # emit only (a < b) so each pair appears exactly once globally
        keep &= bid[:, None] < self.ids[None, :]
        r, c = np.nonzero(keep)
        return pa.table(
            {
                "vec_a": pa.array(bid[r]),
                "vec_b": pa.array(self.ids[c]),
                "cos_sim": pa.array(fixed_k.round_half_away(cos[r, c], 6)),
            }
        )


def neardup_bucket(group: pa.Table, tau: float = 0.4) -> pa.Table:
    """Bucketed stage fn over IVF centroid partitions (Arrow blocks; a block
    may hold SEVERAL centroid buckets — segmented by centroid_id internally):
    exact all-pairs cosine within each bucket (normalize + one GEMM per
    bucket), emitting (vec_a < vec_b) pairs with round(cos, 6) >= tau.

    This is the scale path for embedding near-dup (``CosineNearDup``'s
    docstring contract): compute is O(sum of bucket_size^2) instead of
    O(n * N), and no worker ever holds the full matrix — only its buckets.
    Recall contract: a pair is found iff BOTH vectors map to the same coarse
    centroid; cross-bucket near-dups are missed by construction (the brute
    pass is the recall oracle; tests pin the subset relation)."""
    from geo_ray.stages.agg import np_col

    out_a, out_b, out_s = [], [], []
    if group.num_rows:
        cent = np_col(group, "centroid_id") if "centroid_id" in group.column_names else None
        ids = np_col(group, "vec_id")
        emb = _embeddings_to_matrix(group["embedding"])
        if cent is None:
            cent = np.zeros(ids.size, dtype=np.int64)
        order = np.lexsort((ids, cent))
        cent, ids, emb = cent[order], ids[order], emb[order]
        norms = np.sqrt((emb * emb).sum(axis=1))
        norms[norms == 0] = 1.0
        vn = emb / norms[:, None]
        starts = np.flatnonzero(np.concatenate([[True], cent[1:] != cent[:-1]]))
        bounds = np.concatenate([starts, [cent.size]])
        for s, e in zip(bounds[:-1], bounds[1:]):
            n = e - s
            if n < 2:
                continue
            cos = vn[s:e] @ vn[s:e].T
            iu, ju = np.triu_indices(n, 1)
            sim = fixed_k.round_half_away(cos[iu, ju], 6)
            keep = sim >= tau
            out_a.append(ids[s:e][iu[keep]])
            out_b.append(ids[s:e][ju[keep]])
            out_s.append(sim[keep])
    cat = lambda xs, dt: np.concatenate(xs) if xs else np.array([], dt)  # noqa: E731
    return pa.table(
        {
            "vec_a": pa.array(cat(out_a, np.int64)),
            "vec_b": pa.array(cat(out_b, np.int64)),
            "cos_sim": pa.array(cat(out_s, np.float64)),
        }
    )


def probe_centroids(n_queries: int = 8, n_centroids: int = 16, nprobe: int = 4) -> np.ndarray:
    """(n_queries, nprobe) centroid ids each query probes (cosine-nearest,
    ties by lower centroid id) — the IVF probe plan, computable identically
    in SQL since both centroids and query vectors are deterministic."""
    q = query_matrix(n_queries)
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    c = query_matrix(n_centroids)
    cn = c / np.linalg.norm(c, axis=1, keepdims=True)
    sim = qn @ cn.T
    order = np.argsort(-sim, axis=1, kind="stable")
    return order[:, :nprobe].astype(np.int64)


class IvfTopK:
    """IVF-probed cosine top-k: each batch assigns vectors to centroids
    (ivf_assign math) and scores ONLY the vectors whose centroid is in the
    query's probe set — the scale path that avoids scanning the full corpus.
    Emits per-batch partials; finish with groupby(query_id) top-k."""

    def __init__(self, n_queries: int = 8, k: int = 10, n_centroids: int = 16, nprobe: int = 4):
        self.q = query_matrix(n_queries)
        self.qn = self.q / np.linalg.norm(self.q, axis=1, keepdims=True)
        cents = query_matrix(n_centroids)
        self.cn = cents / np.linalg.norm(cents, axis=1, keepdims=True)
        self.k = k
        self.probe = probe_centroids(n_queries, n_centroids, nprobe)

    def __call__(self, batch: pa.Table) -> pa.Table:
        v = _embeddings_to_matrix(batch["embedding"])
        norms = np.sqrt((v * v).sum(axis=1))
        norms[norms == 0] = 1.0
        vn = v / norms[:, None]
        cent = np.argmax(vn @ self.cn.T, axis=1)
        vec_ids = batch["vec_id"].to_numpy()
        out_q, out_v, out_s = [], [], []
        for qid in range(self.qn.shape[0]):
            m = np.isin(cent, self.probe[qid])
            if not m.any():
                continue
            idx = np.flatnonzero(m)
            cos = vn[idx] @ self.qn[qid]
            kk = min(self.k, idx.size)
            top = np.argpartition(-cos, kk - 1)[:kk] if kk < idx.size else np.arange(idx.size)
            out_q.append(np.full(top.size, qid, dtype=np.int64))
            out_v.append(vec_ids[idx[top]])
            out_s.append(cos[top])
        if not out_q:
            return pa.table(
                {
                    "query_id": pa.array([], pa.int64()),
                    "vec_id": pa.array([], pa.int64()),
                    "cos_sim": pa.array([], pa.float64()),
                }
            )
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q)),
                "vec_id": pa.array(np.concatenate(out_v)),
                "cos_sim": pa.array(np.concatenate(out_s)),
            }
        )


def load_knn_shard(chunk_id: int, n_chunks: int, path: str, sharded: bool = True):
    """Read one vec_id-hash shard, sort by vec_id, L2-normalize, and return
    (vid, matT) with matT laid out (dim, shard) for the probe GEMM. Run it
    as a Ray TASK so the read + normalize happens once per shard per
    CLUSTER and the arrays land in the object store — every downstream
    probe task then maps them zero-copy (plasma-resident, spillable), so
    the full corpus is object-store-resident exactly once instead of being
    re-read per worker or broadcast per task."""
    import pyarrow.parquet as pq

    if sharded:
        t = pq.read_table(f"{path}/shard={chunk_id}", columns=["vec_id", "embedding"])
        vid = t["vec_id"].to_numpy().astype(np.int64)
        order = np.argsort(vid, kind="mergesort")
    else:
        t = pq.read_table(path, columns=["vec_id", "embedding"])
        vid = t["vec_id"].to_numpy().astype(np.int64)
        sel = np.flatnonzero(vid % np.int64(n_chunks) == np.int64(chunk_id))
        order = sel[np.argsort(vid[sel], kind="mergesort")]
    vid = vid[order]
    m = _embeddings_to_matrix(t["embedding"])[order]
    norms = np.sqrt((m * m).sum(axis=1))
    norms[norms == 0] = 1.0
    return vid, (m / norms[:, None]).T.copy()


class KnnGraphChunk:
    """One corpus SHARD of the exact cosine kNN-graph self-join — the
    no-broadcast scale path: the corpus is split into ``n_chunks`` disjoint
    shards by vec_id hash; each probe block GEMMs against ONE shard and emits
    per-probe partial top-k rows, merged by a (probe-keyed) groupby. No task
    ever holds the whole corpus, and each (probe block x shard) pairing does
    one vectorized matmul — the blocked dense plan every distributed kNN
    builder reduces to before approximation.

    Selection order is (cos rounded to 6 dp DESC, neighbor vec_id ASC) at
    every stage — a TOTAL order shared with the SQL twin, so partial top-k
    then merge is exactly the global top-k (selection under a total order is
    associative). The shard matrix sorts by vec_id in ``__init__`` (once per
    actor) so a stable argsort on -cos6 tie-breaks by neighbor id for free.

    With ``sharded=True``, ``path`` is a hash-sharded hive layout
    (``<path>/shard=<c>/``, the ann_index_job partitioning) and the loader
    reads ONLY its shard's files — no n_chunks× read amplification. The
    scale form loads each shard ONCE PER CLUSTER as a Ray task
    (:func:`load_knn_shard` → object store) and every GEMM task maps it
    zero-copy (:func:`knn_probe_fn`); the flat ``path`` mode (full read +
    hash filter) remains for local/stress use where no layout exists.
    """

    def __init__(
        self, chunk_id: int, n_chunks: int, path: str, k: int = 3, sharded: bool = False
    ):
        self.vid, self.mat = load_knn_shard(chunk_id, n_chunks, path, sharded)
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        return knn_score_block(batch, self.vid, self.mat, self.k)


def knn_score_block(batch: pa.Table, vid: np.ndarray, mat: np.ndarray, k: int) -> pa.Table:
    """GEMM one probe block against one shard matrix, emitting per-probe
    partial top-k rows (the KnnGraphChunk kernel as a pure function so the
    shard state can live anywhere — actor field or object-store view)."""
    empty = pa.table(
        {
            "vec_id": pa.array([], pa.int64()),
            "neighbor_id": pa.array([], pa.int64()),
            "cos_sim": pa.array([], pa.float64()),
        }
    )
    if batch.num_rows == 0 or vid.size == 0:
        return empty
    pv = batch["vec_id"].to_numpy().astype(np.int64)
    v = _embeddings_to_matrix(batch["embedding"])
    norms = np.sqrt((v * v).sum(axis=1))
    norms[norms == 0] = 1.0
    cos = (v / norms[:, None]) @ mat
    cos[pv[:, None] == vid[None, :]] = -np.inf  # exclude self
    kk = min(k, vid.size)
    # top-k under (cos6 DESC, vec_id ASC) without rounding or sorting
    # the full matrix: rounding to 6 dp is MONOTONE, so the k-th largest
    # rounded value is round6(k-th largest raw); a one-quantum margin
    # (1e-6) below the raw k-th catches every candidate whose rounded
    # value can reach it (value ties can't drop the id-ordered winner).
    # Only the ~k survivors per row are rounded and lexsorted — the
    # GEMM, one partition and one compare are the only full-matrix
    # passes.
    kth = np.partition(cos, cos.shape[1] - kk, axis=1)[:, cos.shape[1] - kk]
    rows, cols = np.nonzero(cos >= (kth - 1e-6)[:, None])
    cval = fixed_k.round_half_away(cos[rows, cols], 6)
    order = np.lexsort((cols, -cval, rows))  # cols sorted == vec_id sorted
    rows, cols, cval = rows[order], cols[order], cval[order]
    starts = np.flatnonzero(np.concatenate([[True], rows[1:] != rows[:-1]]))
    rank = np.arange(rows.size, dtype=np.int64) - np.repeat(
        starts, np.diff(np.concatenate([starts, [rows.size]]))
    )
    keep = (rank < kk) & np.isfinite(cval)
    return pa.table(
        {
            "vec_id": pa.array(pv[rows[keep]]),
            "neighbor_id": pa.array(vid[cols[keep]]),
            "cos_sim": pa.array(cval[keep]),
        }
    )


_KNN_SHARD_VIEWS: dict = {}


def knn_probe_fn(batch: pa.Table, *, shard_ref, k: int = 3) -> pa.Table:
    """Probe-task form of the kNN shard GEMM: ``shard_ref`` is the object
    ref of ONE :func:`load_knn_shard` result — the shard was read and
    normalized exactly once per cluster by a Ray task, lives in the object
    store, and ``ray.get`` here returns zero-copy numpy views onto the
    plasma segment (cached per worker process; holding the views pins the
    shared memory, not worker heap). Task-based on purpose: one actor pool
    PER shard reserves ``n_chunks`` CPUs at minimum and deadlocks any
    session (or per-node share of a cluster) smaller than the shard count,
    whereas tasks schedule within whatever is free — and unlike a
    load-per-worker cache, interleaved shard scheduling costs nothing
    (measured: the 2-entry per-process LRU re-read shards ~12x per worker
    at 8 shards / 32 workers, 199 s vs the 85-156 s band at 100k vectors)."""
    import ray

    key = shard_ref.hex() if hasattr(shard_ref, "hex") else id(shard_ref)
    st = _KNN_SHARD_VIEWS.get(key)
    if st is None:
        st = ray.get(shard_ref)
        while len(_KNN_SHARD_VIEWS) >= 64:  # cached views PIN plasma objects;
            _KNN_SHARD_VIEWS.pop(next(iter(_KNN_SHARD_VIEWS)))  # bound across corpora
        _KNN_SHARD_VIEWS[key] = st
    vid, mat = st
    return knn_score_block(batch, vid, mat, k)


def merge_knn_bucket(b, k: int = 3):
    """Bucket-level merge of per-shard partial top-k rows: one vectorized
    lexsort per bucket segments all of its probes at once (the per-group
    map_groups form measured one Python call per probe). Same
    (cos6 DESC, neighbor ASC) total order; emits rank 1..k per probe."""
    from geo_ray.stages.agg import np_col

    vid = np_col(b, "vec_id")
    empty = pa.table(
        {
            "vec_id": pa.array([], pa.int64()),
            "neighbor_id": pa.array([], pa.int64()),
            "cos_sim": pa.array([], pa.float64()),
            "rank": pa.array([], pa.int64()),
        }
    )
    if vid.size == 0:
        return empty
    nid = np_col(b, "neighbor_id")
    c = b["cos_sim"].to_numpy(zero_copy_only=False).astype(np.float64)
    order = np.lexsort((nid, -c, vid))
    vid, nid, c = vid[order], nid[order], c[order]
    starts = np.flatnonzero(np.concatenate([[True], vid[1:] != vid[:-1]]))
    rank = np.arange(vid.size, dtype=np.int64) - np.repeat(
        starts, np.diff(np.concatenate([starts, [vid.size]]))
    )
    keep = rank < k
    return pa.table(
        {
            "vec_id": pa.array(vid[keep]),
            "neighbor_id": pa.array(nid[keep]),
            "cos_sim": pa.array(c[keep]),
            "rank": pa.array(rank[keep] + 1),
        }
    )

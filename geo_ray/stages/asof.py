"""Distributed as-of join — an operator Ray Data lacks natively.

For each left row (key, t) find the right row of the same key with the
greatest time <= t (ties broken by greatest tiebreak id — fully
deterministic, unlike a bare SQL ASOF JOIN whose tie choice is undefined).

Plan shape: both sides are tagged and co-partitioned by a LOW-cardinality
hash bucket of the key (one shuffle), then each bucket resolves ALL of its
keys at once with a vectorized segmented scan — no per-key or per-row Python:

1. concatenate right+left rows; ``np.lexsort`` by (key, time, side) with
   right-before-left at equal times (the join is inclusive: t_right == t_left
   matches);
2. segmented running maximum of "last right row seen" with reset at key
   boundaries, done as one ``np.maximum.accumulate`` over markers offset by
   ``segment_id * BIG`` (a new segment's floor exceeds every previous
   segment's ceiling, so the accumulate can never leak across keys);
3. left rows read their match from the accumulated array; unmatched rows are
   dropped (inner as-of).

The partitioning assumption: all rows of one key fit one bucket group (the
same assumption every hash join makes). Skewed keys are handled by LEFT-side
salting (``hot_keys``/``n_salt``): left rows of a hot key spread over
``n_salt`` sub-buckets while the hot key's RIGHT rows replicate to every
sub-bucket (the right side must be complete wherever any of its left rows
land) — output is identical to unsalted, one hot user no longer serializes
on one reducer. Same replicate-the-build-side trick as the tile/PIP salting
(stages/copartition.py).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

N_BUCKETS = 32
LEFT, RIGHT = 1, 0


def tag_side(batch: pa.Table, key: str, time: str, side: int, carry: list[str],
             null_cols: dict, tiebreak: str | None = None,
             hot_keys=None, n_salt: int = 8) -> pa.Table:
    """Normalize one side to (bucket, key, t, side, tie, l_*..., r_*...).

    ``null_cols`` maps the OTHER side's prefixed carry names to their Arrow
    types — filled with nulls so both sides share one schema for ``union``."""
    k = batch[key].to_numpy().astype(np.int64)
    t = batch[time].to_numpy()
    if np.issubdtype(t.dtype, np.datetime64):
        t = t.astype("datetime64[us]").astype(np.int64)
    else:
        t = t.astype(np.int64)
    tie = (
        batch[tiebreak].to_numpy().astype(np.int64)
        if tiebreak is not None
        else np.zeros(k.size, dtype=np.int64)
    )
    n = k.size
    bucket = (k % N_BUCKETS).astype(np.int64)
    row_idx = None
    if hot_keys is not None and len(hot_keys):
        hot = np.isin(k, hot_keys)
        salt_base = N_BUCKETS + (k % N_BUCKETS) * n_salt
        cold = np.flatnonzero(~hot)
        rows = [cold]
        buckets = [bucket[cold]]
        if side == LEFT:
            hl = np.flatnonzero(hot)
            rows.append(hl)
            buckets.append(salt_base[hl] + (tie[hl] + t[hl]) % n_salt)
        else:  # right rows of a hot key replicate to every salt
            hr = np.flatnonzero(hot)
            rows.append(np.repeat(hr, n_salt))
            buckets.append(
                np.repeat(salt_base[hr], n_salt)
                + np.tile(np.arange(n_salt, dtype=np.int64), hr.size)
            )
        row_idx = np.concatenate(rows)
        bucket = np.concatenate(buckets)
        k, t, tie = k[row_idx], t[row_idx], tie[row_idx]
        n = k.size
    cols = {
        "bucket": pa.array(bucket),
        "k": pa.array(k),
        "t": pa.array(t),
        "side": pa.array(np.full(n, side, dtype=np.int64)),
        "tie": pa.array(tie),
    }
    own_prefix = "l" if side == LEFT else "r"
    src = batch if row_idx is None else batch.take(pa.array(row_idx))
    own = {f"{own_prefix}_{c}": src[c] for c in carry}
    for name in sorted(own.keys() | null_cols.keys()):
        cols[name] = own[name] if name in own else pa.nulls(n, type=null_cols[name])
    return pa.table(cols)


def asof_bucket(group, left_carry: list[str], right_carry: list[str]):
    """map_groups: resolve every key of one bucket with a segmented scan."""
    import pandas as pd

    k = group["k"].to_numpy()
    t = group["t"].to_numpy()
    side = group["side"].to_numpy()
    tie = group["tie"].to_numpy()
    n = k.size
    # right rows sort before left rows at equal (key, time) so an equal-time
    # right row is visible to the left row (inclusive match); among equal
    # (key, time) right rows ties sort ascending so the running maximum keeps
    # the LARGEST tie id — side must outrank tie or an equal-time right row
    # could land after the left row and be invisible to it.
    order = np.lexsort((tie, side, t, k))
    ks, ts, ss = k[order], t[order], side[order]
    is_right = ss == RIGHT
    seg = np.cumsum(np.concatenate([[0], (ks[1:] != ks[:-1]).astype(np.int64)]))
    marker = np.where(is_right, np.arange(n, dtype=np.int64), -1)
    BIG = np.int64(n + 2)
    last_right = np.maximum.accumulate(marker + seg * BIG) - seg * BIG
    lpos = np.flatnonzero(~is_right)
    match = last_right[lpos]
    ok = match >= 0
    lrows = order[lpos[ok]]          # indices into the group for left rows
    rrows = order[match[ok]]         # matched right rows (positions in sorted order are markers)
    out = {}
    for c in left_carry:
        out[f"l_{c}"] = group[f"l_{c}"].to_numpy()[lrows]
    out["t"] = t[lrows]
    for c in right_carry:
        out[f"r_{c}"] = group[f"r_{c}"].to_numpy()[rrows]
    out["r_t"] = t[rrows]
    return pd.DataFrame(out)


def asof_join(
    left_ds,
    right_ds,
    left_key: str,
    left_time: str,
    right_key: str,
    right_time: str,
    left_carry: list[str],
    right_carry: list[str],
    right_tiebreak: str | None = None,
    hot_keys=None,
    n_salt: int = 8,
):
    """Inner as-of join of two Datasets (see module docstring). Pass
    ``hot_keys`` (array of skewed key values) to salt-split their left rows
    over ``n_salt`` sub-buckets — output identical to unsalted."""
    def _arrow_types(ds, cols, prefix):
        base = ds.schema().base_schema
        if isinstance(base, pa.Schema):
            return {f"{prefix}_{c}": base.field(c).type for c in cols}
        # pandas-block schema (e.g. from_pandas sources): numpy dtypes
        dt = dict(zip(base.names, base.types))
        return {f"{prefix}_{c}": pa.from_numpy_dtype(dt[c]) for c in cols}

    l_types = _arrow_types(left_ds, left_carry, "l")
    r_types = _arrow_types(right_ds, right_carry, "r")
    lt = left_ds.map_batches(
        tag_side,
        fn_kwargs={
            "key": left_key,
            "time": left_time,
            "side": LEFT,
            "carry": left_carry,
            "null_cols": r_types,
            "hot_keys": hot_keys,
            "n_salt": n_salt,
        },
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    rt = right_ds.map_batches(
        tag_side,
        fn_kwargs={
            "key": right_key,
            "time": right_time,
            "side": RIGHT,
            "carry": right_carry,
            "null_cols": l_types,
            "tiebreak": right_tiebreak,
            "hot_keys": hot_keys,
            "n_salt": n_salt,
        },
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    from geo_ray.stages.agg import hash_bucket_apply

    return hash_bucket_apply(
        lt.union(rt), "bucket", lambda g: asof_bucket(g, left_carry, right_carry)
    )

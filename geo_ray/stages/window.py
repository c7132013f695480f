"""Distributed ordered-window stage: global per-group row numbers (and group
totals) over a range-partitioned sort — the machinery behind ROW_NUMBER /
RANK / PERCENT_RANK / NTILE-style operators that Ray Data has no native
expression for.

Plan shape (and why it scales):

1. ``ds.sort(group_cols + order_cols)`` — Ray's distributed range-partition
   sort; the one unavoidable all-to-all.  With a unique tie-break column in
   ``order_cols`` every full sort tuple is distinct, so the sorted blocks are
   contiguous, non-overlapping runs of the global order.
2. One tiny metadata task per block extracts an O(1) summary: the block's
   minimum full sort tuple (used to order blocks by CONTENT, so we never rely
   on the executor preserving block order), its first and last group key, the
   run lengths of those two boundary groups, and the row count.  Only groups
   that STRADDLE a block edge need cross-block information, and a sorted
   dataset has at most 2×#blocks such boundary groups — so the driver-side
   state is O(#blocks), independent of group cardinality (a per-group offset
   table would be an O(#groups) driver funnel; this is not that).
3. The driver scans the summaries once, accumulating, for each boundary
   group, its row count in earlier blocks (the block's *first-run offset*)
   and its final total.  Groups fully inside one block never appear in the
   map.
4. One remote task per block attaches ``rn`` (1-based global row number
   within the group, in sort order) and ``n_group`` (the group's total row
   count) from local run lengths + the tiny boundary map, then applies the
   caller's vectorized ``finish`` to the block.  No re-shuffle: the rank
   attach is embarrassingly parallel over the already-sorted blocks.

The sort output is materialized into block refs (``to_arrow_refs``) — that is
not an extra cost: a distributed sort materializes its output blocks anyway,
and everything downstream streams again via ``from_arrow_refs``.
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pyarrow as pa


def _key_tuple(tbl: pa.Table, cols: list[str], row: int):
    return tuple(tbl[c][row].as_py() for c in cols)


def _group_runs(tbl: pa.Table, group_cols: list[str]) -> tuple[np.ndarray, np.ndarray]:
    """(starts, lengths) of consecutive equal-group runs in a SORTED table."""
    n = tbl.num_rows
    if n == 0:
        return np.array([], dtype=np.int64), np.array([], dtype=np.int64)
    change = np.zeros(n, dtype=bool)
    change[0] = True
    for c in group_cols:
        col = tbl[c].combine_chunks()
        v = col.to_numpy(zero_copy_only=False)
        change[1:] |= v[1:] != v[:-1]
    starts = np.flatnonzero(change)
    lengths = np.diff(np.concatenate([starts, [n]]))
    return starts, lengths


def _summary(tbl: pa.Table, group_cols: list[str], sort_cols: list[str]) -> dict:
    n = tbl.num_rows
    if n == 0:
        return {"n": 0}
    starts, lengths = _group_runs(tbl, group_cols)
    return {
        "n": n,
        "min_key": _key_tuple(tbl, sort_cols, 0),
        "first": _key_tuple(tbl, group_cols, 0),
        "first_len": int(lengths[0]),
        "last": _key_tuple(tbl, group_cols, n - 1),
        "last_len": int(lengths[-1]),
    }


def _boundary_maps(summaries: list[dict]) -> tuple[list[int], dict]:
    """Per-block first-run offsets + {boundary group -> total rows}.

    ``summaries`` must already be in global sort order and non-empty-only.
    """
    offsets: list[int] = []
    totals: dict = {}
    open_g, open_cnt = None, 0

    def close():
        if open_g is not None:
            totals[open_g] = open_cnt

    for s in summaries:
        if s["first"] == open_g:
            offsets.append(open_cnt)
        else:
            close()
            offsets.append(0)
            open_g, open_cnt = s["first"], 0
        if s["first"] == s["last"]:
            # block is entirely one group (first_len == last_len == n)
            open_cnt += s["n"]
        else:
            open_cnt += s["first_len"]
            totals[open_g] = open_cnt
            open_g, open_cnt = s["last"], s["last_len"]
    close()
    return offsets, totals


def _rank_block(
    tbl: pa.Table,
    group_cols: list[str],
    first_offset: int,
    totals: dict,
    finish: Callable[[pa.Table], pa.Table] | None,
) -> pa.Table:
    n = tbl.num_rows
    if n == 0:
        return tbl
    starts, lengths = _group_runs(tbl, group_cols)
    rn = np.arange(n, dtype=np.int64) + 1
    rn -= np.repeat(starts, lengths)
    rn[: lengths[0]] += first_offset
    n_group = np.repeat(lengths, lengths)
    first_g = _key_tuple(tbl, group_cols, 0)
    last_g = _key_tuple(tbl, group_cols, n - 1)
    if first_g in totals:
        n_group[: lengths[0]] = totals[first_g]
    if last_g in totals:
        n_group[n - lengths[-1] :] = totals[last_g]
    out = tbl.append_column("rn", pa.array(rn)).append_column("n_group", pa.array(n_group))
    return finish(out) if finish is not None else out


def global_ranks(
    ds,
    group_cols: list[str],
    order_cols: list[str],
    descending: list[bool] | None = None,
    finish: Callable[[pa.Table], pa.Table] | None = None,
):
    """Attach global per-group ``rn`` (1-based row number in ``order_cols``
    order; include a unique tie-break column for determinism) and ``n_group``
    (group total) to every row of ``ds``; optionally apply ``finish`` (a
    vectorized pa.Table -> pa.Table) inside the same per-block task.

    Returns a new Dataset.  See module docstring for the plan shape.
    """
    import ray
    import ray.data as rd

    sort_cols = list(group_cols) + list(order_cols)
    if descending is None:
        desc = [False] * len(sort_cols)
    else:
        desc = [False] * len(group_cols) + list(descending)
    refs = ds.sort(sort_cols, descending=desc).to_arrow_refs()

    summarize = ray.remote(num_cpus=0.5)(_summary)
    summaries = ray.get([summarize.remote(r, list(group_cols), sort_cols) for r in refs])
    live = [(s, r) for s, r in zip(summaries, refs) if s["n"] > 0]
    if not live:
        return rd.from_arrow_refs(list(refs))
    # order blocks by CONTENT (min sort tuple), not executor block order;
    # descending keys compare inverted, so build a comparable vector
    def order_key(s):
        k = []
        for v, d in zip(s["min_key"], desc):
            k.append(_Inv(v) if d else v)
        return tuple(k)

    live.sort(key=lambda sr: order_key(sr[0]))
    offsets, totals = _boundary_maps([s for s, _ in live])
    rank = ray.remote(_rank_block)
    out = [
        rank.remote(r, list(group_cols), off, totals, finish)
        for (s, r), off in zip(live, offsets)
    ]
    return rd.from_arrow_refs(out)


class _Inv:
    """Inverted-comparison wrapper for descending sort-key components."""

    __slots__ = ("v",)

    def __init__(self, v):
        self.v = v

    def __lt__(self, other):
        return other.v < self.v

    def __eq__(self, other):
        return self.v == other.v

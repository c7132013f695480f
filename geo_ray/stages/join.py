"""Broadcast hash join stage (small dimension side, vectorized probe).

The reference has no equi-joins (SURVEY.md §2.6); this is engine generality
for the training-data/TPC-style workloads: the build side (a dimension table
that fits in worker memory) is loaded ONCE per task/actor — from a ``ray.put``
object ref or straight from its (page-cached) parquet — sorted by key, and
every probe batch matches via ``np.searchsorted`` (two binary-search passes,
no Python per row). Inner join, unique build keys (dimension semantics —
asserted). For large x large joins use the cell/hash co-partition pattern
(stages/copartition.py).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


class BroadcastHashJoin:
    """map_batches callable: inner-join each batch against the build table.

    Parameters
    ----------
    path / build_ref : parquet path of the build side, or a ``ray.put`` ref
        of a ``pyarrow.Table`` (preferred at scale: ship once per node).
    key : join key column name (present on both sides, int64-able).
    columns : build-side columns to attach (default: all but the key).
    probe_key : probe-side key column if named differently.
    """

    def __init__(self, key: str, path: str | None = None, build_ref=None, columns=None, probe_key: str | None = None):
        if build_ref is not None:
            import ray

            table = ray.get(build_ref)
        else:
            import pyarrow.parquet as pq

            table = pq.read_table(path)
        self.key = key
        self.probe_key = probe_key or key
        cols = list(columns) if columns is not None else [c for c in table.column_names if c != key]
        keys = table[key].to_numpy().astype(np.int64)
        order = np.argsort(keys, kind="mergesort")
        self.build_keys = keys[order]
        if self.build_keys.size and (np.diff(self.build_keys) == 0).any():
            raise ValueError(f"build side has duplicate keys in {key!r}")
        self.build_cols = {c: pc.take(table[c].combine_chunks(), pa.array(order)) for c in cols}

    def __call__(self, batch: pa.Table) -> pa.Table:
        probe = batch[self.probe_key].to_numpy().astype(np.int64)
        pos = np.searchsorted(self.build_keys, probe)
        pos_c = np.minimum(pos, max(0, self.build_keys.size - 1))
        hit = (self.build_keys.size > 0) & (self.build_keys[pos_c] == probe)
        out = batch.filter(pa.array(hit)) if not hit.all() else batch
        take = pa.array(pos_c[hit])
        for c, arr in self.build_cols.items():
            out = out.append_column(c, pc.take(arr, take))
        return out

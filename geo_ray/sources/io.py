"""Table IO: Lance-first with Parquet fallback.

The production corpus is Lance tables of interleaved text+media documents
(BASELINE.json ``input_hint``); this sandbox has no ``lance`` package, so the
reader/writer pair resolves the format at import time and the rest of the
engine is format-agnostic (every pipeline takes a ``read_table``-produced
Dataset). Column pruning is pushed into the read either way — a read that
loads all columns for a two-column transform is wrong at 100 TB.
"""

from __future__ import annotations

import os

try:  # pragma: no cover - lance not in this container
    import lance  # noqa: F401

    HAVE_LANCE = True
except ImportError:
    HAVE_LANCE = False


def read_table(path_or_dir: str, columns=None, **kwargs):
    """Read a Lance dataset (if ``path`` is .lance / lance available) or a
    Parquet file/directory into a ``ray.data.Dataset`` with column pruning."""
    import ray.data as rd

    cols = list(columns) if columns is not None else None
    if HAVE_LANCE and (path_or_dir.endswith(".lance") or os.path.isdir(os.path.join(path_or_dir, "_versions"))):
        return rd.read_lance(path_or_dir, columns=cols, **kwargs)
    return rd.read_parquet(path_or_dir, columns=cols, **kwargs)


def write_table(ds, out_dir: str, partition_cols=None, **kwargs):
    """Write a Dataset as Lance when available, else partitioned Parquet.

    Partitioned output (one directory per partition value) is the resume
    contract: deterministic names, skippable on restart (state/checkpoint)."""
    if HAVE_LANCE:  # pragma: no cover - lance not in this container
        return ds.write_lance(out_dir, **kwargs)
    if partition_cols:
        return ds.write_parquet(out_dir, partition_cols=partition_cols, **kwargs)
    return ds.write_parquet(out_dir, **kwargs)


def table_path(sf_dir: str, name: str) -> str:
    """Resolve a testdata table: prefer ``<name>.lance``, else ``<name>.parquet``."""
    lance_path = os.path.join(sf_dir, f"{name}.lance")
    if HAVE_LANCE and os.path.exists(lance_path):
        return lance_path
    return os.path.join(sf_dir, f"{name}.parquet")

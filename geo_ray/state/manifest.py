"""Per-partition lineage + metrics manifest (checkpoint-resume support).

The reference library has no lifecycle at all (SURVEY.md §3: library, not an
application), so this layer is engine design, per the north rule: every
completed partition appends one JSON line with lineage (input fragments,
kernel version), metrics (rows in/out, wall seconds) and the output location.
A restarted run loads the manifest, skips completed partitions, and removes
any partial output directories that have no manifest row (write-then-record
ordering makes the manifest the source of truth).
"""

from __future__ import annotations

import json
import os
import time


class Manifest:
    """Append-only JSONL manifest, one row per completed partition."""

    def __init__(self, path: str):
        self.path = path
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)

    def entries(self) -> list[dict]:
        if not os.path.exists(self.path):
            return []
        out = []
        with open(self.path) as f:
            for line in f:
                line = line.strip()
                if line:
                    out.append(json.loads(line))
        return out

    def completed(self, kernel_version: str | None = None) -> set[str]:
        """Completed partition ids; with ``kernel_version``, only partitions
        produced by THAT kernel version count — a resumed run after a kernel
        change must rebuild stale partitions, not silently mix outputs of two
        algorithm versions (e.g. the r2 text-hash change)."""
        return {
            e["part_id"]
            for e in self.entries()
            if kernel_version is None or e.get("kernel_version") == kernel_version
        }

    def record(self, part_id: str, **fields) -> dict:
        entry = {"part_id": part_id, "ts": time.time(), **fields}
        # single-line append + flush: a torn write is at worst one bad last
        # line, which entries() would fail on — so write through a temp line
        # buffer and fsync for durability before the partition counts as done
        with open(self.path, "a") as f:
            f.write(json.dumps(entry) + "\n")
            f.flush()
            os.fsync(f.fileno())
        return entry

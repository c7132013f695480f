"""OSM ``.poly`` text format reader.

Reference semantics (src/polygon.cc:15-36): skip two header lines, then read
`` lng lat`` pairs while the line starts with a space; stop at the first line
that does not.
"""

from __future__ import annotations

import numpy as np


def read_poly_text(text: str):
    """Parse .poly content -> (lat, lng) float64 arrays."""
    lines = text.split("\n")[2:]
    lats, lngs = [], []
    for line in lines:
        if not line.startswith(" "):
            break
        parts = line.split()
        if len(parts) < 2:
            break
        lng, lat = float(parts[0]), float(parts[1])
        lats.append(lat)
        lngs.append(lng)
    return np.asarray(lats, dtype=np.float64), np.asarray(lngs, dtype=np.float64)


def read_poly_file(path: str):
    with open(path, "r") as f:
        return read_poly_text(f.read())

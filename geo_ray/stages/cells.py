"""Cell / tile assignment stages (vectorized map_batches callables)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from geo_ray.kernels import cell as cell_k
from geo_ray.kernels import tile as tile_k


def assign_cells(batch: pa.Table, zoom: int = 8) -> pa.Table:
    """Append the 32-bit quadkey ``cell`` (tile_hash_32 semantics,
    src/latlng.cc:75-96) and its coarse prefix ``cell_z{zoom}`` — the shuffle
    key for spatial co-partitioning."""
    lat = batch["lat"].to_numpy()
    lng = batch["lng"].to_numpy()
    h = cell_k.tile_hash_32(lat, lng)
    batch = batch.append_column("cell", pa.array(h.astype(np.int64)))
    prefix = cell_k.cell_prefix(h, zoom)
    return batch.append_column(f"cell_z{zoom}", pa.array(prefix.astype(np.int64)))


def assign_tiles(batch: pa.Table, zoom: int = 14) -> pa.Table:
    """Append WebMercator tile coordinates at ``zoom`` (tile.h:166-169
    semantics: pixel // tile_size) plus the packed uint64 tile key."""
    lat = batch["lat"].to_numpy()
    lng = batch["lng"].to_numpy()
    tx, ty = tile_k.latlng_tile(lat, lng, zoom)
    key = tile_k.pack_key(tx, ty, np.full(tx.size, zoom, dtype=np.int64))
    batch = batch.append_column("tile_x", pa.array(tx.astype(np.int64)))
    batch = batch.append_column("tile_y", pa.array(ty.astype(np.int64)))
    batch = batch.append_column("tile_z", pa.array(np.full(tx.size, zoom, dtype=np.int64)))
    return batch.append_column("tile_key", pa.array(key.astype(np.int64)))

"""Distributed segment-crossing self-join via a multi-level grid.

The classic spatial-join problem the reference's geometry kernels feed into
(segment/orientation math: include/geo/detail/ — closest_on_segment family):
find every pair of polyline segments that STRICTLY cross. Exact integer
predicate: coordinates quantize to micro-degrees (int64), orientation =
cross-product sign — no floating-point ties on either side, so the DuckDB
oracle can run the identical arithmetic.

Distribution is a hierarchical ("multi-level") grid join, the shape used by
PostGIS/Sedona-style engines:

- each segment gets a HOME level where one grid cell is at least as large as
  its bbox span (cell size at level l = 2^(29-l) micro-degree units), then
  emits its bbox cover cells at its home level AND every coarser level;
- a pair's CANONICAL cell is the cell at level Lc = min(home_a, home_b)
  containing the upper-left corner of the bbox intersection — a pure function
  of the pair, so each cell task emits exactly the pairs canonical to it and
  NO global dedup shuffle is needed. One member of every pair sits at its
  home level in the canonical cell, so candidates are home-rows x all-rows,
  never all x all;
- coarse levels (<= SALT_LEVEL) are SALTED: a cell's home rows split across
  SALT slices by segment hash and its probe rows replicate to every slice —
  the home x all pair space partitions exactly, so the hottest world-spanning
  cells parallelize instead of serializing one task (the measured 18.7 s
  straggler on the test corpus);
- per-cell verification is a vectorized orientation test, chunked so the
  temporaries stay cache-resident (large per-iteration temporaries trip the
  sandbox's allocator/bandwidth cliff).

Skew note for 100 TB: geometry with global extent homes at coarse levels —
testing a world-spanning segment against everything it overlaps is inherent
to the data; the salt bounds per-task work, and local-extent corpora (roads,
trajectories) home at fine levels where the grid spreads uniformly.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

# world grid: micro-degree coords shifted non-negative, cell = 2^(29-l) units
_SHIFT_X = 180_000_000
_SHIFT_Y = 90_000_000
_K = 29  # 2^29 > 360e6
LMAX = 20  # finest level: 512 micro-deg (~55 m) cells
SALT_LEVEL = 6  # levels 0..6 get salted
SALT = 8

_GX_BITS = 20


def doc_segments(batch: pa.Table) -> pa.Table:
    """documents (doc_id) -> one row per polyline segment in EXACT
    micro-degree fixed point: (doc_id, seg_idx, ax, ay, bx, by) with
    x = round_half_away(lng * 1e6), y likewise for lat — bit-identical to
    the SQL twin's CAST(ROUND(lng*1000000, 0) AS BIGINT)."""
    from geo_ray.kernels import fixed as fixed_k
    from geo_ray.sources import derive

    doc_id = batch["doc_id"].to_numpy().astype(np.int64)
    keep = doc_id % 4 >= 2
    docs = doc_id[keep]
    if docs.size == 0:
        return pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "seg_idx": pa.array([], pa.int64()),
                "ax": pa.array([], pa.int64()),
                "ay": pa.array([], pa.int64()),
                "bx": pa.array([], pa.int64()),
                "by": pa.array([], pa.int64()),
            }
        )
    d_rep, pt_idx, lat, lng = derive.derive_points(docs)
    x = fixed_k.round_half_away(lng * 1e6, 0).astype(np.int64)
    y = fixed_k.round_half_away(lat * 1e6, 0).astype(np.int64)
    # consecutive points of the same doc form a segment
    same = d_rep[1:] == d_rep[:-1]
    i = np.flatnonzero(same)
    return pa.table(
        {
            "doc_id": pa.array(d_rep[i]),
            "seg_idx": pa.array(pt_idx[i].astype(np.int64)),
            "ax": pa.array(x[i]),
            "ay": pa.array(y[i]),
            "bx": pa.array(x[i + 1]),
            "by": pa.array(y[i + 1]),
        }
    )


def _home_level(span: np.ndarray) -> np.ndarray:
    """Finest level whose cell size (2^(29-l)) exceeds the bbox span:
    l = 29 - bit_length(span); span >= 1. Clamped to [0, LMAX]."""
    bl = np.floor(np.log2(np.maximum(span, 1))).astype(np.int64) + 1
    return np.clip(_K - bl, 0, LMAX)


def pack_cell(level, gx, gy, salt) -> np.ndarray:
    """(level, gx, gy, salt) -> one int64 key:
    salt<<45 | level<<40 | gx<<20 | gy (gx, gy < 2^20 at LMAX=20)."""
    return (
        (np.asarray(salt, dtype=np.int64) << np.int64(45))
        | (np.asarray(level, dtype=np.int64) << np.int64(40))
        | (np.asarray(gx, dtype=np.int64) << np.int64(_GX_BITS))
        | np.asarray(gy, dtype=np.int64)
    )


def _mix_seg(doc: np.ndarray, seg: np.ndarray) -> np.ndarray:
    """Cheap deterministic per-segment hash for salt assignment."""
    h = (doc << np.int64(2)) | seg
    h = (h ^ (h >> np.int64(16))) * np.int64(0x45D9F3B)
    return (h ^ (h >> np.int64(16))) & np.int64(0x7FFFFFFF)


def home_level_flags(batch: pa.Table) -> pa.Table:
    """Per-batch partial: which grid levels have at least one segment homed
    there — a (level, one) row per occupied level. The merged ~30-element
    set drives probe pruning in :func:`explode_cover_cells`."""
    x0 = np.minimum(batch["ax"].to_numpy(), batch["bx"].to_numpy())
    x1 = np.maximum(batch["ax"].to_numpy(), batch["bx"].to_numpy())
    y0 = np.minimum(batch["ay"].to_numpy(), batch["by"].to_numpy())
    y1 = np.maximum(batch["ay"].to_numpy(), batch["by"].to_numpy())
    lv = np.unique(_home_level(np.maximum(x1 - x0, y1 - y0)))
    return pa.table(
        {"level": pa.array(lv), "one": pa.array(np.ones(lv.size, dtype=np.int64))}
    )


def active_home_levels(segs_ds) -> frozenset[int]:
    """Merged set of levels with >= 1 homed segment (tiny driver state:
    at most LMAX+1 integers)."""
    from ray.data.aggregate import Max

    t = (
        segs_ds.map_batches(home_level_flags, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("level")
        .aggregate(Max("one", alias_name="m"))
    )
    return frozenset(int(r["level"]) for r in t.take_all())


def explode_cover_cells(batch: pa.Table, active_levels=None) -> pa.Table:
    """segment rows -> (cell, home, is_home, doc_id, seg_idx, ax..by) rows:
    bbox cover at the segment's home level and every coarser ACTIVE level;
    cover at any level l <= home is at most 2x2 cells. Salted levels emit the
    home row into its hash slice plus probe copies into the other slices.

    ``active_levels`` (from :func:`active_home_levels`) prunes probe
    emission: a pair's canonical level is min(home_a, home_b), which by
    definition has a homed segment, so probes at never-homed levels can't
    participate in any pair. On local-extent geometry (homes concentrated at
    fine levels) this collapses the emission from ~(home x SALT) rows per
    segment to a handful and removes the world-spanning coarse cells from
    the shuffle entirely. ``None`` emits at every level (always sound)."""
    cols = {c: batch[c].to_numpy() for c in batch.column_names}
    n = len(cols["doc_id"])
    if n == 0:
        empty = {
            "cell": pa.array([], pa.int64()),
            "home": pa.array([], pa.int64()),
            "is_home": pa.array([], pa.int8()),
        }
        empty |= {c: pa.array([], pa.int64()) for c in batch.column_names}
        return pa.table(empty)
    x0 = np.minimum(cols["ax"], cols["bx"]) + _SHIFT_X
    x1 = np.maximum(cols["ax"], cols["bx"]) + _SHIFT_X
    y0 = np.minimum(cols["ay"], cols["by"]) + _SHIFT_Y
    y1 = np.maximum(cols["ay"], cols["by"]) + _SHIFT_Y
    home = _home_level(np.maximum(x1 - x0, y1 - y0))
    own_salt = _mix_seg(cols["doc_id"], cols["seg_idx"]) % np.int64(SALT)
    out_cell, out_idx, out_flag = [], [], []

    def emit(idx, level, gx, gy, salt, flag):
        out_cell.append(pack_cell(np.full(idx.size, level, dtype=np.int64), gx, gy, salt))
        out_idx.append(idx)
        out_flag.append(
            np.full(idx.size, flag, dtype=np.int8)
            if isinstance(flag, int)
            else flag.astype(np.int8)
        )

    # vectorized per level: all segments whose home >= l emit their cover at l
    for l in range(LMAX + 1):
        if active_levels is not None and l not in active_levels:
            continue
        m = np.flatnonzero(home >= l)
        if m.size == 0:
            continue
        s = np.int64(_K - l)
        gx0, gx1 = x0[m] >> s, x1[m] >> s
        gy0, gy1 = y0[m] >> s, y1[m] >> s
        at_home = home[m] == l
        for dx in (0, 1):
            for dy in (0, 1):
                # each distinct cover cell exactly once (cover <= 2x2)
                k = np.flatnonzero((gx0 + dx <= gx1) & (gy0 + dy <= gy1))
                if k.size == 0:
                    continue
                idx, gx, gy = m[k], gx0[k] + dx, gy0[k] + dy
                if l > SALT_LEVEL:
                    emit(idx, l, gx, gy, 0, at_home[k])
                else:
                    hk = at_home[k]
                    # home rows: flagged, own salt slice only
                    if hk.any():
                        hsel = np.flatnonzero(hk)
                        emit(idx[hsel], l, gx[hsel], gy[hsel], own_salt[idx[hsel]], 1)
                    # probe copies: every slice except a home row's own
                    for sv in range(SALT):
                        skip = hk & (own_salt[idx] == sv)
                        psel = np.flatnonzero(~skip)
                        if psel.size:
                            emit(idx[psel], l, gx[psel], gy[psel], sv, 0)
    cell = np.concatenate(out_cell)
    idx = np.concatenate(out_idx)
    data = {
        "cell": pa.array(cell),
        "home": pa.array(home[idx]),
        "is_home": pa.array(np.concatenate(out_flag)),
    }
    for c in batch.column_names:
        data[c] = pa.array(cols[c][idx])
    return pa.table(data)


def _orient(px, py, qx, qy, rx, ry):
    """Sign-exact int64 cross product (q-p) x (r-p); |coords| <= 3.6e8 so the
    products stay < 2^58 — no overflow."""
    return (qx - px) * (ry - py) - (qy - py) * (rx - px)


_CHUNK_PAIRS = 1 << 20


def _iter_crossing_chunks(group):
    """Shared candidate machinery for the per-bucket crossing stages: yield
    ``(cols, i, j)`` per cache-resident chunk, where ``cols`` is the dict of
    slice-local column arrays for one grid-cell run and ``(i, j)`` index the
    STRICTLY-CROSSING pairs found in that chunk — each pair globally exactly
    once via the canonical-cell gate.

    Pairing rule inside a (cell, salt) group: the flagged (home) rows pair
    against every row; a pair of two home rows is kept only from its
    lexicographically-smaller flagged side, which makes the emission exactly
    once across salt slices too. Work is chunked to _CHUNK_PAIRS candidate
    pairs so temporaries stay cache-resident."""
    from geo_ray.stages.agg import np_col

    cell = np_col(group, "cell")
    if cell.size == 0:
        return
    names = group.column_names if isinstance(group, pa.Table) else group.columns
    order = np.argsort(cell, kind="mergesort")
    g = {c: np_col(group, c)[order] for c in names}
    cell = cell[order]
    starts = np.flatnonzero(np.concatenate([[True], cell[1:] != cell[:-1]]))
    lens = np.diff(np.concatenate([starts, [cell.size]]))
    gmask = np.int64((1 << _GX_BITS) - 1)
    for st, ln in zip(starts[lens >= 2], lens[lens >= 2]):
        sl = slice(st, st + ln)
        cols = {c: g[c][sl] for c in g}
        doc, seg = cols["doc_id"], cols["seg_idx"]
        ax, ay, bx, by = cols["ax"], cols["ay"], cols["bx"], cols["by"]
        home, flag = cols["home"], cols["is_home"]
        level = (cell[st] >> np.int64(40)) & np.int64(0x1F)
        cgx = (cell[st] >> np.int64(_GX_BITS)) & gmask
        cgy = cell[st] & gmask
        hm = np.flatnonzero(flag == 1)
        if hm.size == 0:
            continue
        n = doc.size
        minx, maxx = np.minimum(ax, bx), np.maximum(ax, bx)
        miny, maxy = np.minimum(ay, by), np.maximum(ay, by)
        key = (doc << np.int64(2)) | seg
        sh = np.int64(_K - level)
        rows_per_chunk = max(1, _CHUNK_PAIRS // n)
        for c0 in range(0, hm.size, rows_per_chunk):
            hs = hm[c0 : c0 + rows_per_chunk]
            i = np.repeat(hs, n)
            j = np.tile(np.arange(n, dtype=np.int64), hs.size)
            # home x all; both-home pairs only from the smaller flagged side
            keep = np.where(
                (home[j] == level) | (flag[j] == 1), key[i] < key[j], i != j
            )
            i, j = i[keep], j[keep]
            # canonical-cell gate (kills duplicates across cells/levels)
            cx0 = np.maximum(minx[i], minx[j]) + _SHIFT_X
            cy0 = np.maximum(miny[i], miny[j]) + _SHIFT_Y
            m = (cx0 >> sh == cgx) & (cy0 >> sh == cgy)
            # bbox overlap (corner implies >= both mins; check the far sides)
            m &= (cx0 - _SHIFT_X <= np.minimum(maxx[i], maxx[j])) & (
                cy0 - _SHIFT_Y <= np.minimum(maxy[i], maxy[j])
            )
            if not m.any():
                continue
            i, j = i[m], j[m]
            o1 = _orient(ax[i], ay[i], bx[i], by[i], ax[j], ay[j])
            o2 = _orient(ax[i], ay[i], bx[i], by[i], bx[j], by[j])
            o3 = _orient(ax[j], ay[j], bx[j], by[j], ax[i], ay[i])
            o4 = _orient(ax[j], ay[j], bx[j], by[j], bx[i], by[i])
            x = (((o1 > 0) & (o2 < 0)) | ((o1 < 0) & (o2 > 0))) & (
                ((o3 > 0) & (o4 < 0)) | ((o3 < 0) & (o4 > 0))
            )
            if not x.any():
                continue
            yield cols, i[x], j[x]


def cell_crossing_counts(group):
    """Per grid-cell bucket: vectorized strict-crossing test
    (:func:`_iter_crossing_chunks`) with the output already reduced to
    per-segment PARTIAL counts, so the final shuffle carries one row per
    (segment, bucket), not one per crossing pair (pair count is inherently
    quadratic on overlapping geometry)."""
    acc_doc, acc_seg = [], []
    for cols, i, j in _iter_crossing_chunks(group):
        acc_doc.append(cols["doc_id"][i])
        acc_doc.append(cols["doc_id"][j])
        acc_seg.append(cols["seg_idx"][i])
        acc_seg.append(cols["seg_idx"][j])
    if not acc_doc:
        return pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "seg_idx": pa.array([], pa.int64()),
                "n_partial": pa.array([], pa.int64()),
            }
        )
    d = np.concatenate(acc_doc)
    sgi = np.concatenate(acc_seg)
    key = (d << np.int64(2)) | sgi  # seg_idx in 1..3
    uk, counts = np.unique(key, return_counts=True)
    return pa.table(
        {
            "doc_id": pa.array(uk >> np.int64(2)),
            "seg_idx": pa.array(uk & np.int64(3)),
            "n_partial": pa.array(counts.astype(np.int64)),
        }
    )


def cell_crossing_points(group):
    """Per grid-cell bucket: the EXACT intersection point of every strictly
    crossing pair — the overlay/map-conflation primitive on top of the same
    exactly-once candidate machinery as :func:`cell_crossing_counts`.

    Parity design (mirrored op-for-op by the SQL twin): each pair is first
    canonicalized so segment ``a`` is the lexicographically smaller
    (doc_id, seg_idx); the line-intersection parameter is then
    ``t = tnum / d`` with ``d = dxa*dyb - dya*dxb`` and
    ``tnum = (axb-axa)*dyb - (ayb-aya)*dxb`` both computed EXACTLY in int64
    (|products| < 2^59, d != 0 for a strict crossing), cast to float64
    (IEEE round-nearest — identical in DuckDB), and the point is
    ``x = axa + t*dxa`` / ``y = aya + t*dya`` in micro-degrees, rounded
    half-away to 3 dp on both sides. Output is the true crossing set —
    unavoidable for this op; everything upstream stays partial/pruned."""
    from geo_ray.kernels import fixed as fixed_k

    acc = {k: [] for k in ("da", "sa", "db", "sb", "x", "y")}
    for cols, i, j in _iter_crossing_chunks(group):
        key = (cols["doc_id"] << np.int64(2)) | cols["seg_idx"]
        swap = key[j] < key[i]
        a = np.where(swap, j, i)
        b = np.where(swap, i, j)
        axa, aya = cols["ax"][a], cols["ay"][a]
        dxa = cols["bx"][a] - axa
        dya = cols["by"][a] - aya
        dxb = cols["bx"][b] - cols["ax"][b]
        dyb = cols["by"][b] - cols["ay"][b]
        d = dxa * dyb - dya * dxb
        tnum = (cols["ax"][b] - axa) * dyb - (cols["ay"][b] - aya) * dxb
        t = tnum.astype(np.float64) / d.astype(np.float64)
        acc["da"].append(cols["doc_id"][a])
        acc["sa"].append(cols["seg_idx"][a])
        acc["db"].append(cols["doc_id"][b])
        acc["sb"].append(cols["seg_idx"][b])
        acc["x"].append(axa.astype(np.float64) + t * dxa.astype(np.float64))
        acc["y"].append(aya.astype(np.float64) + t * dya.astype(np.float64))
    if not acc["da"]:
        return pa.table(
            {
                "doc_a": pa.array([], pa.int64()),
                "seg_a": pa.array([], pa.int64()),
                "doc_b": pa.array([], pa.int64()),
                "seg_b": pa.array([], pa.int64()),
                "x_um": pa.array([], pa.float64()),
                "y_um": pa.array([], pa.float64()),
            }
        )
    return pa.table(
        {
            "doc_a": pa.array(np.concatenate(acc["da"])),
            "seg_a": pa.array(np.concatenate(acc["sa"])),
            "doc_b": pa.array(np.concatenate(acc["db"])),
            "seg_b": pa.array(np.concatenate(acc["sb"])),
            "x_um": pa.array(fixed_k.round_half_away(np.concatenate(acc["x"]), 3)),
            "y_um": pa.array(fixed_k.round_half_away(np.concatenate(acc["y"]), 3)),
        }
    )

"""Segment-crossing self-join: the multi-level-grid distributed plan must
equal a brute-force all-pairs orientation scan, and the canonical-cell rule
must count every crossing pair exactly once regardless of partitioning."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _brute_counts(segs: pa.Table) -> pd.DataFrame:
    from geo_ray.stages.segjoin import _orient

    doc = segs["doc_id"].to_numpy()
    seg = segs["seg_idx"].to_numpy()
    ax, ay, bx, by = (segs[c].to_numpy() for c in ("ax", "ay", "bx", "by"))
    n = doc.size
    iu, ju = np.triu_indices(n, 1)
    o1 = _orient(ax[iu], ay[iu], bx[iu], by[iu], ax[ju], ay[ju])
    o2 = _orient(ax[iu], ay[iu], bx[iu], by[iu], bx[ju], by[ju])
    o3 = _orient(ax[ju], ay[ju], bx[ju], by[ju], ax[iu], ay[iu])
    o4 = _orient(ax[ju], ay[ju], bx[ju], by[ju], bx[iu], by[iu])
    x = (((o1 > 0) & (o2 < 0)) | ((o1 < 0) & (o2 > 0))) & (
        ((o3 > 0) & (o4 < 0)) | ((o3 < 0) & (o4 > 0))
    )
    sides_d = np.concatenate([doc[iu[x]], doc[ju[x]]])
    sides_s = np.concatenate([seg[iu[x]], seg[ju[x]]])
    key = (sides_d << np.int64(2)) | sides_s
    uk, counts = np.unique(key, return_counts=True)
    return pd.DataFrame(
        {
            "doc_id": uk >> np.int64(2),
            "seg_idx": uk & np.int64(3),
            "n_cross": counts.astype(np.int64),
        }
    )


def test_segment_crossings_match_brute_force(ray_session):
    from geo_ray.pipelines import queries as Q
    from geo_ray.stages import segjoin

    docs = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id"])
    segs = segjoin.doc_segments(docs)
    want = _brute_counts(segs).sort_values(["doc_id", "seg_idx"]).reset_index(drop=True)
    got = (
        Q.q_segment_crossings(SF)
        .to_pandas()
        .sort_values(["doc_id", "seg_idx"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got.astype(np.int64), want.astype(np.int64))


def test_canonical_cell_exactly_once_on_synthetic_grid(ray_session):
    """A dense synthetic segment soup (every pair's bboxes overlap across
    several grid levels) still counts each crossing exactly once: the
    single-partition run equals the brute force, and doubling the shuffle
    fan-out cannot change the result (partitioning invariance comes free
    because the canonical cell is a pure function of the pair)."""
    from geo_ray.stages import segjoin
    from geo_ray.stages.agg import hash_bucket_apply

    import ray.data as rd

    rng = np.random.default_rng(7)
    n = 120
    ax = rng.integers(-170_000_000, 170_000_000, n)
    ay = rng.integers(-80_000_000, 80_000_000, n)
    # mix of global and local segments to span many home levels
    span = np.where(rng.random(n) < 0.5, 10_000, 120_000_000)
    bx = ax + rng.integers(-1, 2, n) * span
    by = ay + rng.integers(-1, 2, n) * span
    segs = pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "seg_idx": pa.array(np.ones(n, dtype=np.int64)),
            "ax": pa.array(ax.astype(np.int64)),
            "ay": pa.array(ay.astype(np.int64)),
            "bx": pa.array(np.clip(bx, -179_999_999, 179_999_999).astype(np.int64)),
            "by": pa.array(np.clip(by, -89_999_999, 89_999_999).astype(np.int64)),
        }
    )
    want = _brute_counts(segs).sort_values(["doc_id", "seg_idx"]).reset_index(drop=True)
    cells = segjoin.explode_cover_cells(segs)
    for nb in (3, 17):
        c = cells["cell"].to_numpy()
        ds = rd.from_arrow(cells.append_column("bucket", pa.array(c % np.int64(nb))))
        partials = hash_bucket_apply(ds, "bucket", segjoin.cell_crossing_counts, num_blocks=nb)
        got = (
            partials.to_pandas()
            .groupby(["doc_id", "seg_idx"], as_index=False)["n_partial"]
            .sum()
            .rename(columns={"n_partial": "n_cross"})
            .sort_values(["doc_id", "seg_idx"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got.astype(np.int64), want.astype(np.int64))


def test_active_level_pruning_is_lossless(ray_session):
    """Probe emission pruned to active home levels must leave the counted
    pairs identical: a pair's canonical level always hosts a home row."""
    import ray.data as rd

    from geo_ray.stages import segjoin
    from geo_ray.stages.agg import hash_bucket_apply

    rng = np.random.default_rng(23)
    n = 150
    ax = rng.integers(-170_000_000, 170_000_000, n)
    ay = rng.integers(-80_000_000, 80_000_000, n)
    span = np.where(rng.random(n) < 0.6, 20_000, 90_000_000)
    bx = np.clip(ax + rng.integers(-1, 2, n) * span, -179_999_999, 179_999_999)
    by = np.clip(ay + rng.integers(-1, 2, n) * span, -89_999_999, 89_999_999)
    segs = pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "seg_idx": pa.array(np.ones(n, dtype=np.int64)),
            "ax": pa.array(ax.astype(np.int64)),
            "ay": pa.array(ay.astype(np.int64)),
            "bx": pa.array(bx.astype(np.int64)),
            "by": pa.array(by.astype(np.int64)),
        }
    )
    active = segjoin.active_home_levels(rd.from_arrow(segs))
    assert 0 < len(active) <= segjoin.LMAX + 1

    def run(active_levels):
        cells = segjoin.explode_cover_cells(segs, active_levels=active_levels)
        c = cells["cell"].to_numpy()
        ds = rd.from_arrow(cells.append_column("bucket", pa.array(c % np.int64(7))))
        out = hash_bucket_apply(ds, "bucket", segjoin.cell_crossing_counts, num_blocks=7)
        df = (
            out.to_pandas()
            .groupby(["doc_id", "seg_idx"], as_index=False)["n_partial"]
            .sum()
            .sort_values(["doc_id", "seg_idx"])
            .reset_index(drop=True)
        )
        return df

    pruned = run(active)
    full = run(None)
    pd.testing.assert_frame_equal(pruned, full)
    # pruning actually removed rows on this mixed corpus
    assert (
        segjoin.explode_cover_cells(segs, active_levels=active).num_rows
        <= segjoin.explode_cover_cells(segs).num_rows
    )


def test_segment_intersections_match_brute_force(ray_session):
    """Intersection points: exactly-once pair set AND bit-identical float64
    coordinates versus an independent all-pairs derivation (canonical
    lex-smaller-first op order)."""
    from geo_ray.kernels import fixed as fixed_k
    from geo_ray.pipelines import queries as Q
    from geo_ray.stages.segjoin import _orient

    docs = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id"])
    from geo_ray.stages import segjoin

    segs = segjoin.doc_segments(docs)
    doc = segs["doc_id"].to_numpy()
    seg = segs["seg_idx"].to_numpy()
    ax, ay, bx, by = (segs[c].to_numpy() for c in ("ax", "ay", "bx", "by"))
    # lex order by (doc, seg) so triu pairs are already canonical a<b
    key = (doc << np.int64(2)) | seg
    o = np.argsort(key, kind="mergesort")
    doc, seg, ax, ay, bx, by = doc[o], seg[o], ax[o], ay[o], bx[o], by[o]
    iu, ju = np.triu_indices(doc.size, 1)
    o1 = _orient(ax[iu], ay[iu], bx[iu], by[iu], ax[ju], ay[ju])
    o2 = _orient(ax[iu], ay[iu], bx[iu], by[iu], bx[ju], by[ju])
    o3 = _orient(ax[ju], ay[ju], bx[ju], by[ju], ax[iu], ay[iu])
    o4 = _orient(ax[ju], ay[ju], bx[ju], by[ju], bx[iu], by[iu])
    x = (((o1 > 0) & (o2 < 0)) | ((o1 < 0) & (o2 > 0))) & (
        ((o3 > 0) & (o4 < 0)) | ((o3 < 0) & (o4 > 0))
    )
    a, b = iu[x], ju[x]
    dxa, dya = bx[a] - ax[a], by[a] - ay[a]
    dxb, dyb = bx[b] - ax[b], by[b] - ay[b]
    d = dxa * dyb - dya * dxb
    tnum = (ax[b] - ax[a]) * dyb - (ay[b] - ay[a]) * dxb
    t = tnum.astype(np.float64) / d.astype(np.float64)
    want = pd.DataFrame(
        {
            "doc_a": doc[a],
            "seg_a": seg[a],
            "doc_b": doc[b],
            "seg_b": seg[b],
            "x_um": fixed_k.round_half_away(ax[a].astype(np.float64) + t * dxa.astype(np.float64), 3),
            "y_um": fixed_k.round_half_away(ay[a].astype(np.float64) + t * dya.astype(np.float64), 3),
        }
    ).sort_values(["doc_a", "seg_a", "doc_b", "seg_b"]).reset_index(drop=True)
    got = (
        Q.q_segment_intersections(SF)
        .to_pandas()
        .sort_values(["doc_a", "seg_a", "doc_b", "seg_b"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)

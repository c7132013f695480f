"""Hypothesis property tests (reference test style §5.3: roundtrip/property).

Bounded example counts keep the suite fast; all generators are seeded by
hypothesis' deterministic default profile.
"""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from geo_ray.kernels import box as box_k
from geo_ray.kernels import codec as codec_k
from geo_ray.kernels import mercator as merc_k
from geo_ray.kernels import simplify as simp_k
from geo_ray.kernels import strhash
from geo_ray.stages.dedup import hash_str64

lat_st = st.floats(min_value=-85.0, max_value=85.0, allow_nan=False, width=64)
lng_st = st.floats(min_value=-179.999, max_value=179.999, allow_nan=False, width=64)
coords_st = st.lists(st.tuples(lat_st, lng_st), min_size=2, max_size=40)


@settings(max_examples=50, deadline=None)
@given(coords_st, st.integers(min_value=4, max_value=6))
def test_polyline_codec_roundtrip(coords, precision):
    lat = np.array([c[0] for c in coords])
    lng = np.array([c[1] for c in coords])
    enc = codec_k.encode_polyline(lat, lng, precision)
    dlat, dlng = codec_k.decode_polyline(enc, precision)
    scale = 10.0**precision
    assert np.allclose(dlat, np.round(lat * scale) / scale, atol=1e-9)
    assert np.allclose(dlng, np.round(lng * scale) / scale, atol=1e-9)


@settings(max_examples=50, deadline=None)
@given(
    st.integers(min_value=0, max_value=4095),
    st.integers(min_value=0, max_value=4095),
    st.integers(min_value=0, max_value=10),
)
def test_pixel_merc_latlng_roundtrip_stable(px, py, z):
    """pixel -> merc -> latlng -> merc -> pixel within 1 pixel, merc exact-ish
    (webmercator_test.cc:91-117: Approx epsilon(1) on pixels)."""
    pxa = np.array([px], dtype=np.int64)
    pya = np.array([py], dtype=np.int64)
    mx, my = merc_k.pixel_to_merc(pxa, pya, z, 4096)
    lat, lng = merc_k.merc_to_latlng(mx, my)
    mx2, my2 = merc_k.latlng_to_merc(lat, lng)
    assert np.allclose(mx, mx2, rtol=1e-9, atol=1e-6)
    assert np.allclose(my, my2, rtol=1e-9, atol=1e-6)
    px2, py2 = merc_k.latlng_to_pixel(lat, lng, z, 4096)
    assert abs(int(px2[0]) - px) <= 1 and abs(int(py2[0]) - py) <= 1


@settings(max_examples=50, deadline=None)
@given(st.lists(st.text(min_size=0, max_size=24), min_size=0, max_size=12))
def test_fnv1a_vectorized_equals_scalar(tokens):
    toks = [t.replace(" ", "x").encode("utf-8") for t in tokens]
    toks = [t for t in toks if b"\x00" not in t]
    got = strhash.fnv1a_bytes(toks)
    want = np.array([hash_str64(t.decode("utf-8")) for t in toks], dtype=np.uint64)
    assert got.size == want.size and (got == want).all()


@settings(max_examples=50, deadline=None)
@given(coords_st, st.floats(min_value=1.0, max_value=500000.0, allow_nan=False))
def test_box_extend_contains_original(coords, dist):
    lat = np.array([c[0] for c in coords])
    lng = np.array([c[1] for c in coords])
    b = box_k.make_box(lat, lng)
    e = box_k.extend_meters(*b, dist)
    assert e[0] <= b[0] and e[1] <= b[1] and e[2] >= b[2] and e[3] >= b[3]


@settings(max_examples=25, deadline=None)
@given(coords_st)
def test_simplify_mask_monotone_and_endpoints(coords):
    """Higher zoom keeps a superset of vertices (simplify_mask_test.cc:69-91);
    first and last vertex always kept."""
    lat = np.array([c[0] for c in coords])
    lng = np.array([c[1] for c in coords])
    masks = simp_k.make_simplify_mask(lat, lng)
    assert len(masks) == 21
    for z in range(20):
        assert not (masks[z] & ~masks[z + 1]).any(), f"z{z} keeps a vertex z{z+1} drops"
    for m in masks:
        assert m[0] and m[-1]


@settings(max_examples=50, deadline=None)
@given(st.lists(st.text(max_size=80), min_size=1, max_size=30))
def test_text_hashes_arrow_equals_scalar(texts):
    import hashlib

    import pyarrow as pa

    h1, h2, lens = strhash.text_hashes_arrow(pa.array(texts, type=pa.string()))
    for i, t in enumerate(texts):
        assert lens[i] == len(t.encode("utf-8"))
        d = hashlib.blake2b(t.encode("utf-8"), digest_size=16).digest()
        assert int(np.uint64(h1[i])) == int.from_bytes(d[:8], "little")
        assert int(np.uint64(h2[i])) == int.from_bytes(d[8:], "little")


@settings(max_examples=50, deadline=None)
@given(
    st.integers(min_value=0, max_value=6),
    st.integers(min_value=0, max_value=200),
)
def test_tile_iterator_decrement_inverts_increment(z, steps):
    from geo_ray.kernels.tile_iter import TileIterator

    it = TileIterator(0, 0, z)
    seen = [it.tile]
    for _ in range(steps):
        it.increment()
        seen.append(it.tile)
    for want in reversed(seen[:-1]):
        it.decrement()
        assert it.tile == want


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.floats(min_value=-1e8, max_value=1e8, allow_nan=False, width=64),
        min_size=1,
        max_size=50,
    ),
    st.integers(min_value=0, max_value=6),
)
def test_round_half_away_matches_duckdb(xs, nd):
    import duckdb

    from geo_ray.kernels.fixed import round_half_away

    got = round_half_away(np.array(xs), nd)
    vals = ", ".join(f"({x!r})" for x in xs)
    want = duckdb.sql(
        f"SELECT ROUND(CAST(v AS DOUBLE), {nd}) FROM (VALUES {vals}) t(v)"
    ).fetchnumpy()
    want = list(want.values())[0]
    assert (got == want).all(), (xs, nd, got, want)


def test_round_half_away_pinned_ties():
    from geo_ray.kernels.fixed import round_half_away

    assert round_half_away(np.array([2.5, 3.5, -2.5, 0.5]), 0).tolist() == [3.0, 4.0, -3.0, 1.0]
    assert round_half_away(np.array([15541650.2933725]), 6)[0] == 15541650.293373

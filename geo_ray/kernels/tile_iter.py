"""Tile pyramid iteration — the reference's bidirectional auto-descend
traversal (include/geo/tile.h:45-137, src/tile.cc:5-76), re-derived.

This is the one piece of the tile surface that is inherently a DRIVER-side
generator: a ``tile_range`` walks tiles in row-major order within iterator
bounds and, when it exhausts a level, descends to the next zoom (bounds
doubled) — ``make_tile_pyramid`` walks the whole pyramid z0..z20 this way.
The distributed engine enumerates covers vectorized (``kernels.tile``); this
module exists for API parity and for driver-side pyramid scheduling (e.g.
emitting one Ray Data partition spec per pyramid slice).

Semantics pinned against /root/reference/test/tile_test.cc:15-196 (ported in
tests/test_tile_iter.py):
- ``Tile.range_on_z`` / ``bounds_on_z``  -> src/tile.cc:9-35
- ``make_tile_range(z)``                 -> src/tile.cc:37-42
- ``make_tile_range(x1, y1, x2, y2, z)`` -> src/tile.cc:44-52 (inclusive!)
- ``tile_range_on_z``                    -> src/tile.cc:54-76
- ``make_tile_pyramid``                  -> tile.h:174-177
- iterator ++/-- auto-descend/ascend     -> tile.h:61-105
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import total_ordering

MAX_ZOOM = 20  # default_webmercator (webmercator.h:178,261)


@dataclass(frozen=True)
class Bounds:
    """Half-open iterator bounds [minx, maxx) x [miny, maxy) at one zoom."""

    minx: int
    miny: int
    maxx: int
    maxy: int


def make_no_bounds(z: int) -> Bounds:
    return Bounds(0, 0, 1 << z, 1 << z)


@total_ordering
@dataclass(frozen=True)
class Tile:
    x: int
    y: int
    z: int

    def _key(self):
        return (self.z, self.x, self.y)

    def __lt__(self, other):
        return self._key() < other._key()

    def parent(self) -> "Tile":
        return Tile(self.x >> 1, self.y >> 1, self.z - 1)

    def quad_pos(self) -> int:
        return ((self.y % 2) << 1) | (self.x % 2)

    def as_tile_range(self) -> "TileRange":
        return self.range_on_z(self.z)

    def direct_children(self) -> "TileRange":
        return self.range_on_z(self.z + 1)

    def range_on_z(self, z: int) -> "TileRange":
        if self.z < z:
            dz = z - self.z
            return make_tile_range(
                self.x << dz, self.y << dz, ((self.x + 1) << dz) - 1, ((self.y + 1) << dz) - 1, z
            )
        dz = self.z - z
        return make_tile_range(self.x >> dz, self.y >> dz, self.x >> dz, self.y >> dz, z)

    def bounds_on_z(self, z: int) -> Bounds:
        if self.z < z:
            dz = z - self.z
            return Bounds(self.x << dz, self.y << dz, (self.x + 1) << dz, (self.y + 1) << dz)
        dz = self.z - z
        return Bounds(self.x >> dz, self.y >> dz, (self.x >> dz) + 1, (self.y >> dz) + 1)


class TileIterator:
    """Bidirectional pyramid iterator: row-major within bounds, descending a
    zoom level (bounds doubled) on overflow, ascending (bounds halved) on
    underflow. Equality/ordering compare (z, x, y) only, like the C++."""

    __slots__ = ("tile", "bounds")

    def __init__(self, x: int = 0, y: int = 0, z: int = 0, bounds: Bounds | None = None):
        self.tile = Tile(x, y, z)
        self.bounds = bounds if bounds is not None else make_no_bounds(z)

    @classmethod
    def at_zoom(cls, z: int) -> "TileIterator":
        return cls(0, 0, z, make_no_bounds(z))

    def copy(self) -> "TileIterator":
        return TileIterator(self.tile.x, self.tile.y, self.tile.z, self.bounds)

    def increment(self) -> "TileIterator":
        x, y, z = self.tile.x + 1, self.tile.y, self.tile.z
        b = self.bounds
        if x == b.maxx:
            x = b.minx
            y += 1
            if y == b.maxy:
                b = Bounds(b.minx << 1, b.miny << 1, b.maxx << 1, b.maxy << 1)
                x, y, z = b.minx, b.miny, z + 1
        self.tile = Tile(x, y, z)
        self.bounds = b
        return self

    def decrement(self) -> "TileIterator":
        x, y, z = self.tile.x, self.tile.y, self.tile.z
        b = self.bounds
        if x != b.minx:
            x -= 1
        else:
            x = b.maxx - 1
            if y != b.miny:
                y -= 1
            else:
                b = Bounds(b.minx >> 1, b.miny >> 1, b.maxx >> 1, b.maxy >> 1)
                x, y = b.maxx - 1, b.maxy - 1
                assert z > 0
                z -= 1
        self.tile = Tile(x, y, z)
        self.bounds = b
        return self

    def _key(self):
        return (self.tile.z, self.tile.x, self.tile.y)

    def __eq__(self, other):
        return self._key() == other._key()

    def __lt__(self, other):
        return self._key() < other._key()

    def __le__(self, other):
        return self._key() <= other._key()


class TileRange:
    def __init__(self, begin: TileIterator, end: TileIterator):
        self.begin = begin
        self.end = end

    def __iter__(self):
        it = self.begin.copy()
        while it != self.end:
            yield it.tile
            it.increment()


def make_tile_range(*args) -> TileRange:
    """``make_tile_range(z)`` — the full level z (end = first tile of z+1);
    ``make_tile_range(x1, y1, x2, y2, z)`` — the INCLUSIVE tile rectangle."""
    if len(args) == 1:
        (z,) = args
        b = make_no_bounds(z)
        return TileRange(
            TileIterator(b.minx, b.miny, z, b),
            TileIterator(b.minx << 1, b.miny << 1, z + 1, b),
        )
    x1, y1, x2, y2, z = args
    lox, hix = min(x1, x2), max(x1, x2)
    loy, hiy = min(y1, y2), max(y1, y2)
    b = Bounds(lox, loy, hix + 1, hiy + 1)
    return TileRange(
        TileIterator(lox, loy, z, b), TileIterator(hix, hiy, z, b).increment()
    )


def tile_range_on_z(rng: TileRange, z: int) -> TileRange:
    """Re-level a (single-zoom) range; bounds are [min, max) while
    make_tile_range takes [min, max] — hence the -1 dance (tile.cc:54-76)."""
    t = rng.begin.tile
    b = rng.begin.bounds
    if t.z < z:
        dz = z - t.z
        minx, miny = b.minx << dz, b.miny << dz
        maxx, maxy = (b.maxx << dz) - 1, (b.maxy << dz) - 1
    else:
        dz = t.z - z
        minx, miny = b.minx >> dz, b.miny >> dz
        maxx, maxy = (b.maxx - 1) >> dz, (b.maxy - 1) >> dz
    return make_tile_range(minx, miny, maxx, maxy, z)


def make_tile_pyramid(max_zoom: int = MAX_ZOOM) -> TileRange:
    """The whole pyramid: z0 root through every tile of ``max_zoom``."""
    return TileRange(TileIterator(), TileIterator.at_zoom(max_zoom + 1))

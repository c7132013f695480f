"""geo_ray — Ray-Data-native spatial-join + tiling engine.

A from-scratch re-creation of motis-project/geo's geometry surface as
vectorized NumPy/Arrow kernels (``geo_ray.kernels``) lifted into Ray Data
batch stages (``geo_ray.stages``) and end-to-end pipelines
(``geo_ray.pipelines``). See SURVEY.md for the full operator inventory.
"""

__version__ = "0.1.0"


def _tune_allocator() -> None:
    """Cap glibc at a single malloc arena at import time.

    With OpenBLAS's thread pool alive, glibc hands NumPy's large temporaries
    to fresh per-thread arenas whose first-touch behavior costs 10-20x on the
    first executions of vectorized kernels in each fresh Ray worker process
    (measured: 8.2s -> 0.4s for one 260k x 64 uint64 outer product; the same
    cliff made identical flagship tasks take 12s mean UDF time cold vs 0.44s
    warm). ``mallopt(M_ARENA_MAX, 1)`` routes everything through the main
    arena. Workers import this package when deserializing UDFs, so the fix
    applies cluster-wide without controlling ``ray.init``. Our kernels are
    single-threaded per task, so arena serialization costs nothing. No-op off
    Linux/glibc.
    """
    import ctypes
    import sys

    if not sys.platform.startswith("linux"):
        return
    try:
        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        m_arena_max = -8
        m_trim_threshold = -1
        libc.mallopt(m_arena_max, 1)
        libc.mallopt(m_trim_threshold, 64 * 1024 * 1024)
    except OSError:  # pragma: no cover - non-glibc libc
        pass


_tune_allocator()


def _tune_data_context() -> None:
    """Opt-in hash-shuffle strategy (``GEO_RAY_HASH_SHUFFLE=1``).

    The engine's wide steps are KEY CO-LOCATION problems (bucketed joins,
    band dedup, per-key scans) — ``ShuffleStrategy.HASH_SHUFFLE`` enables
    key-based ``repartition(keys=...)`` (a pure hash exchange, no sort) and
    ``stages.agg.hash_bucket_apply`` uses it automatically when active:
    measured 57s -> 23.5s on a 10M-event as-of join at 32 CPUs. It is NOT
    the default because Ray's hash-shuffle aggregator actors are re-created
    per dataset execution — ~5-15s per query in a 4-CPU session — which
    swamps small-sf correctness runs and tests; flip it on for dedicated
    large-volume sessions (cluster jobs, stress runs).
    """
    import os

    if os.environ.get("GEO_RAY_HASH_SHUFFLE") != "1":
        return
    try:
        from ray.data import DataContext
        from ray.data.context import ShuffleStrategy

        DataContext.get_current().shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
    except Exception:  # pragma: no cover - older ray
        pass


_tune_data_context()

"""Print per-operator ds.stats() for one query — perf iteration helper.

Usage: python tools/run_stats.py <query_name> [sf_dir] [num_cpus]
Note: stats are populated by consuming via iter_batches (count() leaves
stats empty in this Ray version).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    name = sys.argv[1]
    sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    cpus = int(sys.argv[3]) if len(sys.argv) > 3 else 32

    import ray

    ray.init(address="local", num_cpus=cpus, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entry

    fn = entry.queries()[name]
    t0 = time.perf_counter()
    res = fn(sf)
    if hasattr(res, "iter_batches"):
        n = 0
        for b in res.iter_batches(batch_format="pyarrow", batch_size=None):
            n += b.num_rows
        print(f"rows={n} wall={time.perf_counter() - t0:.2f}s\n")
        print(res.stats())
    else:
        print(f"rows={len(res)} wall={time.perf_counter() - t0:.2f}s (driver-side result)")
    ray.shutdown()


if __name__ == "__main__":
    main()

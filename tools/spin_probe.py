"""Host-weather probe: in-place uint64 multiply-add over 20M elements x10.

Quiet window reference ~0.43 s (BASELINE.md).  Run before/after any
benchmark; never conclude a regression from a single degraded reading.
"""
import time

import numpy as np


def main():
    a = np.arange(20_000_000, dtype=np.uint64)
    t0 = time.perf_counter()
    with np.errstate(over="ignore"):
        for _ in range(10):
            a *= np.uint64(0x9E3779B97F4A7C15)
            a += np.uint64(12345)
    print(f"spin={time.perf_counter() - t0:.2f}s (quiet ~0.43)")


if __name__ == "__main__":
    main()

"""Re-measure achievable vacuum load per chunk size (the empirical
basis of params.vacuum_target_load).

Protocol (same as rounds 3-4): for each chunk size, build tables at a
range of chunk COUNTS (the worst chunk governs, so more chunks ⇒ lower
achieved min), insert random keys until the first insert failure, and
record the load factor at failure. Across seeds, report the MIN — the
target table must sit ≥0.02 under it.

Pure numpy (no Spark). Run on an idle box:
    python scripts/measure_vacuum_load.py [--seeds 8]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

# repo root from __file__, same as the sibling scripts — a cwd-relative
# path made the calibration protocol irreproducible from any other cwd
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cuckoo_filter_spark.kernel.filter import CuckooKernel  # noqa: E402
from cuckoo_filter_spark.params import TABLE_VACUUM, CuckooParams  # noqa: E402


def load_at_failure(chunk: int, n_chunks: int, seed: int, b: int = 4,
                    f: int = 16) -> float:
    params = CuckooParams(b, f, chunk * n_chunks, TABLE_VACUUM, chunk)
    kern = CuckooKernel(params)
    rng = np.random.default_rng(seed)
    total = params.size_in_tags
    batch = max(total // 64, 64)
    inserted = 0
    while True:
        h = rng.integers(0, 2**64, batch, dtype=np.uint64)
        idx, tag = params.split(h)
        ok = kern.add_hashed(idx, tag)  # reference Add semantics:
        # per-item success mask, victim stash, rejects after stash fills
        inserted += int(ok.sum())
        if not ok.all():
            return inserted / total


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=8)
    ap.add_argument("--chunks", type=int, nargs="*",
                    default=[64, 128, 256, 512, 1024, 2048, 4096])
    args = ap.parse_args()
    print(f"{'chunk':>6} {'n_chunks':>8} {'min':>6} {'mean':>6}")
    for chunk in args.chunks:
        worst = 1.0
        for n_chunks in (1, 4, 16, 64, 256):
            loads = [load_at_failure(chunk, n_chunks, 1000 * s + chunk)
                     for s in range(args.seeds)]
            print(f"{chunk:>6} {n_chunks:>8} {min(loads):6.3f} "
                  f"{np.mean(loads):6.3f}")
            worst = min(worst, min(loads))
        print(f"{chunk:>6} {'WORST':>8} {worst:6.3f}")


if __name__ == "__main__":
    main()

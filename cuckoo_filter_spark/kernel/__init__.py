"""Vectorized numpy kernels — the product implementation of the filter
semantics (build plan M1). All hot-path compute is batch/array-level;
no per-row Python."""

from cuckoo_filter_spark.kernel.filter import CuckooKernel, FilterFullError

__all__ = ["CuckooKernel", "FilterFullError"]

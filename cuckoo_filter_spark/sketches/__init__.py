"""Companion mergeable sketches (north_rule): Bloom, HLL, count-min,
t-digest, KLL, theta — all sharing the cuckoo filter's vectorized
Arrow-batch update path (metro64 over Arrow buffers → numpy batch
update) and the same partial-build + associative-merge distribution
pattern."""

from cuckoo_filter_spark.sketches.base import build_sketch
from cuckoo_filter_spark.sketches.bloom import BloomSketch
from cuckoo_filter_spark.sketches.countmin import CountMinSketch
from cuckoo_filter_spark.sketches.cube import hll_cube, hll_grouping_sets
from cuckoo_filter_spark.sketches.freq import (
    MGSketch,
    build_mg_sketches,
    grouped_mg_topk,
)
from cuckoo_filter_spark.sketches.hll import HLLSketch
from cuckoo_filter_spark.sketches.kll import KLLSketch
from cuckoo_filter_spark.sketches.rollup import hll_rollup
from cuckoo_filter_spark.sketches.tdigest import TDigestSketch
from cuckoo_filter_spark.sketches.theta import (
    ThetaSketch,
    build_theta_sketches,
    theta_a_not_b,
    theta_intersect,
    theta_jaccard,
    theta_union,
)

__all__ = [
    "build_sketch",
    "BloomSketch",
    "HLLSketch",
    "CountMinSketch",
    "TDigestSketch",
    "KLLSketch",
    "MGSketch",
    "build_mg_sketches",
    "grouped_mg_topk",
    "ThetaSketch",
    "build_theta_sketches",
    "theta_union",
    "theta_intersect",
    "theta_a_not_b",
    "theta_jaccard",
    "hll_rollup",
    "hll_cube",
    "hll_grouping_sets",
]

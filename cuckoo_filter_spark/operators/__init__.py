"""Spark-native distributed operators around the sketch kernels."""

from cuckoo_filter_spark.operators.build import (
    CuckooBuild,
    build_cuckoo_filter,
    count_distinct_exact,
)
from cuckoo_filter_spark.operators.query import (
    cuckoo_anti_join,
    cuckoo_semi_join,
    might_contain_udf,
)
from cuckoo_filter_spark.operators.sampling import (
    hash_sample,
    hash_split,
    sample_expr,
    split_case_sql,
    stratified_sample_expr,
    weighted_sample_expr,
)

__all__ = [
    "CuckooBuild",
    "build_cuckoo_filter",
    "count_distinct_exact",
    "might_contain_udf",
    "cuckoo_semi_join",
    "cuckoo_anti_join",
    "hash_split",
    "hash_sample",
    "sample_expr",
    "split_case_sql",
    "stratified_sample_expr",
    "weighted_sample_expr",
]

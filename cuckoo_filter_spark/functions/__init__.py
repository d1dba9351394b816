"""Column-level functions for large-scale training-data pipelines:
text analysis, dedup signatures, similarity search. Everything here is
either built-in Spark expressions (JVM-side, codegen'd) or Arrow-batched
numpy — no per-row Python in hot paths."""

from cuckoo_filter_spark.functions.text import (
    doc_fingerprint_udf,
    lang_id_udf,
    quality_features,
    token_count_expr,
)
from cuckoo_filter_spark.functions.web import canonical_url, host_of

__all__ = [
    "token_count_expr",
    "quality_features",
    "lang_id_udf",
    "doc_fingerprint_udf",
    "canonical_url",
    "host_of",
]

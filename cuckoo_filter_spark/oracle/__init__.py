"""Testing oracles: pure-Python scalar re-derivation of the reference
filter semantics. Not used in the Spark hot path."""

from cuckoo_filter_spark.oracle.scalar import ScalarFilter

__all__ = ["ScalarFilter"]

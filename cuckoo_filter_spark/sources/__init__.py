"""Sources: synthetic Common-Crawl-style pages table + blob persistence."""

from cuckoo_filter_spark.sources.pages import extract_text, synth_pages, wrap_html

__all__ = ["synth_pages", "wrap_html", "extract_text"]

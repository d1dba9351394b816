"""Shared gates for the transformWithStateInPandas paths."""

from __future__ import annotations


def require_protobuf(alternative: str) -> None:
    """transformWithState's python workers speak protobuf to the state
    server; without google.protobuf the query crashes at runtime with an
    opaque "driver worker exited unexpectedly" — fail loud at plan time
    instead, pointing at the applyInPandasWithState twin (identical
    semantics through the shared micro-batch core, no protobuf needed).
    """
    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError as e:
        raise ImportError(
            "transformWithStateInPandas requires the google.protobuf "
            "package (its state-server protocol); it is unavailable in "
            f"this environment — use {alternative} "
            "(applyInPandasWithState, identical semantics)") from e

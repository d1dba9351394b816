"""bench.py artifact-contract tests (no Spark).

VERDICT r4 #1: the driver captures only the LAST 2000 chars of bench
stdout; BENCH_r04's fat single line overflowed it and the round's perf
signal was lost (parsed: null). These tests pin the compact-line
budget against the REAL 30-query snapshot and the element-wise-max
snapshot merge (VERDICT r4 #2: one contended snapshot must not lower
the contention-gate bar below an earlier quiet capture).
"""

import importlib.util
import json
import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

spec = importlib.util.spec_from_file_location("bench", os.path.join(REPO, "bench.py"))
bench = importlib.util.module_from_spec(spec)
spec.loader.exec_module(bench)


def _load_snapshot():
    path = os.path.join(REPO, "bench_snapshots", "r4_quiet_30q.json")
    with open(path) as f:
        return json.load(f)


def test_compact_line_fits_driver_tail_window():
    full = _load_snapshot()
    full.setdefault("contended_sections", [])
    line = bench.compact_line(full)
    assert len(line) <= 1900, len(line)
    d = json.loads(line)
    # driver contract fields
    assert d["metric"] == "headline_suite_sec"
    assert d["unit"] == "sec"
    assert isinstance(d["value"], (int, float))
    assert d["sf"] == full["sf"]
    assert len(d["queries"]) == len(full["queries"])
    # judge-requested headline fields survive compaction
    assert d["query_sum_sec"] == full["query_sum_sec"]
    assert d["contended_sections"] == []
    assert d["kernel_hash_per_sec"] == full["kernel"]["hash_32B_keys_per_sec"]
    # headline fields AFTER the query map: a future overflow truncates
    # the map (front of the tail window), never the headline
    assert line.index('"queries"') < line.index('"query_sum_sec"')


def test_compact_line_fits_even_with_many_queries():
    full = _load_snapshot()
    full.setdefault("contended_sections", ["build", "probe"])
    full["suspect_regressions"] = ["probe"]
    # simulate 60 long-named queries: precision/query-map degradation
    # must still land under budget
    full["queries"] = {
        f"very_long_query_name_for_budget_test_{i:02d}": 12.345 for i in range(60)
    }
    line = bench.compact_line(full)
    assert len(line) <= 1900, len(line)
    json.loads(line)


def test_load_ref_takes_elementwise_max_across_snapshots():
    ref = bench._load_ref()
    snaps = {}
    for r in ("r3_low_load_28q", "r4_quiet_30q"):
        with open(os.path.join(REPO, "bench_snapshots", f"{r}.json")) as f:
            snaps[r] = json.load(f)
    # kernel hash: r3 pinned 2.72M/s, r4 (residual load) only 2.02M/s —
    # the merged bar must not drop below the r3 evidence
    assert ref["kernel"]["hash_32B_keys_per_sec"] >= max(
        s["kernel"]["hash_32B_keys_per_sec"] for s in snaps.values()
    )
    for sec, (rate_key, rows_key) in bench.SECTION_GATES.items():
        comparable = [
            s[sec]
            for s in snaps.values()
            if sec in s
            and (rows_key is None or s[sec].get(rows_key) == ref[sec].get(rows_key))
        ]
        assert ref[sec][rate_key] >= max(d[rate_key] for d in comparable)


def test_gate_history_flags_back_to_back_capouts(tmp_path, monkeypatch):
    ALL = ["build", "high_load", "kernel", "probe"]
    monkeypatch.setattr(bench, "_CAPOUT_HISTORY", str(tmp_path / "hist.json"))
    assert bench._gate_history_update({"probe": 0.4}, ALL) == []
    assert bench._gate_history_update({"probe": 0.5, "build": 0.6},
                                      ALL) == ["probe"]
    assert bench._gate_history_update({"build": 0.6}, ALL) == ["build"]
    assert bench._gate_history_update({}, ALL) == []
    hist = json.loads((tmp_path / "hist.json").read_text())
    assert len(hist) == 4 and hist[1]["capped"] == {"probe": 0.5, "build": 0.6}


def test_gate_history_smoke_run_does_not_wipe_signal(tmp_path, monkeypatch):
    """A smoke run gates only the kernel section (Spark refs are None at
    off geometry): it must not reset the Spark sections' back-to-back
    cap-out lookback — the suspect compare is against the most recent
    run where THAT section was gated."""
    ALL = ["build", "high_load", "kernel", "probe"]
    monkeypatch.setattr(bench, "_CAPOUT_HISTORY", str(tmp_path / "hist.json"))
    assert bench._gate_history_update({"probe": 0.4}, ALL) == []  # full run A
    # smoke run B: only kernel gated, nothing capped
    assert bench._gate_history_update({}, ["kernel"]) == []
    # full run C: probe caps again — A is the comparable run, so FLAG
    assert bench._gate_history_update({"probe": 0.5}, ALL) == ["probe"]
    # kernel capping on a smoke run D then a full run E: back-to-back
    assert bench._gate_history_update({"kernel": 0.6}, ["kernel"]) == []
    assert bench._gate_history_update({"kernel": 0.5}, ALL) == ["kernel"]


def test_load_ref_ignores_intervening_offgeometry_snapshot(tmp_path, monkeypatch):
    """An off-geometry smoke snapshot between two full-geometry rounds
    must not reset the merged bar to whatever came after it: the
    geometry of record is the LATEST snapshot's, and the max is over
    ALL snapshots at that geometry."""
    for name, rows, rate in (("r3_a_30q", 8_000_000, 10.0),
                             ("r4_smoke_30q", 4_000_000, 3.0),
                             ("r5_b_33q", 8_000_000, 7.0)):
        (tmp_path / f"{name}.json").write_text(json.dumps({
            "build": {"rows": rows, "inserts_per_sec": rate},
            "kernel": {"hash_32B_keys_per_sec": rate},
        }))
    monkeypatch.setattr(bench, "_SNAP_DIR", str(tmp_path))
    ref = bench._load_ref()
    assert ref["build"]["inserts_per_sec"] == 10.0  # not 7.0 (chain reset)
    assert ref["build"]["rows"] == 8_000_000
    assert ref["kernel"]["hash_32B_keys_per_sec"] == 10.0  # no geometry key

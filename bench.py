#!/usr/bin/env python
"""Bench harness (driver contract + BASELINE.md M6 protocol).

Default: runs the headline driver queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS], plus the url-insert
throughput build over a deterministic synthetic pages table, and prints
ONE JSON line.

--scaling: runs the identical pages build at local[8] and local[32] in
separate JVMs (subprocess) and reports throughput at both plus scaling
efficiency = (T_N / T_4N) / 4 — the sandbox evidence for the north_rule
two-cluster-size criterion (BASELINE.md protocol).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

BENCH_ROWS = int(os.environ.get("SPARK_GRAFT_BENCH_ROWS", "8000000"))
SCALING_ROWS = int(os.environ.get("SPARK_GRAFT_SCALING_ROWS", "64000000"))
# default caches and shuffle dirs to tmpfs: the VM's ext4 root disk shows
# multi-10s writeback stalls that add 2x run-to-run noise to benchmarks
_DEF_CACHE = "/dev/shm/spark_graft_bench" if os.path.isdir("/dev/shm") else "/tmp/spark_graft_bench"
PAGES_CACHE = os.environ.get("SPARK_GRAFT_PAGES_CACHE", _DEF_CACHE)


def make_spark(cpus: int):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("cuckoo-filter-spark-bench")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.default.parallelism", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.local.dir",
                "/dev/shm/spark_local" if os.path.isdir("/dev/shm") else "/tmp/spark_local")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def ensure_pages(spark, n_rows: int, urls_only: bool = False) -> str:
    """Deterministic pages table cached as parquet (generation excluded
    from measurement)."""
    kind = "urls" if urls_only else "pages"
    path = f"{PAGES_CACHE}/{kind}_{n_rows}.parquet"
    marker = f"{path}/_SUCCESS"
    if not os.path.exists(marker):
        from cuckoo_filter_spark.sources.pages import synth_pages, synth_urls

        gen = synth_urls if urls_only else synth_pages
        # fixed partition count: scan parallelism must not depend on which
        # parallelism level happened to generate the cache
        gen(spark, n_rows, n_hosts=10000, seed=42, num_partitions=32).write.mode(
            "overwrite"
        ).parquet(path)
    return path


def run_build_bench(spark, n_rows: int, sharded: bool = False,
                    hash_fn: str = "metro64") -> dict:
    """url-insert throughput: build a (b=4, f=16) membership filter over
    the pages url column; report inserts/sec, load, FP rate.

    sharded=True uses the fully-distributed sharded build (the 10^12
    scale path; also the scaling-efficiency protocol since it has no
    driver-side combine bottleneck)."""
    path = ensure_pages(spark, n_rows, urls_only=sharded)
    pages = spark.read.parquet(path).select("url")
    pages.count()  # warm the scan / page cache so build time ≈ build cost

    t0 = time.perf_counter()
    if sharded:
        from cuckoo_filter_spark.operators.sharded import (
            build_sharded_cuckoo_filter,
            sharded_might_contain_udf,
        )

        build = build_sharded_cuckoo_filter(
            pages, "url", capacity=n_rows, bits_per_item=16, num_shards=32,
            output_path=f"{PAGES_CACHE}/shards_out_{n_rows}_{hash_fn}.parquet",
            hash_fn=hash_fn,
        )
        wall = time.perf_counter() - t0
        stored = sum(m["stored"] for m in build.metrics)
        load = max(m["load_factor"] for m in build.metrics)
        mc = sharded_might_contain_udf(spark, build)
    else:
        from cuckoo_filter_spark.operators.build import build_cuckoo_filter
        from cuckoo_filter_spark.operators.query import might_contain_udf

        build = build_cuckoo_filter(
            pages, "url", capacity=n_rows, bits_per_item=16, mode="unique_local",
            hash_fn=hash_fn, auto_shard=None,  # this section measures the
            # single-blob path on purpose; sharded is measured above
        )
        wall = time.perf_counter() - t0
        kern = build.kernel()
        stored = kern.size()
        load = kern.load_factor()
        mc = might_contain_udf(spark, build)

    # FP probe: urls guaranteed absent (host namespace disjoint)
    from pyspark.sql import functions as F

    probes = spark.range(100_000).select(
        F.concat(F.lit("https://absent"), F.col("id"), F.lit(".example.test/q/"),
                 F.col("id")).alias("url")
    )
    fp = probes.where(mc(F.col("url"))).count() / 100_000
    return {
        "rows": n_rows,
        "sharded": sharded,
        "hash_fn": hash_fn,
        "build_sec": round(wall, 3),
        "inserts_per_sec": round(n_rows / wall, 1),
        "stored": int(stored),
        "load_factor": round(float(load), 4),
        "fp_rate": fp,
        "kicks": sum(m["kicks"] for m in build.metrics),
    }


def run_probe_bench(spark, n_rows: int) -> dict:
    """End-to-end query-side throughput: might_contain over the whole
    urls table through the broadcast pandas-UDF (scan + Arrow + hash +
    vectorized bucket probes)."""
    from pyspark.sql import functions as F

    from cuckoo_filter_spark.operators.build import build_cuckoo_filter
    from cuckoo_filter_spark.operators.query import might_contain_udf

    path = ensure_pages(spark, n_rows, urls_only=True)
    pages = spark.read.parquet(path).select("url")
    # small build side → selective membership probe over the full table
    members = pages.limit(200_000)
    build = build_cuckoo_filter(members, "url", capacity=200_000)
    mc = might_contain_udf(spark, build)
    pages.count()  # warm scan
    t0 = time.perf_counter()
    hits = pages.where(mc(F.col("url"))).count()
    wall = time.perf_counter() - t0
    return {
        "rows_probed": n_rows,
        "hits": hits,
        "probe_sec": round(wall, 3),
        "probes_per_sec": round(n_rows / wall, 1),
    }


def _merge_best(runs: list[dict]) -> dict:
    """Element-wise best-of-R for nested microbench dicts: rate keys
    (*_per_sec) take the max across runs (the least-contended repeat);
    everything else comes from the first run (sizes/loads are
    deterministic)."""
    out = {}
    for k in runs[0]:
        vs = [r[k] for r in runs]
        if isinstance(vs[0], dict):
            out[k] = _merge_best(vs)
        elif isinstance(vs[0], (int, float)) and "per_sec" in k:
            out[k] = max(vs)
        else:
            out[k] = vs[0]
    return out


# --- contention gating (VERDICT r3 #2) --------------------------------------
# Every throughput section re-runs until its best repeat is within
# GATE_FACTOR of the stored low-load reference snapshot, or the rep cap
# is hit — in which case the section is marked "contended": true and
# listed in the artifact's top-level contended_sections. BENCH_r03's
# probe section under-reported 4× because a neighbor-noise burst spanned
# all of a FIXED 3 repeats; the gate spends repeats only where they're
# needed (an un-contended first run exits immediately).
GATE_FACTOR = 1.5
GATE_CAP = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "6")))
_SNAP_DIR = os.path.join(REPO, "bench_snapshots")
_CAPOUT_HISTORY = os.path.join(_SNAP_DIR, "capout_history.json")

# gate key + geometry key per section (geometry must match for the
# snapshot rate to be comparable; kernel is single-core, no geometry)
SECTION_GATES = {
    "build": ("inserts_per_sec", "rows"),
    "high_load": ("inserts_per_sec", "rows"),
    "probe": ("probes_per_sec", "rows_probed"),
    "kernel": ("hash_32B_keys_per_sec", None),
}


def _load_ref() -> dict:
    """Reference rates = element-wise MAX across the quiet snapshots
    (VERDICT r4 #2: gating against a single snapshot means one
    contended capture silently lowers every future bar — r4's snapshot
    pinned kernel hash 28% below r3's committed rate). Later snapshots
    win when their geometry (row count) differs; at matching geometry
    the best-evidenced quiet rate across rounds is the bar."""
    import glob
    import re

    def round_no(path: str) -> int:  # r10 sorts after r3 (not stringly)
        m = re.match(r"r(\d+)", os.path.basename(path))
        return int(m.group(1)) if m else 0

    snaps = []
    for p in sorted(glob.glob(os.path.join(_SNAP_DIR, "r[0-9]*_*q*.json")),
                    key=round_no):
        try:
            with open(p) as f:
                snaps.append(json.load(f))
        except Exception:
            pass
    ref: dict = {}
    for sec, (rate_key, rows_key) in SECTION_GATES.items():
        secs = [s[sec] for s in snaps
                if isinstance(s.get(sec), dict) and rate_key in s[sec]]
        if not secs:
            continue
        # geometry of record = the LATEST snapshot's; the max is taken
        # over ALL snapshots at that geometry (not a chain — a single
        # intervening off-geometry smoke snapshot must not reset the
        # bar to whatever came after it)
        geom = secs[-1].get(rows_key) if rows_key is not None else None
        match = [d for d in secs
                 if rows_key is None or d.get(rows_key) == geom]
        best = dict(secs[-1])
        best[rate_key] = max(d[rate_key] for d in match)
        ref[sec] = best
    return ref


def _gate_history_update(capped: dict, gated: list[str]) -> list[str]:
    """Record this run's cap-outs (section -> best/ref ratio) in the
    persistent history and return the sections that ALSO capped out on
    the most recent run where they were GATED — ADVICE r4: a genuine
    >=GATE_FACTOR regression is otherwise indistinguishable from
    neighbor noise (both read as 'contended' and burn GATE_CAP reps).
    One noise burst rarely spans two full bench runs, so back-to-back
    cap-outs of the same section flag as ``suspect_regressions``.

    Per-section lookback, not last-entry: a smoke run (off rows/cpus)
    gates only the geometry-independent kernel section, so it records
    gated=['kernel'] — an interleaved smoke run therefore cannot wipe
    the Spark sections' back-to-back signal (it simply isn't a
    comparable observation for them). Pre-existing entries without a
    'gated' field count as gated only for the sections they capped."""
    try:
        with open(_CAPOUT_HISTORY) as f:
            hist = json.load(f)
    except Exception:
        hist = []
    suspects = []
    for sec in capped:
        for entry in reversed(hist):
            if sec in entry.get("gated", list(entry.get("capped", {}))):
                if sec in entry["capped"]:
                    suspects.append(sec)
                break
    hist.append({"ts": time.time(), "capped": capped,
                 "gated": sorted(gated)})
    hist = hist[-50:]
    try:
        os.makedirs(_SNAP_DIR, exist_ok=True)
        with open(_CAPOUT_HISTORY, "w") as f:
            json.dump(hist, f)
    except Exception:
        pass
    return sorted(suspects)


def gated_best_of(fn, key: str, section: str, ref_rate_fn,
                  contended: list[str], combine=None) -> dict:
    """Run fn until combine(runs)[key] ≥ ref/GATE_FACTOR or GATE_CAP.
    ref_rate_fn(first_run) returns the reference rate, or None when the
    snapshot isn't comparable (different row counts / missing section) —
    then a plain best-of-2 is used. ``combine`` reduces the run list to
    the reported dict (default: whole-run max on ``key``; the kernel
    section passes _merge_best for element-wise bests). ONE definition
    of the contention-gate policy — the contract test pins it here."""
    if combine is None:
        combine = lambda runs: dict(max(runs, key=lambda r: r[key]))
    runs = [fn()]
    ref = ref_rate_fn(runs[0])
    while True:
        best = combine(runs)
        if ref is None:
            if len(runs) >= min(2, GATE_CAP):
                break
        elif best[key] >= ref / GATE_FACTOR or len(runs) >= GATE_CAP:
            break
        runs.append(fn())
    best = combine(runs)
    best["reps_run"] = len(runs)
    if ref is not None:
        best["ref_rate"] = ref
        best["gate_ratio"] = round(best[key] / ref, 3)  # ADVICE r4: keep
        # the best/ref ratio visible even when the gate passes
        if best[key] < ref / GATE_FACTOR:
            best["contended"] = True
            contended.append(section)
    return best


def run_kernel_microbench(contended: list[str]) -> dict:
    """Single-core kernel rates mirroring the reference harness shape
    (cuckoofilter_test.go:113-187: Insert/Lookup, 32-byte keys, single
    (4,8) and packed (4,9); here at capacity 1M, plus encode/decode).

    This section is the artifact's contention-sanity row — BENCH_r02
    recorded hash rates 3.2× below reality during a neighbor-noise
    burst, which made the whole file self-contradictory. Element-wise
    best across repeats (_merge_best), gated on the hash rate vs the
    stored snapshot through the same gated_best_of policy as the Spark
    sections."""
    return gated_best_of(
        _run_kernel_microbench_once, "hash_32B_keys_per_sec", "kernel",
        lambda _first: (_load_ref().get("kernel") or {}).get(
            "hash_32B_keys_per_sec"),
        contended, combine=_merge_best)


def _run_kernel_microbench_once() -> dict:
    import numpy as np

    from cuckoo_filter_spark.kernel.filter import CuckooKernel, split_hash
    from cuckoo_filter_spark.hashing import metro64_flat

    rng = np.random.default_rng(42)
    n = 1_000_000
    flat = rng.integers(0, 256, size=n * 32, dtype=np.int64).astype(np.uint8)
    lens = np.full(n, 32, dtype=np.int64)
    metro64_flat(flat[: 32 * 1000], lens[:1000])  # warm
    t0 = time.perf_counter()
    h = metro64_flat(flat, lens)
    t_hash = time.perf_counter() - t0

    out = {"hash_32B_keys_per_sec": round(n / t_hash, 1)}
    for name, (b, f, tt) in {"single_4_8": (4, 8, 0), "packed_4_9": (4, 9, 1)}.items():
        kern = CuckooKernel.for_capacity(n, b, f, tt)
        idx, tag = split_hash(h, kern.params.num_buckets, f)
        t0 = time.perf_counter()
        kern.add_unique_hashed(idx, tag)
        t_ins = time.perf_counter() - t0
        t0 = time.perf_counter()
        kern.contain_hashed(idx, tag)
        t_look = time.perf_counter() - t0
        t0 = time.perf_counter()
        blob = kern.to_bytes()
        t_enc = time.perf_counter() - t0
        out[name] = {
            "inserts_per_sec": round(n / t_ins, 1),
            "lookups_per_sec": round(n / t_look, 1),
            "encode_mb_per_sec": round(len(blob) / 1e6 / t_enc, 1),
            "load_factor": round(kern.load_factor(), 4),
        }

    # vacuum layout (space extension): capacity just above a pow2
    # boundary — the case the non-pow2 sizing exists for (at exact-pow2
    # capacities both rules emit the same bytes)
    from cuckoo_filter_spark.params import CuckooParams

    cap_v = int(n * 1.1)
    pv = CuckooParams.for_capacity_vacuum(cap_v, 4, 16)
    pc = CuckooParams.for_capacity(cap_v, 4, 16)
    kern = CuckooKernel(pv)
    idx, tag = pv.split(h)
    t0 = time.perf_counter()
    kern.add_unique_hashed(idx, tag)
    t_ins = time.perf_counter() - t0
    t0 = time.perf_counter()
    kern.contain_hashed(idx, tag)
    t_look = time.perf_counter() - t0
    out["vacuum_4_16"] = {
        "capacity": cap_v,
        "inserts_per_sec": round(n / t_ins, 1),
        "lookups_per_sec": round(n / t_look, 1),
        "load_factor": round(kern.load_factor(), 4),
        "table_bytes": pv.size_in_bytes(),
        "pow2_table_bytes": pc.size_in_bytes(),
        "space_saving": round(1 - pv.size_in_bytes() / pc.size_in_bytes(), 3),
    }
    return out


def run_high_load_bench(spark, n_keys: int = 4_000_000, num_shards: int = 32) -> dict:
    """The BASELINE metric's accuracy clause: inserts/sec and observed
    FP rate at ~95% load, b=4, f=16. The sizing-rule bound is r = 2b/2^f
    ≈ 1.22e-4 (README.md:50-52 quotes it rounded as ~0.0001); expected
    FP at load L is ≈ 2b·L/2^f. Sharded build so the kick-heavy
    near-capacity inserts run in parallel per shard."""
    from cuckoo_filter_spark.operators.sharded import build_sharded_cuckoo_filter
    from cuckoo_filter_spark.params import next_pow2

    target_load = 0.95
    uniq_frac = 0.909  # synthetic urls table has 10% dup rate
    nb_shard = next_pow2(int(n_keys / (4 * target_load * num_shards)))
    slots = nb_shard * 4 * num_shards
    n_keys = int(slots * target_load / uniq_frac)
    # headroom chosen so for_capacity() lands exactly on nb_shard
    headroom = 0.9 * 4 * nb_shard * num_shards / n_keys

    path = ensure_pages(spark, n_keys, urls_only=True)
    pages = spark.read.parquet(path).select("url")
    pages.count()
    t0 = time.perf_counter()
    build = build_sharded_cuckoo_filter(
        pages, "url", capacity=n_keys, num_shards=num_shards,
        bits_per_item=16, headroom=headroom,
    )
    wall = time.perf_counter() - t0
    assert build.params.num_buckets == nb_shard, (build.params, nb_shard)

    probes = [f"https://absent{i}.example.test/q/{i}" for i in range(200_000)]
    fp = float(build.contain(probes).mean())
    stored = sum(m["stored"] for m in build.metrics)
    return {
        "target_load": target_load,
        "achieved_load": round(stored / slots, 4),
        "rows": n_keys,
        "build_sec": round(wall, 3),
        "inserts_per_sec": round(n_keys / wall, 1),
        "fp_rate": fp,
        "fp_bound_sizing_rule": round(8 / 65536, 6),
        "fp_expected_at_load": round(8 * (stored / slots) / 65536, 6),
        "kicks": sum(m["kicks"] for m in build.metrics),
    }


def run_queries(spark, sf_dir: str) -> dict:
    import __spark_entry__ as entry_mod

    # steady-state warmup (flagship at sf0.001): spins up python workers,
    # Arrow serde and the numpy/metro64 JIT-ish first-call cost (~5×) so
    # per-query numbers measure the operators, not session cold-start
    entry_mod.entry(spark).collect()
    out = {}
    for name, fn in entry_mod.queries().items():
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        df.collect()
        out[name] = round(time.perf_counter() - t0, 3)
    return out


SCALING_REPEATS = int(os.environ.get("SPARK_GRAFT_SCALING_REPEATS", "3"))


def scaling_child(cpus: int, n_rows: int, hash_fn: str = "metro64") -> None:
    """Best-of-R in one JVM: this shared VM shows ~2x run-to-run noise
    (neighbor contention); the best repeat approximates the
    un-contended machine and is what the efficiency ratio uses."""
    spark = make_spark(cpus)
    run_build_bench(spark, min(n_rows, 500_000), sharded=True, hash_fn=hash_fn)
    runs = [run_build_bench(spark, n_rows, sharded=True, hash_fn=hash_fn)
            for _ in range(SCALING_REPEATS)]
    best = min(runs, key=lambda r: r["build_sec"])
    best["all_build_sec"] = [r["build_sec"] for r in runs]
    best["inserts_per_sec"] = round(n_rows / best["build_sec"], 1)
    print("SCALING_RESULT " + json.dumps(best))
    spark.stop()


SCALING_N = int(os.environ.get("SPARK_GRAFT_SCALING_N", "2"))


def run_scaling(n_rows: int) -> dict:
    """N vs 4N cores on the same input (BASELINE.md protocol).

    Default N=2 (local[2] vs local[8]): this sandbox VM's memory
    bandwidth saturates around 8-16 concurrent numpy workers, so
    local[8]→local[32] measures the VM's bandwidth ceiling, not the
    job's scalability; 2→8 cores isolates the job. Override with
    SPARK_GRAFT_SCALING_N=8 for the 8→32 variant."""
    out = {}
    for hash_fn in ("metro64", "xxhash64"):
        res = {}
        for cpus in (SCALING_N, 4 * SCALING_N):
            proc = subprocess.run(
                [sys.executable, __file__, "--scaling-child", str(cpus),
                 str(n_rows), hash_fn],
                capture_output=True, text=True, env=dict(os.environ), cwd=REPO,
            )
            line = [l for l in proc.stdout.splitlines()
                    if l.startswith("SCALING_RESULT ")]
            if not line:
                raise RuntimeError(
                    f"scaling child failed:\n{proc.stdout}\n{proc.stderr[-3000:]}")
            res[f"local[{cpus}]"] = json.loads(
                line[-1].removeprefix("SCALING_RESULT "))
        tn = res[f"local[{SCALING_N}]"]["inserts_per_sec"]
        t4n = res[f"local[{4 * SCALING_N}]"]["inserts_per_sec"]
        res["scaling_efficiency"] = round((t4n / tn) / 4.0, 3)
        out[hash_fn] = res
    return out


def compact_line(full: dict, budget: int = 1900) -> str:
    """The driver-contract final line. BENCH_r04's single fat line
    overflowed the driver's 2000-char tail-capture window and recorded
    ``parsed: null`` (VERDICT r4 #1) — the full nested result now goes
    to bench_snapshots/last_run.json and this line carries the contract
    fields (metric/value/unit/queries/sf) plus ONE rounded rate per
    throughput section, compact separators, hard-fit to ``budget`` by
    degrading query-time precision first and dropping the query map as
    a last resort (the file always has everything). Headline fields are
    ordered AFTER the query map so a hypothetical future overflow cuts
    the map, not the headline (tail capture keeps the END of stdout)."""

    def build(prec: int, with_queries: bool = True) -> str:
        d: dict = {}
        if with_queries:
            d["queries"] = {k: round(v, prec) for k, v in full["queries"].items()}
        d.update(
            {
                "metric": full["metric"],
                "value": full["value"],
                "unit": full["unit"],
                "query_sum_sec": full["query_sum_sec"],
                "sf": full["sf"],
                "url_inserts_per_sec": full["build"]["inserts_per_sec"],
                "high_load_inserts_per_sec": full["high_load"]["inserts_per_sec"],
                "high_load_fp_rate": full["high_load"]["fp_rate"],
                "probes_per_sec": full["probe"]["probes_per_sec"],
                "kernel_hash_per_sec": full["kernel"]["hash_32B_keys_per_sec"],
                "contended_sections": full["contended_sections"],
                "full_results": "bench_snapshots/last_run.json",
            }
        )
        if full.get("suspect_regressions"):
            d["suspect_regressions"] = full["suspect_regressions"]
        return json.dumps(d, separators=(",", ":"))

    for prec, with_q in ((2, True), (1, True), (1, False)):
        line = build(prec, with_q)
        if len(line) <= budget:
            return line
    return line  # unreachable in practice: the no-queries form is ~500B


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--scaling-child":
        scaling_child(int(sys.argv[2]), int(sys.argv[3]),
                      sys.argv[4] if len(sys.argv) > 4 else "metro64")
        return

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(os.path.basename(sf_dir.rstrip("/")).removeprefix("sf") or 0.1)

    if "--scaling" in sys.argv:
        scaling = run_scaling(SCALING_ROWS)
        print(json.dumps({"scaling": scaling}))
        return

    spark = make_spark(cpus)
    t_total0 = time.perf_counter()
    qtimes = run_queries(spark, sf_dir)

    # throughput sections are contention-GATED best-of (VERDICT r3 #2):
    # re-run until the best repeat is within GATE_FACTOR of the stored
    # low-load snapshot, or GATE_CAP; sections that cap out are listed
    # in contended_sections. Snapshot rates are only compared when the
    # section's row count matches the snapshot's (off-default
    # SPARK_GRAFT_BENCH_ROWS / sf smoke runs fall back to best-of-2).
    ref = _load_ref()
    contended: list[str] = []

    def _ref_rate(section, key, rows_key="rows"):
        def get(first_run):
            # Spark-section rates are only comparable at the snapshot's
            # parallelism (local[32]) and row count; kernel is
            # single-core so it gates regardless of cpus
            if cpus != 32:
                return None
            sec = ref.get(section)
            if not sec or sec.get(rows_key) != first_run.get(rows_key):
                return None
            return sec.get(key)
        return get

    build = gated_best_of(
        lambda: run_build_bench(spark, BENCH_ROWS, sharded=True),
        "inserts_per_sec", "build", _ref_rate("build", "inserts_per_sec"),
        contended)  # 10^12 path
    high_load = gated_best_of(
        lambda: run_high_load_bench(spark), "inserts_per_sec", "high_load",
        _ref_rate("high_load", "inserts_per_sec"), contended)
    probe = gated_best_of(
        lambda: run_probe_bench(spark, BENCH_ROWS), "probes_per_sec", "probe",
        _ref_rate("probe", "probes_per_sec", rows_key="rows_probed"),
        contended)
    kernel = run_kernel_microbench(contended)
    total = round(time.perf_counter() - t_total0, 3)

    sections = {"build": build, "high_load": high_load, "probe": probe,
                "kernel": kernel}
    # history records which sections this run could actually gate: the
    # suspect lookback compares a cap-out only against the most recent
    # run where that section was gated (a smoke run gates only the
    # geometry-independent kernel and must not wipe the Spark sections'
    # back-to-back signal)
    gated = [s for s, d in sections.items() if "ref_rate" in d]
    suspects = _gate_history_update(
        {s: sections[s].get("gate_ratio") for s in contended}, gated)
    full = {
        "metric": "headline_suite_sec",
        "value": total,
        "unit": "sec",
        # value includes best-of-R repeats of the throughput
        # sections + R kernel reps (~35-55s of repeat overhead);
        # query_sum_sec is the noise-comparable per-round gauge
        "query_sum_sec": round(sum(qtimes.values()), 3),
        "section_rep_cap": GATE_CAP,
        "contended_sections": contended,
        "suspect_regressions": suspects,
        "queries": qtimes,
        "sf": sf,
        "url_inserts_per_sec": build["inserts_per_sec"],
        "build": build,
        "high_load": high_load,
        "probe": probe,
        "kernel": kernel,
    }
    try:
        os.makedirs(_SNAP_DIR, exist_ok=True)
        with open(os.path.join(_SNAP_DIR, "last_run.json"), "w") as f:
            json.dump(full, f, indent=1)
    except Exception as e:  # the line must still print
        print(f"WARN: could not write last_run.json: {e}", file=sys.stderr)
    print(compact_line(full))
    spark.stop()


if __name__ == "__main__":
    main()

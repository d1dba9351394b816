"""Deduplication operators for web-scale training-data pipelines:
exact, MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine near-dup.

All signature computation is Arrow-batched numpy over the shared
metro64 path (shingles of the whole batch are hashed in ONE vectorized
call over the concatenated utf-8 buffer — no per-shingle Python); LSH
candidate generation is a plain Spark explode + self-join so Catalyst
handles the shuffle/broadcast strategy.

Scale notes: signatures are tiny (n_perms × 8 B/doc); the band
self-join shuffles only (band_id, band_hash, doc_id) rows, and the
exact-verify step touches only candidate pairs. At 10^12 docs the band
join is the one big shuffle, keyed by band hash — uniformly distributed
by construction, no skew salting needed (hot exact-dup clusters can be
pre-collapsed with dedup_exact first).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from cuckoo_filter_spark.hashing import (
    fmix64 as _mix,
    metro64_flat,
    to_flat_bytes,
)

_U64 = np.uint64


# ---------------------------------------------------------------------------
# shingles — fully vectorized over the Arrow buffer
# ---------------------------------------------------------------------------


_POLY_MUL = _U64(0x9E3779B97F4A7C15)


def batch_shingle_hashes(texts, k: int = 5) -> tuple[np.ndarray, np.ndarray]:
    """All k-byte shingle hashes of a batch in one vectorized pass.

    Returns (hashes uint64[:], doc_offsets int64[n+1]) where doc i's
    shingles are hashes[doc_offsets[i]:doc_offsets[i+1]]. Empty/short
    docs get zero shingles.

    hash = fmix64(polynomial over the k window bytes), computed as k
    shifted multiply-adds over the flat utf-8 buffer — no per-window
    gather and no per-key metro64 call (k-byte keys defeat metro64's
    long-key vectorization; this rolling form measured ~100× faster at
    equal signature quality — shingle hashes are internal to
    MinHash/SimHash, not a reference byte-layout surface).
    """
    flat, lens = to_flat_bytes(texts)
    n = len(lens)
    counts = np.maximum(lens - k + 1, 0)
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lens, out=offsets[1:])
    out_off = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(counts, out=out_off[1:])
    total = int(out_off[-1])
    if total == 0:
        return np.zeros(0, dtype=np.uint64), out_off
    m = len(flat) - k + 1  # windows at every flat position (doc-crossing
    # windows are computed but never selected below)
    acc = np.zeros(m, dtype=np.uint64)
    for j in range(k):
        acc = acc * _POLY_MUL + flat[j:m + j]
    h = _mix(acc, 0x5349_4D48)
    # valid window starts per doc: offsets[i] .. offsets[i]+counts[i]-1
    starts = np.arange(total, dtype=np.int64) + np.repeat(
        offsets[:-1] - out_off[:-1], counts)
    return h[starts], out_off


# ---------------------------------------------------------------------------
# MinHash signatures + LSH banding
# ---------------------------------------------------------------------------


def minhash_signatures(texts, n_perms: int = 64, k: int = 5) -> np.ndarray:
    """int64[n_docs, n_perms] MinHash signature matrix (empty docs → -1)."""
    hashes, off = batch_shingle_hashes(texts, k)
    n = len(off) - 1
    sig = np.full((n, n_perms), -1, dtype=np.int64)
    if len(hashes) == 0:
        return sig
    nonempty = np.flatnonzero(np.diff(off) > 0)
    starts = off[nonempty]
    seeds = _mix(np.arange(1, n_perms + 1, dtype=np.uint64), 0x5EED)
    for p in range(n_perms):
        mixed = _mix(hashes, int(seeds[p]))
        mins = np.minimum.reduceat(mixed, starts)
        sig[nonempty, p] = mins.astype(np.int64)
    return sig


def choose_bands(n_perms: int, threshold: float) -> tuple[int, int]:
    """Pick (bands, rows_per_band) with bands·rows = n_perms whose LSH
    S-curve threshold (1/b)^(1/r) sits closest below the requested
    similarity threshold — avoids candidate explosion on corpora whose
    background similarity is non-trivial."""
    best = None
    for r in range(1, n_perms + 1):
        if n_perms % r:
            continue
        b = n_perms // r
        if b < 1:
            continue
        t = (1.0 / b) ** (1.0 / r)
        # prefer t <= threshold (recall-safe), maximize t; fall back to min t
        key = (t <= threshold, t if t <= threshold else -t)
        if best is None or key > best[0]:
            best = (key, b, r)
    return best[1], best[2]


def add_minhash_signatures(
    df: DataFrame, text_col: str, id_col: str, n_perms: int = 64, k: int = 5
) -> DataFrame:
    """→ (id, sig array<long>): one vectorized signature pass. The id
    column keeps its OWN Spark type (string doc ids are as legal here
    as in the simhash/embedding paths)."""
    id_type = df.schema[id_col].dataType.simpleString()
    schema = f"{id_col} {id_type}, sig array<long>"

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            sig = minhash_signatures(pdf[text_col], n_perms, k)
            yield pd.DataFrame(
                {id_col: pdf[id_col].to_numpy(), "sig": list(sig)}
            )

    return df.select(id_col, text_col).mapInPandas(compute, schema)


def add_minhash_bands(
    df: DataFrame, text_col: str, id_col: str,
    n_perms: int = 64, bands: int = 16, k: int = 5,
) -> DataFrame:
    """→ (id, band, band_hash): one row per (doc, band) for LSH joining.
    Band hashes are computed JVM-side from the signature column."""
    sigs = add_minhash_signatures(df, text_col, id_col, n_perms, k)
    return _bands_from_sigs(sigs, id_col, n_perms, bands)


def _bands_from_sigs(sigs: DataFrame, id_col: str, n_perms: int, bands: int) -> DataFrame:
    rows_per_band = n_perms // bands
    structs = [
        F.struct(
            F.lit(b).alias("band"),
            F.hash(F.slice("sig", b * rows_per_band + 1, rows_per_band), F.lit(b))
            .cast("long").alias("band_hash"),
        )
        for b in range(bands)
    ]
    return sigs.select(
        id_col, F.explode(F.array(*structs)).alias("bb")
    ).select(id_col, "bb.band", "bb.band_hash")


def exact_jaccard_udf(k: int = 5):
    """pandas UDF (text_a, text_b) → exact k-shingle Jaccard similarity."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def jaccard(a: pd.Series, b: pd.Series) -> pd.Series:
        ha, offa = batch_shingle_hashes(a, k)
        hb, offb = batch_shingle_hashes(b, k)
        out = np.zeros(len(a), dtype=np.float64)
        for i in range(len(a)):
            sa = np.unique(ha[offa[i] : offa[i + 1]])
            sb = np.unique(hb[offb[i] : offb[i + 1]])
            if len(sa) == 0 and len(sb) == 0:
                out[i] = 1.0
                continue
            inter = len(np.intersect1d(sa, sb, assume_unique=True))
            out[i] = inter / (len(sa) + len(sb) - inter)
        return pd.Series(out)

    return jaccard


def minhash_near_dup_pairs(
    df: DataFrame, text_col: str, id_col: str,
    threshold: float = 0.8, n_perms: int = 64, bands: int | None = None,
    k: int = 5, sig_margin: float = 0.2,
) -> DataFrame:
    """Near-duplicate pairs (id_a < id_b, jaccard ≥ threshold):
    MinHash banding (banding geometry auto-tuned to the threshold) →
    JVM-side signature-similarity prefilter of candidates (keeps pairs
    with sig-sim ≥ threshold − sig_margin; a true pair EXACTLY AT the
    threshold fails that with probability ≈ exp(−n·KL(t−m ‖ t)) —
    ~8×10⁻⁴ at t=0.8, m=0.2, 64 perms, vanishing for pairs above the
    threshold — widen sig_margin when borderline recall matters more
    than the prefilter's pruning) → exact-Jaccard verification."""
    if bands is None:
        bands, _ = choose_bands(n_perms, threshold)
    # zero-shingle exclusion: texts shorter than k bytes (incl. null /
    # empty) have NO shingle support — their degenerate all-equal
    # signatures would collide in EVERY band, pairing all short docs
    # with each other (O(m²) candidates at corpus scale; ~2% of web
    # text is empty) and reporting jaccard 1.0 for texts that share
    # nothing. Shingle similarity is undefined below k; byte-identical
    # short docs belong to exact dedup (dedup_by_content_hash).
    df = df.where(F.octet_length(F.col(text_col)) >= k)
    sigs = add_minhash_signatures(df, text_col, id_col, n_perms, k)
    # LAZY localCheckpoint: one signature pass feeds every join branch
    # (all references share the checkpointed RDD, so the UDF still runs
    # exactly once) and the blocks are ContextCleaner-managed. Lazy
    # (r7) so the materialization happens INSIDE the consuming action —
    # an eager checkpoint here was a blocking extra job serialized
    # before every candidate stage could start.
    sigs = sigs.localCheckpoint(eager=False)
    bandsdf = _bands_from_sigs(sigs, id_col, n_perms, bands)
    a = bandsdf.alias("a")
    b = bandsdf.alias("b")
    cands = (
        a.join(
            b,
            on=[
                F.col("a.band") == F.col("b.band"),
                F.col("a.band_hash") == F.col("b.band_hash"),
                F.col(f"a.{id_col}") < F.col(f"b.{id_col}"),
            ],
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    sa = sigs.select(F.col(id_col).alias("id_a"), F.col("sig").alias("sig_a"))
    sb = sigs.select(F.col(id_col).alias("id_b"), F.col("sig").alias("sig_b"))
    sig_sim = F.aggregate(
        F.zip_with("sig_a", "sig_b", lambda x, y: (x == y).cast("int")),
        F.lit(0),
        lambda acc, x: acc + x,
    ) / F.lit(float(n_perms))
    prefiltered = (
        cands.join(sa, "id_a").join(sb, "id_b")
        .where(sig_sim >= threshold - sig_margin)
        .select("id_a", "id_b")
    )
    texts = df.select(F.col(id_col), F.col(text_col))
    ta = texts.select(F.col(id_col).alias("id_a"), F.col(text_col).alias("text_a"))
    tb = texts.select(F.col(id_col).alias("id_b"), F.col(text_col).alias("text_b"))
    joined = prefiltered.join(ta, "id_a").join(tb, "id_b")
    jac = exact_jaccard_udf(k)
    return (
        joined.withColumn("jaccard", jac(F.col("text_a"), F.col("text_b")))
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash_signatures(texts, k: int = 5) -> np.ndarray:
    """64-bit SimHash per doc from k-shingle hashes (int64 view)."""
    hashes, off = batch_shingle_hashes(texts, k)
    n = len(off) - 1
    out = np.zeros(n, dtype=np.int64)
    if len(hashes) == 0:
        return out
    # popcount-per-position via unpackbits (uint8, 8× smaller than the
    # int32 ±1 matrix) + per-doc slice sums; majority bit:
    # sum(±1) > 0  ⟺  2·popcount > n_shingles
    bits = np.unpackbits(
        np.ascontiguousarray(hashes).view(np.uint8).reshape(-1, 8),
        axis=1, bitorder="little")  # column j == bit j (little-endian host)
    counts = np.diff(off)
    nonempty = np.flatnonzero(counts > 0)
    # per-doc slice sums beat np.add.reduceat ~80× here (reduceat's
    # per-segment dispatch on a wide uint8 matrix is pathological)
    sums = np.empty((len(nonempty), 64), dtype=np.int64)
    for i, d in enumerate(nonempty):
        sums[i] = bits[off[d]:off[d + 1]].sum(axis=0)
    sig_bits = (2 * sums > counts[nonempty][:, None]).astype(np.uint64)
    vals = (sig_bits << np.arange(64, dtype=np.uint64)).sum(axis=1, dtype=np.uint64)
    out[nonempty] = vals.astype(np.int64)
    return out


def add_simhash(df: DataFrame, text_col: str, out_col: str = "simhash", k: int = 5) -> DataFrame:
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def sh(texts: pd.Series) -> pd.Series:
        return pd.Series(simhash_signatures(texts, k))

    return df.withColumn(out_col, sh(F.col(text_col)))


def simhash_near_dup_pairs(
    df: DataFrame, text_col: str, id_col: str, max_hamming: int = 3, k: int = 5
) -> DataFrame:
    """Pairs with SimHash hamming distance ≤ max_hamming, found with the
    pigeonhole trick: split 64 bits into (max_hamming+1) blocks — any
    pair within distance t shares at least one exact block — group by
    block value, verify hamming on candidates (JVM-side bit ops)."""
    nblocks = max_hamming + 1
    block_bits = 64 // nblocks
    # zero-shingle exclusion, same policy as minhash_near_dup_pairs:
    # sub-k texts all simhash to 0 (hamming 0 to each other) and would
    # pair quadratically via every pigeonhole block
    df = df.where(F.octet_length(F.col(text_col)) >= k)
    sh = add_simhash(df.select(id_col, text_col), text_col, "simhash", k)
    # lazy localCheckpoint (not cache): self-join reads the blocks of
    # ONE signature pass, GC-managed lifetime; lazy (r7) so it
    # materializes inside the consuming action instead of a blocking
    # up-front job
    sh = sh.select(id_col, "simhash").localCheckpoint(eager=False)
    blocks = sh.select(
        id_col,
        "simhash",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("block_id"),
                    # block_bits == 64 (max_hamming=0, one block) must
                    # skip the mask: (1<<64)-1 overflows LongType and the
                    # shift by 0 already yields the full simhash
                    (F.shiftrightunsigned(F.col("simhash"), i * block_bits)
                     .bitwiseAND(F.lit((1 << block_bits) - 1))
                     if block_bits < 64
                     else F.col("simhash")).alias("block_val"),
                )
                for i in range(nblocks)
            ])
        ).alias("blk"),
    ).select(id_col, "simhash", "blk.block_id", "blk.block_val")
    a, b = blocks.alias("a"), blocks.alias("b")
    # hamming check inside the join condition: the overwhelming majority
    # of block-collision candidates (hamming ≈ 32 for unrelated docs)
    # die during the join, before the dedup exchange
    hamming_ab = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    cands = (
        a.join(
            b,
            on=[
                F.col("a.block_id") == F.col("b.block_id"),
                F.col("a.block_val") == F.col("b.block_val"),
                F.col(f"a.{id_col}") < F.col(f"b.{id_col}"),
                hamming_ab <= max_hamming,
            ],
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            hamming_ab.alias("hamming"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    return cands.select("id_a", "id_b", "hamming")


# ---------------------------------------------------------------------------
# transitive clustering of near-dup pairs (connected components)
# ---------------------------------------------------------------------------


def connected_components(
    pairs: DataFrame, id_a: str = "id_a", id_b: str = "id_b", max_iters: int = 12
) -> DataFrame:
    """(id_a, id_b) pairs → (doc_id, component) with component = min id of
    the doc's connected component.

    Min-label propagation WITH pointer jumping: each round every node
    takes the min label over itself and its neighbors (one hop), then
    labels shortcut through their label's label (path halving) — so
    convergence is O(log diameter) rounds, not O(diameter); a 300-hop
    dup chain closes in ~9 rounds. Each round is two joins + one
    aggregation (Catalyst-planned shuffles); the per-round count() is
    control-plane only. Raises RuntimeError if max_iters rounds did not
    converge (silent truncation would keep extra near-dup
    representatives downstream)."""
    edges = (
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .unionByName(pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst")))
        .dropDuplicates()
    )
    # eager localCheckpoint: the whole upstream pair pipeline (LSH +
    # verification) runs ONCE; every round's join reads the materialized
    # edge blocks with truncated lineage (GC-managed, no unpersist)
    edges = edges.localCheckpoint(eager=True)
    labels = (
        edges.select(F.col("src").alias("doc_id"))
        .dropDuplicates()
        .withColumn("component", F.col("doc_id"))
    )
    changed = -1
    for it in range(max_iters):
        neighbor_min = (
            edges.join(labels, edges["dst"] == labels["doc_id"])
            .groupBy("src")
            .agg(F.min("component").alias("nmin"))
        )
        hop = (
            labels.join(neighbor_min, labels["doc_id"] == neighbor_min["src"], "left")
            .select(
                "doc_id",
                F.col("component").alias("__old"),
                F.least(
                    F.col("component"), F.coalesce(F.col("nmin"), F.col("component"))
                ).alias("component"),
            )
        )
        # pointer jumping: component ← label(component). Labels are
        # always real doc ids, so the self-join resolves; this is the
        # path-halving step that makes long chains converge in log rounds.
        parent = hop.select(F.col("doc_id").alias("pid"),
                            F.col("component").alias("pcomp"))
        new_labels = (
            hop.join(parent, hop["component"] == parent["pid"], "left")
            .select(
                "doc_id",
                F.least(
                    F.col("component"), F.coalesce(F.col("pcomp"), F.col("component"))
                ).alias("component"),
                # convergence flag threaded through the round's own
                # columns: the old shape re-joined new vs old labels
                # (an extra shuffle join + full recompute per round)
                (F.least(
                    F.col("component"), F.coalesce(F.col("pcomp"), F.col("component"))
                ) != F.col("__old")).alias("__changed"),
            )
        )
        # truncate lineage every round: the label frame feeds two joins
        # per iteration, so the un-checkpointed plan would double each
        # round (exponential analysis cost → driver OOM near round 10)
        new_labels = new_labels.localCheckpoint(eager=True)
        # cheap local scan of the checkpointed blocks, no join
        changed = new_labels.where(F.col("__changed")).count()
        labels = new_labels.drop("__changed")
        if changed == 0:
            break
    if changed != 0:
        raise RuntimeError(
            f"connected_components did not converge in {max_iters} rounds "
            f"({changed} labels still changing); raise max_iters")
    return labels


def collapse_near_dup_clusters(
    df: DataFrame, pairs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Keep exactly one representative (the min id) per connected
    component of the near-dup pair graph."""
    comp = connected_components(pairs)
    losers = comp.where(F.col("doc_id") != F.col("component")).select(
        F.col("doc_id").alias(id_col)
    )
    return df.join(losers, id_col, "left_anti")


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def dedup_exact(df: DataFrame, cols: list[str]) -> DataFrame:
    """Exact dedup on cols (hash-shuffle dropDuplicates; Catalyst plans
    a partial+final hash aggregate)."""
    return df.dropDuplicates(cols)


def dedup_by_content_hash(df: DataFrame, text_col: str, keep: str = "min",
                          id_col: str = "doc_id", verify: bool = True) -> DataFrame:
    """Exact content dedup keeping one representative per distinct TEXT
    (min/max id). Two-phase agg on the 64-bit fingerprint, so the
    grouping shuffle moves only (fingerprint, id) pairs. ``id_col``
    must be unique per row (it identifies the representative), and
    ``df`` must be deterministic under re-execution (it feeds several
    subplans, the usual Spark contract for uncached frames — persist()
    a nondeterministic input like .sample() first; only the slim
    fingerprint frame is checkpointed here, text bodies never are).

    The fingerprint pass materializes a SLIM (id, fingerprint) frame
    (16 B/row) via eager localCheckpoint: text bodies are never cached,
    the UDF runs exactly once even though several subplans reference the
    fingerprints, and the blocks are freed by the ContextCleaner when
    the result goes out of scope (the previous full-width ``persist()``
    leaked cached text blocks across calls in a long-lived session).

    verify=True (default) makes the result byte-exact under fingerprint
    collisions (~n²/2⁶⁵ odds, which at 10¹²-row scale is no longer
    ignorable): rows whose fingerprint matched the representative but
    whose TEXT differs are restored and deduped exactly among themselves
    — a collision can never silently merge two distinct texts. The
    verification join touches only rows of multi-member fingerprint
    groups (the duplicates being collapsed), never the unique majority."""
    from cuckoo_filter_spark.functions.text import doc_fingerprint_udf

    if keep not in ("min", "max"):
        raise ValueError(f"keep must be 'min' or 'max', got {keep!r}")
    fp = doc_fingerprint_udf()
    agg = F.min if keep == "min" else F.max
    slim = df.select(id_col, fp(F.col(text_col)).alias("__fp"))
    slim = slim.localCheckpoint(eager=False)  # lazy (r7): materializes
    # once inside the first consuming action, not as a blocking pre-job
    reps = slim.groupBy("__fp").agg(agg(F.col(id_col)).alias(id_col))
    winner_ids = reps.select(id_col)
    kept = df.join(winner_ids, id_col, "left_semi")
    if not verify:
        return kept
    loser_fp = slim.join(winner_ids, id_col, "left_anti")
    rep_txt = df.join(reps, id_col).select(
        "__fp", F.col(text_col).alias("__rep_text"))
    losers = df.join(loser_fp, id_col)
    mism = (
        losers.join(rep_txt, "__fp")
        # null-SAFE inequality: doc_fingerprint fillna('')s, so a NULL-
        # text row shares ''\'s fingerprint BY CONSTRUCTION (not by
        # collision) — plain != evaluates NULL and the row would be
        # silently merged with the empty-string representative
        .where(~F.col(text_col).eqNullSafe(F.col("__rep_text")))
        .drop("__rep_text")
    )
    # exact representative per collided text (tiny set; usually empty);
    # the restore join must be NULL-SAFE on the text too — a plain
    # equality join drops the NULL-text group (NULL == NULL is NULL)
    # that the eqNullSafe mismatch filter above deliberately kept
    fixed_reps = mism.groupBy("__fp", text_col).agg(agg(F.col(id_col)).alias(id_col))
    fr = fixed_reps.alias("__fr")
    ms = mism.alias("__ms")
    fixed = ms.join(
        fr,
        on=(F.col(f"__ms.{id_col}") == F.col(f"__fr.{id_col}"))
        & (F.col("__ms.__fp") == F.col("__fr.__fp"))
        & F.col(f"__ms.{text_col}").eqNullSafe(F.col(f"__fr.{text_col}")),
        how="left_semi",
    )
    return kept.unionByName(fixed.drop("__fp"))


# ---------------------------------------------------------------------------
# embedding-cosine near-dup
# ---------------------------------------------------------------------------


def choose_embedding_lsh(n: int, threshold: float,
                         target_recall: float = 0.98,
                         target_bucket: int = 64) -> tuple[int, int]:
    """Auto-size (n_planes, n_tables) for banded hyperplane LSH.

    ρ = P[one plane agrees] = 1 − acos(threshold)/π. Planes per table:
    enough that the mean bucket stays ≤ target_bucket (p ≥ log2(n /
    target_bucket) — the within-bucket self-join must not go quadratic
    as n grows) and at least ln(0.7)/ln(ρ) so one band keeps ≥70% of
    true pairs; clamped to [8, 32]. Tables: enough independent bands
    that 1 − (1 − ρ^p)^T ≥ target_recall, clamped to [1, 16]."""
    import math

    rho = 1.0 - math.acos(min(max(threshold, -1.0), 1.0)) / math.pi
    rho = min(rho, 1.0 - 1e-9)
    p_recall = int(round(math.log(0.7) / math.log(rho)))
    p_bucket = (int(math.ceil(math.log2(n / target_bucket)))
                if n > target_bucket else 0)
    n_planes = min(max(p_recall, p_bucket, 8), 32)
    per_band = rho ** n_planes
    if per_band >= target_recall:
        n_tables = 1
    else:
        n_tables = int(math.ceil(math.log(1.0 - target_recall)
                                 / math.log(1.0 - per_band)))
    return n_planes, min(max(n_tables, 1), 16)


def lsh_expected_recall(threshold: float, n_planes: int, n_tables: int) -> float:
    """1 − (1 − ρ^p)^T for cosine-threshold pairs (ρ = 1 − θ/π).
    Identical vectors always collide regardless (exact-dup recall 1)."""
    import math

    rho = 1.0 - math.acos(min(max(threshold, -1.0), 1.0)) / math.pi
    rho = min(rho, 1.0 - 1e-9)
    return 1.0 - (1.0 - rho ** n_planes) ** n_tables


def embedding_near_dup_pairs(
    df: DataFrame, vec_col: str, id_col: str,
    threshold: float = 0.95,
    n_planes: int | None = None, n_tables: int | None = None,
    seed: int = 7, bucket_cap: int | None = None,
    approx_count: int | None = None, target_recall: float = 0.98,
    log_drops: bool = True,
) -> DataFrame:
    """Pairs with cosine ≥ threshold via BANDED multi-table hyperplane
    LSH + exact cosine verification (same banding shape as the MinHash
    path): T independent tables of p sign-bit planes each; a pair is a
    candidate if it shares ANY table's bucket. p scales with log2(n) so
    the mean bucket size stays bounded as the corpus grows (a fixed p
    makes the within-bucket self-join quadratic at 10⁹+ vectors), and T
    restores recall to target_recall. Identical vectors share every
    bucket, so exact-dup recall is 1 regardless of sizing.

    Scale shape: one UDF pass computes all T bucket ids; only the slim
    (id, table, bucket) rows are exploded/joined (vectors move only for
    deduped candidate pairs, joined back by id); the (id, buckets) frame
    is eagerly localCheckpoint-ed so the self-join branches don't
    recompute the projection.

    bucket_cap: optional per-(table, bucket) membership cap for skewed
    corpora (e.g. a hot all-zeros embedding) — members beyond the cap
    are dropped from candidate generation and the dropped volume is
    surfaced via warnings.warn (log_drops), never silently.

    approx_count: corpus size hint for auto-sizing (skips the count()
    scan when the caller already knows it).

    ``df`` must be deterministic under re-execution (same caveat as
    dedup_by_content_hash): it is read by multiple subplans (the bucket
    projection plus both vector re-join branches), so a nondeterministic
    source — fresh uuid columns, unseeded sampling — can pair ids with
    vectors from a different materialization. localCheckpoint or persist
    such inputs first."""
    import warnings

    from pyspark.sql import Window
    from pyspark.sql.functions import pandas_udf

    from cuckoo_filter_spark.operators.similarity import (
        _as_matrix,
        _hyperplanes,
    )

    spark = df.sparkSession
    if n_planes is None or n_tables is None:
        # size on the rows that actually participate: null-vector rows
        # are excluded from the candidate scan below, and counting them
        # here would inflate n (extra plane -> lower per-band recall)
        n = (approx_count if approx_count is not None
             else df.where(F.col(vec_col).isNotNull()).count())
        auto_p, auto_t = choose_embedding_lsh(max(n, 1), threshold,
                                              target_recall)
        n_planes = n_planes if n_planes is not None else auto_p
        n_tables = n_tables if n_tables is not None else auto_t
    achieved = lsh_expected_recall(threshold, n_planes, n_tables)
    if achieved < target_recall - 1e-9:
        # never silently under-recall — warned on the pair ACTUALLY
        # used, whether auto-chosen (table clamp binds) or overridden
        warnings.warn(
            f"embedding_near_dup_pairs: {n_tables} tables x {n_planes} "
            f"planes reaches ~{achieved:.2f} expected recall at "
            f"threshold={threshold}, below target_recall={target_recall} "
            f"— lower n_planes / raise n_tables, or accept the recall "
            f"(exact duplicates are still always found)")
    # ADVICE r4: probe the dimension from the first NON-NULL vector — a
    # null in row 1 must not make a populated corpus read as empty (and
    # silently return zero pairs). Null-vector rows can match nothing,
    # so they are dropped from the candidate scan entirely.
    df = df.where(F.col(vec_col).isNotNull())
    first = df.select(vec_col).first()
    if first is None:
        # genuinely empty corpus (no non-null vectors): no pairs —
        # return an empty, correctly-typed frame
        id_t = df.schema[id_col].dataType.simpleString()
        return spark.createDataFrame(
            [], f"id_a {id_t}, id_b {id_t}, cosine double")
    dim = len(first[0])
    planes = _hyperplanes(dim, n_tables * n_planes, seed)
    bp = spark.sparkContext.broadcast(planes)
    T, P = n_tables, n_planes

    @pandas_udf("array<long>")
    def all_buckets(vecs: pd.Series) -> pd.Series:
        mat = _as_matrix(vecs)
        proj = mat @ bp.value.T  # [n, T*P]
        bits = (proj > 0).astype(np.uint64)
        shifts = np.arange(P, dtype=np.uint64)
        vals = np.empty((len(mat), T), dtype=np.int64)
        for t in range(T):
            bb = bits[:, t * P:(t + 1) * P]
            vals[:, t] = (bb << shifts).sum(axis=1, dtype=np.uint64).astype(
                np.int64)
        return pd.Series(list(vals))

    slim = df.select(id_col, all_buckets(F.col(vec_col)).alias("__bks"))
    slim = slim.localCheckpoint(eager=False)  # one projection pass; both
    # self-join branches read the checkpoint (GC-managed, unlike
    # persist); lazy (r7) so it materializes inside the consuming action
    bucketed = slim.select(
        id_col, F.posexplode("__bks").alias("__table", "__bucket"))
    if bucket_cap is not None:
        if log_drops:
            # drop count from a plain groupBy over the checkpointed slim
            # frame — one cheap aggregate, NOT a second pass of the
            # row_number window below
            n_dropped = (
                bucketed.groupBy("__table", "__bucket").count()
                .where(F.col("count") > bucket_cap)
                .agg(F.sum(F.col("count") - bucket_cap).alias("d"))
                .collect()[0]["d"]) or 0
            if n_dropped:
                warnings.warn(
                    f"embedding_near_dup_pairs: {n_dropped} (id, table, "
                    f"bucket) memberships over bucket_cap={bucket_cap} "
                    f"dropped — pairs inside over-cap buckets may be missed")
        w = Window.partitionBy("__table", "__bucket").orderBy(id_col)
        bucketed = (bucketed.withColumn("__rn", F.row_number().over(w))
                    .where(F.col("__rn") <= bucket_cap).drop("__rn"))
    a, b = bucketed.alias("a"), bucketed.alias("b")
    cands = (
        a.join(
            b,
            on=[
                F.col("a.__table") == F.col("b.__table"),
                F.col("a.__bucket") == F.col("b.__bucket"),
                F.col(f"a.{id_col}") < F.col(f"b.{id_col}"),
            ],
        )
        .select(F.col(f"a.{id_col}").alias("id_a"),
                F.col(f"b.{id_col}").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    va = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("vec_a"))
    vb = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vec_b"))
    joined = cands.join(va, "id_a").join(vb, "id_b")
    dot = F.aggregate(
        F.zip_with("vec_a", "vec_b", lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    # zero vectors project to bucket 0 in EVERY table, so all-zeros
    # embeddings always become candidate pairs — the shared clamped
    # norm keeps them at score 0.0 instead of ANSI DIVIDE_BY_ZERO
    from cuckoo_filter_spark.operators.similarity import clamped_norm_expr
    norm = clamped_norm_expr
    cos = (dot / (norm(F.col("vec_a")) * norm(F.col("vec_b")))).alias("cosine")
    return joined.select("id_a", "id_b", cos).where(F.col("cosine") >= threshold)

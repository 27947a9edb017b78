"""Similarity search over the ``embeddings`` table (driver north star).

Two tiers, as a real 100 TB pipeline would ship them:

- **Brute-force cosine top-k** (oracle-checked): broadcast the query set,
  score every vector JVM-side, per-query top-k via ranked window. Exact; the
  baseline every ANN variant is measured against. Cost is one scan per query
  batch — fine when |queries| is small, the shape used for eval/probing.
- **LSH-bucketed ANN** (scale path): deterministic random-hyperplane
  signatures partition vectors into 2^H buckets; a query probes only its own
  bucket. Recall vs the brute-force baseline is asserted in tests, the
  driver check is rows-only (bucketing is not expressible in ANSI SQL).

Vector math is JVM higher-order functions (functions/vectors.py). A Pandas
UDF variant is deliberately absent from the hot path: at 64 dims the codegen
loop beats Arrow round-trips; it wins only at ≥ ~1k dims.
"""

from __future__ import annotations

import time

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_exercise_spark.catalog import (
    evict_stale_memos,
    load_table,
    log_memo_build,
    register_memo,
    timed_build,
)
from kafka_exercise_spark.functions.text import md5_hash64
from kafka_exercise_spark.functions.vectors import cosine, dot

N_QUERIES = 5  # vec_id < 5 are the demo query set
TOP_K = 10
N_HYPERPLANES = 6  # 64 buckets
EMBED_DIM = 64


def _embeddings_double(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("emb")
    )


def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-k neighbors (cosine) for the demo query set.

    The query side is broadcast — the big side streams through unshuffled.
    Ranking rounds to 9 decimals with a vec_id tie-break so the cut is
    deterministic and oracle-stable.
    """
    emb = _embeddings_double(spark, sf_dir)
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("emb").alias("q_emb")
    )
    scored = (
        emb.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
        .withColumn("c", F.round(cosine(F.col("emb"), F.col("q_emb")), 9))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("c"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(F.col("c"), 6).alias("cos"),
            F.col("rank").cast("long").alias("rank"),
        )
    )


#: Fixed-point scale for LSH projections: embedding and hyperplane values
#: quantize to 2^-20 before the dot product, making every projection an
#: exact integer (≤ 2^47 — exact in long AND double, any summation order).
PROJ_SCALE = 1 << 20


def _hyperplanes_int() -> list[list[int]]:
    """Deterministic pseudo-random hyperplanes, pre-quantized to ints (no
    RNG state — pure formula, reproducible across sessions and engines)."""
    return [
        [
            round(math.sin(0.7 * h * EMBED_DIM + 1.3 * i + 0.5) * PROJ_SCALE)
            for i in range(EMBED_DIM)
        ]
        for h in range(N_HYPERPLANES)
    ]


def lsh_bucket(col: F.Column) -> F.Column:
    """Random-hyperplane LSH bucket id for an array<double> column.

    The projection sign is computed over EXACT integers (fixed-point
    embedding × pre-quantized plane), so bucket membership is bit-identical
    in any engine and any summation order — which is what lets the LSH ANN
    entries carry full DuckDB value-hash oracles instead of rows-only
    checks. Quantization at 2^-20 is far below any embedding's noise
    floor; the hash family is unchanged in character.
    """
    ei = F.transform(col, lambda x: F.round(x * PROJ_SCALE).cast("long"))
    bucket = F.lit(0)
    for h, plane in enumerate(_hyperplanes_int()):
        # one Literal node per plane (not 64 lit().cast() children): the
        # per-element build costs ~0.5 s of Py4J round trips per call
        plane_lit = F.lit([int(v) for v in plane]).cast("array<bigint>")
        proj = dot(ei, plane_lit)
        bucket = bucket + F.when(proj > 0, F.lit(1 << h)).otherwise(F.lit(0))
    return bucket


#: Materialized bucket-labeled corpus per (application, sf_dir) — the
#: served LSH index both probe variants read (same contract as the IVF
#: assigned-frame memo; at 100 TB this is the bucket-partitioned table).
_LSH_INDEX_MEMO: dict[tuple[str, str], DataFrame] = register_memo({})


def _lsh_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    evict_stale_memos(spark)
    key = (spark.sparkContext.applicationId, sf_dir)
    df = _LSH_INDEX_MEMO.get(key)
    if df is None:
        df = timed_build(
            "lsh_index",
            lambda: _embeddings_double(spark, sf_dir)
            .withColumn("bucket", lsh_bucket(F.col("emb")))
            .localCheckpoint(),
        )
        _LSH_INDEX_MEMO[key] = df
    return df


N_IVF_CELLS = 16
N_PROBE = 4


IVF_TRAIN_MAX = 4096  # vectors collected for the coarse quantizer
IVF_ITERS = 5  # Lloyd iterations — IVF recall barely moves past a few
#: (applicationId, sf_dir) → built centroids — keyed like every other
#: memo so a new session (or a test monkeypatching load_table under a
#: reused sf_dir) never gets stale centroids desynced from its data.
_IVF_INDEX: dict[tuple[str, str], list[list[int]]] = register_memo({})
#: Materialized cell-assignment frames, keyed by (application, sf_dir) —
#: the served IVF index every consumer probes (same contract as
#: dedup._LSH_PAIRS_MEMO).
_IVF_ASSIGNED_MEMO: dict[tuple[str, str], DataFrame] = register_memo({})


def quantized_vec(col: F.Column) -> F.Column:
    """array<double> → array<long> fixed-point at ``PROJ_SCALE`` — the
    shared exactness primitive of the LSH *and* IVF index families."""
    return F.transform(col, lambda x: F.round(x * PROJ_SCALE).cast("long"))


def _dot_long(a: F.Column, b: F.Column) -> F.Column:
    """Exact integer dot product of two quantized array<long> vectors
    (products ≤ 2^40, sums ≤ 2^46 — exact in long, any fold order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def int_cos_e6(ea: F.Column, eb: F.Column) -> F.Column:
    """Cosine between two QUANTIZED vectors as an exact integer in
    micro-units (cos · 10⁶, HALF_UP).

    Why this exists: a float cosine fold produces 1-ulp-different doubles
    across engines (different summation trees), which flips 6-dp rounds at
    grid boundaries — observed once in 8139 pairs at sf0.1. Here every sum
    is an exact integer, so dot/ss are bit-identical everywhere; the only
    float ops left (one multiply, one sqrt, one divide, one 0-dp round)
    are IEEE correctly-rounded functions of identical inputs — identical
    in any engine. Quantization at 2^-20 is far below embedding noise.
    """
    d = _dot_long(ea, eb).cast("double")
    ss = _dot_long(ea, ea).cast("double") * _dot_long(eb, eb).cast("double")
    return (
        F.when(ss > 0, F.round(d / F.sqrt(ss) * 1_000_000).cast("long"))
        .otherwise(F.lit(0).cast("long"))
    )


def _ranked_cells(ei, centers) -> list[int]:
    """All cells ranked by exact integer d² to the query's quantized
    vector (ties → lowest cell) — THE probe-cell ranking shared by every
    IVF consumer (ivf / ivf-pq / pareto), pure driver-side Python ints
    over the bounded demo query panel (the Janino-recompile avoidance
    pattern the ivf docstrings document)."""
    return [
        cell
        for _, cell in sorted(
            (sum((a - b) * (a - b) for a, b in zip(ei, c)), cell)
            for cell, c in enumerate(centers)
        )
    ]


def _ivf_centroids(emb: DataFrame) -> list[list[int]]:
    """Deterministic KMeans coarse quantizer, trained driver-side — in
    EXACT fixed-point integers, so the entire fit (and hence every cell
    assignment) is reproducible bit-for-bit by any engine, which is what
    upgrades the IVF/SemDeDup entries from rows-only to full value-hash
    oracles (the same trick that made the LSH buckets hash-checkable).

    The quantizer only ever sees a bounded sample — centroids must fit on
    the driver regardless of corpus size, and IVF recall needs balanced-ish
    cells, not an optimal clustering. So index build is: deterministic
    hash-sample ≤ IVF_TRAIN_MAX vectors (membership is a pure function of
    vec_id — reproducible across reruns and cluster sizes), ONE collect of
    PRE-QUANTIZED vectors (rounding happens in Spark expressions, so no
    Python-vs-JVM rounding drift can exist), then Lloyd's in int64 numpy on
    the driver: assignment by exact integer squared distance (≤ 2^48 —
    exact in long and double; ties → lowest cell), centroid update by
    element-wise floor(sum/count) (exact integer division), empty cells
    keep their previous centroid. Init = the k sample vectors with
    smallest md5-ranked vec_id (seedless, engine-independent).
    """
    import hashlib

    import numpy as np

    n = emb.count()  # column-pruned count — near metadata-only on parquet
    # bucket count scales WITH n so the expected sample stays ~IVF_TRAIN_MAX
    # at any corpus size (a fixed percent-granularity rate would floor at
    # 1% and grow the driver collect as n/100 — uncapped at billions of
    # vectors)
    buckets = max(1, n // IVF_TRAIN_MAX)
    sample = emb.select(
        "vec_id", quantized_vec(F.col("emb")).alias("ei")
    ).filter(
        F.pmod(
            md5_hash64(F.concat(F.lit("ivf:"), F.col("vec_id"))), F.lit(buckets)
        )
        == 0
    ).collect()

    def h(vid: int) -> int:
        return int(hashlib.md5(f"ivf-init:{vid}".encode()).hexdigest()[:15], 16)

    sample.sort(key=lambda r: (h(r.vec_id), r.vec_id))
    x = np.array([r.ei for r in sample], dtype=np.int64)
    return _integer_lloyd(x, N_IVF_CELLS, IVF_ITERS)


def _integer_lloyd(x, k: int, iters: int) -> list[list[int]]:
    """All-integer Lloyd's over an (n, d) int64 sample: init = first k rows
    (callers pre-sort by md5 rank), assignment by exact integer squared
    distance with lowest-cell tie-break, update = element-wise
    floor(sum/count), empty cells keep their centroid. Every step is exact
    integer arithmetic, so a SQL engine replays the fit bit-for-bit —
    shared by the IVF coarse quantizer and the PQ sub-quantizers."""
    centers = x[: min(k, len(x))].copy()
    for _ in range(iters):
        d2 = ((x[:, None, :] - centers[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)  # first occurrence — lowest cell on ties
        for c in range(len(centers)):
            members = x[assign == c]
            if len(members):
                # floor division (toward -inf), matching floor(sum/cnt)
                centers[c] = members.sum(axis=0) // len(members)
    return centers.tolist()


def _ivf_assign(spark: SparkSession, sf_dir: str):
    """(assigned frame, integer centroids): every vector labeled with its
    nearest IVF cell — the shared substrate of IVF search AND semantic
    dedup. Centroids are a pure function of the corpus (deterministic
    sample + seedless init), so repeated calls reuse the built index per
    sf_dir — exactly how a served IVF index is used.

    Distances are exact integer squared L2 over QUANTIZED vectors (see
    ``quantized_vec``; ≤ 2^48, exact in long), so argmin — with
    array_position's first-occurrence = lowest-cell tie-break — is
    engine-independent; the DuckDB oracle replays the identical fit and
    assignment.
    """
    evict_stale_memos(spark)
    emb = _embeddings_double(spark, sf_dir)
    memo_key = (spark.sparkContext.applicationId, sf_dir)
    centers = _IVF_INDEX.get(memo_key)
    if centers is None:
        centers = _IVF_INDEX[memo_key] = timed_build(
            "ivf_centroids", lambda: _ivf_centroids(emb)
        )

    assigned = _IVF_ASSIGNED_MEMO.get(memo_key)
    if assigned is None:
        _t0_build = time.perf_counter()
        # the assignment scan runs ONCE per (session, corpus) and is pinned
        # — every IVF consumer (ANN probe, SemDeDup) then reads the
        # materialized index instead of re-running the per-row 16-cell
        # fold (bench: ann_ivf_topk 3.97 s → sub-second warm). The frame
        # carries the quantized ints (`ei`) alongside the floats so no
        # consumer ever re-quantizes. At 100 TB this is the
        # cell-partitioned index table written to the lake.
        # ONE nested Literal node (not 16×64 CreateArray children): a
        # per-element lit().cast() build costs ~2 s of Py4J round trips
        # per call and bloats every optimizer walk; it also only exists
        # on this cold path — the memo-hit path builds no plan at all.
        centers_lit = F.lit([[int(v) for v in c] for c in centers]).cast(
            "array<array<bigint>>"
        )
        dists = F.transform(
            centers_lit,
            lambda c: F.aggregate(
                F.zip_with(F.col("ei"), c, lambda a, b: (a - b) * (a - b)),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ),
        )
        # projection barrier: materialize the 16-cell distance fold ONCE
        # per row — inlining it into array_position(dists, array_min(...))
        # evaluates the full fold twice per row (measured 2.4s -> 0.8s)
        assigned = (
            emb.withColumn("ei", quantized_vec(F.col("emb")))
            .withColumn("dists", dists)
            .withColumn(
                "cell",
                (
                    F.array_position(F.col("dists"), F.array_min("dists")) - 1
                ).cast("int"),
            )
            .drop("dists")
            .localCheckpoint()
        )
        _IVF_ASSIGNED_MEMO[memo_key] = assigned
        log_memo_build("ivf_assigned", time.perf_counter() - _t0_build)
    return assigned, centers


def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN: KMeans coarse quantizer, probe the n nearest cells.

    Index build = `_ivf_centroids` (driver-side all-integer Lloyd's on a
    deterministic bounded sample); every vector is assigned to its nearest
    centroid by a pure JVM expression once the centroids are literals.
    Query = rank centroids per query, probe the top-4 cells, exact-score
    only their members. Probing 4/16 cells scans ~25% of the corpus; recall
    vs the brute-force baseline is asserted in tests, and because fit +
    assignment are exact integer arithmetic the driver value-hash-checks
    the output against a DuckDB replay of the identical fit.

    At 100 TB: store the cell id as a partition column so a probe reads
    n_probe partitions, re-train only on drift.
    """
    assigned, centers = _ivf_assign(spark, sf_dir)
    # per-query: the N_PROBE nearest cells, ranked DRIVER-SIDE in pure
    # Python integers (exact — the same arithmetic the oracle replays;
    # ties → lowest cell). The query set is the bounded demo workload
    # (N_QUERIES rows), so the collect is capped by definition — and a
    # Spark subtree here would re-compile its lambda codegen per call
    # (~2 s measured for a 5-row ranking job, the ExprId-cache miss the
    # decontaminate_bloom comment documents).
    q_rows = (
        assigned.filter(F.col("vec_id") < N_QUERIES)
        .select("vec_id", "emb", "ei")
        .collect()
    )
    probes = [
        (r.vec_id, list(r.emb), cell)
        for r in q_rows
        for cell in _ranked_cells(r.ei, centers)[:N_PROBE]
    ]
    q_cells = spark.createDataFrame(
        probes, "query_id long, q_emb array<double>, probe_cell int"
    )
    scored = assigned.join(
        F.broadcast(q_cells),
        (F.col("cell") == F.col("probe_cell"))
        & (F.col("vec_id") != F.col("query_id")),
    ).withColumn("c", F.round(cosine(F.col("emb"), F.col("q_emb")), 9))
    w = Window.partitionBy("query_id").orderBy(F.desc("c"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(F.col("c"), 6).alias("cos"),
            F.col("rank").cast("long").alias("rank"),
        )
    )


def ann_lsh_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-k: probe only the query's hyperplane bucket.

    The bucket id is a pure map over each side; the join is
    bucket-equi + broadcast queries, so the scored candidate set is
    |bucket| not |all|. At 100 TB the vectors side would additionally be
    written bucket-partitioned so a probe scans one partition.
    """
    emb = _lsh_indexed(spark, sf_dir)
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("emb").alias("q_emb"),
        F.col("bucket").alias("q_bucket"),
    )
    scored = (
        emb.join(
            F.broadcast(q),
            (F.col("bucket") == F.col("q_bucket"))
            & (F.col("vec_id") != F.col("query_id")),
        )
        .withColumn("c", F.round(cosine(F.col("emb"), F.col("q_emb")), 9))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("c"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(F.col("c"), 6).alias("cos"),
            F.col("rank").cast("long").alias("rank"),
            "bucket",
        )
    )


def ann_lsh_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe LSH ANN: each query probes its own bucket plus every
    bucket at Hamming distance 1 (one hyperplane flipped).

    The standard recall lever for hyperplane LSH: a near neighbor lands in
    a different bucket exactly when one (or more) projection straddles the
    boundary, and single-bit flips cover the by-far-likeliest case. Cost is
    (H+1)/2^H of the corpus per query (7/64 here ≈ 11%) instead of 1/2^H —
    still a bucket-pruned scan, never all-pairs; recall@k rises toward
    brute force (asserted in tests). The probe set is built by exploding a
    literal array of the H+1 XOR masks per query — pure JVM, one
    bucket-equi broadcast join, the same plan family as single-probe.

    At 100 TB: identical layout story as ``ann_lsh_bucketed`` (vectors
    written bucket-partitioned; a multi-probe query reads H+1 partitions).
    """
    emb = _lsh_indexed(spark, sf_dir)
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("emb").alias("q_emb"),
        F.col("bucket").alias("q_bucket"),
    )
    masks = F.array(*[F.lit(m) for m in [0] + [1 << h for h in range(N_HYPERPLANES)]])
    probes = q.select(
        "query_id",
        "q_emb",
        F.explode(
            F.transform(masks, lambda m: F.col("q_bucket").bitwiseXOR(m))
        ).alias("probe_bucket"),
    )
    scored = emb.join(
        F.broadcast(probes),
        (F.col("bucket") == F.col("probe_bucket"))
        & (F.col("vec_id") != F.col("query_id")),
    ).withColumn("c", F.round(cosine(F.col("emb"), F.col("q_emb")), 9))
    w = Window.partitionBy("query_id").orderBy(F.desc("c"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(F.col("c"), 6).alias("cos"),
            F.col("rank").cast("long").alias("rank"),
        )
    )


#: |z| beyond which an embedding's norm marks it an outlier.
OUTLIER_Z = 2.0


def embedding_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-quality audit: per-vector L2 norm (catches un-normalized /
    truncated vectors — the fixtures come back exactly 1.0) plus z-scored
    distance from the corpus centroid, outlier flag at |z| > ``OUTLIER_Z``
    — the cheap pre-filter that catches off-manifold vectors before they
    poison ANN indexes or dedup thresholds.

    The centroid is a posexplode → per-dimension avg (one shuffle of D
    rows per task thanks to partial aggregation), reassembled into an array
    and broadcast; distances are then a map-only fold per row. σ = 0
    (all-identical corpus) degrades to z = 0 rather than dividing by zero.
    At 100 TB: two scans — one for the centroid, one scoring — both
    scan-bound; persist the centroid row if the audit re-runs.
    """
    emb = _embeddings_double(spark, sf_dir)
    centroid = (
        emb.select(F.posexplode("emb").alias("pos", "v"))
        .groupBy("pos")
        .agg(F.avg("v").alias("c"))
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "c"))),
                lambda s: s["c"],
            ).alias("centroid")
        )
    )
    dist = F.sqrt(
        F.aggregate(
            F.zip_with(F.col("emb"), F.col("centroid"), lambda x, c: (x - c) * (x - c)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    scored = emb.crossJoin(F.broadcast(centroid)).select(
        "vec_id",
        "label",
        F.round(
            F.sqrt(F.aggregate(F.col("emb"), F.lit(0.0), lambda a, x: a + x * x)),
            6,
        ).alias("l2_norm"),
        F.round(dist, 6).alias("dist_centroid"),
    )
    # materialize once: the scored frame feeds BOTH the mu/sigma aggregate
    # and the final output — without the checkpoint the full per-row
    # centroid-distance fold scan runs twice
    scored = scored.localCheckpoint()
    stats = scored.agg(
        F.avg("dist_centroid").alias("mu"),
        F.stddev_samp("dist_centroid").alias("sigma"),
    )
    return (
        scored.crossJoin(F.broadcast(stats))
        .withColumn(
            "z",
            F.when(
                F.col("sigma") > 0,
                F.round((F.col("dist_centroid") - F.col("mu")) / F.col("sigma"), 6),
            ).otherwise(F.lit(0.0)),
        )
        .withColumn("is_outlier", F.abs(F.col("z")) > OUTLIER_Z)
        .select("vec_id", "label", "l2_norm", "dist_centroid", "z", "is_outlier")
    )


def embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric per-vector int8 scalar quantization + reconstruction audit.

    The storage lever for a 100 TB embedding store: float32 → int8 is a 4×
    cut (scale factor stored per vector), and the audit proves the recall
    cost is negligible before committing the corpus to it. Entirely
    JVM-side higher-order expressions — quantize, dequantize, and error in
    ONE map-only projection: no shuffle, no UDF, scales linearly with the
    scan. Emits per vector: the scale, the max absolute reconstruction
    error (∞-norm), and the cosine between original and dequantized vector.
    """
    emb = _embeddings_double(spark, sf_dir)
    with_scale = emb.withColumn(
        "scale",
        F.array_max(F.transform("emb", lambda x: F.abs(x))) / F.lit(127.0),
    )
    dq = F.transform(
        "emb", lambda x: F.round(x / F.col("scale")) * F.col("scale")
    )
    out = (
        with_scale.withColumn("dq", dq)
        .withColumn(
            "max_abs_err",
            F.array_max(
                F.zip_with("emb", "dq", lambda a, b: F.abs(a - b))
            ),
        )
        .withColumn("c", F.round(cosine(F.col("emb"), F.col("dq")), 9))
    )
    return out.select(
        "vec_id",
        "label",
        F.round("scale", 9).alias("scale"),
        F.round("max_abs_err", 9).alias("max_abs_err"),
        F.round("c", 6).alias("cos_recon"),
    )


#: Cosine threshold above which two same-cell embeddings are semantic dups.
#: Matches dedup.COSINE_DUP_THRESHOLD's fixture calibration.
SEMANTIC_DUP_THRESHOLD = 0.25

#: Materialized semantic pair sets, keyed by (application, sf_dir) — the
#: hub the components/survivor stage consumes (same contract as
#: dedup._LSH_PAIRS_MEMO).
_SEMANTIC_PAIRS_MEMO: dict[tuple[str, str], DataFrame] = register_memo({})


def dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic dedup (Abbas et al. 2023, arXiv:2303.09540):
    cluster the embedding space with the IVF coarse quantizer, then compare
    cosine similarity ONLY within each cluster — pairs above the threshold
    are semantic duplicates, and the higher vec_id is marked for removal
    (keep-lowest survivor rule, same convention as the text dedup family).

    This is the paper's exact cost shape: k-means turns the O(n²) all-pairs
    comparison into Σ|cell|² — with balanced cells, n²/k — and at 100 TB the
    cell id becomes a partition column so each within-cell self-join is one
    co-partitioned task reading its own partition, never a corpus-wide
    shuffle. The quantizer is the memoized deterministic ALL-INTEGER IVF
    index (`_ivf_centroids`), so cell membership is engine-exact; pair
    scoring is the exact integer micro-cosine (``int_cos_e6``) over the
    same quantized vectors — no float fold anywhere, which is what gives
    this entry a full DuckDB value-hash oracle at any corpus size.
    Pair-truth and coverage invariants are additionally pinned in pytest.

    Output: (cell, id_a, id_b, cos, drop_id) — the pair evidence plus the
    removal decision (keep-lowest survivor rule).
    """
    evict_stale_memos(spark)
    memo_key = (spark.sparkContext.applicationId, sf_dir)
    cached = _SEMANTIC_PAIRS_MEMO.get(memo_key)
    if cached is not None:
        return cached
    _t0_build = time.perf_counter()
    assigned, _ = _ivf_assign(spark, sf_dir)
    # both self-join sides project straight off the materialized index
    # (which already carries the fixed-point ints the pair stage needs)
    idx = assigned.select("cell", "vec_id", "ei")
    a = idx.withColumnsRenamed({"vec_id": "id_a", "ei": "ei_a"})
    b = idx.withColumnsRenamed({"vec_id": "id_b", "ei": "ei_b"})
    pairs = (
        a.join(b, "cell")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cos_e6", int_cos_e6(F.col("ei_a"), F.col("ei_b")))
        .filter(
            F.col("cos_e6") >= int(round(SEMANTIC_DUP_THRESHOLD * 1_000_000))
        )
        .select(
            F.col("cell").cast("long").alias("cell"),
            "id_a",
            "id_b",
            (F.col("cos_e6") / 1_000_000).alias("cos"),
            F.col("id_b").alias("drop_id"),
        )
        .localCheckpoint()
    )
    _SEMANTIC_PAIRS_MEMO[memo_key] = pairs
    log_memo_build("semantic_pairs", time.perf_counter() - _t0_build)
    return pairs


#: Hybrid score mix: score = HYBRID_ALPHA·cosine + (1-HYBRID_ALPHA)·Jaccard.
HYBRID_ALPHA = 0.5


def hybrid_search_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: fused semantic (cosine over embeddings) + lexical
    (distinct-token Jaccard) ranking, top-k per query — what a retrieval
    stack actually serves, where pure vector search misses exact keyword
    matches and pure lexical search misses paraphrases.

    The corpus is the doc↔embedding join (doc_id = vec_id in the fixture —
    at scale this is the embedded-documents table the chunking + embedding
    stages produce). The query side (docs < N_QUERIES, with text AND
    vector) broadcasts; the corpus streams through unshuffled; one ranked
    window takes k. Determinism: cosine rounds to 9 dp before fusing, the
    Jaccard is a ratio of small ints (exact in both engines), ties break
    on doc_id — the same oracle-stable cut as ``ann_cosine_topk``.
    """
    from kafka_exercise_spark.functions.text import tokens

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.array_distinct(tokens(F.col("text"))).alias("tok")
    )
    emb = _embeddings_double(spark, sf_dir)
    corpus = docs.join(emb, docs.doc_id == emb.vec_id).select(
        "doc_id", "tok", "emb"
    )
    q = corpus.filter(F.col("doc_id") < N_QUERIES).select(
        F.col("doc_id").alias("query_id"),
        F.col("tok").alias("q_tok"),
        F.col("emb").alias("q_emb"),
    )
    # both sides are already distinct, so |A∪B| = |A|+|B|-|A∩B| — exact,
    # and skips materializing a concatenated+deduped array per candidate
    # pair inside the op's hot loop. Empty∪empty (two no-token docs) →
    # jac 0.0, not NULL — engines disagree on integer 0/0 otherwise.
    inter = F.size(F.array_intersect(F.col("tok"), F.col("q_tok")))
    union = F.size("tok") + F.size("q_tok") - inter
    scored = (
        corpus.join(F.broadcast(q), F.col("doc_id") != F.col("query_id"))
        .withColumn("cos", F.round(cosine(F.col("emb"), F.col("q_emb")), 9))
        .withColumn(
            "jac", F.when(union > 0, inter / union).otherwise(F.lit(0.0))
        )
        .withColumn(
            "score",
            F.round(
                HYBRID_ALPHA * F.col("cos") + (1.0 - HYBRID_ALPHA) * F.col("jac"),
                9,
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select(
            "query_id",
            F.col("doc_id").alias("hit_id"),
            F.round("score", 6).alias("score"),
            F.round("cos", 6).alias("cos"),
            F.round("jac", 6).alias("jac"),
            F.col("rank").cast("long").alias("rank"),
        )
    )


def sparse_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sparse top-k retrieval over the feature-hashed vectors via an
    inverted-index (posting-list) join — the scalable sparse-search plan:
    candidates meet ONLY on shared non-zero buckets, so cost is
    Σ|posting list|² per bucket, never queries × corpus.

    Ranking is exact with NO rounding anywhere: the dot product is an
    integer sum, and cos² = dot²/(ss_q·ss_c) divides exact-in-double
    integers (all ≤ ~1e8), so both engines compute the identical double
    and the (cos² desc, doc_id) cut is deterministic. The emitted score is
    that exact cos². At 100 TB the corpus side is written
    bucket-partitioned and each query's buckets prune to their posting
    lists — the same layout story as the dense LSH variants.
    """
    from kafka_exercise_spark.operators.textops import embed_feature_hashing

    vecs = embed_feature_hashing(spark, sf_dir)
    q = vecs.filter(F.col("doc_id") < N_QUERIES).select(
        F.col("doc_id").alias("query_id"),
        F.col("bucket"),
        F.col("cnt").alias("q_cnt"),
        F.col("ss").alias("q_ss"),
    )
    dots = (
        vecs.join(F.broadcast(q), "bucket")
        .filter(F.col("doc_id") != F.col("query_id"))
        .groupBy("query_id", "doc_id")
        .agg(
            F.sum(F.col("cnt") * F.col("q_cnt")).alias("dot"),
            F.first("ss").alias("ss"),
            F.first("q_ss").alias("q_ss"),
        )
    )
    cos2 = (F.col("dot") * F.col("dot")) / (F.col("ss") * F.col("q_ss"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos2"), F.asc("doc_id"))
    return (
        dots.withColumn("cos2", cos2)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select(
            "query_id",
            F.col("doc_id").alias("hit_id"),
            F.col("dot").cast("long").alias("dot"),
            "cos2",
            F.col("rank").cast("long").alias("rank"),
        )
    )


# ---- semantic decontamination (eval-set similarity screening) ----

#: Fixture stand-in for the benchmark/eval embedding set (mirrors
#: dedup.BENCHMARK_MAX_DOC_ID) and the flag threshold in micro-cosine.
SEMANTIC_DECONTAM_MAX_EVAL_ID = 50
SEMANTIC_DECONTAM_COS_E6 = 250_000


def decontaminate_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space benchmark decontamination: corpus vectors whose
    cosine against ANY eval-set vector clears the threshold — the
    paraphrase-level complement of n-gram decontamination (an eval answer
    reworded shares no shingles but lands next to the original in
    embedding space).

    Scale shape: the eval suite is small by definition, so its quantized
    vectors BROADCAST and the corpus streams through map-only — one scan,
    no shuffle, no corpus self-join (the same cost envelope as
    ``decontaminate_ngram``). Scoring is the exact integer micro-cosine,
    so the entry carries a full value-hash oracle.
    """
    # per-side squared norms are computed ONCE per row, not re-folded per
    # pair (the pair stage is |corpus|×|eval| — 3 folds → 1 fold there).
    # Values are unchanged: ss = ssc·sse multiplies the same exact
    # integers either way, so the oracle needs no adjustment.
    emb = _embeddings_double(spark, sf_dir).withColumn(
        "ei", quantized_vec(F.col("emb"))
    )
    emb = emb.withColumn("ss", _dot_long(F.col("ei"), F.col("ei")))
    ev = emb.filter(F.col("vec_id") < SEMANTIC_DECONTAM_MAX_EVAL_ID).select(
        F.col("vec_id").alias("eval_id"),
        F.col("ei").alias("ei_e"),
        F.col("ss").alias("ss_e"),
    )
    corpus = emb.filter(F.col("vec_id") >= SEMANTIC_DECONTAM_MAX_EVAL_ID).select(
        "vec_id", "ei", "ss"
    )
    d = _dot_long(F.col("ei"), F.col("ei_e")).cast("double")
    ss = F.col("ss").cast("double") * F.col("ss_e").cast("double")
    cos_e6 = F.when(
        ss > 0, F.round(d / F.sqrt(ss) * 1_000_000).cast("long")
    ).otherwise(F.lit(0).cast("long"))
    return (
        corpus.join(F.broadcast(ev))
        .withColumn("cos_e6", cos_e6)
        .filter(F.col("cos_e6") >= SEMANTIC_DECONTAM_COS_E6)
        .select(
            "vec_id",
            "eval_id",
            (F.col("cos_e6") / 1_000_000).alias("cos"),
        )
    )


# ---- BM25 lexical retrieval over an inverted index ----

BM25_K1 = 1.2
BM25_B = 0.75


def bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-k retrieval — the lexical ranking the hybrid stack's
    Jaccard stands in for, over a real inverted index: postings join on
    shared terms only (cost Σ|posting list|, never queries × corpus).

    Exactness: idf quantizes to integer micro-nats once per TERM (0-dp
    round of identical doubles — the lm_unigram pattern), the
    length-normalized tf part is one fixed sequence of IEEE ops over exact
    integers (tf, dl, avgdl in centi-units), and each term's contribution
    is 0-dp-rounded to an integer BEFORE the per-document sum — so the
    final score is an exact integer sum, engine-independent, and the
    (score desc, doc_id) cut is deterministic. Full value-hash oracle.

    At 100 TB: postings are the shuffled artifact (term-partitioned,
    map-side combined); the query side broadcasts; document length and idf
    join in as broadcast dimensions.
    """
    from kafka_exercise_spark.functions.text import tokens  # noqa: PLC0415

    docs = load_table(spark, sf_dir, "documents")
    exploded = docs.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("t")
    )
    postings = exploded.groupBy("doc_id", "t").agg(F.count("*").alias("tf"))
    # NOTE (r11 probe): deriving dl from postings (Σtf per doc — one
    # fewer corpus tokenize) was tried and measured SLOWER on the bench
    # (1.3 s → 2.0 s warm): the two independent aggregations over the
    # exploded stream run as concurrent map stages today, while chaining
    # dl behind postings serializes the stage graph. Kept as-is; at
    # true scale the single-scan form wins on bytes and a real cluster
    # would revisit (guide §1.1 first-principles vs empirical).
    dl = exploded.groupBy("doc_id").agg(F.count("*").alias("dl"))
    stats = dl.agg(
        F.count("*").alias("n_docs"),
        F.expr("(sum(dl) * 100) div count(*)").alias("avgdl_c100"),
    )
    dfc = postings.groupBy("t").agg(F.count("*").alias("df"))
    idf = dfc.crossJoin(F.broadcast(stats)).select(
        "t",
        "avgdl_c100",
        F.round(
            F.log(
                1.0
                + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
            )
            * 1_000_000
        )
        .cast("long")
        .alias("idf_micro"),
    )
    q_terms = postings.filter(F.col("doc_id") < N_QUERIES).select(
        F.col("doc_id").alias("query_id"), "t"
    )
    # mirror this op sequence EXACTLY in the oracle — each IEEE op on
    # identical inputs is correctly rounded, so the 0-dp round matches
    contrib = (
        F.round(
            (F.col("tf") * 2.2)
            / (
                F.col("tf")
                + 1.2
                * (0.25 + 0.75 * (F.col("dl") * 100.0 / F.col("avgdl_c100")))
            )
            * F.col("idf_micro")
        )
        .cast("long")
        .alias("contrib_micro")
    )
    # ONLY the query-term list is hint-broadcast (bounded by the query
    # workload). dl (per-document lengths) and idf (the term dictionary)
    # both grow with the corpus — plain joins so AQE broadcasts them at
    # fixture scale but degrades to shuffled joins at 100 TB instead of
    # OOMing an executor.
    scored = (
        postings.join(F.broadcast(q_terms), "t")
        .filter(F.col("doc_id") != F.col("query_id"))
        .join(dl, "doc_id")
        .join(idf, "t")
        .select("query_id", "doc_id", contrib)
        .groupBy("query_id", "doc_id")
        .agg(F.sum("contrib_micro").cast("long").alias("score_micro"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score_micro"), F.asc("doc_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select(
            "query_id",
            F.col("doc_id").alias("hit_id"),
            "score_micro",
            F.col("rank").cast("long").alias("rank"),
        )
    )


# ---- product quantization (the 100 TB embedding-storage codec) ----

PQ_M = 4  # subspaces
PQ_SUBDIM = EMBED_DIM // PQ_M
PQ_K = 16  # centroids per sub-quantizer (4-bit codes)
PQ_ITERS = 3
#: (applicationId, sf_dir) → [m][k][dim] codebooks (memo key contract).
_PQ_CODEBOOKS: dict[tuple[str, str], list[list[list[int]]]] = register_memo({})
#: Materialized PQ code tables per (application, sf_dir) — the index-side
#: payload IVF-PQ search scans (same memo contract as the cell frames).
_PQ_CODES_MEMO: dict[tuple[str, str], DataFrame] = register_memo({})


def _pq_codebooks(emb: DataFrame) -> list[list[list[int]]]:
    """Per-subspace integer sub-quantizers: ONE deterministic hash-sample
    collect (the IVF pattern, 'pq:' salt), then an all-integer Lloyd fit
    per 16-dim slice — exact arithmetic end-to-end, so the DuckDB oracle
    replays all four fits bit-for-bit."""
    import hashlib

    import numpy as np

    n = emb.count()
    buckets = max(1, n // IVF_TRAIN_MAX)
    sample = emb.select(
        "vec_id", quantized_vec(F.col("emb")).alias("ei")
    ).filter(
        F.pmod(
            md5_hash64(F.concat(F.lit("pq:"), F.col("vec_id"))), F.lit(buckets)
        )
        == 0
    ).collect()

    def h(vid: int) -> int:
        return int(hashlib.md5(f"pq-init:{vid}".encode()).hexdigest()[:15], 16)

    sample.sort(key=lambda r: (h(r.vec_id), r.vec_id))
    x = np.array([r.ei for r in sample], dtype=np.int64)
    return [
        _integer_lloyd(
            x[:, m * PQ_SUBDIM : (m + 1) * PQ_SUBDIM].copy(), PQ_K, PQ_ITERS
        )
        for m in range(PQ_M)
    ]


def pq_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization encoding + reconstruction audit — how a 100 TB
    embedding store actually keeps its vectors searchable: each vector
    compresses to PQ_M 4-bit codes (64 float32 dims → 2 bytes, a 128×
    cut), and the emitted exact reconstruction error is the evidence the
    codec's recall cost is acceptable before committing the corpus to it.

    Entirely map-only once the codebooks are literals: per subspace, an
    exact integer distance fold against PQ_K centroids, argmin with
    lowest-code tie-break, plus the chosen cell's distance — one scan, no
    shuffle, no UDF. All arithmetic is exact integers (the codebooks come
    from the all-integer Lloyd fit), so codes AND errors carry a full
    value-hash oracle.
    """
    evict_stale_memos(spark)
    emb = _embeddings_double(spark, sf_dir)
    bkey = (spark.sparkContext.applicationId, sf_dir)
    books = _PQ_CODEBOOKS.get(bkey)
    if books is None:
        books = _PQ_CODEBOOKS[bkey] = timed_build(
            "pq_codebooks", lambda: _pq_codebooks(emb)
        )
    out = emb.withColumn("ei", quantized_vec(F.col("emb")))
    code_cols = []
    err_total = F.lit(0).cast("long")

    def dists_for(book_lit: F.Column, sl: F.Column) -> F.Column:
        # unary lambda on purpose — a second parameter would bind to the
        # array index (the _with_hashed_shingles pitfall)
        return F.transform(
            book_lit,
            lambda c: F.aggregate(
                F.zip_with(sl, c, lambda a, b: (a - b) * (a - b)),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ),
        )

    for m, book in enumerate(books):
        book_lit = F.lit([[int(v) for v in c] for c in book]).cast(
            "array<array<bigint>>"
        )
        sl = F.slice(F.col("ei"), m * PQ_SUBDIM + 1, PQ_SUBDIM)
        dists = dists_for(book_lit, sl)
        # projection barrier per subspace: evaluate the 16-cell fold once
        out = out.withColumn(f"d{m}", dists)
        code_cols.append(
            (
                F.array_position(F.col(f"d{m}"), F.array_min(f"d{m}")) - 1
            ).cast("long").alias(f"code{m}")
        )
        err_total = err_total + F.array_min(f"d{m}")
    return out.select(
        "vec_id",
        "label",
        *code_cols,
        err_total.cast("long").alias("err_q"),
    )


def ivf_cells_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF index-quality audit: per-cell population and corpus share — the
    balance check run after every (re)build, because one overfull cell
    quietly turns "probe 4/16 cells" into "scan half the corpus". All
    exact integers (counts + ppm shares), one aggregate over the
    materialized index.
    """
    assigned, _ = _ivf_assign(spark, sf_dir)
    total = assigned.count()  # index row count — metadata-cheap
    return (
        assigned.groupBy(F.col("cell").cast("long").alias("cell"))
        .agg(
            F.count("*").alias("n_vectors"),
            F.min("vec_id").alias("min_vec_id"),
            F.max("vec_id").alias("max_vec_id"),
        )
        .withColumn(
            # integer `div` ≡ the oracle's `//` at any magnitude (the
            # oracle ALREADY uses // here — a float floor would desync
            # past 2^53 index rows)
            "share_ppm", F.expr(f"(n_vectors * 1000000) div {total}")
        )
    )


def ann_ivf_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ ANN — the production-scale composition (the FAISS IVFPQ
    shape): the IVF coarse quantizer prunes the corpus to the query's
    N_PROBE cells, and ranking inside them uses ASYMMETRIC DISTANCE
    COMPUTATION over the PQ codes — per query, a 4×16 table of exact
    integer distances from the query's sub-slices to every sub-centroid;
    each candidate's distance is then 4 table lookups + 3 adds, NEVER a
    64-dim fold. This is how a 100 TB store answers ANN without touching
    raw vectors: the scan reads (cell, code0..3) — 2 bytes of payload per
    vector — and the float corpus stays cold.

    Exactness: both quantizers are the all-integer fits, the ADC tables
    are exact integer d², and the ADC sum is 4 small ints — so scores and
    the (adc asc, vec_id) cut are engine-exact; full value-hash oracle.
    The per-query tables ride in the broadcast q_cells frame (driver-built
    over the bounded demo query set, like ``ann_ivf_topk``'s probe list).
    """
    assigned, centers = _ivf_assign(spark, sf_dir)
    bkey = (spark.sparkContext.applicationId, sf_dir)
    books = _PQ_CODEBOOKS.get(bkey)
    if books is None:
        books = _PQ_CODEBOOKS[bkey] = timed_build(
            "pq_codebooks",
            lambda: _pq_codebooks(_embeddings_double(spark, sf_dir)),
        )
    # the code table is part of the served index — encoded once per
    # (session, corpus) and pinned, like the cell assignment (at 100 TB
    # it IS the 2-byte-per-vector payload the probe scan reads)
    memo_key = (spark.sparkContext.applicationId, sf_dir)
    codes = _PQ_CODES_MEMO.get(memo_key)
    if codes is None:
        codes = timed_build(
            "pq_codes",
            lambda: pq_encode(spark, sf_dir)
            .select("vec_id", "code0", "code1", "code2", "code3")
            .localCheckpoint(),
        )
        _PQ_CODES_MEMO[memo_key] = codes
    q_rows = (
        assigned.filter(F.col("vec_id") < N_QUERIES)
        .select("vec_id", "ei")
        .collect()
    )
    probes = []
    for r in q_rows:
        ranked_cells = _ranked_cells(r.ei, centers)
        tables = [
            [
                sum(
                    (a - b) * (a - b)
                    for a, b in zip(
                        r.ei[m * PQ_SUBDIM : (m + 1) * PQ_SUBDIM], c
                    )
                )
                for c in book
            ]
            for m, book in enumerate(books)
        ]
        probes.extend(
            (r.vec_id, cell, *tables) for cell in ranked_cells[:N_PROBE]
        )
    q_cells = spark.createDataFrame(
        probes,
        "query_id long, probe_cell int, t0 array<long>, t1 array<long>, "
        "t2 array<long>, t3 array<long>",
    )
    adc = (
        F.element_at("t0", F.col("code0").cast("int") + 1)
        + F.element_at("t1", F.col("code1").cast("int") + 1)
        + F.element_at("t2", F.col("code2").cast("int") + 1)
        + F.element_at("t3", F.col("code3").cast("int") + 1)
    )
    scored = (
        assigned.select("vec_id", "cell")
        .join(codes, "vec_id")
        .join(
            F.broadcast(q_cells),
            (F.col("cell") == F.col("probe_cell"))
            & (F.col("vec_id") != F.col("query_id")),
        )
        .withColumn("adc", adc.cast("long"))
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("adc"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            "adc",
            F.col("rank").cast("long").alias("rank"),
        )
    )


#: Power-iteration fixed point: eigenvector components renormalized to
#: max-abs = this scale each iteration. 2²⁰ keeps ~18 significant bits
#: through the down-shifts (2¹⁰ left only ~5 bits after cancellation in
#: A·v and stalled convergence — pinned by the numpy-alignment test).
PI_V_SCALE = 1 << 20

#: Power iterations (fixed, not convergence-tested — pure function of the
#: input, so the DuckDB oracle replays it as an unrolled CTE chain). The
#: fixture's spectrum is nearly flat (λ₂/λ₁ ≈ 0.93), so no small fixed
#: count fully converges; 12 rounds reach >92% of λ₁ in Rayleigh
#: quotient while keeping the plan and the unrolled oracle tractable.
PI_ITERS = 12


def embedding_top_component(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dominant principal direction of the embedding cloud via power
    iteration — matrix-free PCA, the first step of embedding whitening /
    anisotropy diagnosis (a strongly dominant direction is the classic
    "rogue dimension" failure of embedding spaces).

    v ← normalize(Aᵀ(A·v)), ``PI_ITERS`` rounds, ENTIRELY in exact 64-bit
    integers: vectors are fixed-point quantized (``quantized_vec``), the
    per-row projection s = A_i·v and the accumulation w = Σ s·A_i are
    exact integer sums, s is down-shifted by the quantization scale, and
    renormalization is ``(|w|·scale) div max|w|`` with an explicit sign
    split: all divisions run on absolutes, which makes the semantics
    identical regardless of either engine's negative-operand convention
    (both Spark ``div`` and DuckDB ``//`` truncate — empirically pinned;
    the split also keeps the recurrence readable as round-toward-zero
    in one place). The
    whole fit is therefore engine-exact and the oracle replays it
    bit-for-bit — the k-means/PageRank trick applied to linear algebra.

    Scale shape: the exploded (vec_id, j, a) frame is materialized once;
    each iteration is one broadcast-join + groupBy(vec_id) (the row
    projection) and one groupBy(j) into EMBED_DIM cells (the transpose
    accumulation) — map-side partial sums carry the weight, the second
    exchange is EMBED_DIM rows. Overflow bound: the widest intermediates
    (Σ a·s before its down-shift, |w|·PI_V_SCALE in the renorm) stay
    under 2⁶³ for n up to ~10⁸ rows; beyond that, drop PI_V_SCALE a
    decade per decade of n (same note as graph.RANK_SCALE).
    """
    _, v = _power_fit(spark, sf_dir)
    return v.select(
        "j",
        F.col("v").alias("v_q"),
        (F.col("v") / float(PI_V_SCALE)).alias("loading"),
    )


#: Memoized (exploded-quantized frame, fitted component) per
#: (application, sf_dir) — the served decomposition both the component
#: entry and the anisotropy report read (same contract as the IVF/LSH
#: index memos).
_PI_FIT_MEMO: dict[tuple[str, str], tuple[DataFrame, DataFrame]] = register_memo({})


def _power_fit(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    """Run the integer power iteration once per (app, sf_dir); return the
    persisted exploded frame q = (vec_id, j, a) and the fitted 64-row
    component v = (j, v). See embedding_top_component for the algorithm
    and exactness argument."""
    evict_stale_memos(spark)
    key = (spark.sparkContext.applicationId, sf_dir)
    memo = _PI_FIT_MEMO.get(key)
    if memo is not None:
        return memo
    _t0_build = time.perf_counter()
    emb = _embeddings_double(spark, sf_dir)
    q = (
        emb.select(
            "vec_id", F.posexplode(quantized_vec(F.col("emb"))).alias("j", "a")
        )
        .select("vec_id", (F.col("j") + 1).alias("j"), "a")
        .persist()
    )
    q.count()
    v = spark.range(1, EMBED_DIM + 1).select(
        F.col("id").alias("j"), F.lit(PI_V_SCALE).cast("long").alias("v")
    )
    sgn = "CASE WHEN {x} < 0 THEN -1 ELSE 1 END"
    for _ in range(PI_ITERS):
        s = (
            q.join(F.broadcast(v), "j")
            .groupBy("vec_id")
            .agg(F.sum(F.col("a") * F.col("v")).alias("s_raw"))
            .select(
                "vec_id",
                F.expr(
                    f"({sgn.format(x='s_raw')}) * (abs(s_raw) div {PROJ_SCALE})"
                ).alias("s"),
            )
        )
        w = (
            q.join(s, "vec_id")
            .groupBy("j")
            .agg(F.sum(F.col("a") * F.col("s")).alias("w_raw"))
            # down-shift before renorm so |w|·PI_V_SCALE stays < 2⁶³
            .select(
                "j",
                F.expr(
                    f"({sgn.format(x='w_raw')}) * (abs(w_raw) div {PROJ_SCALE})"
                ).alias("w"),
            )
        )
        m = w.agg(
            F.greatest(F.max(F.abs(F.col("w"))), F.lit(1)).alias("m")
        )
        # cut lineage every round: v references q at TWO levels (via s and
        # w), so the uncut logical plan doubles per iteration — 2^iters
        # scan references kills the optimizer long before execution. The
        # checkpoint is 64 rows; values are unchanged (exact integers).
        v = (
            w.crossJoin(F.broadcast(m))
            .select(
                "j",
                F.expr(
                    f"({sgn.format(x='w')}) * ((abs(w) * {PI_V_SCALE}) div m)"
                ).alias("v"),
            )
            .localCheckpoint()
        )
    _PI_FIT_MEMO[key] = (q, v)
    log_memo_build("power_fit", time.perf_counter() - _t0_build)
    return q, v


def embedding_anisotropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label anisotropy report: how much of each label cluster's
    energy lies along the corpus' dominant direction — the actionable
    number the power-iteration fit exists for. A label whose
    ``avg_cos2_ppm`` is far above the isotropic baseline (1/64 ≈
    15 625 ppm) is collapsing onto the rogue direction; the usual
    remedies are whitening or dropping the component before similarity
    search (Mu & Viswanath 2018's "all-but-the-top").

    Per row: cos²(A_i, v) = (A_i·v)² / (|A_i|²·|v|²), computed the
    ``int_cos_e6`` way — the dot and both squared norms are EXACT
    integers (so bit-identical in any engine), and the only float ops
    are same-formula folds of those identical integers, rounded ONCE at
    ppm resolution. Aggregates are then exact integer sums.

    Scale shape: two groupBy(vec_id) passes over the memoized exploded
    frame (projection and row norms) + one broadcast of the 64-row
    component and its 1-row norm; the label rollup is bounded by the
    label domain.
    """
    q, v = _power_fit(spark, sf_dir)
    p = q.join(F.broadcast(v), "j").groupBy("vec_id").agg(
        F.sum(F.col("a") * F.col("v")).alias("p_raw")
    )
    norms = q.groupBy("vec_id").agg(F.sum(F.col("a") * F.col("a")).alias("ss"))
    vv = v.agg(F.sum(F.col("v") * F.col("v")).alias("vv"))
    labels = _embeddings_double(spark, sf_dir).select("vec_id", "label")
    cos2 = (
        p.join(norms, "vec_id")
        .crossJoin(F.broadcast(vv))
        .select(
            "vec_id",
            F.when(
                (F.col("ss") > 0) & (F.col("vv") > 0),
                F.round(
                    (F.col("p_raw").cast("double") * F.col("p_raw").cast("double"))
                    / (F.col("ss").cast("double") * F.col("vv").cast("double"))
                    * 1_000_000
                ).cast("long"),
            )
            .otherwise(F.lit(0).cast("long"))
            .alias("cos2_ppm"),
        )
    )
    return (
        cos2.join(labels, "vec_id")
        .groupBy("label")
        .agg(
            F.count("*").alias("n_vecs"),
            F.expr("sum(cos2_ppm) div count(*)").cast("long").alias(
                "avg_cos2_ppm"
            ),
            F.max("cos2_ppm").alias("max_cos2_ppm"),
        )
    )


def ann_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval-quality harness: recall@``TOP_K`` of every approximate
    ANN variant against the exact ``ann_cosine_topk`` baseline, per
    query — the acceptance gate an index owner runs before switching the
    corpus from brute-force to a bucketed/compressed index. (Driver-
    recorded twin of the multiprobe>single-probe dominance pytest.)

    recall_ppm = |approx top-k ∩ exact top-k| · 10⁶ div k, exact
    integers (the repo's ppm rule). Every input is a served, memoized
    index result over the bounded ``N_QUERIES`` demo query set, so the
    report costs four bounded joins over ≤ N_QUERIES·TOP_K-row frames —
    at 100 TB the harness shape is unchanged: the exact baseline is
    computed ONCE for a fixed query panel and every candidate index is
    scored against it.
    """
    exact = ann_cosine_topk(spark, sf_dir).select("query_id", "neighbor_id")
    methods = [
        ("ivf", ann_ivf_topk),
        ("ivf_pq", ann_ivf_pq_topk),
        ("lsh_bucketed", ann_lsh_bucketed),
        ("lsh_multiprobe", ann_lsh_multiprobe),
    ]
    appr = None
    for name, fn in methods:
        v = fn(spark, sf_dir).select(
            F.lit(name).alias("method"), "query_id", "neighbor_id"
        )
        appr = v if appr is None else appr.unionByName(v)
    matched = (
        exact.join(appr, ["query_id", "neighbor_id"])
        .groupBy("method", "query_id")
        .agg(F.count("*").alias("n_matched"))
    )
    # (method × query) grid so a variant that misses a query entirely
    # reports recall 0 instead of silently dropping the row. The query
    # domain is derived from the embeddings scan directly (vec_id <
    # N_QUERIES, a pushed-down point filter) rather than from
    # ``exact.select("query_id").distinct()``: the two are identical —
    # every demo query has exactly TOP_K exact neighbors whenever the
    # corpus holds more than TOP_K+1 vectors, which every fixture does —
    # but the old form made ``exact`` feed two consumers, and Spark does
    # not share common subtrees, so the brute-force |corpus|×|queries|
    # cosine scan executed TWICE per report (r12, guide §2.4: remove
    # work; an in-invocation localCheckpoint was tried first and
    # measured slower — the persist/copy cost outweighed the shared
    # read on this sub-second frame).
    grid = (
        _embeddings_double(spark, sf_dir)
        .filter(F.col("vec_id") < N_QUERIES)
        .select(
            F.col("vec_id").alias("query_id"),
            F.explode(
                F.array(*[F.lit(n) for n, _ in methods])
            ).alias("method"),
        )
    )
    return grid.join(matched, ["method", "query_id"], "left").select(
        "method",
        "query_id",
        F.coalesce("n_matched", F.lit(0)).cast("long").alias("n_matched"),
        F.expr(f"(coalesce(n_matched, 0) * 1000000) div {TOP_K}")
        .cast("long")
        .alias("recall_ppm"),
    )


#: Hash-bucket modulus carving the "incoming batch" for the index-refresh
#: audit (~1/8 of the corpus plays the newly-arrived embeddings).
REFRESH_BUCKETS = 8


def ann_index_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental index maintenance audit — the ANN twin of
    ``dedup_incremental``: when a batch of new embeddings arrives, a
    100 TB deployment does NOT refit the coarse quantizer; it assigns
    the batch to the SERVED centroids and watches the cell balance. This
    entry replays exactly that: a deterministic hash slice of the corpus
    plays the incoming batch, every vector's cell comes from the one
    memoized assignment pass (the served index — assignment math is
    identical whether a vector was in the fit sample or not), and the
    report shows per-cell before/after counts and the share drift that
    tells the owner when a refit is due.

    All exact integers: counts are counts, shares are ppm by integer
    ``div`` (≡ the oracle's ``//``), drift is the difference of the two
    rounded shares — bit-identical in any engine. Scale shape: one
    groupBy(cell) over the served assignment (N_IVF_CELLS rows out), a
    1-row total broadcast back; the corpus is never rescanned.
    """
    assigned, _ = _ivf_assign(spark, sf_dir)
    incoming = (
        F.pmod(
            md5_hash64(F.concat(F.lit("refresh:"), F.col("vec_id"))),
            F.lit(REFRESH_BUCKETS),
        )
        == 0
    ).cast("int")
    per_cell = (
        assigned.select(F.col("cell"), incoming.alias("incoming"))
        .groupBy("cell")
        .agg(
            F.sum(F.lit(1) - F.col("incoming")).cast("long").alias("n_before"),
            F.sum("incoming").cast("long").alias("n_added"),
        )
    )
    totals = per_cell.agg(
        F.sum("n_before").cast("long").alias("tb"),
        F.sum(F.col("n_before") + F.col("n_added")).cast("long").alias("ta"),
    )
    share_before = (
        F.when(F.col("tb") > 0, F.expr("(n_before * 1000000) div tb"))
        .otherwise(F.lit(0))
        .cast("long")
    )
    share_after = (
        F.when(
            F.col("ta") > 0,
            F.expr("((n_before + n_added) * 1000000) div ta"),
        )
        .otherwise(F.lit(0))
        .cast("long")
    )
    return per_cell.crossJoin(F.broadcast(totals)).select(
        F.col("cell").cast("long").alias("cell"),
        "n_before",
        "n_added",
        (F.col("n_before") + F.col("n_added")).cast("long").alias("n_after"),
        share_before.alias("share_before_ppm"),
        share_after.alias("share_after_ppm"),
        (share_after - share_before).cast("long").alias("drift_ppm"),
    )


#: kNN label-vote parameters: neighbors consulted per query and the
#: labeled-pool convention (every vec_id >= N_QUERIES is pool; the demo
#: query rows are held out entirely so no query votes for another).
KNN_K = 10


def _vote_tail(nbr_labeled: DataFrame, q_labels: DataFrame) -> DataFrame:
    """THE majority-vote tail shared by both kNN vote entries: count
    votes per (query, label), pick the (n_votes desc, label asc) winner,
    join the query's true label, emit the family's fixed schema — one
    definition so the exact and IVF variants can never drift on the tie
    rule or casts. Inputs: (query_id, label) neighbor rows; (query_id,
    true_label) per query."""
    votes = nbr_labeled.groupBy("query_id", "label").agg(
        F.count("*").alias("n_votes")
    )
    vw = Window.partitionBy("query_id").orderBy(
        F.desc("n_votes"), F.asc("label")
    )
    return (
        votes.withColumn("vr", F.row_number().over(vw))
        .filter(F.col("vr") == 1)
        .join(F.broadcast(q_labels), "query_id")
        .select(
            "query_id",
            F.col("label").cast("long").alias("predicted_label"),
            F.col("n_votes").cast("long").alias("n_votes"),
            F.col("true_label").cast("long").alias("true_label"),
            (F.col("label") == F.col("true_label")).alias("correct"),
        )
    )


def knn_label_vote(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-nearest-neighbor label vote over the embedding corpus — the
    label-propagation primitive of a training-data pipeline (weak
    supervision: tag unlabeled documents with the majority label of their
    nearest labeled neighbors; also the standard probe for embedding
    quality, cf. the linear/knn probes run on every new encoder).

    Shape is the brute-force ANN baseline (``ann_cosine_topk``): the
    bounded query set broadcasts, the corpus streams through unshuffled,
    one ranked window cuts top-``KNN_K`` per query. The vote itself is a
    tiny groupBy over |queries|·k rows. At 100 TB the corpus side is the
    scan; swapping the scorer to the IVF/PQ probe turns this into the
    approximate variant with the same vote tail.

    Exactness: distances are integer squared L2 over ``quantized_vec``
    fixed-point vectors (diffs ≤ 2^21, squares ≤ 2^42, 64-dim sums
    ≤ 2^48 — exact in long, any fold order), so the (d2 asc, vec_id)
    neighbor cut, the vote counts, and the (votes desc, label asc)
    winner are all engine-independent. Full value-hash oracle.
    """
    emb = _embeddings_double(spark, sf_dir).withColumn(
        "qv", quantized_vec(F.col("emb"))
    )
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("true_label"),
        F.col("qv").alias("qqv"),
    )
    pool = emb.filter(F.col("vec_id") >= N_QUERIES).select(
        "vec_id", "label", "qv"
    )
    d2 = F.aggregate(
        F.zip_with(F.col("qv"), F.col("qqv"), lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    scored = pool.join(F.broadcast(q.drop("true_label"))).withColumn("d2", d2)
    w = Window.partitionBy("query_id").orderBy(F.asc("d2"), F.asc("vec_id"))
    top = scored.withColumn("rk", F.row_number().over(w)).filter(
        F.col("rk") <= KNN_K
    )
    return _vote_tail(
        top.select("query_id", "label"),
        q.select("query_id", "true_label"),
    )


def knn_label_vote_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SCALE-PATH twin of ``knn_label_vote``: the same majority-vote
    tail over the SERVED IVF index's top-k (``ann_ivf_topk`` — 4/16
    cells probed, ~25% of the corpus scanned) instead of the brute-force
    scan. This is exactly how label propagation runs at 100 TB: the
    expensive part is the ANN probe against the partition-pruned cell
    files; the vote itself never changes shape (|queries|·k rows).

    Output schema matches the exact variant, and the vote/tie-break tail
    is the SHARED ``_vote_tail`` (drift-proof by construction). Held-out
    convention also shared: other query vectors are excluded from the
    probe list before voting. NB the two entries are not a pure recall
    comparison — the IVF probe ranks by 9-dp cosine while the exact
    variant ranks by integer squared L2, so on unnormalized embeddings
    they can legitimately pick different neighbors even at recall 1.0;
    recall itself is measured like-for-like in ``ann_recall_report``.
    """
    nbrs = ann_ivf_topk(spark, sf_dir).select("query_id", "neighbor_id")
    emb = load_table(spark, sf_dir, "embeddings")
    labels = emb.select("vec_id", F.col("label"))
    q_labels = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("true_label"),
    )
    nbr_labeled = (
        nbrs.filter(F.col("neighbor_id") >= N_QUERIES)
        .join(labels, nbrs.neighbor_id == labels.vec_id)
        .select("query_id", "label")
    )
    return _vote_tail(nbr_labeled, q_labels)


def ann_filtered_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FILTERED vector search — top-k under a metadata predicate (here:
    candidates sharing the query's label), the operation every vector
    store struggles with at scale. Emits, per surviving neighbor, BOTH
    its filtered rank and its rank in the UNFILTERED ordering
    (``global_rank``): the k-th filtered neighbor's global rank IS the
    over-fetch factor a post-filter strategy must use, so this one frame
    quantifies pre-filter vs post-filter for the corpus — the sizing
    number a filtered-ANN deployment needs before choosing a strategy.

    One scored pass (query side broadcast, corpus unshuffled), then two
    ranked windows over the SAME query_id partitioning — one exchange
    total. Ranking rounds to 9 dp with vec_id tie-break (the family's
    determinism rule); a full value-hash oracle replays it.
    """
    emb = _embeddings_double(spark, sf_dir)
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("q_label"),
        F.col("emb").alias("q_emb"),
    )
    scored = (
        emb.join(F.broadcast(q), F.col("vec_id") >= N_QUERIES)
        .withColumn("c", F.round(cosine(F.col("emb"), F.col("q_emb")), 9))
    )
    wg = Window.partitionBy("query_id").orderBy(F.desc("c"), F.asc("vec_id"))
    wf = Window.partitionBy("query_id", "match").orderBy(
        F.desc("c"), F.asc("vec_id")
    )
    ranked = (
        scored.withColumn("match", (F.col("label") == F.col("q_label")))
        .withColumn("global_rank", F.row_number().over(wg))
        .withColumn("rk", F.row_number().over(wf))
    )
    return (
        ranked.filter(F.col("match") & (F.col("rk") <= TOP_K))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(F.col("c"), 6).alias("cos"),
            F.col("rk").cast("long").alias("rank"),
            F.col("global_rank").cast("long").alias("global_rank"),
        )
    )


def ann_pareto_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cost-vs-recall Pareto sheet for the ANN family — the page an index
    owner actually reads when choosing a variant: per (method, query),
    HOW MANY candidates the method scores (its scan cost) against its
    recall@``TOP_K`` vs the exact baseline. Complements
    ``ann_recall_report`` (quality only) with the cost axis; the exact
    baseline appears as its own row (recall 10⁶ ppm, cost = the whole
    pool) so every trade-off is on one sheet. IVF and IVF-PQ probe the
    SAME cells — identical candidate counts by construction — which is
    the point: IVF-PQ buys its speed per candidate (2-byte ADC codes vs
    a 64-dim float fold), not by pruning harder.

    Candidate counts come from the SERVED index structures alone (bucket
    sizes from the memoized LSH frame, cell sizes from the memoized IVF
    assignment, probe lists from the shared ``_ranked_cells`` ranking) —
    nothing is re-scored, so the report costs two small groupBys plus
    bounded joins over the ``N_QUERIES`` panel. All integers; shares in
    ppm via integer ``div``.
    """
    lsh = _lsh_indexed(spark, sf_dir)
    n_corpus = lsh.agg(F.count("*").cast("long").alias("n_corpus"))
    qb = lsh.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("bucket").alias("q_bucket")
    )
    bsz = lsh.groupBy("bucket").agg(F.count("*").alias("n"))
    single = qb.join(bsz, F.col("q_bucket") == F.col("bucket")).select(
        F.lit("lsh_bucketed").alias("method"),
        "query_id",
        (F.col("n") - 1).cast("long").alias("n_candidates"),
    )
    masks = F.array(
        *[F.lit(m) for m in [0] + [1 << h for h in range(N_HYPERPLANES)]]
    )
    probes = qb.select(
        "query_id",
        F.explode(
            F.transform(masks, lambda m: F.col("q_bucket").bitwiseXOR(m))
        ).alias("pb"),
    )
    multi = (
        probes.join(bsz, F.col("pb") == F.col("bucket"), "left")
        .groupBy("query_id")
        .agg(
            (F.sum(F.coalesce(F.col("n"), F.lit(0))) - 1)
            .cast("long")
            .alias("n_candidates")
        )
        .select(F.lit("lsh_multiprobe").alias("method"), "query_id", "n_candidates")
    )
    assigned, centers = _ivf_assign(spark, sf_dir)
    q_rows = (
        assigned.filter(F.col("vec_id") < N_QUERIES)
        .select("vec_id", "ei")
        .collect()
    )
    probe_rows = [
        (r.vec_id, cell)
        for r in q_rows
        for cell in _ranked_cells(r.ei, centers)[:N_PROBE]
    ]
    pdf = spark.createDataFrame(probe_rows, "query_id long, cell int")
    csz = assigned.groupBy("cell").agg(F.count("*").alias("n"))
    # left join: a probed-but-empty cell contributes 0 candidates; the
    # query's own cell is always probed (nearest centroid = assignment),
    # so −1 removes exactly the self row, mirroring the scorers' filter
    ivf_counts = (
        pdf.join(csz, "cell", "left")
        .groupBy("query_id")
        .agg(
            (F.sum(F.coalesce(F.col("n"), F.lit(0))) - 1)
            .cast("long")
            .alias("n_candidates")
        )
    )
    ivf = ivf_counts.select(
        F.lit("ivf").alias("method"), "query_id", "n_candidates"
    )
    ivf_pq = ivf_counts.select(
        F.lit("ivf_pq").alias("method"), "query_id", "n_candidates"
    )
    exact_cand = qb.crossJoin(F.broadcast(n_corpus)).select(
        F.lit("exact").alias("method"),
        "query_id",
        (F.col("n_corpus") - 1).cast("long").alias("n_candidates"),
    )
    cand = single.unionByName(multi).unionByName(ivf).unionByName(ivf_pq).unionByName(exact_cand)
    exact_rec = qb.select(
        F.lit("exact").alias("method"),
        "query_id",
        F.lit(TOP_K).cast("long").alias("n_matched"),
        F.lit(1_000_000).cast("long").alias("recall_ppm"),
    )
    recall_all = ann_recall_report(spark, sf_dir).unionByName(exact_rec)
    return (
        cand.join(recall_all, ["method", "query_id"])
        .crossJoin(F.broadcast(n_corpus))
        .select(
            "method",
            "query_id",
            "n_candidates",
            F.expr("(n_candidates * 1000000) div (n_corpus - 1)")
            .cast("long")
            .alias("cand_ppm"),
            "n_matched",
            "recall_ppm",
        )
    )


def lsh_buckets_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH index-quality audit — the hyperplane-bucket twin of
    ``ivf_cells_report``: per-bucket population and corpus share, plus
    each bucket's share of the MULTIPROBE workload (every bucket is
    probed by queries whose bucket lies within Hamming distance 1, so a
    fat bucket taxes H+1 probe sets, not just its own). The balance
    sheet an owner reads before trusting "probe 7/64 buckets ≈ 11% of
    the corpus" — one skewed bucket quietly re-inflates that fraction.

    All exact integers (counts + integer-``div`` ppm shares); one
    aggregate over the served LSH frame (the memoized index — the corpus
    is not rescanned) plus a bounded |buckets|×(H+1) neighbor fan-out
    for the probe-load column.
    """
    lsh = _lsh_indexed(spark, sf_dir)
    # total as an IN-PLAN 1-row aggregate (broadcast cross join below,
    # the ann_pareto_report n_corpus pattern) — an eager .count() here
    # would run a Spark job as a side effect of merely BUILDING the
    # DataFrame, which plan-introspection tooling would silently execute
    # (r7 ADVICE; every other report is construction-pure).
    total = lsh.agg(F.count("*").cast("long").alias("total_n"))
    per_bucket = lsh.groupBy(
        F.col("bucket").cast("long").alias("bucket")
    ).agg(
        F.count("*").alias("n_vectors"),
        F.min("vec_id").alias("min_vec_id"),
        F.max("vec_id").alias("max_vec_id"),
    )
    # probe-load: bucket b is scanned by any query hashed to b or to a
    # Hamming-1 neighbor of b — sum the neighbor buckets' populations
    # over the explicit XOR-mask fan-out (|buckets|·(H+1) rows, bounded
    # by the hyperplane count, never corpus-sized)
    masks = F.array(
        *[F.lit(m) for m in [0] + [1 << h for h in range(N_HYPERPLANES)]]
    )
    nbr = per_bucket.select(
        "bucket",
        F.explode(
            F.transform(masks, lambda m: F.col("bucket").bitwiseXOR(m))
        ).alias("probe_src"),
    )
    src_sz = per_bucket.select(
        F.col("bucket").alias("probe_src"), F.col("n_vectors").alias("src_n")
    )
    load = (
        nbr.join(src_sz, "probe_src")
        .groupBy("bucket")
        .agg(F.sum("src_n").cast("long").alias("probe_queries"))
    )
    return (
        per_bucket.join(load, "bucket")
        .crossJoin(F.broadcast(total))
        .select(
            "bucket",
            "n_vectors",
            "min_vec_id",
            "max_vec_id",
            F.expr("(n_vectors * 1000000) div total_n").alias("share_ppm"),
            "probe_queries",
        )
    )


#: Hard negatives kept per query (and positives cap per query) in the
#: contrastive-training record pool mined from the ANN candidate set.
NEG_K = 5


def hard_negatives_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DPR-style contrastive-training data mining (Karpukhin et al. 2020,
    arXiv:2004.04906 §4.2): for each query, split its ANN candidate pool
    into POSITIVES (candidates the SemDeDup pair set marks as semantic
    duplicates of the query — the same "these mean the same thing"
    oracle the dedup family uses) and HARD NEGATIVES (close in
    embedding space but not so marked — the near-misses that make a
    retriever learn), keeping the top ``NEG_K`` of each role by cosine.
    This is the step that turns a curated corpus + ANN index into
    (query, positive, negatives) training records for a
    retrieval/embedding model.

    Known miss class, inherited deliberately: SemDeDup compares pairs
    WITHIN an IVF cell, so a true paraphrase that lands in a different
    cell than the query is not in the pair set and will be emitted as a
    top-ranked hard negative — the same cell-boundary recall gap the
    SemDeDup entry itself documents (and `ann_recall_report` prices for
    the index). Production mitigations are the standard ones: raise the
    quantizer's probe count for the dup pass, or post-filter negatives
    above a cosine ceiling; both change THIS entry's role split only
    through the pair set it consumes, so the contract here stays
    "pair-set membership", not "global semantic truth".

    Pool-bounded semantics by design: candidates come from
    ``ann_cosine_topk``'s top-10 (at 100 TB, the served IVF index's
    candidate stage — same frame shape), so mining cost is |queries| ×
    TOP_K, never a corpus scan; the duplicate set is the memoized
    SemDeDup pair frame (O(near-dup) rows, broadcast side of the role
    split). Ranking reuses the candidates' published 6-dp cosine with a
    neighbor-id tie-break, so the cut is deterministic and the oracle —
    COMPOSED from the ANN and SemDeDup oracles — replays it exactly.
    """
    cand = ann_cosine_topk(spark, sf_dir).select(
        "query_id", "neighbor_id", "cos"
    )
    dup = dedup_semantic(spark, sf_dir).select("id_a", "id_b")
    sym = dup.unionByName(
        dup.select(
            F.col("id_b").alias("id_a"), F.col("id_a").alias("id_b")
        )
    ).select(
        F.col("id_a").alias("query_id"),
        F.col("id_b").alias("neighbor_id"),
        F.lit(True).alias("is_dup"),
    )
    rolled = cand.join(F.broadcast(sym), ["query_id", "neighbor_id"], "left")
    role = F.when(
        F.col("is_dup").isNotNull(), F.lit("positive")
    ).otherwise(F.lit("hard_negative"))
    w = Window.partitionBy("query_id", "role").orderBy(
        F.desc("cos"), F.asc("neighbor_id")
    )
    return (
        rolled.withColumn("role", role)
        .withColumn("role_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("role_rank") <= NEG_K)
        .select("query_id", "neighbor_id", "cos", "role", "role_rank")
    )

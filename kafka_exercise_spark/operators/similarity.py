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

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_exercise_spark.catalog import load_table
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


def _hyperplanes() -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (no RNG state — pure formula,
    reproducible across sessions and engines)."""
    return [
        [math.sin(0.7 * h * EMBED_DIM + 1.3 * i + 0.5) for i in range(EMBED_DIM)]
        for h in range(N_HYPERPLANES)
    ]


def lsh_bucket(col: F.Column) -> F.Column:
    """Random-hyperplane LSH bucket id for an array<double> column."""
    bucket = F.lit(0)
    for h, plane in enumerate(_hyperplanes()):
        proj = dot(col, F.array(*[F.lit(v) for v in plane]))
        bucket = bucket + F.when(proj > 0, F.lit(1 << h)).otherwise(F.lit(0))
    return bucket


N_IVF_CELLS = 16
N_PROBE = 4


def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN: KMeans coarse quantizer, probe the n nearest cells.

    Index build = train KMeans(k=16, fixed seed) on the corpus and assign
    every vector to its nearest centroid (pure JVM expression once the
    centroids are literals). Query = rank centroids per query, probe the
    top-4 cells, exact-score only their members. Probing 4/16 cells scans
    ~25% of the corpus; recall vs the brute-force baseline is asserted in
    tests (driver check is rows-only — KMeans is not ANSI-SQL).

    At 100 TB: train on a sample (KMeans cost is per-training-row, recall
    changes little), store the cell id as a partition column so a probe
    reads n_probe partitions, re-train only on drift.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    emb = _embeddings_double(spark, sf_dir)
    # The quantizer trains on a corpus sample small enough for one task:
    # coalesce(1) turns every MLlib pass (init + each Lloyd iteration is a
    # separate distributed job) into a single-task job — at fixture scale
    # that is ~4x faster than 32-partition passes whose cost is pure job
    # overhead. random init skips k-means||'s extra passes; IVF recall
    # needs balanced-ish cells, not an optimal clustering. At 100 TB:
    # .sample() to ~100k vectors first, same coalesce — centroids must fit
    # on the driver regardless, so index build is inherently sample-based.
    train = emb.select(array_to_vector(F.col("emb")).alias("features")).coalesce(1)
    # maxIter low: IVF recall barely moves after a few Lloyd iterations and
    # training cost is the index-build bottleneck
    model = KMeans(
        k=N_IVF_CELLS,
        seed=42,
        maxIter=5,
        initMode="random",
        featuresCol="features",
    ).fit(train)
    centers = [c.tolist() for c in model.clusterCenters()]

    def l2sq(col: F.Column, center: list[float]) -> F.Column:
        c = F.array(*[F.lit(v) for v in center])
        return F.aggregate(
            F.zip_with(col, c, lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    dists = F.array(*[l2sq(F.col("emb"), c) for c in centers])
    assigned = emb.withColumn(
        "cell", (F.array_position(dists, F.array_min(dists)) - 1).cast("int")
    )
    # per-query: the N_PROBE nearest cells
    q = assigned.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("emb").alias("q_emb")
    )
    q_dists = F.array(*[l2sq(F.col("q_emb"), c) for c in centers])
    q_cells = q.withColumn(
        "probe_cells",
        F.slice(
            F.transform(
                F.array_sort(
                    F.transform(
                        q_dists,
                        lambda d, i: F.struct(d.alias("d"), i.alias("cell")),
                    )
                ),
                lambda s: s["cell"],
            ),
            1,
            N_PROBE,
        ),
    ).select("query_id", "q_emb", F.explode("probe_cells").alias("probe_cell"))
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
    emb = _embeddings_double(spark, sf_dir).withColumn("bucket", lsh_bucket(F.col("emb")))
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
            "rank",
            "bucket",
        )
    )

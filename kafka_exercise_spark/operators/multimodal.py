"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The pattern for image/audio/video at 100 TB: the payload is an opaque
``binary`` column (or a lake URI for > ~1 MB blobs), metadata is typed
columns, and decode/feature-extraction runs as Arrow-batched Pandas UDFs via
``mapInPandas`` so each executor processes record batches, not rows.

The container has no image/audio libraries, so the *decode* step is stubbed
(NotImplementedError behind ``decode_stub``) and feature extraction uses a
deterministic byte-level fake. The Spark-side plumbing — schema, binary
handling, Arrow batch shape, partition behavior — is real and tested.

Fixture mapping: ``documents.text`` encoded to bytes stands in for a media
payload (same plumbing, checkable values).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from kafka_exercise_spark.catalog import load_table

if TYPE_CHECKING:
    import pandas as pd


def decode_stub(payload: bytes) -> object:
    """Placeholder for a real media decode (PIL.Image.open / av.open / ...).

    STUB: the decode libraries are not in this container. The surrounding
    plumbing (binary column → mapInPandas batches → typed features) is the
    real deliverable; swap this function for the real decoder in production.
    """
    raise NotImplementedError(
        "media decode requires an image/audio library not present here"
    )


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → (doc_id, payload binary, media_type, n_bytes): the opaque
    payload + typed-metadata shape.

    Partitioning: a *moderate* width (8), not full parallelism — each first
    use of a partition forks a Python worker that imports pandas (~1 s);
    32 cold workers for a small table costs more than it buys. Long-lived
    clusters amortize worker start-up, small benches do not.
    """
    docs = load_table(spark, sf_dir, "documents").repartition(
        min(8, spark.sparkContext.defaultParallelism)
    )
    return docs.select(
        "doc_id",
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.lit("text/plain").alias("media_type"),
        F.octet_length(F.encode(F.col("text"), "UTF-8")).cast("long").alias("n_bytes"),
    )


FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("sha256_hex", StringType()),
        StructField("head4_be", LongType()),  # first 4 payload bytes, big-endian
        StructField("byte_sum_mod", LongType()),
    ]
)


def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas feature extraction over the binary payload column.

    Values are independently checkable: sha256/byte math reproduce in the
    DuckDB oracle from the text column — so the Arrow round-trip itself is
    value-verified, not just schema-verified.

    The worker function is a nested closure on purpose: cloudpickle then
    serializes it BY VALUE, so Python workers never need this package on
    their import path (module-level functions pickle by reference and fail
    on executors whose PYTHONPATH lacks the repo).
    """

    def extract(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        # Deterministic byte-level "features" stand in for decode+embed; a
        # real pipeline calls decode_stub's replacement here with the whole
        # Arrow batch resident as a pandas column of bytes.
        import hashlib

        import pandas as pd

        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": payloads.map(len),
                    "sha256_hex": payloads.map(
                        lambda b: hashlib.sha256(bytes(b)).hexdigest()
                    ),
                    "head4_be": payloads.map(
                        lambda b: int.from_bytes(bytes(b[:4]).ljust(4, b"\0"), "big")
                    ),
                    "byte_sum_mod": payloads.map(lambda b: sum(bytes(b)) % 997),
                }
            )

    return media_table(spark, sf_dir).mapInPandas(extract, schema=FEATURE_SCHEMA)


def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JVM-side metadata over the binary column (no Python): byte length +
    sha256 — the cheap pre-filter pass before any expensive decode."""
    media = media_table(spark, sf_dir)
    return media.select(
        "doc_id",
        "media_type",
        "n_bytes",
        F.sha2(F.col("payload"), 256).alias("sha256_hex"),
    )


#: Frame geometry for the deterministic sampler: the payload is treated as
#: a sequence of fixed FRAME_BYTES chunks ("frames"); SAMPLE_FRAMES are
#: taken at a uniform stride. Real video frames are variable-size — the
#: fixed chunk stands in for the decoder's frame index, which is exactly
#: what a production sampler consumes.
FRAME_BYTES = 64
SAMPLE_FRAMES = 4


def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uniform-stride frame sampling over an opaque media payload — the
    video-pipeline step that cuts a 100 TB corpus to the k frames/clip a
    vision encoder actually reads.

    Entirely JVM-side: frame index set = ``array_distinct(transform(
    sequence(0..k-1), j -> floor(j*n_frames/k)))``, one explode, and the
    frame bytes come from ``substr`` on the binary column (direct byte
    offsets — no decode, no Python, no shuffle; the only wide op is none).
    A real deployment swaps the fixed-size chunk for decoder frame indices
    (decode_stub's replacement) but keeps this exact plan shape: sample
    BEFORE decode, so the expensive step only ever sees k frames per doc.

    Emitted per sampled frame: byte offset + sha256 of the frame slice —
    enough for the DuckDB oracle to verify every byte boundary without
    shipping the frames themselves through the comparison.
    """
    k = SAMPLE_FRAMES
    media = media_table(spark, sf_dir).withColumn(
        "n_frames",
        F.ceil(F.col("n_bytes") / F.lit(float(FRAME_BYTES))).cast("bigint"),
    )
    idxs = F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.lit(k - 1)),
            lambda j: F.floor(j * F.col("n_frames") / F.lit(float(k))).cast(
                "bigint"
            ),
        )
    )
    frame = F.col("payload").substr(
        (F.col("frame_idx") * FRAME_BYTES).cast("int") + F.lit(1),
        F.lit(FRAME_BYTES),
    )
    return (
        media.select(
            "doc_id", "n_frames", F.explode(idxs).alias("frame_idx"), "payload"
        )
        .select(
            "doc_id",
            "n_frames",
            "frame_idx",
            (F.col("frame_idx") * FRAME_BYTES).alias("frame_offset"),
            F.octet_length(frame).cast("bigint").alias("frame_bytes"),
            F.sha2(frame, 256).alias("frame_sha256"),
        )
    )

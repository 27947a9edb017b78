"""Lake layout: partitioned landing + bucketed tables (the 100 TB layer).

The reference's "lake" is a flat S3 prefix per topic with 10-record files
(reference connect_s3_sink_jovens.config:6,12) — no partitioning, no
clustering, nothing for a reader to prune on. At warehouse scale, layout IS
the query plan: this module owns the two layout contracts the engine's
operators rely on, with the plan-visible guarantees pinned in
tests/test_lake.py:

- **Partitioned landing** (``write_partitioned`` / ``scan with a partition
  predicate``): directory-encoded partition columns; a filter on them shows
  up as ``PartitionFilters`` in the scan and prunes whole directories
  before any IO. A date-partitioned 100 TB events table turns a one-day
  query into a ~0.3 TB scan.
- **Bucketed tables** (``write_bucketed``): pre-shuffled clustering on the
  join/agg key. Two tables bucketed on the same key with the same bucket
  count join with ZERO exchanges — at 100 TB that deletes the single most
  expensive stage of fact-fact joins. (Spark's bucketing needs
  ``saveAsTable``; the files carry bucket ids the planner trusts.)

Both writers are thin on purpose — layout decisions (columns, counts)
belong to the caller; the helpers encode only the mechanics plus the sizing
rules of thumb documented on each function.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    max_records_per_file: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Land a frame with directory-encoded partition columns.

    Sizing: pick partition columns with enough cardinality to prune but few
    enough distinct values that each directory holds ≥ one full parquet
    row group (128 MB-ish); high-cardinality keys belong in bucketing or
    file-level sorting (min/max skipping), never in partitionBy.
    """
    writer = df.write.mode(mode).partitionBy(*partition_cols)
    if max_records_per_file is not None:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int,
    sort_col: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Save as a bucketed (optionally sorted) table.

    Sizing: n_buckets ≈ table_size / target_partition_size (aim 128-256 MB
    per bucket at the largest consumer); both sides of a co-located join
    must agree on (bucket_col, n_buckets). sort_col pre-sorts within
    buckets so sort-merge joins skip their sort too.
    """
    writer = df.write.mode(mode).bucketBy(n_buckets, bucket_col)
    if sort_col is not None:
        writer = writer.sortBy(sort_col)
    writer.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    """Catalog read of a saved (bucketed) table."""
    return spark.table(table)


def swap_side_dir(path: str) -> str:
    """Staging-directory name for an atomic dir replacement of ``path``."""
    return path.rstrip("/") + ".staging"


def recover_swap_state(path: str) -> None:
    """Converge any crashed prior swap of ``path``.

    A writer killed between the two commit renames leaves ``<path>.old``
    holding the live data with ``path`` missing — restore it; stale
    ``.old``/``.staging`` dirs from aborted runs are cleared so the next
    swap starts clean. Call before reading ``path`` for a rewrite.
    """
    import os
    import shutil

    old = path.rstrip("/") + ".old"
    if not os.path.exists(path) and os.path.exists(old):
        os.rename(old, path)
    shutil.rmtree(swap_side_dir(path), ignore_errors=True)
    shutil.rmtree(old, ignore_errors=True)


def commit_dir_swap(path: str) -> None:
    """Atomically replace ``path`` with its written ``.staging`` dir.

    The rename pair is the commit point; crash windows in between are
    healed by ``recover_swap_state`` on the next run. Single-FS rename —
    on object stores the same shape is write-new-prefix + repoint-manifest.
    """
    import os
    import shutil

    old = path.rstrip("/") + ".old"
    if os.path.exists(path):
        os.rename(path, old)
    os.rename(swap_side_dir(path), path)
    shutil.rmtree(old, ignore_errors=True)


def compact_landing(
    spark: SparkSession,
    path: str,
    target_records_per_file: int,
    partition_cols: list[str] | None = None,
) -> tuple[int, int]:
    """Rewrite a small-files landing into right-sized files; returns
    (files_before, files_after).

    The reference's sink rolls a file every 10 records (reference
    connect_s3_sink_jovens.config:6 ``flush.size: 10``) — correct for
    latency, catastrophic for readers at scale: a year of 2-rows/s landing
    is ~6M tiny objects, and every scan pays per-file open/footer costs.
    Compaction is the standard second stage: read the landing, rewrite at
    target file size, atomically swap. Here the swap is
    write-to-side-dir + rename (single-FS move); on object stores the same
    shape runs as write-new-prefix + repoint-table/manifest.

    Readers running mid-compaction see the old prefix (the swap is the
    atomic step); streaming consumers of the landing should instead compact
    downstream-of-checkpoint paths only.

    Crash recovery via ``recover_swap_state``/``commit_dir_swap`` —
    re-running after a crash at any point converges.
    """
    import glob
    import os

    recover_swap_state(path)
    before = len(glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True))
    # persist: the frame is read twice (count to size the file count, then
    # the rewrite) — one scan of millions of tiny files is the job's whole
    # cost, so don't pay it twice
    df = spark.read.parquet(path).persist()
    try:
        # file count = ceil(rows / target): repartitioning wider than that
        # would re-create small files, narrower would exceed the target
        n_files = max(1, -(-df.count() // target_records_per_file))
        writer = (
            df.repartition(n_files)
            .write.mode("overwrite")
            .option("maxRecordsPerFile", target_records_per_file)
        )
        if partition_cols:
            writer = writer.partitionBy(*partition_cols)
        writer.parquet(swap_side_dir(path))
    finally:
        df.unpersist()
    commit_dir_swap(path)
    after = len(glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True))
    return before, after

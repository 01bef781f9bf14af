"""Heterogeneous lake ingestion + sink writers.

The canonical store is parquet (catalog.py / __init__.read_table); these
cover the other formats a lake feeds in, and the write path out.

Scale notes:
- CSV/JSON readers take an EXPLICIT schema: schema inference is a full
  extra pass over the data (at 100 TB, a second scan), and inferred types
  drift between samples. Inference is allowed only behind `infer=True`
  for exploration.
- The sink writer sorts within partitions (parquet min/max page stats ->
  the same pruning MergeTree's ORDER BY provides, forecast_script.py:143)
  and optionally partitions by a coarse key (date bucket) for partition
  pruning; `maxRecordsPerFile` bounds file sizes so downstream scans
  parallelize evenly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str | None = None,
    header: bool = True,
    infer: bool = False,
    **options: str,
) -> DataFrame:
    if schema is None and not infer:
        raise ValueError("pass a schema, or infer=True for exploration only")
    reader = spark.read.option("header", str(header).lower())
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.csv(path)


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str | None = None,
    infer: bool = False,
    **options: str,
) -> DataFrame:
    if schema is None and not infer:
        raise ValueError("pass a schema, or infer=True for exploration only")
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.json(path)


def read_orc(spark: SparkSession, path: str, **options: str) -> DataFrame:
    """ORC lake ingestion (the other columnar format a warehouse feeds
    in). ORC carries its schema, so no explicit-schema requirement —
    column pruning and predicate pushdown work exactly as with parquet
    (Spark's native vectorized ORC reader)."""
    reader = spark.read
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.orc(path)


def read_text_lines(spark: SparkSession, path: str) -> DataFrame:
    """ClickHouse ``LineAsString`` input format: one row per line with a
    single ``value`` string column — the raw-corpus ingestion shape for
    text pipelines (split downstream with the engine's own expressions,
    never driver-side)."""
    return spark.read.text(path)


def write_bucketed_table(
    df: DataFrame,
    name: str,
    bucket_col: str,
    n_buckets: int,
    sort_col: str | None = None,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed table write: pre-shuffles data into `n_buckets` files by
    hash(bucket_col) so future equi-joins/aggregations on that key need NO
    exchange — both sides arrive co-partitioned (the Hive-bucketing
    equivalent of co-located MergeTree parts). The big-fact-join strategy
    at 100 TB: pay the shuffle once at write time, never per query.
    Requires saveAsTable (bucket metadata lives in the catalog)."""
    writer = df.write.mode(mode).bucketBy(n_buckets, bucket_col)
    if sort_col:
        writer = writer.sortBy(sort_col)
    if path:
        writer = writer.option("path", path)
    writer.format("parquet").saveAsTable(name)


def path_exists(spark: SparkSession, path: str) -> bool:
    """Filesystem-agnostic existence probe via the Hadoop FS API (works
    for local paths, HDFS, and object stores alike — os.path does not)."""
    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    return p.getFileSystem(hconf).exists(p)


def upsert_partitioned(
    spark: SparkSession,
    updates: DataFrame,
    path: str,
    keys: list[str],
    partition_col: str,
) -> None:
    """MERGE-style upsert into a partitioned parquet dataset: matched keys
    are replaced, new keys appended, everything else untouched.

    The scale contract is partition-scoped rewrite: only partitions that
    contain updated keys are read, merged (anti-join out the old versions
    of updated keys, union the updates), and dynamically overwritten —
    untouched partitions' files are never opened or rewritten. Update cost
    is proportional to touched partitions, not table size (the parquet-only
    stand-in for Delta/Iceberg MERGE INTO; at 100 TB pick partition_col so
    updates cluster into few partitions).

    The merged slice is localCheckpoint()ed before the overwrite because
    Spark refuses to overwrite a path it is still lazily reading from;
    the materialized slice is bounded by the touched partitions.
    """
    target = spark.read.parquet(path)
    touched = [r[0] for r in updates.select(partition_col).distinct().collect()]
    merged = (
        target.filter(F.col(partition_col).isin(touched))
        .join(updates.select(keys), keys, "left_anti")
        .unionByName(updates)
        .localCheckpoint()
    )
    (
        merged.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(partition_col)
        .parquet(path)
    )


def compact_files(
    spark: SparkSession,
    path: str,
    target_files: int,
    sort_within: str | list[str] | None = None,
) -> int:
    """Small-file compaction: rewrite a parquet dataset into `target_files`
    files (optionally re-sorted so min/max page stats stay tight).

    Streaming sinks and incremental upserts accrete small files; at 100 TB
    scan parallelism and footer-read overhead degrade with file count, so
    periodic compaction is part of table maintenance. coalesce() (no
    shuffle) merges partitions; a localCheckpoint materializes the data
    before the self-overwrite. Returns the new file count."""
    df = spark.read.parquet(path).coalesce(target_files)
    if sort_within:
        cols = [sort_within] if isinstance(sort_within, str) else sort_within
        df = df.sortWithinPartitions(*cols)
    df.localCheckpoint().write.mode("overwrite").parquet(path)
    return len(
        [f for f in spark.read.parquet(path).inputFiles() if f.endswith(".parquet")]
    )


def write_table(
    df: DataFrame,
    path: str,
    sort_within_partitions: str | list[str] | None = None,
    partition_by: str | list[str] | None = None,
    mode: str = "overwrite",
    max_records_per_file: int | None = None,
    fmt: str = "parquet",
) -> None:
    """C5-at-scale sink: drop-and-recreate via mode='overwrite'
    (forecast_script.py:127-145 semantics), clustered by sort column."""
    out = df
    if sort_within_partitions:
        cols = (
            [sort_within_partitions]
            if isinstance(sort_within_partitions, str)
            else sort_within_partitions
        )
        out = out.sortWithinPartitions(*cols)
    writer = out.write.mode(mode)
    if partition_by:
        cols = [partition_by] if isinstance(partition_by, str) else partition_by
        writer = writer.partitionBy(*cols)
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", str(max_records_per_file))
    writer.format(fmt).save(path)

"""Custom Python DataSource WRITER (two-phase commit JSONL sink):
staging invisibility, manifest-gated visibility, overwrite atomicity,
and row fidelity.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from clickhouse_forecasting_spark.sources import jsonl_sink, read_table


def test_write_read_roundtrip_with_manifest(spark, sf_dir, tmp_path):
    jsonl_sink.register(spark)
    target = str(tmp_path / "sink")
    src = read_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    src.write.format("jsonlsink").option("path", target).mode("append").save()
    # manifest exists, staging is gone, files listed == files present
    man = json.load(open(os.path.join(target, jsonl_sink.MANIFEST)))
    assert man["total_rows"] == src.count()
    assert not os.path.exists(os.path.join(target, "_staging"))
    listed = {e["file"] for e in man["files"]}
    on_disk = {f for f in os.listdir(target) if f.endswith(".jsonl")}
    assert listed == on_disk and len(listed) >= 1
    back = jsonl_sink.read_manifest(
        spark, target, "o_orderkey long, cents long"
    )
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, src.collect())
    )


def test_orphan_part_files_are_invisible(spark, sf_dir, tmp_path):
    """The visibility contract: a part file NOT in the manifest (a torn
    write from a dead task, a concurrent writer's leftovers) is never
    read back."""
    jsonl_sink.register(spark)
    target = str(tmp_path / "sink_orphan")
    src = spark.range(10).select(F.col("id").alias("o_orderkey"),
                                 (F.col("id") * 100).alias("cents"))
    src.write.format("jsonlsink").option("path", target).mode("append").save()
    with open(os.path.join(target, "part-orphan.jsonl"), "w") as fh:
        fh.write('{"o_orderkey": 999999, "cents": 1}\n')
    back = jsonl_sink.read_manifest(
        spark, target, "o_orderkey long, cents long"
    )
    assert back.count() == 10
    assert back.where(F.col("o_orderkey") == 999999).count() == 0


def test_overwrite_swaps_generations_atomically(spark, tmp_path):
    jsonl_sink.register(spark)
    target = str(tmp_path / "sink_ovr")
    gen1 = spark.range(5).select(F.col("id").alias("v"))
    gen2 = spark.range(100, 103).select(F.col("id").alias("v"))
    gen1.write.format("jsonlsink").option("path", target).mode("append").save()
    gen2.write.format("jsonlsink").option("path", target).mode(
        "overwrite"
    ).save()
    back = jsonl_sink.read_manifest(spark, target, "v long")
    assert sorted(r.v for r in back.collect()) == [100, 101, 102]
    # gen-1 part files physically removed after the manifest swap
    man = json.load(open(os.path.join(target, jsonl_sink.MANIFEST)))
    listed = {e["file"] for e in man["files"]}
    on_disk = {f for f in os.listdir(target) if f.endswith(".jsonl")}
    assert on_disk == listed


def test_second_append_merges_manifest(spark, tmp_path):
    """ADVICE r4: a second append to the same path must UNION the
    manifest, not replace it — otherwise previously committed rows
    become invisible orphans and the 2PC/append contract is broken."""
    jsonl_sink.register(spark)
    target = str(tmp_path / "sink_app2")
    gen1 = spark.range(5).select(F.col("id").alias("v"))
    gen2 = spark.range(100, 103).select(F.col("id").alias("v"))
    gen1.write.format("jsonlsink").option("path", target).mode("append").save()
    gen2.write.format("jsonlsink").option("path", target).mode("append").save()
    back = jsonl_sink.read_manifest(spark, target, "v long")
    assert sorted(r.v for r in back.collect()) == [0, 1, 2, 3, 4, 100, 101, 102]
    man = json.load(open(os.path.join(target, jsonl_sink.MANIFEST)))
    assert man["total_rows"] == 8
    listed = {e["file"] for e in man["files"]}
    on_disk = {f for f in os.listdir(target) if f.endswith(".jsonl")}
    assert listed == on_disk

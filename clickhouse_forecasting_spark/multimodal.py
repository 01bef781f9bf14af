"""Multimodal column plumbing (BASELINE.json extension surface).

Images/audio/video are opaque ``binary`` payload columns with a typed
metadata struct alongside — the parquet-native layout for multimodal
training data:

    payload  binary            -- the encoded media bytes
    media    struct<kind: string, mime: string, byte_len: long,
                    checksum: string>

The Spark-side plumbing (schemas, batch shapes, partitioning, Pandas-UDF
signatures) is real and tested; the actual media *decode* is stubbed behind
``decode_stub`` with a deterministic fake (image/audio libraries are not in
this container — swap ``_decode_payload`` for PIL/libav calls in a real
deployment; the dataflow does not change).

Scale notes: payloads dominate bytes, so operators keep them out of
shuffles — feature extraction is ``mapInPandas`` (per-partition, zero
shuffle), and any grouping happens on the *metadata/feature* projection,
never on payload bytes. ``spark.sql.files.maxPartitionBytes`` governs batch
memory; Arrow moves payload bytes to Python zero-copy-ish per batch.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_STRUCT = T.StructType(
    [
        T.StructField("kind", T.StringType()),
        T.StructField("mime", T.StringType()),
        T.StructField("byte_len", T.LongType()),
        T.StructField("checksum", T.StringType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("byte_len", T.LongType()),
        T.StructField("feat_mean", T.DoubleType()),
        T.StructField("feat_dim", T.IntegerType()),
    ]
)


def attach_payload(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Build a multimodal frame from the documents fixture: the text bytes
    stand in for an encoded media payload; metadata is computed JVM-side
    (octet_length/md5 — never pulls bytes into Python)."""
    payload = F.encode(F.col(text_col), "utf-8")
    return df.select(
        F.col(id_col),
        payload.alias("payload"),
        F.struct(
            F.lit("image").alias("kind"),
            F.lit("application/octet-stream").alias("mime"),
            F.octet_length(payload).cast("long").alias("byte_len"),
            F.md5(payload).alias("checksum"),
        ).alias("media"),
    )


def _decode_payload(payload: bytes) -> list[float]:
    """STUB — deterministic fake decode. A real deployment replaces this
    with e.g. PIL.Image.open + resize + np.asarray. Raises for empty
    payloads the way a real decoder raises for corrupt media."""
    if not payload:
        raise ValueError("empty payload")
    # fake 4-dim feature: byte statistics (deterministic, library-free)
    n = len(payload)
    return [
        float(n),
        float(sum(payload[:256]) % 997),
        float(payload[0]),
        float(payload[-1]),
    ]


def extract_features(df: DataFrame, batch_hint: int | None = None) -> DataFrame:
    """Feature-extract every payload via mapInPandas — the canonical decode
    pattern: per-partition Arrow batches in, small feature rows out, payload
    bytes never shuffled. Corrupt payloads yield NULL features instead of
    failing the batch (per-row fault isolation, mirroring the forecaster's
    M4 semantics)."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    feats = _decode_payload(bytes(payload))
                    out.append(
                        {
                            "doc_id": doc_id,
                            "byte_len": len(payload),
                            "feat_mean": sum(feats) / len(feats),
                            "feat_dim": len(feats),
                        }
                    )
                except Exception:
                    out.append(
                        {"doc_id": doc_id, "byte_len": len(payload), "feat_mean": None, "feat_dim": None}
                    )
            yield pd.DataFrame(out, columns=[f.name for f in FEATURE_SCHEMA.fields])

    return df.select("doc_id", "payload").mapInPandas(_extract, schema=FEATURE_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_payload", T.BinaryType()),
        T.StructField("frame_checksum", T.StringType()),
    ]
)


def _sample_frames(payload: bytes, n_frames: int) -> list[bytes]:
    """STUB — deterministic fake frame sampler. A real deployment replaces
    this with libav/pyav keyframe extraction; the dataflow (1 video row ->
    n frame rows) is what's under test. Fake frames are byte-slices so
    frame count/sizes are deterministic."""
    if not payload:
        raise ValueError("empty payload")
    step = max(len(payload) // n_frames, 1)
    return [payload[i * step : (i + 1) * step] or payload[-step:] for i in range(n_frames)]


def sample_frames(df: DataFrame, n_frames: int = 4) -> DataFrame:
    """Frame sampling via mapInPandas — the 1:N batch shape (one media row
    yields n frame rows). Payload bytes stay within the partition; any
    downstream grouping runs on (doc_id, frame_idx) + checksum, never on
    frame bytes. Corrupt payloads are skipped (fault isolation), visible as
    missing doc_ids."""
    import hashlib

    def _explode_frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    frames = _sample_frames(bytes(payload), n_frames)
                except Exception:
                    continue
                for i, fr in enumerate(frames):
                    out.append(
                        {
                            "doc_id": doc_id,
                            "frame_idx": i,
                            "frame_payload": fr,
                            "frame_checksum": hashlib.md5(fr).hexdigest(),
                        }
                    )
            yield pd.DataFrame(out, columns=[f.name for f in FRAME_SCHEMA.fields])

    return df.select("doc_id", "payload").mapInPandas(_explode_frames, schema=FRAME_SCHEMA)


def resize_payloads(df: DataFrame, target_bytes: int = 64) -> DataFrame:
    """Resize via mapInPandas — the payload->payload (1:1, bytes-in/bytes-out)
    shape. STUB: truncation/padding stands in for PIL resize; a real decoder
    swaps _resize only. Output schema mirrors input so resize composes with
    attach_payload/extract_features pipelines."""

    def _resize(payload: bytes) -> bytes:
        if not payload:
            raise ValueError("empty payload")
        return payload[:target_bytes].ljust(target_bytes, b"\x00")

    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
            T.StructField("resized", T.BooleanType()),
        ]
    )

    def _apply(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    out.append({"doc_id": doc_id, "payload": _resize(bytes(payload)), "resized": True})
                except Exception:
                    out.append({"doc_id": doc_id, "payload": bytes(payload), "resized": False})
            yield pd.DataFrame(out, columns=[f.name for f in out_schema.fields])

    return df.select("doc_id", "payload").mapInPandas(_apply, schema=out_schema)


def media_stats(df: DataFrame) -> DataFrame:
    """Metadata-only aggregation — runs entirely on the struct projection;
    parquet column pruning means payload bytes are never read."""
    return df.groupBy(F.col("media.kind").alias("kind")).agg(
        F.count("*").alias("n_items"),
        F.sum("media.byte_len").alias("total_bytes"),
        F.avg("media.byte_len").alias("avg_bytes"),
    )

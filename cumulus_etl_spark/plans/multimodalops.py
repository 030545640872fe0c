"""Multimodal catalog entries — put the binary-column pipeline under the
driver's per-round gate (rows-only: the decode stage is a deterministic
stub, see operators/multimodal.py, so there is no SQL oracle; schema and
row counts are still checked every round).

Payloads are synthesized from `documents.text` bytes so the pipeline is
fully deterministic and runs on the standard harness tables: the bytes
flow binary→metadata→mapInPandas exactly as real media would.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cumulus_etl_spark.operators import multimodal as M
from cumulus_etl_spark.plans.catalog import register
from cumulus_etl_spark.sources import table


def _payloads(spark: SparkSession, sf_dir: str, kind: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.encode("text", "utf-8").alias("payload"),
        F.lit(f"{kind}/synthetic").alias("ct"),
    )


@register("multimodal_image_stats", None, tags=("multimodal",))
def multimodal_image_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pack→decode→embed image pipeline, aggregated: per media kind,
    row count, mean decoded width/height, mean byte size, and mean
    first-embedding component. Exercises the metadata expressions, the
    Arrow batch path, and the nested-struct output schema end-to-end.
    No oracle by design: the decode/embed stages are Pandas-UDF binary
    processing DuckDB has no analog for (rows-only; decoders are
    unit-tested against genuine containers in test_multimodal.py)."""
    packed = M.pack_media(_payloads(spark, sf_dir, "image"), "payload", "ct")
    decoded = M.decode_images(packed)
    embedded = M.embed_media(decoded)
    return (
        embedded.groupBy(F.col("media_meta.media_kind").alias("media_kind"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.avg("image_info.width").alias("avg_width"),
            F.avg("image_info.height").alias("avg_height"),
            F.avg("media_meta.byte_size").alias("avg_bytes"),
            F.avg(F.element_at("embedding", 1)).alias("avg_emb0"),
        )
    )


@register("multimodal_audio_features", None, tags=("multimodal",))
def multimodal_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio feature pass (stub codec, real vectorized DSP): per-doc
    duration/RMS/peak/zero-crossing-rate, filtered to non-trivial
    clips and top-100 by duration with a doc_id tiebreak.
    No oracle by design: the DSP runs in a Pandas UDF over binary
    payloads (no DuckDB analog); rows-only + unit-tested decoders."""
    packed = M.pack_media(_payloads(spark, sf_dir, "audio"), "payload", "ct")
    feats = M.extract_audio_features(packed)
    return (
        feats.select(
            "doc_id",
            F.col("audio_features.duration_s").alias("duration_s"),
            F.col("audio_features.rms").alias("rms"),
            F.col("audio_features.zero_crossing_rate").alias("zcr"),
        )
        .filter(F.col("duration_s") > 0)
        .orderBy(F.desc("duration_s"), F.asc("doc_id"))
        .limit(100)
    )


@register("multimodal_frame_sample", None, tags=("multimodal",))
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sampling fan-out: one row per sampled frame with the
    parent metadata carried along; aggregated to frames-per-video
    distribution so the result is small and stable.
    No oracle by design: frame extraction is Pandas-UDF binary
    processing (no DuckDB analog); rows-only + unit-tested decoders."""
    packed = M.pack_media(_payloads(spark, sf_dir, "video"), "payload", "ct")
    frames = M.sample_video_frames(packed)
    per_video = frames.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_frames"))
    return per_video.groupBy("n_frames").agg(F.count(F.lit(1)).alias("n_videos"))

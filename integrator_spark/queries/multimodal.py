"""Multimodal column handling (SURVEY.md §2.10): opaque binary payloads
with typed metadata, processed by Arrow-batched pandas UDFs.

The container has no image/audio codecs, so the *decode kernels* for
non-text mime types are stubs (clearly marked NotImplementedError) —
but every piece of Spark plumbing is real and tested: the
binary+struct column model, the mapInPandas batch iteration, the UDF
signature/schema contract, and the downstream relational aggregation.
A real pipeline drops in PIL/ffmpeg inside ``_decode_payload`` without
touching anything else.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from ..registry import register

DECODED_SCHEMA = ("doc_id long, mime string, lang string, "
                  "n_bytes long, first_byte long, ok boolean")


def _decode_payload(payload: bytes, mime: str) -> tuple[int, int, bool]:
    """Per-item decode kernel. Text decodes for real; image/audio/video
    decode is STUBBED — the Spark-side contract (schema, batching,
    partitioning) is identical for all mime types."""
    if mime.startswith("text/"):
        return len(payload), payload[0] if payload else -1, True
    if mime.split("/", 1)[0] in {"image", "audio", "video"}:
        raise NotImplementedError(
            f"no codec for {mime} in this container — plug PIL/ffmpeg in here")
    return len(payload), -1, False


def decode_multimodal(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: Arrow batch in → decoded feature batch out."""
    for pdf in batches:
        decoded = [_decode_payload(p, m) for p, m in zip(pdf["payload"], pdf["mime"])]
        yield pd.DataFrame({
            "doc_id": pdf["doc_id"].astype("int64"),
            "mime": pdf["mime"],
            "lang": pdf["lang"],
            "n_bytes": pd.Series([d[0] for d in decoded], dtype="int64"),
            "first_byte": pd.Series([d[1] for d in decoded], dtype="int64"),
            "ok": pd.Series([d[2] for d in decoded], dtype="bool"),
        })


def build_multimodal_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model the corpus as a multimodal table: binary payload + mime +
    metadata struct — the layout image/audio shards would use at 100 TB
    (payloads stay opaque bytes until a task-specific decode stage)."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("payload"),
        F.lit("text/plain").alias("mime"),
        F.col("lang"),
        F.create_map(F.lit("source"), F.col("source"),
                     F.lit("lang"), F.col("lang")).alias("meta"),
    )


@register("multimodal_ingest", oracle="""
SELECT 'text/plain' AS mime,
       lang,
       COUNT(*) AS n_items,
       CAST(SUM(n_chars) AS BIGINT) AS total_bytes,
       COUNT(*) AS n_ok
FROM documents
GROUP BY lang
""", tags=("multimodal",))
def multimodal_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal pipeline end-to-end: binary+metadata frame →
    mapInPandas decode → relational aggregate. The oracle checks the
    decoded byte accounting against the source table (the corpus is
    ASCII, so bytes == chars)."""
    mm = build_multimodal_frame(spark, sf_dir)
    decoded = mm.select("doc_id", "payload", "mime", "lang") \
        .mapInPandas(decode_multimodal, DECODED_SCHEMA)
    return (decoded.groupBy("mime", "lang")
            .agg(F.count(F.lit(1)).alias("n_items"),
                 F.sum("n_bytes").alias("total_bytes"),
                 F.sum(F.when(F.col("ok"), 1).otherwise(0)).alias("n_ok")))

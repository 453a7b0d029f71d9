"""Multimodal column plumbing (north-star mandate).

Images/audio/video are opaque ``binary`` columns with a typed metadata
struct; the decode/feature steps run as Arrow-batched ``mapInPandas``
so payload bytes never round-trip through Python row objects.

The container has no image/audio libraries, so the decode kernel is a
clearly-marked deterministic stub (`_decode_stub`) — the Spark-side
contract (schema, batch shape, partitioning) is real and tested, and a
real codec drops into the same function signature.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from artemia_airflow_spark.catalog import scan
from artemia_airflow_spark.plans.registry import declared
from artemia_airflow_spark.session import ensure_engine_conf

if TYPE_CHECKING:
    import pandas as pd

# Output contract of the decode/feature stage.
DECODED_SCHEMA = (
    "doc_id long, media_type string, n_bytes int, width int, height int, checksum bigint"
)


def attach_fake_media(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Synthesize an opaque media payload + typed metadata from text
    (the fixtures ship no binary columns).  Payload = UTF-8 bytes;
    metadata mirrors what an ingest service would attach."""
    return df.select(
        F.col(id_col),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.struct(
            F.when(F.col(id_col) % 3 == 0, "image/png")
            .when(F.col(id_col) % 3 == 1, "audio/wav")
            .otherwise("video/mp4")
            .alias("media_type"),
            F.length(F.col(text_col)).alias("declared_len"),
        ).alias("media_meta"),
    )


def _decode_stub(media_type: str, payload: bytes) -> tuple[int, int]:
    """STUB decode: deterministic fake (width, height) from payload
    length.  Replace with PIL/librosa/pyav in a real deployment —
    `NotImplementedError` left out deliberately so the pipeline is
    runnable end-to-end in CI."""
    n = len(payload)
    return (n % 640 + 16, (n // 7) % 480 + 16)


def decode_media(df: DataFrame) -> DataFrame:
    """Arrow-batched decode/feature-extraction over (payload, meta).

    ``mapInPandas`` streams column batches — each worker sees a pandas
    frame of a few thousand rows, never the whole partition, so 100 MB
    media blobs don't blow executor memory (tune via
    spark.sql.execution.arrow.maxRecordsPerBatch).
    """
    import zlib

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in it:
            dims = [
                _decode_stub(mt, bytes(pl))
                for mt, pl in zip(pdf["media_meta"].map(lambda m: m["media_type"]), pdf["payload"])
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_meta"].map(lambda m: m["media_type"]),
                    "n_bytes": pdf["payload"].map(len).astype("int32"),
                    "width": [w for w, _ in dims],
                    "height": [h for _, h in dims],
                    "checksum": [zlib.crc32(bytes(p)) for p in pdf["payload"]],
                }
            )

    return df.mapInPandas(batches, DECODED_SCHEMA)


@declared("q_multimodal_decode")
def q_multimodal_decode(spark, sf_dir):
    """North-star multimodal (rows-only): binary payload -> mapInPandas
    decode stub -> per-media-type stats.  Exercises the full plumbing:
    binary column, struct metadata, Arrow batching, post-decode agg."""
    ensure_engine_conf(spark)
    d = scan(spark, sf_dir, "documents")
    media = attach_fake_media(d, "doc_id", "text")
    decoded = decode_media(media)
    return decoded.groupBy("media_type").agg(
        F.count(F.lit(1)).alias("n_assets"),
        F.sum("n_bytes").alias("total_bytes"),
        F.max("width").alias("max_width"),
    )


@declared(
    "q_multimodal",
    oracle="""
    SELECT lang, label,
           COUNT(*) AS n,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
           MIN(n_chars) AS min_chars,
           MAX(n_chars) AS max_chars
    FROM documents JOIN embeddings ON doc_id = vec_id
    GROUP BY lang, label
    """,
)
def q_multimodal(spark, sf_dir):
    """B44: mixed text x vector rollup — documents joined to embeddings
    (doc_id = vec_id), stats per (lang, label)."""
    ensure_engine_conf(spark)
    d = scan(spark, sf_dir, "documents")
    e = scan(spark, sf_dir, "embeddings")
    return (
        d.join(e, d.doc_id == e.vec_id)
        .groupBy("lang", "label")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("n_chars").alias("sum_chars"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
        )
    )

RESIZED_SCHEMA = "doc_id long, media_type string, width int, height int, payload binary"
FRAMES_SCHEMA = "doc_id long, frame_idx int, frame_checksum bigint"


def resize_media(df: DataFrame, *, max_side: int = 256) -> DataFrame:
    """Resize stage (STUB kernel, real Spark plumbing): recompute
    dimensions clamped to ``max_side`` keeping aspect ratio; payload
    passed through opaque.  A real deployment swaps the dimension
    arithmetic for PIL/ffmpeg inside the same mapInPandas contract."""

    def run(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in it:
            scale = (max_side / pdf[["width", "height"]].max(axis=1)).clip(upper=1.0)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "width": (pdf["width"] * scale).astype("int32").clip(lower=1),
                    "height": (pdf["height"] * scale).astype("int32").clip(lower=1),
                    "payload": pdf["payload"],
                }
            )

    return df.mapInPandas(run, RESIZED_SCHEMA)


def sample_frames(df: DataFrame, *, every_n_bytes: int = 64, max_frames: int = 8) -> DataFrame:
    """Frame-sampling stage (STUB kernel): emit up to ``max_frames``
    "frames" per video payload — deterministic byte-window checksums
    standing in for decoded frames.  One row in -> many rows out, the
    UDTF shape for video at scale (frames explode row counts; keep the
    stage AFTER filters so only surviving videos decode)."""
    import zlib

    def run(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in it:
            out = {"doc_id": [], "frame_idx": [], "frame_checksum": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                data = bytes(payload)
                for i in range(min(max_frames, max(len(data) // every_n_bytes, 1))):
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(i)
                    out["frame_checksum"].append(
                        zlib.crc32(data[i * every_n_bytes : (i + 1) * every_n_bytes])
                    )
            yield pd.DataFrame(out)

    return df.mapInPandas(run, FRAMES_SCHEMA)


@declared("q_multimodal_pipeline")
def q_multimodal_pipeline(spark, sf_dir):
    """North-star multimodal (rows-only): the full chain — attach
    binary payloads -> decode (stub) -> resize -> frame-sample videos
    only -> per-type frame stats.  Every hop is Arrow-batched; filters
    run before the expensive stages."""
    ensure_engine_conf(spark)
    d = scan(spark, sf_dir, "documents")
    media = attach_fake_media(d, "doc_id", "text")
    decoded = decode_media(media)
    enriched = decoded.join(media.select("doc_id", "payload"), "doc_id")
    resized = resize_media(enriched)
    videos = resized.filter(F.col("media_type") == "video/mp4")
    frames = sample_frames(videos)
    return frames.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_frames"),
        F.countDistinct("frame_checksum").alias("n_distinct_frames"),
    ).groupBy("n_frames").agg(
        F.count(F.lit(1)).alias("n_videos"),
        F.sum("n_distinct_frames").alias("total_distinct"),
    )

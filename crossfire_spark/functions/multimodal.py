"""Multimodal column plumbing for LLM data pipelines.

Images/audio/video ride through Spark as opaque ``binary`` columns
with a typed metadata struct alongside. The decode / feature-extract
kernels are STUBBED (the real codec libraries are not in this
container — see ``decode_image``), but everything Spark-side is real
and tested: schema, Arrow batch shape, ``mapInPandas`` signature,
partition-size control.

Scale notes baked into the design:
- blobs never enter a shuffle key; metadata-only projections prune
  the binary column at the parquet scan (columnar: reading metadata
  costs nothing even when blobs are huge),
- feature extraction is ``mapInPandas`` (Arrow batches, one Python
  worker per partition, streaming iterator — bounded memory however
  big the table is),
- ``spark.sql.files.maxPartitionBytes`` + per-batch row caps keep a
  batch of blobs inside executor memory.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from crossfire_spark.catalog import load_table, spread

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("content", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.IntegerType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("digest", T.StringType()),
        T.StructField("feature", T.ArrayType(T.DoubleType())),
    ]
)

FEATURE_DIM = 8


def decode_image(content: bytes) -> "object":
    """REAL image decode — intentionally unimplemented.

    The container has no PIL/opencv/ffmpeg; a production deployment
    plugs the codec in here. The pipeline around it (batching, schema,
    partitioning) is exercised via ``_fake_features`` instead.
    """
    raise NotImplementedError(
        "image decoding requires a codec library (PIL/opencv); "
        "wire it in here — the Spark plumbing around this call is real"
    )


def _fake_features(content: bytes, dim: int = FEATURE_DIM) -> list[float]:
    """Deterministic stand-in for a decoded-media feature vector:
    byte-histogram moments. Replace with decode_image(...) output."""
    if not content:
        return [0.0] * dim
    step = max(len(content) // dim, 1)
    return [
        float(sum(content[i : i + step]) % 997) / 997.0
        for i in range(0, step * dim, step)
    ][:dim]


def synthesize_media(docs: DataFrame) -> DataFrame:
    """Deterministic fake media table derived from ``documents`` (the
    container ships no real blobs): content = utf-8 of the text,
    metadata derived from doc fields. Real pipelines read parquet/
    Iceberg with an actual binary column — same schema."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
        .alias("kind"),
        F.encode("text", "utf-8").alias("content"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            (F.col("n_chars") % 1920).cast("int").alias("width"),
            (F.col("n_chars") % 1080).cast("int").alias("height"),
            (F.col("n_chars") * 10).cast("int").alias("duration_ms"),
        ).alias("meta"),
    )


def extract_features(media: DataFrame, batch_rows: int = 256) -> DataFrame:
    """Feature extraction over binary content via ``mapInPandas``.

    Iterator-of-batches signature: bounded memory no matter how many
    blobs a partition holds; Arrow moves the bytes without pickling.
    """

    # NOTE: the closure must be fully self-contained (no references to
    # crossfire_spark module globals): cloudpickle serializes module
    # globals by reference, and executor Python workers do not have
    # this repo on sys.path when the driver runs from elsewhere.
    dim = FEATURE_DIM

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        def feats(content: bytes) -> list[float]:
            if not content:
                return [0.0] * dim
            step = max(len(content) // dim, 1)
            return [
                float(sum(content[i : i + step]) % 997) / 997.0
                for i in range(0, step * dim, step)
            ][:dim]

        for pdf in batches:
            for start in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[start : start + batch_rows]
                yield pd.DataFrame(
                    {
                        "media_id": chunk["media_id"],
                        "n_bytes": chunk["content"].map(len).astype("int64"),
                        "digest": chunk["content"].map(
                            lambda b: hashlib.sha256(b).hexdigest()
                        ),
                        "feature": chunk["content"].map(feats),
                    }
                )

    return media.select("media_id", "content").mapInPandas(
        extract, schema=FEATURE_SCHEMA
    )


RESIZE_W, RESIZE_H = 224, 224
FRAME_STRIDE = 1000  # bytes per sampled "frame" in the fake kernel


def resize_images(media: DataFrame, width: int = RESIZE_W, height: int = RESIZE_H) -> DataFrame:
    """Image resize pipeline. The decode→resize→re-encode kernel is a
    deterministic FAKE (no codec libs in this container — production
    swaps in PIL/opencv inside the same closure); the Spark plumbing
    is real: binary in, binary out, metadata struct updated, Arrow
    batches, bounded memory."""

    def kernel(batches):
        import hashlib

        import pandas as pd

        for pdf in batches:
            # fake resize: content -> digest-seeded byte payload of
            # (width*height)//1000 bytes, deterministic per input
            def rz(b: bytes) -> bytes:
                seed = hashlib.sha256(b).digest()
                n = max((width * height) // 1000, 32)
                return (seed * (n // len(seed) + 1))[:n]

            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "content": pdf["content"].map(rz),
                    "width": width,
                    "height": height,
                    "orig_bytes": pdf["content"].map(len).astype("int64"),
                }
            )

    return media.where(F.col("kind") == "image").select(
        "media_id", "content"
    ).mapInPandas(
        kernel,
        schema="media_id long, content binary, width int, height int, orig_bytes long",
    )


def sample_frames(media: DataFrame, stride: int = FRAME_STRIDE) -> DataFrame:
    """Video frame sampling: one row per sampled frame (explode-style
    fan-out inside the Python worker). Fake kernel slices the byte
    stream at fixed strides; a real one seeks keyframes via ffmpeg.
    Output grows by the frame count — the partition-size note from
    the module docstring applies doubly here."""

    def kernel(batches):
        import pandas as pd

        for pdf in batches:
            out_ids, out_idx, out_frames = [], [], []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                for i, off in enumerate(range(0, len(content), stride)):
                    out_ids.append(mid)
                    out_idx.append(i)
                    out_frames.append(bytes(content[off : off + stride]))
            yield pd.DataFrame(
                {"media_id": out_ids, "frame_idx": out_idx, "frame": out_frames}
            )

    return media.where(F.col("kind") == "video").select(
        "media_id", "content"
    ).mapInPandas(kernel, schema="media_id long, frame_idx int, frame binary")


def m02_image_resize(spark, sf_dir):
    """Declared resize pipeline: metadata of resized images (the
    binary itself stays out of the result — blobs don't belong in
    driver-collected outputs). Rows-only driver check."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    media = synthesize_media(docs)
    out = resize_images(media)
    return out.select(
        "media_id",
        "width",
        "height",
        "orig_bytes",
        F.length("content").alias("new_bytes"),
    ).orderBy("media_id", "width", "height", "orig_bytes", "new_bytes")


def m03_frame_sample(spark, sf_dir):
    """Declared frame-sampling pipeline: per-video frame counts and
    sizes. Rows-only driver check."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    media = synthesize_media(docs)
    frames = sample_frames(media)
    return (
        frames.groupBy("media_id")
        .agg(
            F.count(F.lit(1)).alias("n_frames"),
            F.sum(F.length("frame")).alias("total_bytes"),
        )
        .orderBy("media_id", "n_frames", "total_bytes")
    )


def m01_media_features(spark, sf_dir):
    """Declared pipeline: synth media -> mapInPandas features ->
    metadata join. Driver records a rows-only check (the sha256/
    histogram kernels are deterministic, so rows are stable)."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    media = synthesize_media(docs)
    feats = extract_features(media)
    return (
        feats.join(media.select("media_id", "kind", "meta.width", "meta.height"), "media_id")
        .select(
            "media_id",
            "kind",
            "n_bytes",
            "digest",
            F.round(F.element_at("feature", 1), 4).alias("f0"),
            "width",
            "height",
        )
        .orderBy("media_id", "kind", "n_bytes", "digest", "f0", "width", "height")
    )


MULTIMODAL_QUERIES = {
    "m01_media_features": m01_media_features,
    "m02_image_resize": m02_image_resize,
    "m03_frame_sample": m03_frame_sample,
}
# All three kernels are deterministic functions of the byte stream,
# so all three mapInPandas pipelines get full DuckDB oracles: m01
# restates sha256 + the byte-histogram moment, m02's resized payload
# size is closed-form (max((224*224)//1000, 32) = 50 bytes), and
# m03's frame fan-out is ceil(bytes/stride) rows summing back to the
# byte count — the oracle checks the real Spark plumbing (binary
# columns, Arrow batches, worker-side explode) against closed forms.
MULTIMODAL_ORACLE_SQL: dict[str, str] = {
    "m02_image_resize": """
        SELECT doc_id media_id, CAST(224 AS INT) width, CAST(224 AS INT) height,
               CAST(octet_length(encode(text)) AS BIGINT) orig_bytes,
               CAST(50 AS INT) new_bytes
        FROM documents WHERE doc_id % 3 = 0
        ORDER BY media_id, width, height, orig_bytes, new_bytes""",
    "m03_frame_sample": """
        SELECT doc_id media_id,
               CAST(CEIL(octet_length(encode(text)) / 1000.0) AS BIGINT) n_frames,
               CAST(octet_length(encode(text)) AS BIGINT) total_bytes
        FROM documents WHERE doc_id % 3 = 2
        ORDER BY media_id, n_frames, total_bytes""",
    "m01_media_features": """
        WITH m AS (SELECT doc_id media_id,
               CASE WHEN doc_id % 3 = 0 THEN 'image'
                    WHEN doc_id % 3 = 1 THEN 'audio'
                    ELSE 'video' END kind,
               text,
               CAST(length(text) AS BIGINT) n_bytes,
               greatest(length(text) // 8, 1) step,
               CAST(n_chars % 1920 AS INT) width,
               CAST(n_chars % 1080 AS INT) height
        FROM documents)
        SELECT media_id, kind, n_bytes, sha256(text) digest,
               ROUND((SELECT SUM(ord(substr(m.text, i, 1)))
                      FROM UNNEST(range(1, step + 1)) u(i)) % 997 / 997.0,
                     4) f0,
               width, height
        FROM m
        ORDER BY media_id, kind, n_bytes, digest, f0, width, height""",
}

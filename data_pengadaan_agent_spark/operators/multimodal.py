"""Multimodal-column plumbing (driver contract: images/audio/video as
opaque binary columns with typed metadata).

The container ships no image/audio codecs, so the decode kernels are
deterministic fakes / clearly-marked stubs — but the Spark-side
plumbing is real: schemas, Arrow batch shapes, mapInPandas operators,
and partition sizing are exactly what a production decode stage uses.
Swap `_decode_image_stub` for PIL/torchvision and nothing else moves.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),  # opaque encoded bytes
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
        T.StructField("codec", T.StringType(), True),
    ]
)


def synthesize_media(spark: SparkSession, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table for tests: payload bytes derived
    from the id, metadata cycling over plausible values."""
    df = spark.range(n).select(
        F.col("id").alias("media_id"),
        F.element_at(F.array(F.lit("image"), F.lit("audio"), F.lit("video")), (F.col("id") % 3 + 1).cast("int")).alias("media_type"),
        F.encode(F.concat(F.lit(f"payload-{seed}-"), F.col("id").cast("string")), "utf-8").alias("payload"),
        (F.col("id") % 640 + 64).cast("int").alias("width"),
        (F.col("id") % 480 + 48).cast("int").alias("height"),
        (F.col("id") % 30000).cast("int").alias("duration_ms"),
        F.lit("fake/v1").alias("codec"),
    )
    return df


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic media table derived from the `documents` fixture:
    payload = utf-8 bytes of the text, metadata arithmetic on
    (doc_id, n_chars). Every derivation is a pure column expression, so
    an external oracle can recompute the whole pipeline from the same
    parquet — which makes the opaque-binary plumbing itself testable."""
    # pmod, not % (self-review r12): content-addressed doc ids
    # (read_text_corpus's xxhash64) are ~half NEGATIVE — Spark % keeps
    # the dividend's sign, so element_at got index 0 (runtime error)
    # or -1 (silently the WRONG media type) and heights went negative
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.pmod(F.col("doc_id"), F.lit(3)) + 1).cast("int"),
        ).alias("media_type"),
        F.encode("text", "utf-8").alias("payload"),
        (F.pmod(F.col("n_chars"), F.lit(640)) + 64).cast("int").alias("width"),
        (F.pmod(F.col("doc_id"), F.lit(480)) + 48).cast("int").alias("height"),
        F.pmod(F.col("n_chars") * 37, F.lit(30000)).cast("int").alias("duration_ms"),
        F.lit("fake/v1").alias("codec"),
    )


def _decode_image_stub(payload: bytes, width: int, height: int) -> list[float]:
    """STUB decode: a real deployment calls PIL here. Deterministic
    fake: 8 features derived from the payload + dimensions. The fake
    "decodes" the payload as UTF-8 and sums CODEPOINTS (not raw
    bytes) so it agrees with the SQL oracle's ``ord(text[i])`` sum
    for non-ASCII text too — the fixtures carry a zh lang label, so
    multibyte text is a live possibility."""
    if payload is None:
        raise NotImplementedError("real image decode requires PIL — not in this container")
    s = sum(ord(c) for c in bytes(payload).decode("utf-8", errors="replace"))
    return [float((s + i * 37) % 251) / 251.0 for i in range(6)] + [float(width), float(height)]


def extract_image_features(df: DataFrame) -> DataFrame:
    """Decode + feature-extract over mapInPandas: Arrow-batched,
    one Python worker per partition, constant memory per batch. At
    100 TB the input should be repartitioned so each task holds
    O(100 MB) of payload — callers do `df.repartition(n)` upstream."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _decode_image_stub(p, w, h)
                for p, w, h in zip(pdf["payload"], pdf["width"], pdf["height"])
            ]
            yield pd.DataFrame({"media_id": pdf["media_id"], "features": feats})

    return (
        df.filter(F.col("media_type") == "image")
        .select("media_id", "payload", "width", "height")
        .mapInPandas(run, schema="media_id long, features array<double>")
    )


def resize_plan(df: DataFrame, max_side: int = 256) -> DataFrame:
    """Resize metadata computation stays JVM-side (pure arithmetic);
    only the pixel transform would enter Python. Returns target dims
    preserving aspect ratio."""
    scale = F.least(
        F.lit(max_side) / F.greatest(F.col("width"), F.col("height")), F.lit(1.0)
    )
    return df.select(
        "media_id",
        "media_type",
        F.round(F.col("width") * scale).cast("int").alias("target_width"),
        F.round(F.col("height") * scale).cast("int").alias("target_height"),
    )


def sample_frames(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plan for video rows: one output row per sampled
    timestamp (sequence + explode, JVM-side); the actual frame decode
    is the stubbed Python kernel."""
    # duration NULL or <= 0 emits NO frames (self-review r12:
    # greatest() skips NULLs, so an unknown-length clip fabricated a
    # frame at t=0)
    return (
        df.filter(
            (F.col("media_type") == "video") & (F.col("duration_ms") > 0)
        )
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), F.greatest(F.col("duration_ms") - 1, F.lit(0)), F.lit(every_ms))
            ).alias("frame_ts_ms"),
        )
    )


def chunk_audio(df: DataFrame, chunk_ms: int = 5000) -> DataFrame:
    """Audio chunking plan: one row per fixed-length window of each
    audio row (sequence + explode, JVM-side; the waveform decode of
    each chunk is the stubbed Python kernel). end_ms clamps to the
    clip's duration."""
    # duration NULL or <= 0 emits NO chunks (self-review r12: a NULL
    # duration fabricated a phantom 5-second chunk of unknown media)
    return (
        df.filter(
            (F.col("media_type") == "audio") & (F.col("duration_ms") > 0)
        )
        .select(
            "media_id",
            "duration_ms",
            F.explode(
                F.sequence(
                    F.lit(0), F.greatest(F.col("duration_ms") - 1, F.lit(0)), F.lit(chunk_ms)
                )
            ).alias("start_ms"),
        )
        .select(
            "media_id",
            (F.col("start_ms") / chunk_ms).cast("int").alias("chunk_idx"),
            "start_ms",
            F.least(F.col("start_ms") + chunk_ms, F.col("duration_ms")).alias("end_ms"),
        )
    )


def payload_byte_stats(df: DataFrame) -> DataFrame:
    """REAL byte-level analytics over the opaque payload column — no
    codec needed, so unlike the decode stub this kernel runs for
    real in this container: per media row, numpy reads the raw bytes
    (frombuffer + bincount — one vectorized pass per Arrow batch) and
    emits

      n_bytes        octet length
      distinct_bytes how many of the 256 values occur
      modal_byte     most frequent byte (smallest wins ties)
      modal_count    its count
      printable_ppm  share of printable ASCII (0x20–0x7E) in ppm

    The corrupt-or-mislabeled-media triage row: a 'text/utf-8-ish'
    payload shows high printable_ppm and ~dozens of distinct bytes;
    ciphertext/compressed data saturates distinct_bytes with flat
    modal_count; an all-zero payload screams truncation. Integer
    outputs end to end; the Python reference in the tests pins the
    kernel bit-for-bit. Same scale contract as the other multimodal
    kernels: Arrow-batched mapInPandas, constant memory per batch,
    repartition upstream for O(100 MB) tasks."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "media_id": [], "n_bytes": [], "distinct_bytes": [],
                "modal_byte": [], "modal_count": [], "printable_ppm": [],
            }
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = np.frombuffer(bytes(payload or b""), dtype=np.uint8)
                out["media_id"].append(mid)
                out["n_bytes"].append(int(b.size))
                if b.size == 0:
                    out["distinct_bytes"].append(0)
                    out["modal_byte"].append(-1)
                    out["modal_count"].append(0)
                    out["printable_ppm"].append(0)
                    continue
                counts = np.bincount(b, minlength=256)
                out["distinct_bytes"].append(int((counts > 0).sum()))
                modal = int(counts.argmax())  # argmax: smallest index wins ties
                out["modal_byte"].append(modal)
                out["modal_count"].append(int(counts[modal]))
                printable = int(counts[0x20:0x7F].sum())
                out["printable_ppm"].append(int(printable * 1_000_000 // b.size))
            yield pd.DataFrame(out)

    return df.select("media_id", "payload").mapInPandas(
        run,
        schema="media_id long, n_bytes bigint, distinct_bytes int, "
               "modal_byte int, modal_count bigint, printable_ppm bigint",
    )

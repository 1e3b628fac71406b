"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

The container ships no image/audio codecs, so the *decode kernels* are
deterministic stubs (clearly marked), but everything Spark-side is real and
tested: schema, Arrow batch shape, ``mapInPandas`` plumbing, partition
sizing. Swapping the stub body for PIL/ffmpeg is a one-function change.

Pattern: binary payloads ride in their own column; metadata (mime, width,
height, duration) is a sibling struct so filters/pruning never touch the
heavy bytes (parquet column pruning keeps the scan cheap when a query only
reads metadata — the 100 TB concern).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("n_bytes", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = "media_id long, n_bytes int, mime string, width int, height int, checksum string"


def documents_as_media(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Adapter: treat document text bytes as a fake media payload — gives
    the multimodal path a deterministic corpus to run on in this sandbox."""
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.length(F.encode(F.col(text_col), "UTF-8")).cast("int").alias("n_bytes"),
        ).alias("meta"),
    )


def _decode_stub(payload: bytes | None) -> tuple[int, int]:
    """STUB — stands in for a real image decode (PIL.Image.open etc., not
    available in this container). Derives a deterministic fake (width,
    height) from the payload so tests exercise the full Arrow round-trip.
    Replace the body with a real decoder in production."""
    if payload is None:
        return (0, 0)
    n = len(payload)
    return (n % 640 + 1, (n * 7) % 480 + 1)


def extract_features(media: DataFrame, batch_hint: int = 1024) -> DataFrame:
    """Vectorized feature extraction over media payloads via mapInPandas:
    Arrow-batched binary columns in, typed features out. The per-batch
    pandas work is the only Python in the engine's operator set, and it is
    batch-granular (never per-row dispatch)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            dims = pdf["payload"].map(_decode_stub)
            meta = pd.DataFrame(list(pdf["meta"]))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": meta["n_bytes"].astype("int32"),
                    "mime": meta["mime"],
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                    "checksum": pdf["payload"].map(
                        lambda b: hashlib.md5(b).hexdigest() if b is not None else None
                    ),
                }
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_n_bytes: int = 4096) -> DataFrame:
    """Video-frame-sampling analogue: computes per-item sample offsets as an
    array column (pure JVM). A real pipeline would feed these offsets to a
    decode UDF; here the plan itself (explode → one row per frame) is the
    deliverable, showing how a 100 TB video table fans out to frame rows
    without materializing bytes per frame."""
    n = F.col("meta.n_bytes")
    offsets = F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)), F.lit(every_n_bytes))
    return media.select(
        "media_id",
        F.posexplode(offsets).alias("frame_idx", "byte_offset"),
    )

"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

Pattern: binary payloads ride in their own column; metadata (mime,
n_bytes) is a sibling struct so filters/pruning never touch the heavy
bytes (parquet column pruning keeps the scan cheap when a query only
reads metadata — the 100 TB concern).

Decoding is REAL header-only parsing — BMP / PNG / WAV dimensions and
audio parameters are plain byte arithmetic on the container headers
(struct.unpack, no codec libraries), dispatched by magic-byte sniffing of
the payload itself. Full pixel/sample decode would need PIL/ffmpeg (not
in this container) and is not required for the metadata features this
operator emits; formats without a recognized header yield null features
(a real pipeline cannot decode unknown bytes either).
"""

from __future__ import annotations

import struct
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

FEATURE_SCHEMA = (
    "media_id long, n_bytes int, mime string, width int, height int, "
    "sample_rate int, channels int, checksum string"
)

# header sizes of the containers the generator emits (and the parsers
# consume): BMP = 14-byte file header + 40-byte BITMAPINFOHEADER; PNG =
# 8-byte signature + 25-byte IHDR chunk (4 len + 4 type + 13 data + 4
# crc); WAV = canonical 44-byte RIFF/fmt/data preamble
BMP_HEADER = 54
PNG_HEADER = 33
WAV_HEADER = 44


def documents_as_media(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Adapter: treat document text bytes as an opaque media payload —
    exercises the unknown-format path (no magic bytes → null features)."""
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.length(F.encode(F.col(text_col), "UTF-8")).cast("int").alias("n_bytes"),
        ).alias("meta"),
    )


def _bmp_payload(doc_id: int, body: bytes) -> bytes:
    w, h = doc_id % 317 + 1, doc_id % 211 + 1
    file_size = BMP_HEADER + len(body)
    return (
        b"BM"
        + struct.pack("<IHHI", file_size, 0, 0, BMP_HEADER)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
        + body
    )


def _png_payload(doc_id: int, body: bytes) -> bytes:
    w, h = doc_id % 317 + 1, doc_id % 211 + 1
    ihdr = struct.pack(">II", w, h) + bytes([8, 2, 0, 0, 0])  # depth 8, truecolor
    return (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", 13) + b"IHDR" + ihdr + struct.pack(">I", 0)
        + body
    )


def _wav_payload(doc_id: int, body: bytes) -> bytes:
    channels = doc_id % 2 + 1
    rate = 8000 + (doc_id % 8) * 1000
    byte_rate = rate * channels * 2
    return (
        b"RIFF" + struct.pack("<I", 36 + len(body)) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, channels, rate, byte_rate, channels * 2, 16)
        + b"data" + struct.pack("<I", len(body))
        + body
    )


_TYPED = [
    ("image/bmp", _bmp_payload),
    ("image/png", _png_payload),
    ("audio/wav", _wav_payload),
]


def documents_as_typed_media(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Deterministic typed-media corpus: each document becomes a REAL
    BMP / PNG / WAV container (by ``doc_id % 3``) whose header fields are
    pure arithmetic on ``doc_id`` and whose body is the document's UTF-8
    bytes — so an external oracle can predict every feature
    :func:`extract_features` parses back out of the bytes. Payload
    construction is Arrow-batched (generator scaffolding; the engine-side
    deliverable is the parse direction)."""

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            bodies = pdf[text_col].map(lambda s: (s or "").encode("utf-8"))
            payloads, mimes = [], []
            for i, body in zip(ids, bodies):
                mime, fn = _TYPED[int(i) % 3]
                payloads.append(fn(int(i), body))
                mimes.append(mime)
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "payload": payloads,
                    "mime": mimes,
                    "n_bytes": [len(p) for p in payloads],
                }
            )

    built = df.select(F.col(id_col), F.col(text_col)).mapInPandas(
        build, "media_id long, payload binary, mime string, n_bytes int"
    )
    return built.select(
        "media_id",
        "payload",
        F.struct(F.col("mime"), F.col("n_bytes")).alias("meta"),
    )


def _sniff(b: bytes) -> tuple[str | None, int]:
    """ONE recognition predicate shared by decode and checksum: (kind,
    header_len), or (None, 0). Keeping a single sniffer guarantees the
    parsed features and the body checksum always agree on whether — and
    where — a header was recognized (divergent predicates would silently
    hash header bytes or drop body bytes on edge-length payloads)."""
    if (
        b[:2] == b"BM"
        and len(b) >= BMP_HEADER
        # "BM" alone false-positives on opaque text starting with those two
        # bytes; require the structural invariants our 54-byte-header parse
        # depends on: pixel-data offset == 54 (no palette between header and
        # body — the checksum hashes from there) and biSize == 40
        # (BITMAPINFOHEADER, the only DIB variant the decoder understands)
        and struct.unpack_from("<I", b, 10)[0] == BMP_HEADER
        and struct.unpack_from("<I", b, 14)[0] == 40
    ):
        return ("bmp", BMP_HEADER)
    if b[:8] == b"\x89PNG\r\n\x1a\n" and len(b) >= PNG_HEADER and b[12:16] == b"IHDR":
        return ("png", PNG_HEADER)
    if b[:4] == b"RIFF" and b[8:12] == b"WAVE" and b[12:16] == b"fmt " and len(b) >= WAV_HEADER:
        return ("wav", WAV_HEADER)
    return (None, 0)


def decode_header(payload: bytes | None) -> tuple:
    """Header-only decode by magic-byte sniffing: returns
    (width, height, sample_rate, channels) with None for fields the
    format doesn't carry, or all-None for unrecognized/truncated bytes.
    Pure byte arithmetic — the real decode this container permits."""
    if payload is None:
        return (None, None, None, None)
    b = bytes(payload)
    kind, _hl = _sniff(b)
    try:
        if kind == "bmp":
            w, h = struct.unpack_from("<ii", b, 18)
            return (w, abs(h), None, None)  # negative height = top-down rows
        if kind == "png":
            w, h = struct.unpack_from(">II", b, 16)
            return (w, h, None, None)
        if kind == "wav":
            channels, rate = struct.unpack_from("<HI", b, 22)
            return (None, None, rate, channels)
    except struct.error:
        pass
    return (None, None, None, None)


def header_len(payload: bytes | None) -> int:
    """Bytes consumed by a recognized container header (0 if none) — the
    body a checksum/feature pass should hash starts here. Same sniffer as
    decode_header by construction."""
    if payload is None:
        return 0
    return _sniff(bytes(payload))[1]


def extract_features(media: DataFrame, batch_hint: int = 1024) -> DataFrame:
    """Vectorized feature extraction over media payloads via mapInPandas:
    Arrow-batched binary columns in, typed features out. Dimensions /
    audio parameters are parsed from the payload HEADER BYTES (not read
    from metadata), so the output verifies the actual container contents;
    the checksum covers the body after the recognized header (equals the
    md5 of the original content for the typed generator). Batch-granular
    — never per-row dispatch through Spark."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            decoded = pdf["payload"].map(decode_header)
            meta = pd.DataFrame(list(pdf["meta"]))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": meta["n_bytes"].astype("int32"),
                    "mime": meta["mime"],
                    "width": pd.array([d[0] for d in decoded], dtype="Int32"),
                    "height": pd.array([d[1] for d in decoded], dtype="Int32"),
                    "sample_rate": pd.array([d[2] for d in decoded], dtype="Int32"),
                    "channels": pd.array([d[3] for d in decoded], dtype="Int32"),
                    "checksum": pdf["payload"].map(
                        lambda b: hashlib.md5(bytes(b)[header_len(b):]).hexdigest()
                        if b is not None else None
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

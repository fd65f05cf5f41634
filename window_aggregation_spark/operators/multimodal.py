"""Multimodal column plumbing: images/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched pandas iterators.

The Spark-side machinery here is real and tested — binary payload columns,
a typed metadata struct, ``mapInPandas`` operators with explicit output
schemas and bounded batch sizes. The actual media decoding is STUBBED:
the container has no image/audio libraries, so :func:`decode_image_features`
computes deterministic fake features from the raw bytes (and
:func:`require_decoder` raises ``NotImplementedError`` showing where a real
decoder — PIL / torchaudio / pyav — would plug in). Swapping the fake for a
real decoder changes only the inner function body; schema, partitioning,
and batch shape stay identical.

Scale notes: payloads ride in parquet binary columns; ``mapInPandas``
processes Arrow batches per partition, so memory is bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch`` x payload size —
repartition by size class before heavy decode stages to even out skew from
variable payload sizes.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

METADATA_FIELDS = "mime string, width int, height int, n_bytes long"

FEATURE_SCHEMA = (
    "doc_id long, mime string, n_bytes long, feat array<double>"
)


def attach_binary_payload(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Demo payload builder: treat each document's UTF-8 bytes as an opaque
    binary blob with a metadata struct (in a real pipeline the payload
    comes from an upstream image/audio source as a parquet binary column)."""
    payload = F.encode(F.col(text_col), "UTF-8")
    meta = F.struct(
        F.lit("application/octet-stream").alias("mime"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.length(payload).cast("long").alias("n_bytes"),
    )
    return df.select(
        F.col(id_col), payload.alias("payload"), meta.alias("meta")
    )


PNG_MAGIC_HEX = "89504E470D0A1A0A"


def extract_png_meta(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Parse image metadata straight out of a binary column with pure
    built-in expressions — no decode, no Python.

    PNG layout: 8 magic bytes, 4-byte chunk length, 4-byte "IHDR", then
    width and height as 4-byte big-endian ints at offsets 17 and 21
    (1-based). ``hex(substring(bytes))`` -> ``conv(_, 16, 10)`` reads the
    ints JVM-side, so a 100 TB scan extracting dimensions never leaves
    whole-stage codegen and never materializes decoded pixels. Non-PNG
    payloads yield ``is_png = false`` and null dimensions.
    """
    payload = F.col(payload_col)
    magic = F.upper(F.hex(F.substring(payload, 1, 8)))

    def be_int(offset: int) -> F.Column:
        return F.conv(F.hex(F.substring(payload, offset, 4)), 16, 10).cast("int")

    is_png = (magic == PNG_MAGIC_HEX) & (F.length(payload) >= 24)
    return df.select(
        "*",
        is_png.alias("is_png"),
        F.when(is_png, be_int(17)).alias("png_width"),
        F.when(is_png, be_int(21)).alias("png_height"),
    )


def require_decoder(kind: str) -> None:
    """Where a real decoder plugs in. The v1 container ships no media
    libraries, so real decoding is explicitly unimplemented."""
    raise NotImplementedError(
        f"No {kind} decoder available in this environment. Plug a real "
        f"decoder (PIL / torchaudio / pyav) into decode_image_features's "
        f"inner loop; schema and batching are already in place."
    )


def decode_image_features(
    df: DataFrame, *, n_features: int = 8, use_real_decoder: bool = False
) -> DataFrame:
    """Arrow-batched 'decode + feature extract' over binary payloads.

    With ``use_real_decoder=False`` (the only mode that works in this
    container) features are a deterministic fake: byte-histogram moments of
    the payload, so tests can assert exact values and batch shapes.
    """

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if use_real_decoder:
                require_decoder("image")
            payloads = pdf["payload"]
            feats = []
            for raw in payloads:
                b = bytes(raw)
                # deterministic fake features: length + evenly-strided bytes
                stride = max(1, len(b) // (n_features - 1)) if b else 1
                vec = [float(len(b))] + [
                    float(b[min(i * stride, len(b) - 1)]) if b else 0.0
                    for i in range(n_features - 1)
                ]
                feats.append(vec)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "mime": [m["mime"] for m in pdf["meta"]],
                    "n_bytes": [int(m["n_bytes"]) for m in pdf["meta"]],
                    "feat": feats,
                }
            )

    return df.mapInPandas(decode, schema=FEATURE_SCHEMA)


def sample_frames(
    df: DataFrame, *, every_n_bytes: int = 64, max_frames: int = 4
) -> DataFrame:
    """'Frame sampling' plumbing: explode each payload into up to
    ``max_frames`` fixed-stride byte windows (stand-ins for video frames).
    Pure built-in expressions — the explode/schema/partitioning pattern a
    real frame sampler would use, with the codec stubbed out."""
    n = F.least(
        F.lit(max_frames),
        F.greatest((F.length("payload") / every_n_bytes).cast("int"), F.lit(1)),
    )
    frames = F.transform(
        F.sequence(F.lit(0), n - 1),
        lambda i: F.struct(
            i.alias("frame_idx"),
            F.substring(
                F.col("payload").cast("string"), i * every_n_bytes + 1, every_n_bytes
            ).alias("frame_bytes"),
        ),
    )
    return df.select("doc_id", F.explode(frames).alias("frame")).select(
        "doc_id", "frame.frame_idx", "frame.frame_bytes"
    )

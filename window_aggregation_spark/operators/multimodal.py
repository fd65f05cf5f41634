"""Multimodal column plumbing: images/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched pandas iterators.

The Spark-side machinery here is real and tested — binary payload columns,
a typed metadata struct, ``mapInPandas`` operators with explicit output
schemas and bounded batch sizes. IMAGE decoding is real too:
``decode_image_features(use_real_decoder=True)`` decodes pixels via PIL
when importable, else the stdlib zlib PNG decoder (:func:`decode_png`) —
no codec library required. The oracle-stable default keeps deterministic
byte-derived fake features so the correctness gate stays engine-neutral.
AUDIO decoding is real for PCM/WAV: :func:`decode_wav_features` parses
the RIFF container with the stdlib ``wave`` module and emits per-payload
sample statistics (no codec library required; other formats would plug
torchaudio into the same seam). Video decoding remains explicitly
unimplemented (:func:`require_decoder`): those codecs genuinely aren't
in the container, and the seam shows exactly where pyav plugs in —
swapping the inner function body, never the schema/partitioning/batch
shape.

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


def extract_wav_meta(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Parse audio metadata out of a binary column with pure built-in
    expressions — the audio sibling of :func:`extract_png_meta` (the
    codegen header peek; full sample decode is :func:`decode_wav_features`).

    Contract: the CANONICAL 44-byte PCM layout only — ``RIFF`` at 1,
    ``WAVE`` at 9, and the ``fmt `` chunk immediately at 13 (files with
    LIST/INFO chunks before ``fmt `` yield ``is_wav = false`` rather than
    misread fields). WAV integers are little-endian, so each field is
    summed from per-byte ``conv(hex(substring(...)))`` terms — everything
    stays in whole-stage codegen across a 100 TB scan.
    """
    payload = F.col(payload_col)

    def tag(offset: int, hex_magic: str) -> F.Column:
        n = len(hex_magic) // 2
        return F.upper(F.hex(F.substring(payload, offset, n))) == hex_magic

    def byte_at(offset: int) -> F.Column:
        return F.conv(F.hex(F.substring(payload, offset, 1)), 16, 10).cast(
            "long"
        )

    def le_int(offset: int, nbytes: int) -> F.Column:
        val = byte_at(offset)
        for i in range(1, nbytes):
            val = val + byte_at(offset + i) * F.lit(256**i)
        return val.cast("int")

    is_wav = (
        tag(1, "52494646")        # "RIFF"
        & tag(9, "57415645")      # "WAVE"
        & tag(13, "666D7420")     # "fmt "
        & (F.length(payload) >= 36)
    )
    return df.select(
        "*",
        is_wav.alias("is_wav"),
        F.when(is_wav, le_int(23, 2)).alias("wav_channels"),
        F.when(is_wav, le_int(25, 4)).alias("wav_sample_rate"),
        F.when(is_wav, le_int(35, 2)).alias("wav_bits_per_sample"),
    )


def extract_gif_meta(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """GIF dimensions from the fixed logical-screen descriptor: magic
    ``GIF87a``/``GIF89a`` then width/height as little-endian uint16 at
    1-based offsets 7 and 9 — fixed offsets, so the parse is sound (no
    marker scanning) and pure codegen like the PNG/WAV siblings."""
    payload = F.col(payload_col)

    def byte_at(offset: int) -> F.Column:
        return F.conv(F.hex(F.substring(payload, offset, 1)), 16, 10).cast(
            "long"
        )

    def le16(offset: int) -> F.Column:
        return (byte_at(offset) + byte_at(offset + 1) * F.lit(256)).cast("int")

    magic = F.upper(F.hex(F.substring(payload, 1, 6)))
    is_gif = magic.isin("474946383761", "474946383961") & (
        F.length(payload) >= 10
    )
    return df.select(
        "*",
        is_gif.alias("is_gif"),
        F.when(is_gif, le16(7)).alias("gif_width"),
        F.when(is_gif, le16(9)).alias("gif_height"),
    )


def extract_mp4_meta(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """MP4/ISO-BMFF detection from the fixed-position ``ftyp`` box: the
    box type lives at 1-based offset 5 and the major brand at 9 — both
    fixed by the spec, so detection + brand are sound codegen
    expressions. Duration/dimensions live in the variable-position
    ``moov`` tree, which a fixed-offset parse cannot reach soundly —
    those stay behind :func:`require_decoder` with the sample decoders."""
    payload = F.col(payload_col)
    is_mp4 = (
        F.upper(F.hex(F.substring(payload, 5, 4))) == "66747970"  # "ftyp"
    ) & (F.length(payload) >= 12)
    brand = F.decode(F.substring(payload, 9, 4), "US-ASCII")
    return df.select(
        "*",
        is_mp4.alias("is_mp4"),
        F.when(is_mp4, F.trim(brand)).alias("mp4_brand"),
    )


def require_decoder(kind: str) -> None:
    """Where a real decoder plugs in. Image decoding IS implemented (PIL
    when importable, else the stdlib PNG decoder below), audio PCM/WAV
    decoding with the stdlib ``wave`` module (:func:`decode_wav_features`),
    and video for uncompressed-DIB AVI with a stdlib RIFF parser
    (:func:`decode_avi_features`; MJPEG frames additionally decode when
    PIL is importable — per-frame JPEG through the image seam). Codecs
    beyond those (H.264 etc.) raise per payload inside the decode body;
    pyav would plug into the same mapInPandas seam."""
    if kind in ("image", "audio", "video"):
        return
    raise NotImplementedError(
        f"No {kind} decoder available in this environment. Plug a real "
        f"decoder (pyav) into a mapInPandas body like "
        f"decode_image_features's; schema and batching are already in place."
    )


_PNG_SIG = b"\x89PNG\r\n\x1a\x0a"
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # grey, RGB, grey+A, RGBA


def decode_png(data: bytes) -> "np.ndarray":
    """Pure-stdlib PNG decoder (zlib + numpy): 8-bit depth, all five scanline
    filters, greyscale/RGB/(+alpha), non-interlaced. Returns HxWxC uint8.

    This exists so 'real decode' is not a stub even in codec-free
    containers — PNG needs only zlib, which is stdlib. It is the per-row
    fallback inside an Arrow batch, not a scale claim: at 100 TB the hot
    path is the codegen header parse (:func:`extract_png_meta`), and full
    pixel decode belongs to an optimized library (PIL takes over whenever
    it is importable). Exotic shapes (16-bit, palette, interlaced) raise
    ``NotImplementedError`` rather than silently mis-decoding.
    """
    import struct
    import zlib

    import numpy as np

    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, ihdr, idat = 8, None, []
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        ctype = data[pos + 4:pos + 8]
        chunk = data[pos + 8:pos + 8 + length]
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", chunk)
        elif ctype == b"IDAT":
            idat.append(chunk)
        elif ctype == b"IEND":
            break
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, depth, color, _comp, _filt, interlace = ihdr
    channels = _PNG_CHANNELS.get(color)
    if channels is None or depth != 8 or interlace:
        raise NotImplementedError(
            f"decode_png handles 8-bit non-interlaced grey/RGB/alpha only "
            f"(got depth={depth}, color_type={color}, interlace={interlace})"
        )
    raw = zlib.decompress(b"".join(idat))
    stride, bpp = w * channels, channels
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG scanline data has unexpected length")
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        f = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).copy()
        if f == 0:  # None
            pass
        elif f == 2:  # Up (uint8 wrap-around IS the spec's mod-256)
            line += prev
        elif f in (1, 3, 4):  # Sub / Average / Paeth: left-recursive
            for x in range(stride):
                left = int(line[x - bpp]) if x >= bpp else 0
                up = int(prev[x])
                if f == 1:
                    pred = left
                elif f == 3:
                    pred = (left + up) // 2
                else:
                    ul = int(prev[x - bpp]) if x >= bpp else 0
                    p = left + up - ul
                    pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                    pred = left if pa <= pb and pa <= pc else (
                        up if pb <= pc else ul
                    )
                line[x] = (int(line[x]) + pred) % 256
        else:
            raise ValueError(f"unknown PNG filter type {f}")
        out[y] = prev = line
    return out.reshape(h, w, channels)


def get_image_decoder():
    """The pluggable decode step: PIL when importable (any format), else
    :func:`decode_png` (stdlib, PNG only). Returns ``bytes -> HxWxC uint8``.
    """
    try:
        import io

        from PIL import Image  # optional dependency, never required

        import numpy as np

        def pil_decode(b: bytes) -> "np.ndarray":
            arr = np.asarray(Image.open(io.BytesIO(b)))
            return arr[:, :, None] if arr.ndim == 2 else arr

        return pil_decode
    except ImportError:
        return decode_png


def get_jpeg_decoder():
    """JPEG decode step for MJPEG frames: PIL when importable (libjpeg,
    the fast path), else the repo's own baseline-sequential decoder
    (``jpeg_codec.decode_jpeg_baseline`` — numpy+stdlib, real decode,
    cross-checked against libjpeg output in tests). Returns
    ``bytes -> HxWx3 uint8``. Progressive inputs without PIL raise
    ``NotImplementedError`` naming the marker."""
    try:
        import io

        from PIL import Image  # optional dependency, never required

        import numpy as np

        def pil_decode(b: bytes) -> "np.ndarray":
            arr = np.asarray(Image.open(io.BytesIO(b)).convert("RGB"))
            return arr

        return pil_decode
    except ImportError:
        from window_aggregation_spark.operators.jpeg_codec import (
            decode_jpeg_baseline,
        )

        return decode_jpeg_baseline


def decode_image_features(
    df: DataFrame, *, n_features: int = 8, use_real_decoder: bool = False
) -> DataFrame:
    """Arrow-batched 'decode + feature extract' over binary payloads.

    With ``use_real_decoder=False`` (the oracle-stable default) features
    are a deterministic fake: byte-histogram moments of the payload, so
    tests can assert exact values and batch shapes. With
    ``use_real_decoder=True`` each payload is ACTUALLY decoded
    (:func:`get_image_decoder`: PIL if importable, stdlib PNG otherwise)
    and features are pixel statistics
    ``[width, height, channels, mean, std, min, max, n_bytes]``.
    Either way the plan is identical — same schema, same Arrow batching;
    only the pandas-side inner function changes, which is the whole design
    point of the seam.
    """

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        decoder = None
        if use_real_decoder:
            require_decoder("image")
            decoder = get_image_decoder()
        for pdf in batches:
            payloads = pdf["payload"]
            feats = []
            for raw in payloads:
                b = bytes(raw)
                if decoder is not None:
                    px = decoder(b).astype("float64")
                    h, w, c = px.shape
                    vec = [
                        float(w), float(h), float(c),
                        float(px.mean()), float(px.std()),
                        float(px.min()), float(px.max()),
                        float(len(b)),
                    ][:n_features]
                    feats.append(vec)
                    continue
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


# ---------------------------------------------------------------------------
# Audio: real PCM/WAV decode — stdlib wave/struct, no codec library needed
# ---------------------------------------------------------------------------

AUDIO_FEATURE_SCHEMA = (
    "doc_id long, sample_rate int, n_channels int, n_frames long, "
    "n_bytes long, smean double, srms double, smin int, smax int"
)


def encode_pcm16_wav(
    samples: "list[int]", sample_rate: int = 16000, n_channels: int = 1
) -> bytes:
    """Encode interleaved int16 samples into a canonical 44-byte-header
    RIFF/WAVE container via the stdlib ``wave`` module. The inverse of
    :func:`decode_wav_features`'s parse — tests round-trip through it."""
    import io
    import struct
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(n_channels)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(struct.pack(f"<{len(samples)}h", *samples))
    return buf.getvalue()


def synth_wav_payloads(
    df: DataFrame, id_col: str = "doc_id", *, sample_rate: int = 16000
) -> DataFrame:
    """Deterministic WAV corpus builder: one mono PCM16 payload per id with
    ``n = 256 + id % 64`` frames, ``sample[i] = (id·31 + i·7) mod 65536 −
    32768``. The formula (not the container) is what a SQL oracle
    recomputes, so the REAL byte round-trip — stdlib ``wave`` encode here,
    ``wave`` decode in :func:`decode_wav_features` — is value-checked
    end-to-end: any container/parse bug shows up as a feature mismatch."""

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            payloads = []
            for did in ids:
                n = 256 + int(did) % 64
                samples = [
                    (int(did) * 31 + i * 7) % 65536 - 32768 for i in range(n)
                ]
                payloads.append(encode_pcm16_wav(samples, sample_rate))
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return df.select(F.col(id_col).cast("long").alias(id_col)).mapInPandas(
        synth, schema="doc_id long, payload binary"
    )


def decode_wav_features(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """REAL audio decode over binary WAV payloads: the stdlib ``wave``
    module parses the RIFF container (any chunk layout, not just the
    44-byte canonical one the codegen header peek
    :func:`extract_wav_meta` handles), PCM16 frames are vectorized
    through numpy, and per-payload sample statistics come out as typed
    columns. Arrow-batched ``mapInPandas`` like the image path — memory
    bounded by batch size × payload size; malformed payloads raise
    (``ValueError``) rather than emitting garbage rows.

    Stats are over all interleaved samples (all channels). Only PCM16 is
    decoded — other sample widths raise ``NotImplementedError`` honestly.
    """

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io
        import wave

        import numpy as np

        for pdf in batches:
            out = {k: [] for k in (
                "doc_id", "sample_rate", "n_channels", "n_frames",
                "n_bytes", "smean", "srms", "smin", "smax",
            )}
            for did, raw in zip(pdf[id_col], pdf[payload_col]):
                if raw is None:
                    raise ValueError(
                        f"doc_id={did}: null WAV payload (upstream fetch "
                        f"failure?) — refusing to emit a garbage row"
                    )
                b = bytes(raw)
                try:
                    with wave.open(io.BytesIO(b), "rb") as w:
                        if w.getsampwidth() != 2:
                            raise NotImplementedError(
                                f"PCM16 only (got sampwidth="
                                f"{w.getsampwidth()})"
                            )
                        nf = w.getnframes()
                        nch = w.getnchannels()
                        frames = w.readframes(nf)
                        # A truncated data chunk would otherwise emit an
                        # n_frames (from the header) inconsistent with the
                        # samples actually decoded — enforce the "malformed
                        # payloads raise" contract instead.
                        if len(frames) != nf * nch * 2:
                            raise ValueError(
                                f"doc_id={did}: WAV data chunk truncated "
                                f"(header claims {nf} frames x {nch} ch, "
                                f"got {len(frames)} bytes)"
                            )
                        out["sample_rate"].append(int(w.getframerate()))
                        out["n_channels"].append(int(nch))
                        out["n_frames"].append(int(nf))
                except wave.Error as e:
                    raise ValueError(
                        f"doc_id={did}: not a decodable WAV payload: {e}"
                    ) from e
                x = np.frombuffer(frames, dtype="<i2").astype("float64")
                if x.size == 0:
                    raise ValueError(f"doc_id={did}: WAV has no samples")
                out["doc_id"].append(int(did))
                out["n_bytes"].append(len(b))
                out["smean"].append(float(x.sum() / x.size))
                out["srms"].append(
                    float(np.sqrt(np.dot(x, x) / x.size))
                )
                out["smin"].append(int(x.min()))
                out["smax"].append(int(x.max()))
            yield pd.DataFrame(out)

    return df.mapInPandas(decode, schema=AUDIO_FEATURE_SCHEMA)


# ---------------------------------------------------------------------------
# Video: real RIFF/AVI decode — stdlib struct walker, uncompressed-DIB
# frames decoded directly (MJPEG '00dc' frames route through the image
# decoder, which needs PIL for JPEG). No codec library required for DIB.
# ---------------------------------------------------------------------------

VIDEO_FEATURE_SCHEMA = (
    "doc_id long, width int, height int, fps double, n_frames long, "
    "n_bytes long, pmean double, prms double, pmin int, pmax int"
)


def encode_avi_dib(
    frames: "list", fps: int = 10
) -> bytes:
    """Encode HxWx3 uint8 RGB frames into a minimal-but-valid RIFF AVI
    with uncompressed bottom-up BGR DIB frames ('00db' chunks, BI_RGB,
    rows padded to 4 bytes) + an idx1 index — the same container layout
    mainstream muxers emit for raw video. The inverse of
    :func:`decode_avi_features`'s parse; tests round-trip pixel arrays
    through the pair."""
    import struct

    import numpy as np

    if not frames:
        raise ValueError("encode_avi_dib needs at least one frame")
    h, w, c = np.asarray(frames[0]).shape
    if c != 3:
        raise ValueError("encode_avi_dib encodes 3-channel RGB frames")
    row = w * 3
    stride = (row + 3) & ~3
    dib_size = stride * h

    def chunk(fourcc: bytes, payload: bytes) -> bytes:
        pad = b"\x00" if len(payload) % 2 else b""
        return fourcc + struct.pack("<I", len(payload)) + payload + pad

    def lst(subtype: bytes, payload: bytes) -> bytes:
        return chunk(b"LIST", subtype + payload)

    n = len(frames)
    avih = struct.pack(
        "<14I",
        1_000_000 // fps,        # dwMicroSecPerFrame
        dib_size * fps,          # dwMaxBytesPerSec
        0, 0x10,                 # padding granularity, AVIF_HASINDEX
        n, 0, 1, dib_size,       # total frames, initial, streams, bufsize
        w, h, 0, 0, 0, 0,        # width, height, reserved[4]
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIII4H",
        b"vids", b"DIB ", 0, 0, 0, 0,
        1, fps,                  # dwScale, dwRate -> fps = rate/scale
        0, n, dib_size, 0xFFFFFFFF, dib_size,
        0, 0, w, h,              # rcFrame
    )
    strf = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, dib_size, 0, 0, 0, 0
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi_frames = []
    for fr in frames:
        px = np.asarray(fr, dtype=np.uint8)
        if px.shape != (h, w, 3):
            raise ValueError("all frames must share one HxWx3 shape")
        bgr = px[::-1, :, ::-1]  # bottom-up rows, RGB->BGR
        rows = np.zeros((h, stride), dtype=np.uint8)
        rows[:, :row] = bgr.reshape(h, row)
        movi_frames.append(chunk(b"00db", rows.tobytes()))
    movi = lst(b"movi", b"".join(movi_frames))
    # idx1: one entry per frame — offset is from the start of the 'movi'
    # subtype fourcc (offset 4 within the LIST payload), per the spec.
    entries, off = [], 4
    for _ in range(n):
        entries.append(struct.pack("<4sII I", b"00db", 0x10, off, dib_size))
        off += 8 + dib_size + (dib_size % 2)
    idx1 = chunk(b"idx1", b"".join(entries))
    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body


def synth_avi_payloads(
    df: DataFrame, id_col: str = "doc_id", *, width: int = 8,
    height: int = 6, fps: int = 10
) -> DataFrame:
    """Deterministic AVI corpus builder: one raw-DIB video per id with
    ``n = 2 + id % 3`` frames and ``pixel[f,y,x,c] = (id*31 + f*17 + y*5
    + x*3 + c) mod 256`` (RGB). The FORMULA (not the container) is what
    the SQL oracle recomputes, so the real byte round-trip — RIFF mux
    here, RIFF parse in :func:`decode_avi_features` — is value-checked
    end-to-end, the same contract as :func:`synth_wav_payloads`."""

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            payloads = []
            f_ = np.arange(height * width * 3)
            yxc = np.stack(
                np.meshgrid(
                    np.arange(height), np.arange(width), np.arange(3),
                    indexing="ij",
                ),
                axis=-1,
            )  # (h, w, 3, 3) of (y, x, c)
            base = yxc[..., 0] * 5 + yxc[..., 1] * 3 + yxc[..., 2]
            del f_
            for did in ids:
                n = 2 + int(did) % 3
                frames = [
                    ((int(did) * 31 + f * 17 + base) % 256).astype("uint8")
                    for f in range(n)
                ]
                payloads.append(encode_avi_dib(frames, fps=fps))
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return df.select(F.col(id_col).cast("long").alias(id_col)).mapInPandas(
        synth, schema="doc_id long, payload binary"
    )


def encode_avi_mjpeg(
    frames: "list", fps: int = 10, quality: int = 90
) -> bytes:
    """Encode HxWx3 uint8 RGB frames into a RIFF AVI with MJPEG frames
    ('00dc' chunks, fccHandler/biCompression 'MJPG') — the most common
    real-world AVI flavor. Every frame is an independent baseline JPEG
    from ``jpeg_codec.encode_jpeg_baseline`` DELIBERATELY (not PIL even
    when importable): fixture payload bytes must be identical on every
    platform, and PIL-or-not must never change what the suite hashes.
    :func:`decode_avi_features` decodes these through the same
    :func:`get_jpeg_decoder` seam that handles camera MJPEG."""
    import struct

    import numpy as np

    from window_aggregation_spark.operators.jpeg_codec import (
        encode_jpeg_baseline,
    )

    if not frames:
        raise ValueError("encode_avi_mjpeg needs at least one frame")
    h, w, c = np.asarray(frames[0]).shape
    if c != 3:
        raise ValueError("encode_avi_mjpeg encodes 3-channel RGB frames")

    def chunk(fourcc: bytes, payload: bytes) -> bytes:
        pad = b"\x00" if len(payload) % 2 else b""
        return fourcc + struct.pack("<I", len(payload)) + payload + pad

    def lst(subtype: bytes, payload: bytes) -> bytes:
        return chunk(b"LIST", subtype + payload)

    jpegs = []
    for fr in frames:
        px = np.asarray(fr, dtype=np.uint8)
        if px.shape != (h, w, 3):
            raise ValueError("all frames must share one HxWx3 shape")
        jpegs.append(encode_jpeg_baseline(px, quality=quality))
    n = len(jpegs)
    bufsize = max(len(j) for j in jpegs)
    avih = struct.pack(
        "<14I",
        1_000_000 // fps,
        bufsize * fps,
        0, 0x10,
        n, 0, 1, bufsize,
        w, h, 0, 0, 0, 0,
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIII4H",
        b"vids", b"MJPG", 0, 0, 0, 0,
        1, fps,
        0, n, bufsize, 0xFFFFFFFF, bufsize,
        0, 0, w, h,
    )
    # BITMAPINFOHEADER with biCompression = 'MJPG' fourcc (not BI_RGB)
    strf = struct.pack(
        "<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG", bufsize, 0, 0, 0, 0
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih)
        + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi = lst(b"movi", b"".join(chunk(b"00dc", j) for j in jpegs))
    entries, off = [], 4
    for j in jpegs:
        entries.append(struct.pack("<4sIII", b"00dc", 0x10, off, len(j)))
        off += 8 + len(j) + (len(j) % 2)
    idx1 = chunk(b"idx1", b"".join(entries))
    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body


def synth_mjpeg_payloads(
    df: DataFrame, id_col: str = "doc_id", *, width: int = 16,
    height: int = 16, fps: int = 10, quality: int = 90
) -> DataFrame:
    """Deterministic MJPEG-AVI corpus builder — the compressed twin of
    :func:`synth_avi_payloads`, same structural formula (``n = 2 +
    id % 3`` frames) but a SMOOTH pixel field ``pixel[f,y,x,c] =
    (id*7 + f*11 + y*3 + x*2 + 40*c) mod 160 + 48`` (no mod-256 wrap
    edges, values away from clip range) so baseline-JPEG round-trip
    error stays within a small, testable bound. Structural features
    (width/height/fps/n_frames) survive compression EXACTLY; pixel
    statistics survive within the bound the suite's in-bound flags pin
    (same bounded-error-oracle pattern as ``w_approx_percentile``)."""

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        yxc = np.stack(
            np.meshgrid(
                np.arange(height), np.arange(width), np.arange(3),
                indexing="ij",
            ),
            axis=-1,
        )
        base = yxc[..., 0] * 3 + yxc[..., 1] * 2 + yxc[..., 2] * 40
        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            payloads = []
            for did in ids:
                n = 2 + int(did) % 3
                frames = [
                    ((int(did) * 7 + f * 11 + base) % 160 + 48).astype(
                        "uint8"
                    )
                    for f in range(n)
                ]
                payloads.append(
                    encode_avi_mjpeg(frames, fps=fps, quality=quality)
                )
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return df.select(F.col(id_col).cast("long").alias(id_col)).mapInPandas(
        synth, schema="doc_id long, payload binary"
    )


def mjpeg_formula_moments(
    spark, *, width: int = 16, height: int = 16
):
    """Exact mean/rms of :func:`synth_mjpeg_payloads`' pixel formula,
    as a 480-row lookup DataFrame ``(__res, __fmean, __frms)`` keyed by
    ``doc_id % 480``: ``(id*7 + f*11 + y*3 + x*2 + 40c) mod 160``
    depends on ``id`` only through ``id mod 160`` along ``7*id`` (and
    ``7*480`` is a multiple of 160), while the frame count ``2 + id%3``
    has period 3 — lcm-compatible at 480. Built driver-side in numpy
    (tiny, deterministic) and broadcast, so the in-bound yardstick costs
    O(1) however large the corpus."""
    import numpy as np

    yxc = np.stack(
        np.meshgrid(
            np.arange(height), np.arange(width), np.arange(3),
            indexing="ij",
        ),
        axis=-1,
    )
    base = yxc[..., 0] * 3 + yxc[..., 1] * 2 + yxc[..., 2] * 40
    rows = []
    for res in range(480):
        n = 2 + res % 3
        x = np.concatenate([
            ((res * 7 + f * 11 + base) % 160 + 48)
            .reshape(-1).astype(np.float64)
            for f in range(n)
        ])
        rows.append(
            (res, float(x.mean()), float(np.sqrt(np.dot(x, x) / x.size)))
        )
    return spark.createDataFrame(rows, "__res int, __fmean double, __frms double")


def _iter_riff_chunks(b: bytes, start: int, end: int):
    """Yield (fourcc, payload_start, payload_size) for the chunks of a
    RIFF region; chunks are word-aligned (odd sizes pad one byte)."""
    import struct

    pos = start
    while pos + 8 <= end:
        fourcc = b[pos:pos + 4]
        (size,) = struct.unpack("<I", b[pos + 4:pos + 8])
        if pos + 8 + size > end:
            raise ValueError(
                f"RIFF chunk {fourcc!r} overruns its parent region"
            )
        yield fourcc, pos + 8, size
        pos += 8 + size + (size % 2)


def _iter_movi_chunks(b: bytes, start: int, end: int):
    """Yield the data chunks of a ``movi`` region, descending into
    ``rec `` LISTs (interleave groups mainstream muxers wrap around
    frame+audio chunks) so frames inside them are not skipped."""
    for fourcc, p0, size in _iter_riff_chunks(b, start, end):
        if fourcc == b"LIST" and b[p0:p0 + 4] == b"rec ":
            yield from _iter_movi_chunks(b, p0 + 4, p0 + size)
        else:
            yield fourcc, p0, size


def decode_avi_features(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """REAL video decode over binary AVI payloads: a stdlib ``struct``
    RIFF walker (the WAV pattern one level up in chunk nesting) parses
    hdrl/strl for dimensions + fps, then decodes every frame in the
    ``movi`` list — '00db' uncompressed DIB frames directly (bottom-up
    BGR, stride-padded rows, BI_RGB only), '00dc' compressed frames
    through :func:`get_jpeg_decoder` (MJPEG = per-frame JPEG: PIL when
    importable, else the repo's baseline JPEG decoder in
    ``jpeg_codec.py`` — real decode either way).
    Emits per-payload pixel statistics over all frames as typed columns.

    Same Arrow-batched ``mapInPandas`` seam as the image/audio decoders:
    memory is batch size x payload size, malformed payloads raise with
    the offending ``doc_id`` rather than emitting garbage rows. A pyav
    integration for real codecs would replace only the inner per-frame
    branch — schema, batching and statistics stay as they are.
    """

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct

        import numpy as np

        # resolved once per task, on the first compressed frame — a
        # failed PIL import is NOT cached by Python, so calling
        # get_jpeg_decoder per frame would re-scan sys.path every frame
        jpeg_decode = None
        for pdf in batches:
            out = {k: [] for k in (
                "doc_id", "width", "height", "fps", "n_frames",
                "n_bytes", "pmean", "prms", "pmin", "pmax",
            )}
            for did, raw in zip(pdf[id_col], pdf[payload_col]):
                if raw is None:
                    raise ValueError(f"doc_id={did}: null AVI payload")
                b = bytes(raw)
                if b[:4] != b"RIFF" or b[8:12] != b"AVI ":
                    raise ValueError(f"doc_id={did}: not a RIFF/AVI payload")
                (riff_size,) = struct.unpack("<I", b[4:8])
                if 8 + riff_size > len(b):
                    raise ValueError(f"doc_id={did}: truncated AVI payload")
                w = h = None
                scale = rate = None
                compression = None
                frames_px = []
                for fcc, p0, sz in _iter_riff_chunks(b, 12, 8 + riff_size):
                    if fcc != b"LIST":
                        continue
                    subtype = b[p0:p0 + 4]
                    if subtype == b"hdrl":
                        for f2, q0, s2 in _iter_riff_chunks(b, p0 + 4, p0 + sz):
                            if f2 == b"avih":
                                vals = struct.unpack("<14I", b[q0:q0 + 56])
                                w, h = vals[8], vals[9]
                            elif f2 == b"LIST" and b[q0:q0 + 4] == b"strl":
                                # strh precedes strf within a strl; only
                                # the VIDEO stream's strf is a
                                # BITMAPINFOHEADER — an audio strl's strf
                                # (WAVEFORMATEX) must not overwrite
                                # `compression` with garbage
                                is_vids = False
                                for f3, r0, s3 in _iter_riff_chunks(
                                    b, q0 + 4, q0 + s2
                                ):
                                    if f3 == b"strh":
                                        is_vids = b[r0:r0 + 4] == b"vids"
                                        if is_vids:
                                            sh = struct.unpack(
                                                "<4s4sIHHIIIIIIII4H",
                                                b[r0:r0 + 56],
                                            )
                                            scale, rate = sh[6], sh[7]
                                    elif f3 == b"strf" and is_vids:
                                        bi = struct.unpack(
                                            "<IiiHHI", b[r0:r0 + 20]
                                        )
                                        compression = bi[5]
                    elif subtype == b"movi":
                        for f2, q0, s2 in _iter_movi_chunks(b, p0 + 4, p0 + sz):
                            if f2.endswith(b"db"):  # uncompressed DIB
                                if w is None or h is None:
                                    raise ValueError(
                                        f"doc_id={did}: movi before hdrl"
                                    )
                                if compression not in (None, 0):
                                    raise NotImplementedError(
                                        f"doc_id={did}: biCompression="
                                        f"{compression} in a '..db' chunk "
                                        f"(BI_RGB only)"
                                    )
                                stride = (w * 3 + 3) & ~3
                                if s2 != stride * h:
                                    raise ValueError(
                                        f"doc_id={did}: DIB frame is {s2} "
                                        f"bytes, expected {stride * h}"
                                    )
                                rows = np.frombuffer(
                                    b, dtype=np.uint8, count=s2, offset=q0
                                ).reshape(h, stride)
                                bgr = rows[:, : w * 3].reshape(h, w, 3)
                                frames_px.append(bgr[::-1, :, ::-1])
                            elif f2.endswith(b"dc"):  # compressed (MJPEG)
                                # per-frame JPEGs: PIL/libjpeg when
                                # importable, else the repo's baseline
                                # JPEG decoder (jpeg_codec.py) — real
                                # decode either way
                                if jpeg_decode is None:
                                    jpeg_decode = get_jpeg_decoder()
                                frames_px.append(jpeg_decode(b[q0:q0 + s2]))
                if not frames_px:
                    raise ValueError(f"doc_id={did}: AVI has no video frames")
                x = np.concatenate(
                    [f.reshape(-1).astype("float64") for f in frames_px]
                )
                out["doc_id"].append(int(did))
                out["width"].append(int(w))
                out["height"].append(int(h))
                out["fps"].append(
                    float(rate) / float(scale) if scale else 0.0
                )
                out["n_frames"].append(len(frames_px))
                out["n_bytes"].append(len(b))
                out["pmean"].append(float(x.sum() / x.size))
                out["prms"].append(float(np.sqrt(np.dot(x, x) / x.size)))
                out["pmin"].append(int(x.min()))
                out["pmax"].append(int(x.max()))
            yield pd.DataFrame(out)

    return df.mapInPandas(decode, schema=VIDEO_FEATURE_SCHEMA)


def resize_images(
    df: DataFrame,
    *,
    out_h: int,
    out_w: int,
    payload_col: str = "payload",
    id_col: str = "doc_id",
) -> DataFrame:
    """REAL image resize over binary payloads: decode
    (:func:`get_image_decoder` — PIL when importable, stdlib PNG
    otherwise), nearest-neighbor resample with the deterministic integer
    index map ``src = floor(dst * in / out)`` (no interpolation, so the
    output is bit-identical across PIL and the stdlib decoder), and emit
    the raw interleaved HxWxC uint8 bytes plus dimensions — the standard
    pre-embedding normalization step of a multimodal pipeline.

    Arrow-batched ``mapInPandas`` like the other decode stages; a
    malformed or null payload raises with the offending ``doc_id``
    rather than emitting a garbage row. Output payload size is exactly
    ``out_h * out_w * channels`` bytes.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        decoder = get_image_decoder()
        for pdf in batches:
            out = {k: [] for k in ("doc_id", "height", "width",
                                   "channels", "pixels")}
            for did, raw in zip(pdf[id_col], pdf[payload_col]):
                if raw is None:
                    raise ValueError(f"doc_id={did}: null image payload")
                try:
                    px = decoder(bytes(raw))
                except Exception as e:
                    raise ValueError(
                        f"doc_id={did}: undecodable image payload: {e}"
                    ) from e
                h, w, c = px.shape
                ys = (np.arange(out_h) * h) // out_h
                xs = (np.arange(out_w) * w) // out_w
                resized = px[ys][:, xs]
                out["doc_id"].append(int(did))
                out["height"].append(out_h)
                out["width"].append(out_w)
                out["channels"].append(int(c))
                out["pixels"].append(resized.astype("uint8").tobytes())
            yield pd.DataFrame(out)

    return df.mapInPandas(
        run,
        schema="doc_id long, height int, width int, channels int, "
               "pixels binary",
    )

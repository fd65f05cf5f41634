"""Real image decode behind the multimodal seam: the stdlib PNG decoder
(all five scanline filters) and the end-to-end Spark path — real PNG bytes
through decode_image_features(use_real_decoder=True), dimensions matching
the codegen header parse and pixel stats matching numpy ground truth."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from window_aggregation_spark.operators import multimodal as mm


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def encode_png(arr: np.ndarray, filter_type: int = 0) -> bytes:
    """Reference PNG encoder (test-side inverse of mm.decode_png): 8-bit
    HxWxC with one filter type applied to every scanline."""
    h, w, c = arr.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    a = arr.astype(np.int16)
    raw = bytearray()
    prev = np.zeros((w, c), np.int16)
    for y in range(h):
        line = a[y]
        left = np.vstack([np.zeros((1, c), np.int16), line[:-1]])
        if filter_type == 0:
            enc = line
        elif filter_type == 1:
            enc = line - left
        elif filter_type == 2:
            enc = line - prev
        elif filter_type == 3:
            enc = line - (left + prev) // 2
        elif filter_type == 4:
            ul = np.vstack([np.zeros((1, c), np.int16), prev[:-1]])
            p = left + prev - ul
            pa, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - ul)
            pred = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, ul)
            )
            enc = line - pred
        else:
            raise ValueError(filter_type)
        raw += bytes([filter_type]) + (enc % 256).astype(np.uint8).tobytes()
        prev = line
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\x0a"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
@pytest.mark.parametrize("channels", [1, 3, 4])
def test_decode_png_roundtrip_all_filters(filter_type, channels):
    rng = np.random.default_rng(42 + filter_type + 10 * channels)
    arr = rng.integers(0, 256, size=(13, 7, channels), dtype=np.uint8)
    decoded = mm.decode_png(encode_png(arr, filter_type))
    np.testing.assert_array_equal(decoded, arr)


def test_decode_png_rejects_unsupported_shapes():
    arr = np.zeros((4, 4, 3), dtype=np.uint8)
    png = bytearray(encode_png(arr))
    # flip bit depth to 16 inside IHDR (offset: 8 sig + 8 hdr + 8 w/h)
    png[8 + 8 + 8] = 16
    with pytest.raises(NotImplementedError, match="8-bit"):
        mm.decode_png(bytes(png))
    with pytest.raises(ValueError, match="not a PNG"):
        mm.decode_png(b"plainly not an image")


def test_real_decode_end_to_end_matches_header_parse(spark):
    """Real PNG bytes through the Arrow-batched decode: per-image feature
    vector [w, h, c, mean, std, min, max, n_bytes] must agree with the
    codegen header parse (extract_png_meta) and with numpy ground truth."""
    rng = np.random.default_rng(7)
    images = {
        1: rng.integers(0, 256, size=(16, 9, 3), dtype=np.uint8),
        2: rng.integers(0, 256, size=(5, 31, 1), dtype=np.uint8),
        3: rng.integers(0, 256, size=(8, 8, 4), dtype=np.uint8),
    }
    rows = []
    for doc_id, arr in images.items():
        png = encode_png(arr, filter_type=doc_id % 5)
        rows.append((doc_id, bytearray(png), ("image/png", len(png))))
    df = spark.createDataFrame(
        rows,
        "doc_id long, payload binary, "
        "meta struct<mime string, n_bytes long>",
    )
    meta = {
        r["doc_id"]: (r["png_width"], r["png_height"])
        for r in mm.extract_png_meta(df).collect()
    }
    feats = {
        r["doc_id"]: r["feat"]
        for r in mm.decode_image_features(df, use_real_decoder=True).collect()
    }
    assert set(feats) == set(images)
    for doc_id, arr in images.items():
        w, h, c = arr.shape[1], arr.shape[0], arr.shape[2]
        f = feats[doc_id]
        assert (f[0], f[1], f[2]) == (float(w), float(h), float(c))
        assert meta[doc_id] == (w, h)  # header parse agrees with decode
        px = arr.astype(np.float64)
        assert f[3] == pytest.approx(px.mean())
        assert f[4] == pytest.approx(px.std())
        assert (f[5], f[6]) == (float(px.min()), float(px.max()))


def test_pil_path_when_available(spark):
    """When PIL is importable the decoder swaps in transparently; skipped in
    codec-free containers (the stdlib PNG path covers those)."""
    pytest.importorskip("PIL")
    arr = np.arange(48, dtype=np.uint8).reshape(4, 4, 3)
    decoded = mm.get_image_decoder()(encode_png(arr))
    np.testing.assert_array_equal(decoded, arr)


def test_wav_header_expression_parse(spark):
    """Canonical PCM WAV headers parse JVM-side (LE fields from per-byte
    conv terms); a LIST-before-fmt layout and non-audio bytes are refused
    rather than misread."""
    import struct

    def wav_header(rate, channels, bits):
        return (
            b"RIFF" + struct.pack("<I", 36) + b"WAVE"
            + b"fmt " + struct.pack("<IHHIIHH", 16, 1, channels, rate,
                                    rate * channels * bits // 8,
                                    channels * bits // 8, bits)
            + b"data" + struct.pack("<I", 0)
        )

    list_first = b"RIFF" + struct.pack("<I", 40) + b"WAVE" + b"LIST" + b"\0" * 24
    rows = [
        (1, wav_header(44100, 2, 16)),
        (2, wav_header(16000, 1, 24)),
        (3, list_first),
        (4, b"not audio at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {
        r["doc_id"]: (
            r["is_wav"], r["wav_channels"], r["wav_sample_rate"],
            r["wav_bits_per_sample"],
        )
        for r in mm.extract_wav_meta(df).collect()
    }
    assert got[1] == (True, 2, 44100, 16)
    assert got[2] == (True, 1, 16000, 24)
    assert got[3] == (False, None, None, None)
    assert got[4] == (False, None, None, None)


def test_gif_header_expression_parse(spark):
    import struct

    gif = b"GIF89a" + struct.pack("<HH", 320, 200) + b"\0\0\0"
    gif87 = b"GIF87a" + struct.pack("<HH", 17, 4000) + b"\0\0\0"
    rows = [(1, gif), (2, gif87), (3, b"PNG\x00 not a gif")]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {
        r["doc_id"]: (r["is_gif"], r["gif_width"], r["gif_height"])
        for r in mm.extract_gif_meta(df).collect()
    }
    assert got[1] == (True, 320, 200)
    assert got[2] == (True, 17, 4000)
    assert got[3] == (False, None, None)


def test_mp4_detection_expression_parse(spark):
    import struct

    mp4 = struct.pack(">I", 20) + b"ftypisom" + b"\0" * 12
    m4a = struct.pack(">I", 20) + b"ftypM4A " + b"\0" * 12
    rows = [(1, mp4), (2, m4a), (3, b"RIFF....WAVE not mp4")]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {
        r["doc_id"]: (r["is_mp4"], r["mp4_brand"])
        for r in mm.extract_mp4_meta(df).collect()
    }
    assert got[1] == (True, "isom")
    assert got[2] == (True, "M4A")
    assert got[3] == (False, None)


def test_wav_real_decode_roundtrip(spark):
    """Encode known int16 samples into a real RIFF container (stdlib wave)
    and decode them back through the Spark operator: every statistic must
    match the numpy ground truth, and the header peek (extract_wav_meta)
    must agree with the full parse."""
    samples = [0, 1000, -1000, 32767, -32768, 7, -7, 0]
    payload = mm.encode_pcm16_wav(samples, sample_rate=8000)
    df = spark.createDataFrame([(1, payload)], "doc_id long, payload binary")
    (row,) = mm.decode_wav_features(df).collect()
    x = np.array(samples, dtype=np.float64)
    assert (row["sample_rate"], row["n_channels"]) == (8000, 1)
    assert row["n_frames"] == len(samples)
    assert row["n_bytes"] == 44 + 2 * len(samples)
    assert row["smean"] == pytest.approx(x.mean())
    assert row["srms"] == pytest.approx(np.sqrt((x * x).mean()))
    assert (row["smin"], row["smax"]) == (-32768, 32767)
    (meta,) = mm.extract_wav_meta(df).collect()
    assert (meta["is_wav"], meta["wav_channels"]) == (True, 1)
    assert meta["wav_sample_rate"] == row["sample_rate"]
    assert meta["wav_bits_per_sample"] == 16


def test_wav_real_decode_stereo_and_errors(spark):
    """Stereo payloads decode with stats over interleaved samples; corrupt
    bytes and truncated containers raise (never emit garbage rows)."""
    stereo = mm.encode_pcm16_wav([100, -100, 200, -200], sample_rate=44100,
                                 n_channels=2)
    df = spark.createDataFrame([(1, stereo)], "doc_id long, payload binary")
    (row,) = mm.decode_wav_features(df).collect()
    assert (row["n_channels"], row["n_frames"]) == (2, 2)
    assert (row["smin"], row["smax"]) == (-200, 200)
    bad = spark.createDataFrame(
        [(2, b"RIFFgarbage-not-a-wave-file")], "doc_id long, payload binary"
    )
    with pytest.raises(Exception, match="WAV|wave|Error"):
        mm.decode_wav_features(bad).collect()


def test_wav_synth_payloads_are_real_containers(spark):
    """synth_wav_payloads emits true canonical WAV bytes: the codegen
    header parse accepts every payload and the deterministic sample
    formula reproduces through the full byte round trip."""
    ids = spark.createDataFrame([(0,), (5,), (63,)], "doc_id long")
    wavs = mm.synth_wav_payloads(ids)
    metas = {r["doc_id"]: r for r in mm.extract_wav_meta(wavs).collect()}
    assert all(m["is_wav"] for m in metas.values())
    feats = {r["doc_id"]: r for r in mm.decode_wav_features(wavs).collect()}
    for did, r in feats.items():
        n = 256 + did % 64
        xs = np.array(
            [(did * 31 + i * 7) % 65536 - 32768 for i in range(n)],
            dtype=np.float64,
        )
        assert r["n_frames"] == n
        assert r["smean"] == pytest.approx(xs.mean())
        assert (r["smin"], r["smax"]) == (int(xs.min()), int(xs.max()))


def test_wav_decode_null_payload_raises_with_doc_id(spark):
    df = spark.createDataFrame(
        [(7, None)], "doc_id long, payload binary"
    )
    with pytest.raises(Exception, match="doc_id=7"):
        mm.decode_wav_features(df).collect()


def test_resize_images_nearest_neighbor_exact(spark):
    """Real PNG -> decode -> nearest-neighbor resize: output pixels must
    equal the numpy index-map ground truth byte-for-byte, and the payload
    size must be exactly out_h * out_w * channels."""
    arr = np.arange(4 * 6 * 3, dtype=np.uint8).reshape(4, 6, 3)
    df = spark.createDataFrame(
        [(1, encode_png(arr))], "doc_id long, payload binary"
    )
    (row,) = mm.resize_images(df, out_h=2, out_w=3).collect()
    assert (row["height"], row["width"], row["channels"]) == (2, 3, 3)
    ys = (np.arange(2) * 4) // 2
    xs = (np.arange(3) * 6) // 3
    expect = arr[ys][:, xs]
    assert bytes(row["pixels"]) == expect.tobytes()
    assert len(row["pixels"]) == 2 * 3 * 3


def test_resize_images_upscale_and_errors(spark):
    """Upscaling repeats source pixels (floor map); garbage and null
    payloads raise naming the doc_id."""
    arr = np.array([[[10], [20]], [[30], [40]]], dtype=np.uint8)  # 2x2x1
    df = spark.createDataFrame(
        [(5, encode_png(arr))], "doc_id long, payload binary"
    )
    (row,) = mm.resize_images(df, out_h=4, out_w=4).collect()
    px = np.frombuffer(bytes(row["pixels"]), dtype=np.uint8).reshape(4, 4)
    assert (px[:2, :2] == 10).all() and (px[2:, 2:] == 40).all()
    bad = spark.createDataFrame(
        [(9, b"not an image")], "doc_id long, payload binary"
    )
    with pytest.raises(Exception, match="doc_id=9"):
        mm.resize_images(bad, out_h=2, out_w=2).collect()


# ---------------------------------------------------------------------------
# video: real RIFF/AVI mux + decode (round 6)
# ---------------------------------------------------------------------------

def test_avi_real_decode_roundtrip(spark):
    """Mux known RGB frames into a real RIFF/AVI container and decode them
    back through the Spark operator: pixel statistics must match the numpy
    ground truth and the container size must match the fixed layout
    formula (232 header/index bytes + 168 per 8x6 frame)."""
    rng = np.random.RandomState(7)
    frames = [rng.randint(0, 256, (6, 8, 3)).astype(np.uint8)
              for _ in range(3)]
    payload = mm.encode_avi_dib(frames, fps=25)
    assert len(payload) == 232 + 168 * 3
    df = spark.createDataFrame([(1, payload)], "doc_id long, payload binary")
    (row,) = mm.decode_avi_features(df).collect()
    x = np.concatenate([f.reshape(-1) for f in frames]).astype(np.float64)
    assert (row["width"], row["height"], row["n_frames"]) == (8, 6, 3)
    assert row["fps"] == pytest.approx(25.0)
    assert row["n_bytes"] == len(payload)
    assert row["pmean"] == pytest.approx(x.mean())
    assert row["prms"] == pytest.approx(np.sqrt((x * x).mean()))
    assert (row["pmin"], row["pmax"]) == (int(x.min()), int(x.max()))


def test_avi_decode_is_pixel_exact_not_just_stats():
    """The parse must invert the mux exactly (bottom-up row order, BGR
    channel swap, stride padding) — checked at array level, because
    aggregate statistics alone cannot see a flipped or channel-swapped
    frame. Uses a non-4-multiple row width so stride padding is live."""
    rng = np.random.RandomState(11)
    frames = [rng.randint(0, 256, (5, 7, 3)).astype(np.uint8)
              for _ in range(2)]
    b = mm.encode_avi_dib(frames, fps=10)
    (riff_size,) = struct.unpack("<I", b[4:8])
    w = h = None
    got = []
    for fcc, p0, sz in mm._iter_riff_chunks(b, 12, 8 + riff_size):
        if fcc != b"LIST":
            continue
        sub = b[p0:p0 + 4]
        if sub == b"hdrl":
            for f2, q0, s2 in mm._iter_riff_chunks(b, p0 + 4, p0 + sz):
                if f2 == b"avih":
                    vals = struct.unpack("<14I", b[q0:q0 + 56])
                    w, h = vals[8], vals[9]
        elif sub == b"movi":
            for f2, q0, s2 in mm._iter_riff_chunks(b, p0 + 4, p0 + sz):
                if f2.endswith(b"db"):
                    stride = (w * 3 + 3) & ~3
                    rows = np.frombuffer(
                        b, dtype=np.uint8, count=s2, offset=q0
                    ).reshape(h, stride)
                    got.append(rows[:, : w * 3].reshape(h, w, 3)[::-1, :, ::-1])
    assert len(got) == 2
    for a, c in zip(frames, got):
        assert np.array_equal(a, c)


def test_avi_decode_malformed_payloads_raise(spark):
    """Garbage, truncated containers, and wrong-size DIB frames raise with
    the offending doc_id instead of emitting garbage rows; video now
    passes require_decoder."""
    mm.require_decoder("video")  # must not raise (r5 'What's missing #1')
    frames = [np.zeros((6, 8, 3), dtype=np.uint8)]
    good = mm.encode_avi_dib(frames)
    cases = {
        2: b"not an avi at all",
        3: good[:40],                      # truncated inside hdrl
        4: good[:4] + struct.pack("<I", len(good) * 2) + good[8:],  # size lies
    }
    for did, payload in cases.items():
        df = spark.createDataFrame(
            [(did, payload)], "doc_id long, payload binary"
        )
        with pytest.raises(Exception, match="AVI|RIFF|overruns|truncated"):
            mm.decode_avi_features(df).collect()


def test_avi_synth_payloads_match_formula(spark):
    """synth_avi_payloads writes true containers whose decoded pixels equal
    the documented formula — the property the DuckDB oracle relies on."""
    ids = spark.createDataFrame([(0,), (1,), (5,)], "doc_id long")
    rows = {
        r["doc_id"]: r
        for r in mm.decode_avi_features(mm.synth_avi_payloads(ids)).collect()
    }
    for did, r in rows.items():
        n = 2 + did % 3
        assert (r["width"], r["height"], r["n_frames"]) == (8, 6, n)
        assert r["n_bytes"] == 232 + 168 * n
        vals = np.array(
            [
                (did * 31 + f * 17 + y * 5 + x * 3 + c) % 256
                for f in range(n)
                for y in range(6)
                for x in range(8)
                for c in range(3)
            ],
            dtype=np.float64,
        )
        assert r["pmean"] == pytest.approx(vals.mean())
        assert r["prms"] == pytest.approx(np.sqrt((vals * vals).mean()))


def test_wav_truncated_data_chunk_raises(spark):
    """A WAV whose data chunk is shorter than the header's frame count
    raises (the 'malformed payloads raise' contract) instead of emitting
    an n_frames inconsistent with the decoded samples."""
    import io
    import wave

    good = mm.encode_pcm16_wav([1, 2, 3, 4, 5, 6, 7, 8], sample_rate=8000)
    truncated = good[:-6]  # drop 3 samples' bytes, keep the header intact
    with wave.open(io.BytesIO(truncated), "rb") as w:
        assert w.getnframes() == 8  # header still claims all 8 frames
    df = spark.createDataFrame(
        [(9, truncated)], "doc_id long, payload binary"
    )
    with pytest.raises(Exception, match="truncated"):
        mm.decode_wav_features(df).collect()


def test_avi_multistream_audio_and_rec_lists_decode(spark):
    """Real-world AVI shapes the minimal muxer doesn't emit: a SECOND
    'auds' stream (whose 16-byte WAVEFORMATEX strf must NOT be parsed as
    a BITMAPINFOHEADER and clobber `compression`) and frames wrapped in
    'rec ' interleave LISTs next to audio data chunks. The decode must
    match the plain single-stream container's statistics exactly."""
    import struct

    rng = np.random.RandomState(11)
    frames = [rng.randint(0, 256, (6, 8, 3)).astype(np.uint8)
              for _ in range(2)]
    plain = mm.encode_avi_dib(frames, fps=10)

    def chunk(fourcc, payload):
        pad = b"\x00" if len(payload) % 2 else b""
        return fourcc + struct.pack("<I", len(payload)) + payload + pad

    def lst(subtype, payload):
        return chunk(b"LIST", subtype + payload)

    h, w = 6, 8
    stride = (w * 3 + 3) & ~3
    dib_size = stride * h
    avih = struct.pack(
        "<14I", 100_000, dib_size * 10, 0, 0x10,
        len(frames), 0, 2, dib_size, w, h, 0, 0, 0, 0,
    )
    vids_strh = struct.pack(
        "<4s4sIHHIIIIIIII4H", b"vids", b"DIB ", 0, 0, 0, 0,
        1, 10, 0, len(frames), dib_size, 0xFFFFFFFF, dib_size,
        0, 0, w, h,
    )
    vids_strf = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, dib_size, 0, 0, 0, 0
    )
    auds_strh = struct.pack(
        "<4s4sIHHIIIIIIII4H", b"auds", b"\x00\x00\x00\x00", 0, 0, 0, 0,
        1, 8000, 0, 8000, 16000, 0xFFFFFFFF, 2, 0, 0, 0, 0,
    )
    # 16-byte WAVEFORMATEX (PCM16 mono 8 kHz) — as a BITMAPINFOHEADER
    # prefix this would read a garbage nonzero "compression" field
    auds_strf = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih)
        + lst(b"strl", chunk(b"strh", vids_strh) + chunk(b"strf", vids_strf))
        + lst(b"strl", chunk(b"strh", auds_strh) + chunk(b"strf", auds_strf)),
    )
    recs = []
    for fr in frames:
        bgr = np.asarray(fr, dtype=np.uint8)[::-1, :, ::-1]
        rows = np.zeros((h, stride), dtype=np.uint8)
        rows[:, : w * 3] = bgr.reshape(h, w * 3)
        recs.append(
            lst(
                b"rec ",
                chunk(b"00db", rows.tobytes())
                + chunk(b"01wb", b"\x00\x01" * 50),
            )
        )
    movi = lst(b"movi", b"".join(recs))
    body = b"AVI " + hdrl + movi
    payload = b"RIFF" + struct.pack("<I", len(body)) + body

    df = spark.createDataFrame(
        [(1, plain), (2, payload)], "doc_id long, payload binary"
    )
    out = {r["doc_id"]: r for r in mm.decode_avi_features(df).collect()}
    for field in ("width", "height", "n_frames", "pmean", "prms",
                  "pmin", "pmax"):
        assert out[2][field] == out[1][field], field


def test_mjpeg_avi_decode_roundtrip(spark):
    """MJPEG AVI end-to-end: encode frames as per-frame baseline JPEGs
    in '00dc' chunks, decode through the RIFF walker + JPEG decoder.
    Structural fields exact; pixel stats within JPEG quantization
    distance of the source frames."""
    rng = np.random.default_rng(3)
    y, x = np.mgrid[0:16, 0:16]
    frames = [
        np.stack([(x * 2 + y * 3 + 20 * f) % 150 + 50 for _ in range(3)],
                 axis=2).astype(np.uint8)
        for f in range(3)
    ]
    payload = mm.encode_avi_mjpeg(frames, fps=12, quality=90)
    assert payload[:4] == b"RIFF" and b"MJPG" in payload[:200]
    df = spark.createDataFrame([(7, payload)], "doc_id long, payload binary")
    r = mm.decode_avi_features(df).collect()[0]
    assert (r["width"], r["height"], r["n_frames"]) == (16, 16, 3)
    assert r["fps"] == pytest.approx(12.0)
    src = np.concatenate([f.reshape(-1).astype(float) for f in frames])
    assert r["pmean"] == pytest.approx(src.mean(), abs=2.0)
    assert r["prms"] == pytest.approx(np.sqrt((src * src).mean()), abs=2.0)


def test_mjpeg_synth_payloads_deterministic_and_formula_bounded(spark):
    """synth_mjpeg_payloads must emit byte-identical payloads across
    runs (fixture determinism — PIL presence must never change them) and
    decode to stats within the suite flags' 3.0 bound of the exact
    formula moments from mjpeg_formula_moments."""
    ids = spark.range(0, 12).withColumnRenamed("id", "doc_id")
    a = {r["doc_id"]: bytes(r["payload"])
         for r in mm.synth_mjpeg_payloads(ids).collect()}
    b = {r["doc_id"]: bytes(r["payload"])
         for r in mm.synth_mjpeg_payloads(ids).collect()}
    assert a == b
    feats = {r["doc_id"]: r
             for r in mm.decode_avi_features(
                 mm.synth_mjpeg_payloads(ids)).collect()}
    mom = {r["__res"]: r for r in mm.mjpeg_formula_moments(spark).collect()}
    assert len(mom) == 480
    for did, r in feats.items():
        m = mom[did % 480]
        assert abs(r["pmean"] - m["__fmean"]) <= 3.0
        assert abs(r["prms"] - m["__frms"]) <= 3.0
        assert r["n_frames"] == 2 + did % 3


def test_mjpeg_formula_moments_match_numpy_bruteforce(spark):
    """The 480-residue closed-form lookup equals brute-force numpy over
    actual doc ids beyond 480 (periodicity claim checked, not assumed)."""
    mom = {r["__res"]: (r["__fmean"], r["__frms"])
           for r in mm.mjpeg_formula_moments(spark).collect()}
    yxc = np.stack(
        np.meshgrid(np.arange(16), np.arange(16), np.arange(3),
                    indexing="ij"), axis=-1)
    base = yxc[..., 0] * 3 + yxc[..., 1] * 2 + yxc[..., 2] * 40
    for did in (0, 7, 479, 480, 481, 957, 12345):
        n = 2 + did % 3
        xv = np.concatenate([
            ((did * 7 + f * 11 + base) % 160 + 48).reshape(-1).astype(float)
            for f in range(n)])
        want = (xv.mean(), np.sqrt((xv * xv).mean()))
        got = mom[did % 480]
        assert got[0] == pytest.approx(want[0], abs=1e-9)
        assert got[1] == pytest.approx(want[1], abs=1e-9)

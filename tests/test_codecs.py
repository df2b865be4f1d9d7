"""Real in-container media decode (functions/codecs): WAV via stdlib
wave, PPM/BMP via struct+numpy — closing the library-gated half of
the multimodal seam for the formats that need no codec library."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from cdh_integrate_carbondata2_3_spark.functions.codecs import (
    decode_bmp,
    decode_ppm,
    decode_wav,
    encode_wav_pcm16,
    sniff_and_decode,
)


def test_wav_roundtrip_pcm16():
    samples = [0, 100, -100, 32767, -32768, 7]
    blob = encode_wav_pcm16(samples, sample_rate=8000)
    d = decode_wav(blob)
    assert d["kind"] == "audio"
    assert d["channels"] == 1 and d["sample_rate"] == 8000
    assert d["n_samples"] == 6
    assert d["sum_samples"] == sum(samples)
    assert d["peak"] == 32768
    assert d["duration_ms"] == 6 * 1000 // 8000


def test_wav_stereo_and_8bit():
    inter = [1, -2, 3, -4]                       # L R L R
    blob = encode_wav_pcm16(inter, sample_rate=44100, channels=2)
    d = decode_wav(blob)
    assert d["channels"] == 2 and d["n_samples"] == 2
    assert d["sum_samples"] == sum(inter)
    # 8-bit unsigned, centered on 128
    import io
    import wave
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(1)
        w.setframerate(8000)
        w.writeframes(bytes([128, 130, 126]))
    d8 = decode_wav(buf.getvalue())
    assert d8["sum_samples"] == 0 + 2 - 2
    assert d8["peak"] == 2


def test_ppm_decode_with_comment():
    px = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    blob = b"P6\n# a comment\n3 2\n255\n" + px.tobytes()
    d = decode_ppm(blob)
    assert (d["width"], d["height"]) == (3, 2)
    assert d["sum_r"] == int(px[:, :, 0].sum())
    assert d["sum_g"] == int(px[:, :, 1].sum())
    assert d["sum_b"] == int(px[:, :, 2].sum())


def _bmp24(px_topdown: np.ndarray) -> bytes:
    """Minimal uncompressed 24-bit BMP writer (bottom-up, padded)."""
    h, w, _ = px_topdown.shape
    row_bytes = (w * 3 + 3) & ~3
    body = bytearray()
    for r in range(h - 1, -1, -1):               # bottom-up
        row = px_topdown[r][:, ::-1].tobytes()   # RGB → BGR
        body += row + b"\0" * (row_bytes - len(row))
    off = 14 + 40
    hdr = (b"BM" + struct.pack("<IHHI", off + len(body), 0, 0, off)
           + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0,
                         len(body), 2835, 2835, 0, 0))
    return bytes(hdr) + bytes(body)


def test_bmp_decode_padding_and_bottom_up():
    px = np.arange(3 * 3 * 3, dtype=np.uint8).reshape(3, 3, 3)
    d = decode_bmp(_bmp24(px))
    assert (d["width"], d["height"]) == (3, 3)
    assert d["sum_r"] == int(px[:, :, 0].sum())
    assert d["sum_g"] == int(px[:, :, 1].sum())
    assert d["sum_b"] == int(px[:, :, 2].sum())


def test_sniff_dispatch_and_unknown_magic():
    assert sniff_and_decode(encode_wav_pcm16([5]))["kind"] == "audio"
    assert sniff_and_decode(b"P6\n1 1\n255\n\x01\x02\x03")["kind"] == "image"
    with pytest.raises(NotImplementedError, match="inject"):
        sniff_and_decode(b"\x89PNG\r\n")        # compressed → library seam


def test_real_decode_through_spark_pipeline(spark):
    """End-to-end: WAV blobs built per row, decoded by the REAL wave
    decoder inside the mapInPandas feature extractor, verified against
    the generation formula."""
    import pandas as pd

    from cdh_integrate_carbondata2_3_spark.functions.multimodal import (
        extract_features)

    def make_blob(doc_id: int) -> bytes:
        n = 50 + doc_id % 64
        s = [((doc_id * 31 + i * 7) % 65536) - 32768 for i in range(n)]
        return encode_wav_pcm16(s, sample_rate=16000)

    def attach(it):
        for pdf in it:
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "content": [make_blob(int(d)) for d in pdf["doc_id"]]})

    media = spark.range(0, 200).selectExpr("id as doc_id") \
        .mapInPandas(attach, "doc_id bigint, content binary")

    def wav_features(content: bytes) -> dict:
        d = sniff_and_decode(content)
        return {"n_samples": d["n_samples"],
                "sum_samples": d["sum_samples"],
                "sample_rate": d["sample_rate"]}

    out = extract_features(
        media, decode=wav_features,
        schema="doc_id bigint, n_samples bigint, sum_samples bigint, "
               "sample_rate int").collect()
    assert len(out) == 200
    for r in out:
        n = 50 + r["doc_id"] % 64
        want = sum(((r["doc_id"] * 31 + i * 7) % 65536) - 32768
                   for i in range(n))
        assert (r["n_samples"], r["sum_samples"], r["sample_rate"]) == \
            (n, want, 16000), r["doc_id"]


def test_truncated_wav_raises():
    """Header promising more frames than the data chunk holds must
    raise, not return an inconsistent (header-count, actual-sum)."""
    import io
    import wave
    blob = bytearray(encode_wav_pcm16([1, 2, 3, 4, 5], sample_rate=8000))
    cut = bytes(blob[:-4])            # drop 2 samples, keep header
    with wave.open(io.BytesIO(cut)) as w:
        assert w.getnframes() == 5    # wave trusts the header count
    with pytest.raises(ValueError, match="truncated WAV"):
        decode_wav(cut)


def test_ppm_raster_size_mismatch_raises():
    """'\\r\\n' after maxval (or any padding/truncation) must raise —
    a one-byte offset would silently rotate every channel sum."""
    px = bytes(range(12))             # 2x2 RGB
    with pytest.raises(ValueError, match="raster size mismatch"):
        decode_ppm(b"P6\n2 2\n255\r\n" + px)
    with pytest.raises(ValueError, match="raster size mismatch"):
        decode_ppm(b"P6\n2 2\n255\n" + px[:-1])
    ok = decode_ppm(b"P6\n2 2\n255\n" + px)
    assert (ok["width"], ok["height"]) == (2, 2)


def _rng_px(h, w, seed=7):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(h, w, 3)).astype(np.uint8)


def test_png_roundtrip_every_filter():
    """encode (forward filter) → decode (unfilter) recovers exact
    channel sums for each of the five scanline filters, and for a
    mixed per-row assignment — the filter paths are independent code,
    so round-trip exactness is a real check."""
    from cdh_integrate_carbondata2_3_spark.functions.codecs import (
        decode_png, encode_png)
    px = _rng_px(9, 13)
    want = {c: int(px[:, :, i].sum(dtype=np.int64))
            for i, c in enumerate("rgb")}
    for ft in (0, 1, 2, 3, 4, [0, 1, 2, 3, 4, 4, 3, 2, 1]):
        d = decode_png(encode_png(px, filters=ft))
        assert d["kind"] == "image"
        assert (d["width"], d["height"]) == (13, 9)
        assert (d["sum_r"], d["sum_g"], d["sum_b"]) == (
            want["r"], want["g"], want["b"]), f"filter {ft}"


def test_png_sniff_dispatch():
    from cdh_integrate_carbondata2_3_spark.functions.codecs import (
        encode_png)
    px = _rng_px(4, 5, seed=3)
    d = sniff_and_decode(encode_png(px, filters=4))
    assert d["width"] == 5 and d["height"] == 4
    assert d["sum_g"] == int(px[:, :, 1].sum(dtype=np.int64))


def test_png_crc_and_truncation_rejected():
    from cdh_integrate_carbondata2_3_spark.functions.codecs import (
        decode_png, encode_png)
    blob = bytearray(encode_png(_rng_px(3, 3)))
    # flip a byte inside IHDR data → CRC mismatch
    bad = bytearray(blob)
    bad[16] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(bad))
    # chop the stream before IEND → truncation, not a silent partial
    with pytest.raises(ValueError):
        decode_png(bytes(blob[:-10]))


def test_png_gray_and_palette():
    """Hand-built gray (color type 0) and palette (type 3) PNGs
    decode with gray replicated across channels / PLTE resolved."""
    import zlib
    from cdh_integrate_carbondata2_3_spark.functions.codecs import (
        PNG_SIG, decode_png)

    def chunk(ctype, data):
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))

    # 2x2 gray: values 10 20 / 30 40, filter 0 rows
    raw = bytes([0, 10, 20, 0, 30, 40])
    g = (PNG_SIG + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0))
         + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))
    d = decode_png(g)
    assert (d["sum_r"], d["sum_g"], d["sum_b"]) == (100, 100, 100)
    # 2x1 palette: indices 0,1 → PLTE [(1,2,3), (200,100,50)]
    raw = bytes([0, 0, 1])
    plte = bytes([1, 2, 3, 200, 100, 50])
    p = (PNG_SIG + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 1, 8, 3, 0, 0, 0))
         + chunk(b"PLTE", plte)
         + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))
    d = decode_png(p)
    assert (d["sum_r"], d["sum_g"], d["sum_b"]) == (201, 102, 53)
    # out-of-range palette index rejected
    raw_bad = bytes([0, 0, 2])
    pb = (PNG_SIG + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 1, 8, 3, 0, 0, 0))
          + chunk(b"PLTE", plte)
          + chunk(b"IDAT", zlib.compress(raw_bad)) + chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="palette"):
        decode_png(pb)


def test_png_rgba_and_interlace_gate():
    """RGBA sums ignore alpha; Adam7 raises NotImplementedError
    (routes to the injection seam, never mis-parses)."""
    import zlib
    from cdh_integrate_carbondata2_3_spark.functions.codecs import (
        PNG_SIG, decode_png)

    def chunk(ctype, data):
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))

    # 1x2 RGBA rows: (1,2,3,255), (4,5,6,0)
    raw = bytes([0, 1, 2, 3, 255, 4, 5, 6, 0])
    b = (PNG_SIG + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 1, 8, 6, 0, 0, 0))
         + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))
    d = decode_png(b)
    assert (d["sum_r"], d["sum_g"], d["sum_b"]) == (5, 7, 9)
    i = (PNG_SIG + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 1, 8, 6, 0, 0, 1))
         + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))
    with pytest.raises(NotImplementedError, match="interlace|Adam7"):
        decode_png(i)


def test_mp3_frame_walk():
    from cdh_integrate_carbondata2_3_spark.functions.codecs import (
        decode_mp3_meta, encode_mp3_frames)
    blob = encode_mp3_frames(38, sample_rate=44100, kbps=128)
    d = decode_mp3_meta(blob)
    assert d["frames"] == 38 and d["sample_rate"] == 44100
    assert d["mean_kbps"] == 128
    assert d["duration_ms"] == 38 * 1152 * 1000 // 44100
    # ID3v2 tag prefix is skipped (syncsafe size)
    tag = b"ID3\x04\x00\x00\x00\x00\x00\x0a" + b"x" * 10
    assert decode_mp3_meta(tag + blob)["frames"] == 38
    # corrupt sync mid-stream raises instead of returning partials
    flen = 144 * 128 * 1000 // 44100          # 417 bytes per frame
    bad = bytearray(blob)
    bad[flen * 19] = 0x00                     # clobber frame 19's header
    with pytest.raises(ValueError, match="sync|Layer"):
        decode_mp3_meta(bytes(bad))


def test_mp4_box_walk():
    from cdh_integrate_carbondata2_3_spark.functions.codecs import (
        decode_mp4_meta, encode_mp4_meta)
    blob = encode_mp4_meta(duration_ms=61500, width=1920, height=1080)
    d = decode_mp4_meta(blob)
    assert d["brand"] == "isom" and d["duration_ms"] == 61500
    assert d["n_tracks"] == 1
    assert d["tracks"][0]["width"] == 1920
    assert d["tracks"][0]["height"] == 1080
    assert d["tracks"][0]["timescale"] == 1000
    with pytest.raises(ValueError):
        decode_mp4_meta(b"\x00\x00\x00\x08free")    # no ftyp/moov


def test_mp3_mp4_sniff_dispatch():
    from cdh_integrate_carbondata2_3_spark.functions.codecs import (
        encode_mp3_frames, encode_mp4_meta, sniff_and_decode)
    assert sniff_and_decode(encode_mp4_meta(5000, 64, 48))["kind"] == "video"
    assert sniff_and_decode(encode_mp3_frames(5))["kind"] == "audio"

"""REAL in-container media decoders — no external libraries.

The multimodal seam (`functions/multimodal.py`) was library-gated:
pillow/librosa/av don't ship here, so decode was a deterministic
fake behind an injection point. This module closes part of that gap
with decoders built from the standard library + numpy only:

- **WAV** (RIFF/WAVE PCM, 8/16-bit, any channel count) — stdlib
  ``wave`` frames → numpy samples; real audio decode.
- **PPM** (binary P6, maxval ≤ 255) — header parse + numpy
  frombuffer; real image decode.
- **BMP** (BITMAPINFOHEADER, uncompressed 24-bit) — struct header +
  row-padded numpy view, bottom-up row order honored.

Compressed formats (JPEG/PNG/MP3/MP4...) still need the library
seam — :func:`sniff_and_decode` raises ``NotImplementedError`` for
unknown magic bytes so the caller can route those blobs to an
injected decoder instead of silently mis-parsing them.

Every decoder returns plain-python feature dicts shaped for
``extract_features(decode=...)`` Arrow batches; sums are exact ints
so correctness gates can recompute them in SQL.
"""

from __future__ import annotations

import io
import struct
import wave

import numpy as np


def decode_wav(content: bytes) -> dict:
    """Decode a RIFF/WAVE PCM blob to sample statistics.

    Returns channels / sample_rate / n_samples (per channel) /
    duration_ms (int, floor) / sum_samples (exact int over ALL
    channels' samples) / peak (max |sample|)."""
    with wave.open(io.BytesIO(content), "rb") as w:
        nch = w.getnchannels()
        sw = w.getsampwidth()
        sr = w.getframerate()
        nframes = w.getnframes()
        raw = w.readframes(nframes)
    if sw == 1:           # 8-bit WAV is unsigned, centered on 128
        samples = np.frombuffer(raw, dtype=np.uint8).astype(np.int64) - 128
    elif sw == 2:         # 16-bit is signed little-endian
        samples = np.frombuffer(raw, dtype="<i2").astype(np.int64)
    else:
        raise NotImplementedError(f"WAV sample width {sw} bytes "
                                  "(PCM 8/16-bit supported)")
    if len(samples) != nframes * nch:
        # truncated data chunk: the header promises more frames than
        # the blob holds — raise instead of returning an internally
        # inconsistent (header-count, actual-sum) pair
        raise ValueError(
            f"truncated WAV: header declares {nframes} frames × {nch} "
            f"channel(s), data chunk holds {len(samples)} samples")
    return {
        "kind": "audio",
        "channels": nch,
        "sample_rate": sr,
        "n_samples": nframes,
        "duration_ms": (nframes * 1000) // sr if sr else 0,
        "sum_samples": int(samples.sum()),
        "peak": int(np.abs(samples).max()) if len(samples) else 0,
    }


def _ppm_header(content: bytes) -> tuple[int, int, int, int]:
    """Parse the P6 header (magic, whitespace/comments, w h maxval);
    returns (width, height, maxval, data_offset)."""
    if content[:2] != b"P6":
        raise ValueError("not a binary PPM (P6) blob")
    i, fields = 2, []
    while len(fields) < 3:
        while i < len(content) and content[i:i + 1].isspace():
            i += 1
        if content[i:i + 1] == b"#":          # comment to end of line
            while i < len(content) and content[i:i + 1] != b"\n":
                i += 1
            continue
        j = i
        while j < len(content) and not content[j:j + 1].isspace():
            j += 1
        fields.append(int(content[i:j]))
        i = j
    return fields[0], fields[1], fields[2], i + 1   # single ws after maxval


def decode_ppm(content: bytes) -> dict:
    """Decode a binary PPM (P6) image to pixel statistics."""
    w, h, maxval, off = _ppm_header(content)
    if maxval > 255:
        raise NotImplementedError("16-bit PPM not supported")
    if len(content) - off != w * h * 3:
        # the spec allows exactly ONE whitespace byte after maxval;
        # a '\r\n' writer or padded/truncated raster would otherwise
        # decode one byte off and return silently wrong channel sums
        raise ValueError(
            f"PPM raster size mismatch: header says {w}×{h}×3 = "
            f"{w * h * 3} bytes, blob holds {len(content) - off} "
            "after the single post-maxval whitespace")
    px = np.frombuffer(content, dtype=np.uint8,
                       count=w * h * 3, offset=off).reshape(h, w, 3)
    return {
        "kind": "image",
        "width": w,
        "height": h,
        "sum_r": int(px[:, :, 0].sum(dtype=np.int64)),
        "sum_g": int(px[:, :, 1].sum(dtype=np.int64)),
        "sum_b": int(px[:, :, 2].sum(dtype=np.int64)),
    }


def decode_bmp(content: bytes) -> dict:
    """Decode an uncompressed 24-bit BMP (BITMAPINFOHEADER) to pixel
    statistics. BMP rows are 4-byte padded and stored bottom-up
    (positive height) — both honored."""
    if content[:2] != b"BM":
        raise ValueError("not a BMP blob")
    data_off = struct.unpack_from("<I", content, 10)[0]
    hdr_size = struct.unpack_from("<I", content, 14)[0]
    if hdr_size < 40:
        raise NotImplementedError("pre-BITMAPINFOHEADER BMP")
    w, h_signed = struct.unpack_from("<ii", content, 18)
    planes, bpp = struct.unpack_from("<HH", content, 26)
    compression = struct.unpack_from("<I", content, 30)[0]
    if bpp != 24 or compression != 0:
        raise NotImplementedError(
            f"BMP bpp={bpp} compression={compression} "
            "(only uncompressed 24-bit supported)")
    h = abs(h_signed)
    row_bytes = (w * 3 + 3) & ~3                     # 4-byte row padding
    rows = np.frombuffer(content, dtype=np.uint8, count=row_bytes * h,
                         offset=data_off).reshape(h, row_bytes)
    px = rows[:, :w * 3].reshape(h, w, 3)            # strip padding
    if h_signed > 0:
        px = px[::-1]                                # bottom-up → top-down
    # BMP stores BGR
    return {
        "kind": "image",
        "width": w,
        "height": h,
        "sum_r": int(px[:, :, 2].sum(dtype=np.int64)),
        "sum_g": int(px[:, :, 1].sum(dtype=np.int64)),
        "sum_b": int(px[:, :, 0].sum(dtype=np.int64)),
    }


def sniff_and_decode(content: bytes) -> dict:
    """Dispatch on magic bytes to a REAL decoder; unknown/compressed
    formats raise ``NotImplementedError`` so callers route them to an
    injected library decoder instead of mis-parsing."""
    if content[:4] == b"RIFF" and content[8:12] == b"WAVE":
        return decode_wav(content)
    if content[:2] == b"P6":
        return decode_ppm(content)
    if content[:2] == b"BM":
        return decode_bmp(content)
    raise NotImplementedError(
        f"no built-in decoder for magic {content[:4]!r}; inject a "
        "library-backed decoder via extract_features(decode=...)")


def encode_wav_pcm16(samples, sample_rate: int = 16000,
                     channels: int = 1) -> bytes:
    """Write mono/interleaved int16 samples as a PCM16 WAV blob
    (stdlib wave) — the test/gate-side generator for decode_wav."""
    arr = np.asarray(samples, dtype="<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(arr.tobytes())
    return buf.getvalue()

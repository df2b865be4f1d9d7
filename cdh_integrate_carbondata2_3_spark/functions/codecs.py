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
- **PNG** (8-bit gray/RGB/palette/gray-alpha/RGBA, non-interlaced) —
  chunk walk with CRC verification, stdlib ``zlib`` inflate of the
  IDAT stream, and all five scanline filters (None/Sub/Up/Average/
  Paeth) unfiltered with numpy; a real compressed-image decode with
  no external library.

Formats needing codecs the stdlib lacks (JPEG/MP3/MP4...) still use
the library seam — :func:`sniff_and_decode` raises
``NotImplementedError`` for unknown magic bytes so the caller can
route those blobs to an injected decoder instead of silently
mis-parsing them.

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


PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _paeth_predict(a, b, c):
    """PNG Paeth predictor, vectorized over a pixel's channels
    (int32 numpy arrays): nearest of left/up/upper-left to a+b-c,
    ties broken left, up, upper-left (PNG spec 9.4)."""
    p = a + b - c
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    return np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))


def _png_chunks(content: bytes):
    """Walk PNG chunks, verifying each CRC; yields (type, data)."""
    import zlib
    pos = 8
    while pos + 8 <= len(content):
        (length,) = struct.unpack_from(">I", content, pos)
        ctype = content[pos + 4:pos + 8]
        data = content[pos + 8:pos + 8 + length]
        if len(data) != length:
            raise ValueError("truncated PNG chunk "
                             f"{ctype!r} (want {length} bytes)")
        (crc,) = struct.unpack_from(">I", content, pos + 8 + length)
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {ctype!r} CRC mismatch")
        yield ctype, data
        if ctype == b"IEND":
            return
        pos += 12 + length
    raise ValueError("PNG stream ended without IEND")


def _png_unfilter(raw: bytes, w: int, h: int, ch: int) -> np.ndarray:
    """Reverse the per-scanline filters → (h, w*ch) uint8 samples.
    Sub is a per-channel cumulative sum (vectorized); Average/Paeth
    need the in-row left neighbor, so they walk pixels with the
    channel math vectorized."""
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError(
            f"PNG raster size mismatch: {h} rows × (1+{stride}) = "
            f"{h * (stride + 1)} bytes, inflate produced {len(raw)}")
    recon = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        off = y * (stride + 1)
        ft = raw[off]
        row = np.frombuffer(raw, dtype=np.uint8, count=stride,
                            offset=off + 1).astype(np.int32)
        if ft == 0:
            cur = row
        elif ft == 1:      # Sub: recon[x] = filt[x] + recon[x-1 px]
            cur = (np.cumsum(row.reshape(w, ch), axis=0) % 256).ravel()
        elif ft == 2:      # Up
            cur = (row + prev) % 256
        elif ft in (3, 4):  # Average / Paeth: left-dependent, walk
            # pixels in Python ints (all values 0..255, so //2, abs
            # and %256 are exact; a numpy-op-per-pixel walk pays ~µs
            # of dispatch per pixel and dominated small-image decode)
            r_ = row.tolist()
            p_ = prev.tolist() if not isinstance(prev, list) else prev
            out = [0] * stride
            left = [0] * ch
            upleft = [0] * ch
            for x in range(0, stride, ch):
                for c in range(ch):
                    up = p_[x + c]
                    if ft == 3:
                        pred = (left[c] + up) // 2
                    else:
                        pp = left[c] + up - upleft[c]
                        pa = pp - left[c] if pp >= left[c] else left[c] - pp
                        pb = pp - up if pp >= up else up - pp
                        pc_ = (pp - upleft[c] if pp >= upleft[c]
                               else upleft[c] - pp)
                        pred = (left[c] if pa <= pb and pa <= pc_
                                else up if pb <= pc_ else upleft[c])
                    v = (r_[x + c] + pred) % 256
                    out[x + c] = v
                    left[c] = v
                upleft = p_[x:x + ch]
            cur = np.array(out, dtype=np.int32)
        else:
            raise ValueError(f"PNG scanline filter {ft} is invalid")
        recon[y] = cur.astype(np.uint8)
        prev = cur
    return recon


def decode_png(content: bytes) -> dict:
    """Decode a PNG (8-bit, non-interlaced; color types 0/2/3/4/6) to
    pixel statistics — stdlib ``zlib`` + numpy, no image library.
    Gray and gray-alpha report the gray value on all three channels;
    palette images resolve through PLTE; alpha is not premultiplied
    (sums are over the stored samples, exactly recomputable)."""
    import zlib
    if content[:8] != PNG_SIG:
        raise ValueError("not a PNG blob")
    ihdr = plte = None
    idat = bytearray()
    for ctype, data in _png_chunks(content):
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"PLTE":
            plte = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat += data
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, ctype_n, comp, filt, interlace = ihdr
    if depth != 8:
        raise NotImplementedError(f"PNG bit depth {depth} (8 supported)")
    if interlace:
        raise NotImplementedError("Adam7-interlaced PNG")
    if comp or filt or ctype_n not in _PNG_CHANNELS:
        raise ValueError(
            f"invalid PNG header (compression={comp}, filter={filt}, "
            f"color type={ctype_n})")
    ch = _PNG_CHANNELS[ctype_n]
    samples = _png_unfilter(zlib.decompress(bytes(idat)), w, h, ch)
    px = samples.reshape(h, w, ch)
    if ctype_n == 3:                       # palette → RGB lookup
        if plte is None:
            raise ValueError("palette PNG missing PLTE")
        if int(px.max(initial=0)) >= len(plte):
            raise ValueError("PNG palette index out of range")
        rgb = plte[px[:, :, 0]]
    elif ctype_n in (0, 4):                # gray(+alpha)
        rgb = np.repeat(px[:, :, :1], 3, axis=2)
    else:                                  # RGB / RGBA
        rgb = px[:, :, :3]
    return {
        "kind": "image",
        "width": w,
        "height": h,
        "sum_r": int(rgb[:, :, 0].sum(dtype=np.int64)),
        "sum_g": int(rgb[:, :, 1].sum(dtype=np.int64)),
        "sum_b": int(rgb[:, :, 2].sum(dtype=np.int64)),
    }


def encode_png(px, filters=0) -> bytes:
    """Write an (h, w, 3) uint8 RGB array as a truecolor PNG —
    stdlib ``zlib`` deflate + CRC chunks; the test/gate-side
    generator for :func:`decode_png`. ``filters`` picks the forward
    scanline filter: one int for all rows or a per-row list — lets
    tests exercise every unfilter path with round-trip exactness."""
    import zlib
    arr = np.ascontiguousarray(np.asarray(px, dtype=np.uint8))
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError("encode_png wants an (h, w, 3) uint8 array")
    h, w, _ = arr.shape
    fts = ([int(filters)] * h if np.isscalar(filters) else
           [int(f) for f in filters])
    if len(fts) != h:
        raise ValueError(f"need {h} per-row filters, got {len(fts)}")
    prev = np.zeros((w, 3), dtype=np.int32)
    lines = bytearray()
    for y in range(h):
        row = arr[y].astype(np.int32)
        ft = fts[y]
        left = np.zeros((w, 3), dtype=np.int32)
        left[1:] = row[:-1]
        upleft = np.zeros((w, 3), dtype=np.int32)
        upleft[1:] = prev[:-1]
        if ft == 0:
            out = row
        elif ft == 1:
            out = row - left
        elif ft == 2:
            out = row - prev
        elif ft == 3:
            out = row - (left + prev) // 2
        elif ft == 4:
            out = row - _paeth_predict(left, prev, upleft)
        else:
            raise ValueError(f"PNG filter {ft} is invalid")
        lines += bytes([ft]) + (out % 256).astype(np.uint8).tobytes()
        prev = row

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (PNG_SIG + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(lines)))
            + chunk(b"IEND", b""))


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
    if content[:8] == PNG_SIG:
        return decode_png(content)
    if content[:3] == b"\xff\xd8\xff":
        from .jpeg import decode_jpeg
        return decode_jpeg(content)
    if content[4:8] == b"ftyp":
        return decode_mp4_meta(content)
    if content[:3] == b"ID3" or (len(content) > 1 and content[0] == 0xFF
                                 and (content[1] & 0xE6) == 0xE2):
        return decode_mp3_meta(content)
    raise NotImplementedError(
        f"no built-in decoder for magic {content[:4]!r}; inject a "
        "library-backed decoder via extract_features(decode=...)")


# MPEG-1/2 Layer III bitrate (kbps) and sample-rate tables, by
# (version_bits, bitrate_index) / (version_bits, samplerate_index)
_MP3_BITRATE_V1 = [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192,
                   224, 256, 320]
_MP3_BITRATE_V2 = [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128,
                   144, 160]
_MP3_RATES = {3: [44100, 48000, 32000],     # MPEG-1
              2: [22050, 24000, 16000],     # MPEG-2
              0: [11025, 12000, 8000]}      # MPEG-2.5


def decode_mp3_meta(content: bytes) -> dict:
    """Parse an MPEG Layer III stream's FRAME HEADERS (no audio
    decode): walks sync words frame-by-frame using the exact header
    bitrate/samplerate/padding arithmetic, skipping ID3v2 tags.
    Returns frame count, sample rate, duration_ms (from samples per
    frame × frames), and mean bitrate. A real container/framing
    parse — the PCM synthesis filterbank stays behind the library
    seam."""
    pos = 0
    if content[:3] == b"ID3":           # ID3v2: syncsafe 28-bit size
        sz = ((content[6] & 0x7F) << 21 | (content[7] & 0x7F) << 14
              | (content[8] & 0x7F) << 7 | (content[9] & 0x7F))
        pos = 10 + sz
    frames = 0
    total_samples = 0
    total_kbps = 0
    rate = None
    while pos + 4 <= len(content):
        if content[pos] != 0xFF or (content[pos + 1] & 0xE0) != 0xE0:
            raise ValueError(f"MP3 sync lost at byte {pos}")
        h1, h2 = content[pos + 1], content[pos + 2]
        version = (h1 >> 3) & 0x3       # 3=MPEG1, 2=MPEG2, 0=MPEG2.5
        layer = (h1 >> 1) & 0x3         # 1 = Layer III
        if version == 1 or layer != 1:
            raise ValueError("not an MPEG Layer III frame")
        bi = (h2 >> 4) & 0xF
        si = (h2 >> 2) & 0x3
        pad = (h2 >> 1) & 0x1
        if bi in (0, 15) or si == 3:
            raise ValueError("MP3 free-form/invalid bitrate or rate")
        kbps = (_MP3_BITRATE_V1 if version == 3 else _MP3_BITRATE_V2)[bi]
        sr = _MP3_RATES[version][si]
        if rate is None:
            rate = sr
        spf = 1152 if version == 3 else 576   # samples per L3 frame
        flen = (144 if version == 3 else 72) * kbps * 1000 // sr + pad
        frames += 1
        total_samples += spf
        total_kbps += kbps
        pos += flen
    if not frames:
        raise ValueError("no MP3 frames found")
    return {"kind": "audio", "container": "mp3", "frames": frames,
            "sample_rate": rate,
            "duration_ms": total_samples * 1000 // rate,
            "mean_kbps": total_kbps // frames}


def encode_mp3_frames(n_frames: int, sample_rate: int = 44100,
                      kbps: int = 128) -> bytes:
    """Generate a syntactically-valid MPEG-1 Layer III frame stream
    (silent payloads) — the test/gate-side generator for
    decode_mp3_meta; headers are real, audio payload is zeros."""
    si = _MP3_RATES[3].index(sample_rate)
    bi = _MP3_BITRATE_V1.index(kbps)
    out = bytearray()
    for _ in range(n_frames):
        flen = 144 * kbps * 1000 // sample_rate
        hdr = bytes([0xFF, 0xFB, (bi << 4) | (si << 2), 0xC0])
        out += hdr + b"\x00" * (flen - 4)
    return bytes(out)


def decode_mp4_meta(content: bytes) -> dict:
    """Parse an ISO-BMFF (MP4/MOV) box tree — ftyp brand, mvhd
    movie duration/timescale, per-track tkhd dimensions and mdhd
    media timescale. Real container parsing (big-endian box walk,
    version-0/1 headers); sample decode stays behind the seam."""
    def boxes(data: bytes, pos: int, end: int):
        while pos + 8 <= end:
            (size,) = struct.unpack_from(">I", data, pos)
            btype = data[pos + 4:pos + 8]
            if size == 1:               # 64-bit largesize
                (size,) = struct.unpack_from(">Q", data, pos + 8)
                body = pos + 16
            elif size == 0:             # to end of enclosing box
                size = end - pos
                body = pos + 8
            else:
                body = pos + 8
            if size < 8 or pos + size > end:
                raise ValueError("malformed MP4 box")
            yield btype, body, pos + size
            pos += size

    brand = None
    duration_ms = None
    tracks = []
    for btype, body, bend in boxes(content, 0, len(content)):
        if btype == b"ftyp":
            brand = content[body:body + 4].decode("ascii", "replace")
        elif btype == b"moov":
            for b2, p2, e2 in boxes(content, body, bend):
                if b2 == b"mvhd":
                    ver = content[p2]
                    if ver == 1:
                        ts, dur = struct.unpack_from(">IQ", content,
                                                     p2 + 20)
                    else:
                        ts, dur = struct.unpack_from(">II", content,
                                                     p2 + 12)
                    duration_ms = dur * 1000 // ts
                elif b2 == b"trak":
                    trk = {}
                    for b3, p3, e3 in boxes(content, p2, e2):
                        if b3 == b"tkhd":
                            # width/height are the LAST 8 bytes of
                            # tkhd in both version-0 and version-1
                            # layouts (16.16 fixed point)
                            wfx, hfx = struct.unpack_from(
                                ">II", content, e3 - 8)
                            trk["width"] = wfx >> 16
                            trk["height"] = hfx >> 16
                        elif b3 == b"mdia":
                            for b4, p4, _e4 in boxes(content, p3, e3):
                                if b4 == b"mdhd":
                                    ver = content[p4]
                                    if ver == 1:
                                        (mts,) = struct.unpack_from(
                                            ">I", content, p4 + 20)
                                    else:
                                        (mts,) = struct.unpack_from(
                                            ">I", content, p4 + 12)
                                    trk["timescale"] = mts
                    tracks.append(trk)
    if brand is None or duration_ms is None:
        raise ValueError("not an MP4 (missing ftyp/moov/mvhd)")
    return {"kind": "video", "container": "mp4", "brand": brand,
            "duration_ms": duration_ms, "n_tracks": len(tracks),
            "tracks": tracks}


def encode_mp4_meta(duration_ms: int, width: int, height: int,
                    timescale: int = 1000) -> bytes:
    """Build a minimal valid ISO-BMFF box tree (ftyp + moov with
    mvhd and one video trak) — the test/gate-side generator for
    decode_mp4_meta. No media samples, headers only."""
    def box(btype: bytes, body: bytes) -> bytes:
        return struct.pack(">I", len(body) + 8) + btype + body

    dur = duration_ms * timescale // 1000
    mvhd = box(b"mvhd", struct.pack(">B3x", 0)
               + struct.pack(">II", 0, 0)        # ctime mtime
               + struct.pack(">II", timescale, dur)
               + b"\x00" * 80)
    tkhd = box(b"tkhd", struct.pack(">B3x", 0)
               + struct.pack(">IIII", 0, 0, 1, 0)  # times, id, rsvd
               + b"\x00" * 56          # dur, rsvd, layer/vol, matrix
               + struct.pack(">II", width << 16, height << 16))
    mdhd = box(b"mdhd", struct.pack(">B3x", 0)
               + struct.pack(">IIII", 0, 0, timescale, dur)
               + b"\x00" * 4)
    mdia = box(b"mdia", mdhd)
    trak = box(b"trak", tkhd + mdia)
    moov = box(b"moov", mvhd + trak)
    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2")
    return ftyp + moov


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

"""Baseline JPEG (ITU-T T.81) decode and encode — stdlib + numpy.

Closes the JPEG half of the multimodal decode seam with a REAL
in-container codec, no image library:

- **decode_jpeg**: marker walk (DQT/SOF0/DHT/SOS/DRI, APPn/COM
  skipped), canonical-Huffman entropy decode with byte unstuffing and
  restart-marker handling, dequantize + dezigzag, orthonormal 8×8
  IDCT as two numpy matrix products, chroma upsampling for any
  sampling factors ≤ 2 (4:4:4 / 4:2:2 / 4:2:0), BT.601 YCbCr→RGB,
  crop to the declared geometry. Progressive (SOF2) and
  arithmetic-coded JPEGs raise ``NotImplementedError`` so the caller
  routes them to an injected decoder rather than mis-parsing.
- **encode_jpeg**: the test/gate-side generator — 4:4:4 baseline
  encoder with the Annex-K quantization tables (quality 50 = the
  tables verbatim), per-image canonical Huffman tables built from the
  actual symbol frequencies and EMITTED in DHT (the decoder reads
  whatever the file declares, so both sides exercise the real
  canonical-table machinery rather than sharing hardcoded constants).

Exactness lever for oracles: an 8×8-aligned FLAT tile has only a DC
coefficient; with the gray value chosen so 8·(v−128) is a multiple of
the DC quant step (even v−128 under the standard luminance table) and
r=g=b (so chroma is exactly 128 → all-zero blocks), the decoded tile
is bit-exact — making channel sums SQL-recomputable even though JPEG
is lossy in general. The gate leans on this; the tests also check
PSNR on dense random images where exactness is impossible.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------- tables

# zigzag scan order: (row, col) pairs in transmission order
ZIGZAG: list[tuple[int, int]] = []
for _s in range(15):
    _d = [(i, _s - i) for i in range(max(0, _s - 7), min(7, _s) + 1)]
    ZIGZAG.extend(_d if _s % 2 else _d[::-1])

# flat raster index of each zigzag position: blk.flat[_ZZ_FLAT[z]] is
# the coefficient transmitted at zigzag position z (vectorized
# (de)zigzag — a pure permutation, value-exact vs the (r, c) loops)
_ZZ_FLAT = np.array([r * 8 + c for r, c in ZIGZAG], dtype=np.intp)

# Annex K.1/K.2 quantization tables (quality 50), zigzag order
_QL_RASTER = np.array([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99]], dtype=np.int32)
_QC_RASTER = np.array([
    [17, 18, 24, 47, 99, 99, 99, 99],
    [18, 21, 26, 66, 99, 99, 99, 99],
    [24, 26, 56, 99, 99, 99, 99, 99],
    [47, 66, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99]], dtype=np.int32)

# orthonormal DCT-II matrix: forward X = C A Cᵀ, inverse A = Cᵀ X C
_C = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _C[_k, _n] = (np.sqrt(1 / 8) if _k == 0 else 0.5) * np.cos(
            (2 * _n + 1) * _k * np.pi / 16)


def _scaled_q(base: np.ndarray, quality: int) -> np.ndarray:
    if not 1 <= quality <= 100:
        raise ValueError("quality must be in 1..100")
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = (base * scale + 50) // 100
    return np.clip(q, 1, 255).astype(np.int32)


# ----------------------------------------------------------- bit streams

class _BitReader:
    """MSB-first reader over the entropy-coded segment: unstuffs
    FF00, stops at markers (leaves them for the caller)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bits = 0
        self.nbits = 0

    def _fill(self) -> None:
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2          # stuffed FF
            else:
                raise _MarkerHit(0xFF00 | nxt)
        else:
            self.pos += 1
        self.bits = (self.bits << 8) | b
        self.nbits += 8

    def read(self, n: int) -> int:
        while self.nbits < n:
            self._fill()
        self.nbits -= n
        v = (self.bits >> self.nbits) & ((1 << n) - 1)
        self.bits &= (1 << self.nbits) - 1
        return v

    def align_to_marker(self) -> int:
        """Drop partial bits and consume the next marker (RSTn)."""
        self.bits = 0
        self.nbits = 0
        while self.data[self.pos] != 0xFF or self.data[self.pos + 1] == 0x00:
            self.pos += 1
        m = (0xFF00 | self.data[self.pos + 1])
        self.pos += 2
        return m


class _MarkerHit(Exception):
    def __init__(self, marker: int):
        self.marker = marker


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nacc = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | code
        self.nacc += length
        while self.nacc >= 8:
            self.nacc -= 8
            b = (self.acc >> self.nacc) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)   # byte stuffing
            self.acc &= (1 << self.nacc) - 1

    def flush(self) -> bytes:
        if self.nacc:
            pad = 8 - self.nacc
            self.write((1 << pad) - 1, pad)
        return bytes(self.out)

    def marker(self, m: int) -> None:
        """Byte-align (1-padding) and emit a raw marker (RSTn)."""
        if self.nacc:
            pad = 8 - self.nacc
            self.write((1 << pad) - 1, pad)
        self.out += bytes([0xFF, m])


# --------------------------------------------------------------- huffman

def _build_decode_table(bits: list[int], vals: list[int]) -> tuple:
    """Canonical Huffman (T.81 C.2) as (minlen, mincode, maxcode,
    valptr, vals) arrays for the F.2.2.3-style decoder: one bulk
    read of the shortest code length, then one extra bit per longer
    length — same MSB-first bit consumption as the old bit-at-a-time
    dict walk, without a tuple-keyed dict lookup per bit."""
    mincode = [0] * 17
    maxcode = [-1] * 17          # empty lengths never match
    valptr = [0] * 17
    code = 0
    k = 0
    minlen = 0
    for length in range(1, 17):
        n = bits[length - 1]
        if n:
            if not minlen:
                minlen = length
            valptr[length] = k
            mincode[length] = code
            maxcode[length] = code + n - 1
            code += n
            k += n
        code <<= 1
    if k:
        vals[k - 1]              # truncated DHT payload -> IndexError
    return (minlen or 16, mincode, maxcode, valptr, vals)


def _decode_symbol(br: _BitReader, table: tuple) -> int:
    minlen, mincode, maxcode, valptr, vals = table
    code = br.read(minlen)
    length = minlen
    while code > maxcode[length]:
        length += 1
        if length > 16:
            raise ValueError("invalid JPEG Huffman code")
        code = (code << 1) | br.read(1)
    return vals[valptr[length] + code - mincode[length]]


def _canonical_encode_table(freqs: dict[int, int]) -> tuple[
        list[int], list[int], dict[int, tuple[int, int]]]:
    """Equal-length canonical table over the USED symbols (valid
    canonical Huffman: n symbols at length L with n < 2^L, so the
    all-ones code never appears). Returns (bits, vals,
    {symbol: (code, length)}) for DHT emission + encoding."""
    syms = sorted(freqs)
    if not syms:
        syms = [0]
    n = len(syms)
    length = max(1, (n + 1 - 1).bit_length())  # n ≤ 2^L − 1
    while (1 << length) - 1 < n:
        length += 1
    bits = [0] * 16
    bits[length - 1] = n
    enc = {s: (i, length) for i, s in enumerate(syms)}
    return bits, syms, enc


def _magnitude(v: int) -> tuple[int, int]:
    """(size, value-bits) per T.81 F.1.2.1 two's-complement-ish
    magnitude coding."""
    if v == 0:
        return 0, 0
    size = int(abs(v)).bit_length()
    return size, v if v >= 0 else v + (1 << size) - 1


def _extend(raw: int, size: int) -> int:
    if size == 0:
        return 0
    return raw if raw >= (1 << (size - 1)) else raw - (1 << size) + 1


# ---------------------------------------------------------------- decode

def decode_jpeg(content: bytes) -> dict:
    """Decode a baseline (SOF0) JPEG to pixel statistics (same shape
    as the PNG/PPM/BMP decoders). Sampling factors up to 2×2; raises
    ``NotImplementedError`` for progressive/arithmetic streams and
    ``ValueError`` for ANY corrupt stream — callers route undecodable
    blobs to the injected decoder by catching exactly those two, so
    no internal exception type may escape (truncated headers surface
    as IndexError/struct.error/StopIteration/KeyError inside)."""
    try:
        return _decode_jpeg_inner(content)
    except (ValueError, NotImplementedError):
        raise
    except (IndexError, KeyError, StopIteration, struct.error) as e:
        raise ValueError(
            f"corrupt JPEG stream: {type(e).__name__} while "
            "parsing") from None


def _decode_jpeg_inner(content: bytes) -> dict:
    if content[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG blob (missing SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    frame = None
    restart_interval = 0
    while pos < len(content):
        if content[pos] != 0xFF:
            raise ValueError("JPEG marker expected")
        marker = content[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:      # EOI without SOS
            break
        (seglen,) = struct.unpack_from(">H", content, pos)
        seg = content[pos + 2:pos + seglen]
        if marker == 0xDB:      # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0xF
                i += 1
                if pq:
                    vals = np.frombuffer(seg, dtype=">u2", count=64,
                                         offset=i).astype(np.int32)
                    i += 128
                else:
                    vals = np.frombuffer(seg, dtype=np.uint8, count=64,
                                         offset=i).astype(np.int32)
                    i += 64
                q = np.zeros(64, dtype=np.int32)
                q[_ZZ_FLAT] = vals
                qt[tq] = q.reshape(8, 8)
        elif marker == 0xC4:    # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0xF
                bits = list(seg[i + 1:i + 17])
                nv = sum(bits)
                vals = list(seg[i + 17:i + 17 + nv])
                huff[(tc, th)] = _build_decode_table(bits, vals)
                i += 17 + nv
        elif marker == 0xC0 or marker == 0xC1:   # SOF0/1 baseline
            prec, h, w, nc = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8:
                raise NotImplementedError(f"JPEG precision {prec}")
            comps = []
            for c in range(nc):
                cid, hv, tq = struct.unpack_from(">BBB", seg, 6 + 3 * c)
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF,
                              "tq": tq})
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"non-baseline JPEG (SOF{marker - 0xC0})")
        elif marker == 0xDD:    # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:    # SOS — entropy data follows
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            ns = seg[0]
            scan = []
            for c in range(ns):
                cs, tt = seg[1 + 2 * c], seg[2 + 2 * c]
                comp = next(x for x in frame["comps"] if x["id"] == cs)
                scan.append({"comp": comp, "dc": tt >> 4, "ac": tt & 0xF})
            pos += seglen
            return _decode_scan(content, pos, frame, scan, qt, huff,
                                restart_interval)
        pos += seglen
    raise ValueError("JPEG stream has no SOS scan")


def _decode_block(br: _BitReader, dc_tab: tuple, ac_tab: tuple,
                  pred: int) -> tuple[list, int]:
    # the entropy-decode hot loop: _BitReader state is held in locals
    # and every read/fill/symbol-decode is inlined straight-line (the
    # function-call-per-bit-read overhead dominated small-image
    # decode). Identical bit consumption and symbols as the helper
    # form; error paths (_MarkerHit, IndexError) abort the whole scan
    # as ValueError, so state write-back on them is irrelevant.
    coef = [0] * 64
    data = br.data
    pos = br.pos
    bits = br.bits
    nbits = br.nbits
    dc_minlen, dc_mincode, dc_maxcode, dc_valptr, dc_vals = dc_tab
    ac_minlen, ac_mincode, ac_maxcode, ac_valptr, ac_vals = ac_tab

    # ---- DC symbol (canonical decode) + magnitude bits
    n = dc_minlen
    while nbits < n:
        b = data[pos]
        if b == 0xFF:
            if data[pos + 1] == 0x00:
                pos += 2
            else:
                raise _MarkerHit(0xFF00 | data[pos + 1])
        else:
            pos += 1
        bits = (bits << 8) | b
        nbits += 8
    nbits -= n
    code = (bits >> nbits) & ((1 << n) - 1)
    bits &= (1 << nbits) - 1
    length = dc_minlen
    while code > dc_maxcode[length]:
        length += 1
        if length > 16:
            raise ValueError("invalid JPEG Huffman code")
        while nbits < 1:
            b = data[pos]
            if b == 0xFF:
                if data[pos + 1] == 0x00:
                    pos += 2
                else:
                    raise _MarkerHit(0xFF00 | data[pos + 1])
            else:
                pos += 1
            bits = (bits << 8) | b
            nbits += 8
        nbits -= 1
        code = (code << 1) | ((bits >> nbits) & 1)
        bits &= (1 << nbits) - 1
    size = dc_vals[dc_valptr[length] + code - dc_mincode[length]]
    if size:
        while nbits < size:
            b = data[pos]
            if b == 0xFF:
                if data[pos + 1] == 0x00:
                    pos += 2
                else:
                    raise _MarkerHit(0xFF00 | data[pos + 1])
            else:
                pos += 1
            bits = (bits << 8) | b
            nbits += 8
        nbits -= size
        raw = (bits >> nbits) & ((1 << size) - 1)
        bits &= (1 << nbits) - 1
        pred += (raw if raw >= (1 << (size - 1))
                 else raw - (1 << size) + 1)
    coef[0] = pred
    k = 1
    while k < 64:
        # ---- AC symbol (canonical decode)
        n = ac_minlen
        while nbits < n:
            b = data[pos]
            if b == 0xFF:
                if data[pos + 1] == 0x00:
                    pos += 2
                else:
                    raise _MarkerHit(0xFF00 | data[pos + 1])
            else:
                pos += 1
            bits = (bits << 8) | b
            nbits += 8
        nbits -= n
        code = (bits >> nbits) & ((1 << n) - 1)
        bits &= (1 << nbits) - 1
        length = ac_minlen
        while code > ac_maxcode[length]:
            length += 1
            if length > 16:
                raise ValueError("invalid JPEG Huffman code")
            while nbits < 1:
                b = data[pos]
                if b == 0xFF:
                    if data[pos + 1] == 0x00:
                        pos += 2
                    else:
                        raise _MarkerHit(0xFF00 | data[pos + 1])
                else:
                    pos += 1
                bits = (bits << 8) | b
                nbits += 8
            nbits -= 1
            code = (code << 1) | ((bits >> nbits) & 1)
            bits &= (1 << nbits) - 1
        rs = ac_vals[ac_valptr[length] + code - ac_mincode[length]]
        run, size = rs >> 4, rs & 0xF
        if size == 0:
            if run == 15:       # ZRL
                k += 16
                continue
            break               # EOB
        k += run
        if k > 63:
            raise ValueError("JPEG AC run past block end")
        while nbits < size:
            b = data[pos]
            if b == 0xFF:
                if data[pos + 1] == 0x00:
                    pos += 2
                else:
                    raise _MarkerHit(0xFF00 | data[pos + 1])
            else:
                pos += 1
            bits = (bits << 8) | b
            nbits += 8
        nbits -= size
        raw = (bits >> nbits) & ((1 << size) - 1)
        bits &= (1 << nbits) - 1
        coef[k] = (raw if raw >= (1 << (size - 1))
                   else raw - (1 << size) + 1)
        k += 1
    br.pos = pos
    br.bits = bits
    br.nbits = nbits
    return coef, pred


def _decode_scan(data: bytes, pos: int, frame: dict, scan: list,
                 qt: dict, huff: dict, dri: int) -> dict:
    h, w = frame["h"], frame["w"]
    hmax = max(c["comp"]["h"] for c in scan)
    vmax = max(c["comp"]["v"] for c in scan)
    if hmax > 2 or vmax > 2:
        raise NotImplementedError("JPEG sampling factors > 2")
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    # entropy decode collects each component's quantized coefficients
    # (zigzag order, one row per block in (my, mx, by, bx) order);
    # dezigzag + dequantize + IDCT then run batched over all blocks —
    # the same per-block arithmetic, without 64-iteration Python
    # loops and 8×8-at-a-time numpy calls
    coefs = [np.zeros((mcuy * mcux * s["comp"]["v"] * s["comp"]["h"], 64),
                      dtype=np.int32) for s in scan]
    nblk = [0] * len(scan)
    tabs = [(huff[(0, s["dc"])], huff[(1, s["ac"])],
             s["comp"]["v"] * s["comp"]["h"]) for s in scan]
    br = _BitReader(data, pos)
    preds = [0] * len(scan)
    mcu_count = 0
    # corrupt streams must surface as ValueError — callers route
    # undecodable blobs to the injected decoder by catching
    # ValueError/NotImplementedError, so internal exception types
    # (_MarkerHit, end-of-data IndexError) must never escape the scan
    try:
        for my in range(mcuy):
            for mx in range(mcux):
                if dri and mcu_count and mcu_count % dri == 0:
                    m = br.align_to_marker()
                    if not 0xFFD0 <= m <= 0xFFD7:
                        raise ValueError(f"expected RST marker, got {m:#x}")
                    preds = [0] * len(scan)
                try:
                    for si, (dc_tab, ac_tab, nb) in enumerate(tabs):
                        for _ in range(nb):
                            coef, preds[si] = _decode_block(
                                br, dc_tab, ac_tab, preds[si])
                            coefs[si][nblk[si]] = coef
                            nblk[si] += 1
                except _MarkerHit as mh:
                    if mh.marker == 0xFFD9:
                        raise ValueError(
                            "corrupt JPEG stream: data truncated "
                            "mid-scan (EOI inside an MCU)") from None
                    raise ValueError(
                        "corrupt JPEG stream: unexpected marker "
                        f"{mh.marker:#06x} mid-scan") from None
                mcu_count += 1
    except IndexError:
        raise ValueError("corrupt JPEG stream: entropy-coded data "
                         "ended before the last MCU") from None
    planes = []
    for si, s in enumerate(scan):
        c = s["comp"]
        cv, ch = c["v"], c["h"]
        q = qt[c["tq"]]
        blks = np.zeros((len(coefs[si]), 64))
        blks[:, _ZZ_FLAT] = coefs[si]          # dezigzag (permutation)
        blks = blks.reshape(-1, 8, 8) * q      # dequantize
        px = _C.T @ blks @ _C + 128.0          # batched 8×8 IDCT
        # block order is (my, mx, by, bx); reassemble the plane
        planes.append(px.reshape(mcuy, mcux, cv, ch, 8, 8)
                      .transpose(0, 2, 4, 1, 3, 5)
                      .reshape(mcuy * cv * 8, mcux * ch * 8))
    # upsample to full geometry and crop
    full = []
    for si, s in enumerate(scan):
        c = s["comp"]
        p = planes[si]
        p = np.repeat(np.repeat(p, vmax // c["v"], axis=0),
                      hmax // c["h"], axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        ycc = np.clip(np.round(full[0]), 0, 255)
        rgb = np.stack([ycc] * 3, axis=2)
    elif len(full) == 3:
        y, cb, cr = full
        r = y + 1.402 * (cr - 128)
        g = y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128)
        b = y + 1.772 * (cb - 128)
        rgb = np.clip(np.round(np.stack([r, g, b], axis=2)), 0, 255)
    else:
        raise NotImplementedError(f"JPEG with {len(full)} components")
    rgb = rgb.astype(np.int64)
    return {"kind": "image", "width": w, "height": h,
            "sum_r": int(rgb[:, :, 0].sum()),
            "sum_g": int(rgb[:, :, 1].sum()),
            "sum_b": int(rgb[:, :, 2].sum())}


# ---------------------------------------------------------------- encode

def encode_jpeg(px, quality: int = 50, restart_interval: int = 0) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as a baseline 4:4:4 JPEG.
    Annex-K quantization at the given quality (50 = tables verbatim);
    canonical Huffman tables are built from the image's own symbol
    statistics and written to DHT. ``restart_interval`` > 0 emits DRI
    + RSTn markers every that many MCUs (exercises the decoder's
    restart/realign path)."""
    arr = np.ascontiguousarray(np.asarray(px, dtype=np.float64))
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError("encode_jpeg wants an (h, w, 3) array")
    h, w, _ = arr.shape
    r, g, b = arr[:, :, 0], arr[:, :, 1], arr[:, :, 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    ql = _scaled_q(_QL_RASTER, quality)
    qc = _scaled_q(_QC_RASTER, quality)
    ph = (h + 7) // 8 * 8
    pw = (w + 7) // 8 * 8

    def pad(p):
        if ph == h and pw == w:
            return p
        return np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge")

    planes = [(pad(y), ql), (pad(cb), qc), (pad(cr), qc)]
    # pass 1: quantized ZIGZAG coefficient rows per component —
    # blockify via reshape, batched 8×8 DCT, one fancy-index zigzag
    # (same per-block arithmetic as the old slice-at-a-time loop)
    blocks: list[list[list[int]]] = []
    for p, q in planes:
        blks = (p.reshape(ph // 8, 8, pw // 8, 8)
                .transpose(0, 2, 1, 3).reshape(-1, 8, 8) - 128.0)
        coef = _C @ blks @ _C.T
        qz = np.round(coef / q).astype(np.int32)
        blocks.append(qz.reshape(-1, 64)[:, _ZZ_FLAT].tolist())
    # pass 2: symbol statistics (DC sizes, AC run/size) per class
    dc_freq: list[dict[int, int]] = [{}, {}]
    ac_freq: list[dict[int, int]] = [{}, {}]
    per_block_syms: list[list] = [[], [], []]
    for ci in range(3):
        cls = 0 if ci == 0 else 1
        pred = 0
        for i, zz in enumerate(blocks[ci]):
            if restart_interval and i and i % restart_interval == 0:
                pred = 0                     # RSTn resets DC predictors
            diff = zz[0] - pred
            pred = zz[0]
            dsize, dbits = _magnitude(diff)
            dc_freq[cls][dsize] = dc_freq[cls].get(dsize, 0) + 1
            acs = []
            run = 0
            last = 0
            for k in range(63, 0, -1):
                if zz[k]:
                    last = k
                    break
            for k in range(1, last + 1):
                v = zz[k]
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    acs.append((0xF0, 0, 0))    # ZRL
                    ac_freq[cls][0xF0] = ac_freq[cls].get(0xF0, 0) + 1
                    run -= 16
                size, vbits = _magnitude(v)
                sym = (run << 4) | size
                acs.append((sym, size, vbits))
                ac_freq[cls][sym] = ac_freq[cls].get(sym, 0) + 1
                run = 0
            if last < 63:
                acs.append((0x00, 0, 0))        # EOB
                ac_freq[cls][0x00] = ac_freq[cls].get(0x00, 0) + 1
            per_block_syms[ci].append((dsize, dbits, acs))
    tables = []
    enc_tabs = []
    for cls in range(2):
        db, dv, de = _canonical_encode_table(dc_freq[cls])
        ab, av, ae = _canonical_encode_table(ac_freq[cls])
        tables.append(((0, cls, db, dv), (1, cls, ab, av)))
        enc_tabs.append((de, ae))
    # pass 3: emit the stream INTERLEAVED per MCU (4:4:4 → one
    # Y, Cb, Cr block per MCU, in that order — T.81 A.2.3; DC
    # predictors are per-component, so the stats above are unchanged)
    bw = _BitWriter()
    for i in range(len(per_block_syms[0])):
        if restart_interval and i and i % restart_interval == 0:
            bw.marker(0xD0 + ((i // restart_interval - 1) % 8))
        for ci in range(3):
            cls = 0 if ci == 0 else 1
            de, ae = enc_tabs[cls]
            dsize, dbits, acs = per_block_syms[ci][i]
            code, ln = de[dsize]
            bw.write(code, ln)
            if dsize:
                bw.write(dbits, dsize)
            for sym, size, vbits in acs:
                code, ln = ae[sym]
                bw.write(code, ln)
                if size:
                    bw.write(vbits, size)
    payload = bw.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    def zz_bytes(q: np.ndarray) -> bytes:
        return bytes(q.reshape(64)[_ZZ_FLAT].tolist())

    out = bytearray(b"\xff\xd8")
    out += seg(0xDB, b"\x00" + zz_bytes(ql))
    out += seg(0xDB, b"\x01" + zz_bytes(qc))
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    out += seg(0xC0, struct.pack(">BHHB", 8, h, w, 3)
               + bytes([1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1]))
    for cls in range(2):
        for tc, th, bits, vals in tables[cls]:
            out += seg(0xC4, bytes([(tc << 4) | th])
                       + bytes(bits) + bytes(vals))
    out += seg(0xDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
    out += payload
    out += b"\xff\xd9"
    return bytes(out)

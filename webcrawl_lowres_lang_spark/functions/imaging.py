"""Image codec + perceptual hashing for the image+caption content store
(BASELINE.json input_hint: ``bytes:binary, w:int32, h:int32, fmt:string,
phash:int64``; per-row invariant: decoded-pixel allclose / PSNR>=40dB for
lossy formats).

The sandbox has no image libraries (no PIL/opencv), so both codecs are
self-contained:
- ``png`` is a REAL codec: pure numpy + zlib PNG (8-bit RGB, filter-0
  scanlines) — lossless round-trip.
- ``jpeg`` is a REAL baseline JFIF codec since round 4 (pure numpy +
  stdlib; was a quantize+PNG stand-in through round 3): sequential
  baseline per ITU-T T.81, 4:4:4, Annex K quant tables scaled by the IJG
  quality rule, Annex K typical Huffman tables, with the decoder driven
  entirely by the file's own DQT/DHT/SOF0 segments. Round-trip PSNR at
  the fixtures' quality 97 is ~43-44 dB — a genuinely lossy format above
  the 40 dB per-row invariant gate. The round-3 stand-in container still
  decodes (legacy checkpoints; bulk throughput fixtures keep it because
  the pure-python codec is ~20x slower than libjpeg-turbo and would make
  throughput benches codec-bound — see sources/fixtures.page_row).

All batch entry points are Arrow/pandas-UDF-shaped (numpy over pd.Series),
never per-row Python in the Spark hot path.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
_JPEG_QUANT_STEP = 4  # stand-in lossy quantization; PSNR ≈ 46.4 dB


# --- PNG codec (pure numpy + zlib) ------------------------------------------


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def png_encode(arr: np.ndarray) -> bytes:
    """Encode HxWx3 uint8 -> PNG bytes (color type 2, bit depth 8, filter 0)."""
    if arr.dtype != np.uint8 or arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError("png_encode expects HxWx3 uint8")
    h, w, _ = arr.shape
    scan = np.zeros((h, 1 + w * 3), dtype=np.uint8)
    scan[:, 1:] = arr.reshape(h, w * 3)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        _PNG_MAGIC
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(scan.tobytes(), 6))
        + _chunk(b"IEND", b"")
    )


def png_decode(data: bytes) -> np.ndarray:
    """Decode PNG bytes produced by ``png_encode`` (filter 0/1/2 supported)."""
    if not data.startswith(_PNG_MAGIC):
        raise ValueError("not a PNG")
    pos, w, h, idat = len(_PNG_MAGIC), 0, 0, b""
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if tag == b"IHDR":
            w, h, depth, ctype = struct.unpack(">IIBB", body[:10])
            if depth != 8 or ctype != 2:
                raise ValueError("only 8-bit RGB supported")
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        pos += 12 + length
    raw = np.frombuffer(zlib.decompress(idat), dtype=np.uint8).reshape(h, 1 + w * 3)
    filters, scan = raw[:, 0], raw[:, 1:].copy()
    out = np.zeros_like(scan)
    for i in range(h):
        f, line = filters[i], scan[i].astype(np.int64)
        if f == 0:
            out[i] = line
        elif f == 1:  # Sub
            acc = line.reshape(w, 3)
            for x in range(1, w):
                acc[x] = (acc[x] + acc[x - 1]) & 0xFF
            out[i] = acc.reshape(-1)
        elif f == 2:  # Up
            out[i] = (line + out[i - 1]) & 0xFF
        else:
            raise ValueError(f"unsupported PNG filter {f}")
    return out.astype(np.uint8).reshape(h, w, 3)


# --- baseline JFIF codec (pure numpy + stdlib; REAL since round 4) -------------
#
# Sequential baseline JPEG per ITU-T T.81: 4:4:4 sampling, Annex K
# quantization tables scaled by the IJG quality rule, Annex K "typical"
# Huffman tables, JFIF APP0 header. The DECODER is driven entirely by the
# file's own DQT/DHT/SOF0 segments (like any real decoder), so the two
# halves cannot silently share a transcription error. The decoder also
# handles chroma subsampling (4:2:0/4:2:2/4:1:1), restart markers, and
# grayscale scans (round 5). Out of scope (raises, with a PIL fallback in
# decode_image when importable): progressive scans, 12-bit, arithmetic.

_ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
])

_QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32)
_QT_CHROMA = np.array(
    [17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
     24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99]
    + [99] * 32, dtype=np.int32)

# Annex K "typical" Huffman specs: (bits-per-length[1..16], symbol values)
_HUFF_DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0], list(range(12)))
_HUFF_DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0], list(range(12)))
_HUFF_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
     0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
     0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
     0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
     0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
     0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
     0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
     0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
     0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
     0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
     0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
     0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
     0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
     0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)
_HUFF_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
     0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
     0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
     0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
     0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
     0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
     0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
     0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
     0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
     0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
     0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
     0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
     0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
     0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)

# orthonormal 8x8 DCT-II basis: block_freq = _C8 @ block @ _C8.T
_C8 = np.cos(np.pi / 8 * (np.arange(8)[None, :] + 0.5) * np.arange(8)[:, None])
_C8 *= np.sqrt(2.0 / 8)
_C8[0] /= np.sqrt(2.0)


def _scaled_qt(base: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling: 1..100 -> per-coefficient divisors in [1, 255]."""
    q = min(100, max(1, int(quality)))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int32)


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length), canonical assignment per T.81 C.2."""
    out, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self) -> None:
        if self.n:  # pad the final byte with 1-bits (T.81 F.1.2.3)
            self.write((1 << (8 - self.n)) - 1, 8 - self.n)


def _magnitude(v: int) -> tuple[int, int]:
    """(category, value-bits) for a DC diff / AC coefficient per F.1.2."""
    s = int(abs(v)).bit_length()
    return s, (v if v >= 0 else v + (1 << s) - 1)


def _encode_blocks(writer, blocks: np.ndarray, dc_tab, ac_tab, pred: int) -> int:
    """Huffman-encode quantized zigzag blocks (N, 64); returns new DC pred."""
    for zz in blocks:
        s, bits = _magnitude(int(zz[0]) - pred)
        pred = int(zz[0])
        code, ln = dc_tab[s]
        writer.write(code, ln)
        if s:
            writer.write(bits, s)
        run = 0
        nz = np.nonzero(zz[1:])[0]
        last = nz[-1] + 1 if len(nz) else 0
        for i in range(1, last + 1):
            v = int(zz[i])
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, ln = ac_tab[0xF0]  # ZRL
                writer.write(code, ln)
                run -= 16
            s, bits = _magnitude(v)
            code, ln = ac_tab[(run << 4) | s]
            writer.write(code, ln)
            writer.write(bits, s)
            run = 0
        if last < 63:
            code, ln = ac_tab[0x00]  # EOB
            writer.write(code, ln)
    return pred


def _plane_blocks(plane: np.ndarray, qt: np.ndarray) -> np.ndarray:
    """Level-shift, 8x8 DCT, quantize, zigzag -> (n_blocks, 64) int32 in
    raster block order. Vectorized across all blocks at once."""
    h, w = plane.shape
    bh, bw = -(-h // 8), -(-w // 8)
    padded = np.pad(plane, ((0, bh * 8 - h), (0, bw * 8 - w)), mode="edge")
    blocks = (
        padded.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
        .astype(np.float64) - 128.0
    )
    freq = np.einsum("ux,nxy,vy->nuv", _C8, blocks, _C8)
    quant = np.round(freq / qt.reshape(8, 8)).astype(np.int32)
    return quant.reshape(-1, 64)[:, _ZIGZAG]


_SUBSAMP = {"444": (1, 1), "422": (2, 1), "420": (2, 2)}


def _pad_to(plane: np.ndarray, ph: int, pw: int) -> np.ndarray:
    h, w = plane.shape
    if h == ph and w == pw:
        return plane
    return np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")


def _box_down(plane: np.ndarray, fv: int, fh: int) -> np.ndarray:
    """Box-average downsample by (fv, fh); pads to a factor multiple first."""
    h, w = plane.shape
    p = _pad_to(plane, -(-h // fv) * fv, -(-w // fh) * fh)
    return p.reshape(p.shape[0] // fv, fv, p.shape[1] // fh, fh).mean(axis=(1, 3))


def _mcu_block_order(mcuy: int, mcux: int, vc: int, hc: int) -> np.ndarray:
    """Raster-block index for each block in MCU-interleaved order."""
    my, mx = np.divmod(np.arange(mcuy * mcux), mcux)
    by, bx = np.divmod(np.arange(vc * hc), hc)
    return (
        (my[:, None] * vc + by[None, :]) * (mcux * hc) + mx[:, None] * hc + bx[None, :]
    ).reshape(-1)


def jpeg_encode(
    arr: np.ndarray,
    quality: int = 95,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """HxWx3 uint8 RGB -> baseline JFIF bytes (Annex K tables).

    subsampling: "444" (default, byte-identical to the round-4 encoder),
    "422" (2x1 chroma), or "420" (2x2 chroma) with MCU-interleaved scan
    layout per T.81 A.2.3. restart_interval > 0 emits a DRI segment and
    RSTn markers every that-many MCUs (T.81 E.2.4) — the layouts nearly
    all camera/libjpeg streams use, so the decoder below can be exercised
    on realistic structure without any image library in the sandbox.
    """
    if arr.dtype != np.uint8 or arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError("jpeg_encode expects HxWx3 uint8")
    if subsampling == "gray":
        return _jpeg_encode_gray(arr, quality, restart_interval)
    if subsampling not in _SUBSAMP:
        raise ValueError(f"unsupported subsampling: {subsampling}")
    hs, vs = _SUBSAMP[subsampling]
    h, w, _ = arr.shape
    r, g, b = (arr[:, :, i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    qt_l, qt_c = _scaled_qt(_QT_LUMA, quality), _scaled_qt(_QT_CHROMA, quality)

    out = bytearray(b"\xFF\xD8")  # SOI
    out += b"\xFF\xE0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    for tid, qt in ((0, qt_l), (1, qt_c)):
        out += b"\xFF\xDB" + struct.pack(">HB", 67, tid) + bytes(qt[_ZIGZAG].astype(np.uint8))
    out += b"\xFF\xC0" + struct.pack(">HBHHB", 17, 8, h, w, 3)
    for cid, samp, qid in ((1, (hs << 4) | vs, 0), (2, 0x11, 1), (3, 0x11, 1)):
        out += bytes([cid, samp, qid])
    for tc_th, (bits, vals) in (
        (0x00, _HUFF_DC_LUMA), (0x10, _HUFF_AC_LUMA),
        (0x01, _HUFF_DC_CHROMA), (0x11, _HUFF_AC_CHROMA),
    ):
        out += b"\xFF\xC4" + struct.pack(">HB", 3 + 16 + len(vals), tc_th)
        out += bytes(bits) + bytes(vals)
    if restart_interval:
        out += b"\xFF\xDD" + struct.pack(">HH", 4, restart_interval)
    out += b"\xFF\xDA" + struct.pack(">HB", 12, 3)
    for cid, tabs in ((1, 0x00), (2, 0x11), (3, 0x11)):
        out += bytes([cid, tabs])
    out += b"\x00\x3F\x00"  # Ss=0 Se=63 AhAl=0

    dc_l = _canonical_codes(*_HUFF_DC_LUMA)
    ac_l = _canonical_codes(*_HUFF_AC_LUMA)
    dc_c = _canonical_codes(*_HUFF_DC_CHROMA)
    ac_c = _canonical_codes(*_HUFF_AC_CHROMA)
    mcux, mcuy = -(-w // (8 * hs)), -(-h // (8 * vs))
    if hs > 1 or vs > 1:
        cb, cr = _box_down(cb, vs, hs), _box_down(cr, vs, hs)
    # pre-pad every plane to its exact MCU grid so raster block order from
    # _plane_blocks maps onto MCU-interleaved order via _mcu_block_order
    y = _pad_to(y, mcuy * vs * 8, mcux * hs * 8)
    cb = _pad_to(cb, mcuy * 8, mcux * 8)
    cr = _pad_to(cr, mcuy * 8, mcux * 8)
    planes = [
        (_plane_blocks(y, qt_l), dc_l, ac_l, _mcu_block_order(mcuy, mcux, vs, hs), hs * vs),
        (_plane_blocks(cb, qt_c), dc_c, ac_c, _mcu_block_order(mcuy, mcux, 1, 1), 1),
        (_plane_blocks(cr, qt_c), dc_c, ac_c, _mcu_block_order(mcuy, mcux, 1, 1), 1),
    ]
    writer = _BitWriter()
    preds = [0, 0, 0]
    rst = 0
    for m in range(mcuy * mcux):
        if restart_interval and m and m % restart_interval == 0:
            writer.flush()
            writer.out += bytes([0xFF, 0xD0 + (rst & 7)])  # RSTn, not stuffed
            rst += 1
            preds = [0, 0, 0]
        for c, (blocks, dct, act, order, bpm) in enumerate(planes):
            sel = order[m * bpm : (m + 1) * bpm]
            preds[c] = _encode_blocks(writer, blocks[sel], dct, act, preds[c])
    writer.flush()
    out += writer.out
    out += b"\xFF\xD9"  # EOI
    return bytes(out)


def _jpeg_encode_gray(arr: np.ndarray, quality: int, restart_interval: int) -> bytes:
    """1-component (luma only) baseline JFIF — the grayscale layout real
    crawled JPEGs frequently use. Non-interleaved scan: MCU = 1 block."""
    h, w, _ = arr.shape
    y = (
        0.299 * arr[:, :, 0].astype(np.float64)
        + 0.587 * arr[:, :, 1]
        + 0.114 * arr[:, :, 2]
    )
    qt_l = _scaled_qt(_QT_LUMA, quality)
    out = bytearray(b"\xFF\xD8")
    out += b"\xFF\xE0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    out += b"\xFF\xDB" + struct.pack(">HB", 67, 0) + bytes(qt_l[_ZIGZAG].astype(np.uint8))
    out += b"\xFF\xC0" + struct.pack(">HBHHB", 11, 8, h, w, 1) + bytes([1, 0x11, 0])
    for tc_th, (bits, vals) in ((0x00, _HUFF_DC_LUMA), (0x10, _HUFF_AC_LUMA)):
        out += b"\xFF\xC4" + struct.pack(">HB", 3 + 16 + len(vals), tc_th)
        out += bytes(bits) + bytes(vals)
    if restart_interval:
        out += b"\xFF\xDD" + struct.pack(">HH", 4, restart_interval)
    out += b"\xFF\xDA" + struct.pack(">HB", 8, 1) + bytes([1, 0x00]) + b"\x00\x3F\x00"
    dc_l = _canonical_codes(*_HUFF_DC_LUMA)
    ac_l = _canonical_codes(*_HUFF_AC_LUMA)
    blocks = _plane_blocks(y, qt_l)
    writer = _BitWriter()
    pred, rst = 0, 0
    for m in range(blocks.shape[0]):
        if restart_interval and m and m % restart_interval == 0:
            writer.flush()
            writer.out += bytes([0xFF, 0xD0 + (rst & 7)])
            rst += 1
            pred = 0
        pred = _encode_blocks(writer, blocks[m : m + 1], dc_l, ac_l, pred)
    writer.flush()
    out += writer.out
    out += b"\xFF\xD9"
    return bytes(out)


class _FastBits:
    """Entropy-segment reader over the UNSTUFFED byte string: O(1)
    16-bit peek at any bit offset (int.from_bytes over a 4-byte window),
    the structure every production JPEG decoder uses for table-driven
    Huffman decode."""

    __slots__ = ("data", "bitpos")

    def __init__(self, entropy: bytes):
        self.data = entropy + b"\x00\x00\x00\x00"  # peek slack past EOI
        self.bitpos = 0

    def peek16(self) -> int:
        byte, shift = self.bitpos >> 3, self.bitpos & 7
        window = int.from_bytes(self.data[byte : byte + 4], "big")
        return (window >> (16 - shift)) & 0xFFFF

    def skip(self, n: int) -> None:
        self.bitpos += n

    def take(self, n: int) -> int:
        v = self.peek16() >> (16 - n)
        self.bitpos += n
        return v


def _huff_lut(bits: list[int], vals: list[int]) -> np.ndarray:
    """Flat 2^16 lookup: lut[peek16] = (symbol << 8) | code_length.
    Each canonical code of length L owns the 2^(16-L) entries prefixed by
    it — one array index replaces a per-bit tree walk."""
    lut = np.zeros(1 << 16, dtype=np.uint16)
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            start = code << (16 - length)
            lut[start : start + (1 << (16 - length))] = (vals[k] << 8) | length
            code += 1
            k += 1
        code <<= 1
    return lut


def _entropy_segments(data: bytes, pos: int) -> list[bytes]:
    """Split the entropy-coded data into unstuffed restart segments:
    0xFF00 is byte stuffing (stripped), 0xFFD0-D7 are RSTn segment
    boundaries, any other 0xFFxx marker ends the scan (EOI). A stream
    with no restart markers yields exactly one segment."""
    segs: list[bytes] = []
    start = end = pos
    n = len(data)
    while end < n - 1:
        if data[end] == 0xFF:
            nxt = data[end + 1]
            if nxt == 0x00:
                end += 2
                continue
            if 0xD0 <= nxt <= 0xD7:
                segs.append(data[start:end].replace(b"\xFF\x00", b"\xFF"))
                end += 2
                start = end
                continue
            break
        end += 1
    segs.append(data[start:end].replace(b"\xFF\x00", b"\xFF"))
    return segs


def _extend(v: int, s: int) -> int:
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def jpeg_decode(data: bytes) -> np.ndarray:
    """Baseline JFIF bytes -> HxWx3 uint8 RGB; every table comes from the
    file's own DQT/DHT segments. Supports baseline sequential streams with
    ANY integer sampling grid (4:4:4, 4:2:2, 4:2:0, ...), restart markers
    (DRI/RSTn), and 1-component grayscale — the layouts covering nearly
    all real-world libjpeg/camera output. Raises NotImplementedError on
    progressive scans (SOF2) and 12-bit/arithmetic variants; decode_image
    falls back to PIL for those when it is importable."""
    if not data.startswith(b"\xFF\xD8"):
        raise ValueError("not a JPEG")
    pos = 2
    qts: dict[int, np.ndarray] = {}
    huffs: dict[int, dict[tuple[int, int], int]] = {}
    h = w = 0
    restart_interval = 0
    comp_qt: dict[int, int] = {}
    comp_samp: dict[int, tuple[int, int]] = {}
    comp_tabs: dict[int, int] = {}
    comp_order: list[int] = []
    while pos < len(data):
        assert data[pos] == 0xFF, "marker expected"
        marker = data[pos + 1]
        if marker == 0xD9:
            break
        (seglen,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        body = data[pos + 4 : pos + 2 + seglen]
        pos += 2 + seglen
        if marker == 0xDB:
            i = 0
            while i < len(body):
                pq_tq = body[i]
                if pq_tq >> 4:
                    raise NotImplementedError("16-bit quant tables unsupported")
                zz = np.frombuffer(body[i + 1 : i + 65], dtype=np.uint8).astype(np.int32)
                qt = np.zeros(64, dtype=np.int32)
                qt[_ZIGZAG] = zz
                qts[pq_tq & 0xF] = qt
                i += 65
        elif marker == 0xC4:
            i = 0
            while i < len(body):
                tc_th = body[i]
                bits = list(body[i + 1 : i + 17])
                nvals = sum(bits)
                vals = list(body[i + 17 : i + 17 + nvals])
                huffs[tc_th] = _huff_lut(bits, vals)
                i += 17 + nvals
        elif marker == 0xDD:
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xC0:
            _prec, h, w, ncomp = struct.unpack(">BHHB", body[:6])
            for c in range(ncomp):
                cid, samp, qid = body[6 + 3 * c : 9 + 3 * c]
                comp_samp[cid] = (samp >> 4, samp & 0xF)
                comp_qt[cid] = qid
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7):
            raise NotImplementedError("only baseline sequential JPEG supported")
        elif marker == 0xDA:
            ncomp = body[0]
            for c in range(ncomp):
                cid, tabs = body[1 + 2 * c : 3 + 2 * c]
                comp_tabs[cid] = tabs
                comp_order.append(cid)
            break  # entropy data follows
    if len(comp_order) not in (1, 3):
        raise NotImplementedError("only 1- or 3-component scans supported")
    if len(comp_order) == 1:
        # non-interleaved single-component scan: MCU = 1 block, the
        # declared sampling factors do not shape the scan (T.81 A.2.2)
        samp = {comp_order[0]: (1, 1)}
    else:
        samp = {cid: comp_samp[cid] for cid in comp_order}
    hmax = max(s[0] for s in samp.values())
    vmax = max(s[1] for s in samp.values())
    for hc, vc in samp.values():
        if hc < 1 or vc < 1 or hmax % hc or vmax % vc:
            raise NotImplementedError("non-integer subsampling ratio")
    mcux, mcuy = -(-w // (8 * hmax)), -(-h // (8 * vmax))
    n_mcus = mcux * mcuy
    # pass 1: entropy-decode every block's zigzag coefficients (the only
    # inherently sequential part); pass 2 below dequantizes + IDCTs ALL
    # blocks per component in one einsum. Per-MCU template: one entry per
    # block = (comp idx, dc lut, ac lut, raster-index offset grid).
    coeffs = []
    template = []
    for c, cid in enumerate(comp_order):
        hc, vc = samp[cid]
        coeffs.append(np.zeros((mcuy * vc * mcux * hc, 64), dtype=np.int32))
        tabs = comp_tabs[cid]
        dc_lut, ac_lut = huffs[tabs >> 4], huffs[0x10 | (tabs & 0xF)]
        for by in range(vc):
            for bx in range(hc):
                # raster index of this block for MCU (my, mx):
                #   (my*vc + by) * (mcux*hc) + mx*hc + bx
                template.append(
                    (c, dc_lut, ac_lut, vc * mcux * hc, by * mcux * hc + bx, hc)
                )
    segments = _entropy_segments(data, pos)
    seg_i = 0
    reader = _FastBits(segments[0])
    preds = [0] * len(comp_order)
    peek16, skip, take = reader.peek16, reader.skip, reader.take
    for m in range(n_mcus):
        if restart_interval and m and m % restart_interval == 0:
            seg_i += 1
            if seg_i >= len(segments):
                raise ValueError("missing restart segment in JPEG stream")
            reader = _FastBits(segments[seg_i])
            peek16, skip, take = reader.peek16, reader.skip, reader.take
            preds = [0] * len(comp_order)
        my, mx = divmod(m, mcux)
        for c, dc_lut, ac_lut, row_stride, off, hc in template:
            zz = coeffs[c][my * row_stride + mx * hc + off]
            entry = int(dc_lut[peek16()])
            if not entry & 0xFF:
                # unassigned LUT slot = no canonical code matches this
                # prefix; advancing zero bits would silently mis-decode a
                # corrupted stream (the AC branch already raises)
                raise ValueError("invalid Huffman code in JPEG stream")
            s = entry >> 8
            skip(entry & 0xFF)
            preds[c] += _extend(take(s), s) if s else 0
            zz[0] = preds[c]
            k = 1
            while k < 64:
                entry = int(ac_lut[peek16()])
                if not entry & 0xFF:
                    raise ValueError("invalid Huffman code in JPEG stream")
                skip(entry & 0xFF)
                sym = entry >> 8
                if sym == 0x00:
                    break
                if sym == 0xF0:
                    k += 16
                    continue
                k += sym >> 4
                s = sym & 0xF
                zz[k] = _extend(take(s), s)
                k += 1
    planes = []
    for c, cid in enumerate(comp_order):
        hc, vc = samp[cid]
        rows, cols = mcuy * vc, mcux * hc
        # dequant in zigzag order, scatter to raster, one batched IDCT
        deq = coeffs[c].astype(np.float64) * qts[comp_qt[cid]][_ZIGZAG]
        raster = np.zeros((rows * cols, 64))
        raster[:, _ZIGZAG] = deq
        pix = np.einsum("ux,nuv,vy->nxy", _C8, raster.reshape(-1, 8, 8), _C8) + 128.0
        plane = pix.reshape(rows, cols, 8, 8).transpose(0, 2, 1, 3).reshape(rows * 8, cols * 8)
        fy, fx = vmax // vc, hmax // hc
        if fy > 1 or fx > 1:  # nearest-neighbor chroma upsample
            plane = plane.repeat(fy, axis=0).repeat(fx, axis=1)
        planes.append(plane[:h, :w])
    if len(planes) == 1:
        y = planes[0].clip(0, 255).round().astype(np.uint8)
        return np.stack([y, y, y], axis=2)
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.stack([r, g, b], axis=2).clip(0, 255).round().astype(np.uint8)


def jpeg_encode_standin(arr: np.ndarray) -> bytes:
    """Round-3 deterministic lossy stand-in (quantize + PNG container),
    kept so legacy containers still decode; new fixture encoding uses the
    REAL baseline codec above."""
    q = _JPEG_QUANT_STEP
    quant = ((arr.astype(np.int32) + q // 2) // q * q).clip(0, 255).astype(np.uint8)
    return png_encode(quant)


def _pil_decode(data: bytes) -> "np.ndarray | None":
    """Decode via PIL when importable (absent in this sandbox); returns
    None when the library is unavailable so callers can re-raise the
    original NotImplementedError. Mirrors extract_pdf's PyPDF2 fallback:
    the pure-numpy codec is the tested path, the library the wider net."""
    try:
        import io

        from PIL import Image  # type: ignore[import-not-found]
    except ImportError:
        return None
    return np.asarray(Image.open(io.BytesIO(data)).convert("RGB"), dtype=np.uint8)


def decode_image(data: bytes, fmt: str) -> np.ndarray:
    """Decode stored bytes -> HxWx3 uint8 pixels.

    png -> pure-numpy PNG decoder. jpeg -> the REAL baseline JFIF decoder
    (SOI magic), or the legacy round-3 PNG-container stand-in (PNG magic).
    JPEG variants outside the numpy codec's subset (progressive,
    12-bit/arithmetic) fall back to PIL when importable.
    """
    if fmt == "png":
        return png_decode(data)
    if fmt == "jpeg":
        if data.startswith(b"\xFF\xD8"):
            try:
                return jpeg_decode(data)  # REAL baseline JFIF (pure numpy)
            except NotImplementedError:
                pixels = _pil_decode(data)
                if pixels is not None:
                    return pixels
                raise
        if data.startswith(_PNG_MAGIC):
            return png_decode(data)  # legacy round-3 stand-in container
        raise NotImplementedError("unrecognized jpeg container")
    raise NotImplementedError(f"unsupported image format: {fmt}")


# --- deterministic renderer ----------------------------------------------------


def _splitmix64(x: np.ndarray) -> np.ndarray:
    x = (x + np.uint64(0x9E3779B97F4A7C15)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    x ^= x >> np.uint64(30)
    x = (x * np.uint64(0xBF58476D1CE4E5B9)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    x ^= x >> np.uint64(27)
    x = (x * np.uint64(0x94D049BB133111EB)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    x ^= x >> np.uint64(31)
    return x


def render_image(seed: int, key: str, w: int, h: int) -> np.ndarray:
    """Deterministic HxWx3 uint8 image keyed by (seed, key): smooth gradient
    + structured noise. Same (seed,key,w,h) -> identical pixels anywhere."""
    # uint64 wraparound here is intentional (splitmix-style mixing) —
    # errstate keeps numpy's overflow RuntimeWarning out of test output
    with np.errstate(over="ignore"):
        base = np.uint64(zlib.crc32(key.encode()) ^ (seed & 0xFFFFFFFF)) * np.uint64(
            0x9E3779B97F4A7C15
        )
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float64)
    s = _splitmix64(np.arange(6, dtype=np.uint64) + base).astype(np.float64) * (2.0 ** -64)
    img = np.zeros((h, w, 3), dtype=np.float64)
    for c in range(3):
        img[:, :, c] = (
            127.5
            + 80 * np.sin(2 * np.pi * (s[c] + xs / max(w, 1) * (1 + 2 * s[c + 3])))
            + 60 * np.cos(2 * np.pi * (s[c + 3] + ys / max(h, 1)))
        )
    noise_keys = base + np.arange(h * w, dtype=np.uint64)
    noise = (_splitmix64(noise_keys).astype(np.float64) * (2.0 ** -64) - 0.5) * 24
    img += noise.reshape(h, w, 1)
    return img.clip(0, 255).astype(np.uint8)


# --- perceptual hash + PSNR -----------------------------------------------------

_PHASH_SIZE = 32
_DCT = np.cos(
    np.pi / _PHASH_SIZE * (np.arange(_PHASH_SIZE)[:, None] + 0.5) * np.arange(_PHASH_SIZE)[None, :]
).T  # DCT-II basis, (freq, sample)


def _resize_nn(gray: np.ndarray, size: int) -> np.ndarray:
    h, w = gray.shape
    yi = (np.arange(size) * h // size).clip(0, h - 1)
    xi = (np.arange(size) * w // size).clip(0, w - 1)
    return gray[np.ix_(yi, xi)]


def phash64(arr: np.ndarray) -> int:
    """Classic 64-bit DCT perceptual hash: grayscale -> 32x32 -> DCT-II ->
    top-left 8x8 (minus DC) thresholded at the median. Signed int64 so it
    fits the Iceberg ``phash:int64`` column."""
    gray = arr.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
    small = _resize_nn(gray, _PHASH_SIZE)
    freq = _DCT @ small @ _DCT.T
    block = freq[:8, :8].flatten()
    block = np.delete(block, 0)  # drop DC
    bits = block > np.median(block)
    val = np.uint64(0)
    for b in bits[:63]:  # 63 AC bits + leading zero keeps it in int64 range
        val = (val << np.uint64(1)) | np.uint64(bool(b))
    return int(val.astype(np.int64))


def hamming64(a: int, b: int) -> int:
    return bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB; inf for identical images."""
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return 20 * np.log10(255.0) - 10 * np.log10(mse)

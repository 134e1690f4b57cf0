"""Baseline grayscale JPEG codec, numpy + stdlib only.

Closes the last pixel-real media gap (SCALE.md): PNG/GIF/BMP decode
real pixels; JPEG previously stopped at the segment-walking header
parse because its entropy stream needs an actual codec. This module
IS that codec — ITU-T T.81 baseline sequential DCT, greyscale
(1 component, no subsampling), built entirely from the public spec:
Annex K.1 luminance quantization table, Annex K.3 standard DC/AC
Huffman tables, the F.1.2 magnitude-category coding, the F.1.2.3
byte stuffing (0xFF -> 0xFF 0x00), and the A.3.3 zig-zag order.

Determinism contract: `decode(encode(px))` equals the ENCODER's own
reconstruction (`encode_gray(..., return_recon=True)`) bit-exactly —
both paths share _reconstruct on the identical quantized
coefficients, so the only loss is quantization, never codec drift.
tests/test_multimodal.py pins that equality, a PSNR floor vs the
source, and marker-level well-formedness (the segment walker in
operators/multimodal.py parses these files like any other JPEG).

Scale shape: the codec is called from mapInPandas batches (one
Python call per image, numpy-vectorized DCT/quant across all 8x8
blocks of the image at once; only the Huffman bit stream is a
per-coefficient loop, bounded by image size). The encoder exists to
make the SYNTHESIZED corpus real — production pipelines decode
externally-encoded files with the same decoder.
"""

from __future__ import annotations

import functools
import struct

import numpy as np

# Annex K.1 — luminance quantization table (quality 50), zig-zag
# source order flattened here in natural (row-major) order.
STD_LUMA_Q = np.array([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99],
], dtype=np.int32)

# A.3.3 zig-zag: ZIGZAG[k] = natural index of the k-th zig-zag coeff.
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)
UNZIGZAG = np.argsort(ZIGZAG)

# Annex K.3.1 — standard DC luminance Huffman spec (BITS, HUFFVAL).
DC_BITS = (0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
DC_VALS = tuple(range(12))
# Annex K.3.2 — standard AC luminance Huffman spec.
AC_BITS = (0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D)
AC_VALS = (
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
)


def _canonical_codes(bits, vals):
    """C.2 canonical code assignment: {symbol: (code, length)}."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


_DC_ENC = _canonical_codes(DC_BITS, DC_VALS)
_AC_ENC = _canonical_codes(AC_BITS, AC_VALS)

# Orthonormal 8-point DCT-II matrix (A.3.3's FDCT up to the JPEG
# scaling, folded so D @ B @ D.T is exactly the spec's coefficient
# grid for an 8x8 block B).
_D = np.zeros((8, 8))
for _k in range(8):
    _c = np.sqrt(1.0 / 8) if _k == 0 else np.sqrt(2.0 / 8)
    for _n in range(8):
        _D[_k, _n] = _c * np.cos((2 * _n + 1) * _k * np.pi / 16)


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, val: int, nbits: int) -> None:
        if nbits == 0:
            return
        self.acc = (self.acc << nbits) | (val & ((1 << nbits) - 1))
        self.n += nbits
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:        # F.1.2.3 byte stuffing
                self.out.append(0x00)
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self) -> bytes:
        if self.n:
            pad = 8 - self.n
            self.put((1 << pad) - 1, pad)  # 1-bits padding per F.1.2.3
        return bytes(self.out)


def _magnitude(v: int) -> tuple[int, int]:
    """F.1.2.1 category coding: (size, appended bits)."""
    if v == 0:
        return 0, 0
    size = int(abs(v)).bit_length()
    bits = v if v > 0 else v + (1 << size) - 1
    return size, bits


def _blocks_of(px: np.ndarray) -> tuple[np.ndarray, int, int]:
    """Edge-replicate to 8-multiples, return (nb, 8, 8) raster blocks."""
    h, w = px.shape
    H = (h + 7) // 8 * 8
    W = (w + 7) // 8 * 8
    padded = np.pad(px, ((0, H - h), (0, W - w)), mode="edge")
    nby, nbx = H // 8, W // 8
    blocks = (padded.reshape(nby, 8, nbx, 8).transpose(0, 2, 1, 3)
              .reshape(nby * nbx, 8, 8))
    return blocks, nby, nbx


def _quantize(blocks: np.ndarray, q: np.ndarray) -> np.ndarray:
    coef = np.einsum("km,bmn,ln->bkl", _D, blocks.astype(np.float64) - 128.0,
                     _D)
    r = coef / q
    return np.trunc(r + np.copysign(0.5, r)).astype(np.int32)


def _reconstruct(qc: np.ndarray, q: np.ndarray, nby: int, nbx: int,
                 h: int, w: int) -> np.ndarray:
    """Shared dequant + IDCT + level shift + clamp — the decoder AND
    the encoder's return_recon both call exactly this, which is what
    makes decode(encode(x)) bit-equal to the encoder's reconstruction."""
    deq = qc.astype(np.float64) * q
    # D.T @ C @ D per block: sum_{k,l} D[k,m] C[k,l] D[l,n]
    spatial = np.einsum("km,bkl,ln->bmn", _D, deq, _D)
    px = np.clip(np.floor(spatial + 128.0 + 0.5), 0, 255).astype(np.uint8)
    full = (px.reshape(nby, nbx, 8, 8).transpose(0, 2, 1, 3)
            .reshape(nby * 8, nbx * 8))
    return full[:h, :w]


def encode_gray(px: np.ndarray, return_recon: bool = False):
    """Encode a (h, w) uint8 array as a baseline greyscale JPEG.
    With return_recon=True also returns the encoder-side
    reconstruction (the exact pixels any conforming decoder of this
    file must produce under this module's arithmetic)."""
    px = np.asarray(px, dtype=np.uint8)
    if px.ndim != 2 or px.size == 0:
        raise ValueError("encode_gray expects a non-empty 2-D array")
    h, w = px.shape
    if h > 0xFFFF or w > 0xFFFF:
        raise ValueError("image dimension exceeds JPEG's 16-bit field")
    blocks, nby, nbx = _blocks_of(px)
    qc = _quantize(blocks, STD_LUMA_Q)
    zz = qc.reshape(-1, 64)[:, ZIGZAG]

    bw = _BitWriter()
    prev_dc = 0
    for blk in zz:
        diff = int(blk[0]) - prev_dc
        prev_dc = int(blk[0])
        size, bits = _magnitude(diff)
        code, length = _DC_ENC[size]
        bw.put(code, length)
        bw.put(bits, size)
        run = 0
        nz = np.nonzero(blk[1:])[0]
        last = nz[-1] + 1 if len(nz) else 0
        for k in range(1, last + 1):
            v = int(blk[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, length = _AC_ENC[0xF0]  # ZRL
                bw.put(code, length)
                run -= 16
            size, bits = _magnitude(v)
            code, length = _AC_ENC[(run << 4) | size]
            bw.put(code, length)
            bw.put(bits, size)
            run = 0
        if last < 63:
            code, length = _AC_ENC[0x00]      # EOB
            bw.put(code, length)
    entropy = bw.flush()

    dqt = b"\xff\xdb" + struct.pack(">HB", 67, 0) + bytes(
        int(STD_LUMA_Q.reshape(64)[ZIGZAG[k]]) for k in range(64))
    sof = (b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, h, w, 1)
           + bytes((1, 0x11, 0)))
    dht = (b"\xff\xc4"
           + struct.pack(">HB", 2 + 1 + 16 + len(DC_VALS), 0x00)
           + bytes(DC_BITS) + bytes(DC_VALS)
           + b"\xff\xc4"
           + struct.pack(">HB", 2 + 1 + 16 + len(AC_VALS), 0x10)
           + bytes(AC_BITS) + bytes(AC_VALS))
    sos = b"\xff\xda" + struct.pack(">HB", 8, 1) + bytes((1, 0x00, 0, 63, 0))
    data = (b"\xff\xd8" + dqt + sof + dht + sos + entropy + b"\xff\xd9")
    if return_recon:
        return data, _reconstruct(qc, STD_LUMA_Q, nby, nbx, h, w)
    return data


@functools.lru_cache(maxsize=32)
def _lookup_tables(bits: tuple, vals: tuple) -> tuple[list, list]:
    """16-bit-window Huffman lookup (F.2.2.3 done table-driven): for
    every uint16 window value whose leading bits form a code, the code
    length and decoded symbol; length 0 marks an invalid prefix. One
    list index replaces the old per-BIT reader loop (read_symbol →
    read → _fill was ~85% of decode time, ~4 Python calls per bit —
    the GIF-LZW per-code-loop lesson applied to Huffman). Cached:
    real corpora reuse a handful of tables (our encoder ships the
    fixed Annex K pair), so the 64 KiB fill runs once per table, not
    per frame. Plain lists, not arrays — the decode loop consumes
    one scalar at a time and list indexing returns ready Python ints."""
    enc = _canonical_codes(bits, vals)
    lens = np.zeros(65536, dtype=np.int64)
    syms = np.zeros(65536, dtype=np.int64)
    for sym, (code, length) in enc.items():
        lo = code << (16 - length)
        lens[lo:lo + (1 << (16 - length))] = length
        syms[lo:lo + (1 << (16 - length))] = sym
    return lens.tolist(), syms.tolist()


def decode_gray(data: bytes) -> np.ndarray:
    """Decode a baseline greyscale JPEG produced by any conforming
    encoder using 1 component and no restart intervals. Raises
    ValueError on anything else (progressive, multi-component,
    truncated) — the segment walker in operators/multimodal.py remains
    the metadata path for those."""
    if len(data) < 4 or data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    dims = None
    pos = 2
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError("lost JPEG marker sync")
        # B.1.1.2: markers may be preceded by any number of 0xFF fill
        # bytes — skip them (a conforming encoder may pad with 0xFF)
        while data[pos + 1] == 0xFF and pos + 4 <= len(data):
            pos += 1
        marker = data[pos + 1]
        if marker == 0xD9:
            raise ValueError("JPEG ended before SOS")
        if marker == 0x01 or 0xD0 <= marker <= 0xD8:
            pos += 2
            continue
        # the fill-byte skip above can exit on its bounds condition
        # with marker still 0xFF and fewer than 2 length bytes left —
        # keep that inside the ValueError contract (corrupt payload),
        # not a struct.error escaping to the caller
        if marker == 0xFF or pos + 4 > len(data):
            raise ValueError("truncated JPEG (0xFF run at end of data)")
        seglen = struct.unpack(">H", data[pos + 2:pos + 4])[0]
        seg = data[pos + 4:pos + 2 + seglen]
        if marker == 0xDB:
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 15
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                tbl = np.zeros(64, dtype=np.int32)
                tbl[ZIGZAG] = np.frombuffer(seg[i + 1:i + 65],
                                            dtype=np.uint8)
                qt[tq] = tbl.reshape(8, 8)
                i += 65
        elif marker == 0xC4:
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 15
                bits = tuple(seg[i + 1:i + 17])
                nvals = sum(bits)
                # a truncated segment can declare more codes than it
                # carries values — caught here so the canonical-code
                # walk can't run off the value list (fuzz-pinned:
                # decode must be TOTAL, ValueError on any malformation)
                if len(bits) < 16 or i + 17 + nvals > len(seg):
                    raise ValueError("truncated DHT segment")
                vals = tuple(seg[i + 17:i + 17 + nvals])
                huff[(tc, th)] = _lookup_tables(bits, vals)
                i += 17 + nvals
        elif marker == 0xC0 or marker == 0xC1:
            if len(seg) < 9:
                raise ValueError("truncated SOF segment")
            _prec, h, w, nf = struct.unpack(">BHHB", seg[:6])
            if nf != 1:
                raise ValueError("only 1-component baseline supported")
            comp_tq = seg[8]
            dims = (h, w, comp_tq)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            # 0xC8 (JPG extension) included: it signals a non-baseline
            # coding process, not a skippable metadata segment
            raise ValueError("non-baseline JPEG unsupported")
        elif marker == 0xDD:
            raise ValueError("restart intervals unsupported")
        elif marker == 0xDA:
            if dims is None:
                raise ValueError("SOS before SOF")
            if len(seg) < 3:
                raise ValueError("truncated SOS segment")
            ns = seg[0]
            if ns != 1:
                raise ValueError("only 1-component scans supported")
            td, ta = seg[2] >> 4, seg[2] & 15
            if (0, td) not in huff or (1, ta) not in huff:
                raise ValueError("SOS references missing Huffman table")
            if dims[2] not in qt:
                raise ValueError("SOS references missing quant table")
            scan_start = pos + 2 + seglen
            return _decode_scan(data, scan_start, dims, qt,
                                huff[(0, td)], huff[(1, ta)])
        pos += 2 + seglen
    raise ValueError("no SOS marker found")


def _decode_scan(data: bytes, start: int, dims, qt, dc_tab,
                 ac_tab) -> np.ndarray:
    h, w, tq = dims
    end = data.rfind(b"\xff\xd9")
    if end < start:
        raise ValueError("missing EOI")
    entropy = data[start:end].replace(b"\xff\x00", b"\xff")
    dc_len, dc_sym = dc_tab
    ac_len, ac_sym = ac_tab
    # One vectorized pass turns the whole entropy stream into 16-bit
    # lookahead windows: W[p] = the 16 bits starting at bit p, so a
    # code OR a value read at any position is one index. Built from
    # three-byte rolling words with two shifts — not an unpackbits
    # (n,16) bit matrix, whose matmul upcasts to int64 and
    # transiently costs ~128 bytes per input byte (measured 25x
    # slower at 100 KB). W stays the int64 NDARRAY: ~64 bytes per
    # input byte of steady state (8 windows/byte x 8 B). The r9
    # .tolist() form was ~4.5x that (measured ~288 B/input byte —
    # list slot + a fresh PyLong per window), which on a multi-MB
    # real JPEG transiently held hundreds of MB per image on
    # executors (ADVICE r9); each loop read below converts its one
    # scalar with int(), which benchmarks within a few percent of
    # list indexing on 512x512 photo content while the old _BitReader
    # was ~85% of decode wall. The trailing pad is 1-bits (the spec's
    # byte-align fill), so windows past the real stream decode as the
    # (invalid or truncating) padding they are — the pos > nbits
    # guard below keeps the old ValueError contract for truncated
    # streams.
    barr = np.frombuffer(entropy, dtype=np.uint8)
    nbits = barr.size * 8
    padded = np.concatenate(
        [barr, np.full(4, 0xFF, np.uint8)]).astype(np.int64)
    trip = (padded[:-2] << 16) | (padded[1:-1] << 8) | padded[2:]
    idx = np.arange(nbits + 16)
    W = (trip[idx >> 3] >> (8 - (idx & 7))) & 0xFFFF
    nby, nbx = (h + 7) // 8, (w + 7) // 8
    nb = nby * nbx
    zz = np.zeros((nb, 64), dtype=np.int32)
    dc = 0
    pos = 0
    for b in range(nb):
        wv = int(W[pos])
        length = dc_len[wv]
        if length == 0:
            raise ValueError("invalid Huffman code in JPEG stream")
        size = dc_sym[wv]
        pos += length
        if pos > nbits:
            raise ValueError("truncated JPEG entropy stream")
        if size:
            v = int(W[pos]) >> (16 - size)
            pos += size
            if pos > nbits:
                raise ValueError("truncated JPEG entropy stream")
            # F.2.2.1 EXTEND inlined
            dc += v if v >= (1 << (size - 1)) else v - (1 << size) + 1
        zz[b, 0] = dc
        k = 1
        while k < 64:
            wv = int(W[pos])
            length = ac_len[wv]
            if length == 0:
                raise ValueError("invalid Huffman code in JPEG stream")
            sym = ac_sym[wv]
            pos += length
            if pos > nbits:
                raise ValueError("truncated JPEG entropy stream")
            if sym == 0x00:      # EOB
                break
            if sym == 0xF0:      # ZRL
                k += 16
                continue
            size = sym & 15
            if size == 0:
                # T.81 table F.1 leaves (run, size=0) undefined for
                # run not in {0 (EOB), 15 (ZRL)} — a reserved symbol
                # only a corrupt/hostile stream produces. Without
                # this guard the EXTEND below evaluates 1 << -1
                # (ValueError by accident, with a misleading
                # message); fail it as the explicit corrupt-stream
                # contract instead (ADVICE r9).
                raise ValueError("reserved AC symbol in JPEG stream")
            k += sym >> 4
            if k > 63:
                raise ValueError("AC run past block end")
            v = int(W[pos]) >> (16 - size)
            pos += size
            if pos > nbits:
                raise ValueError("truncated JPEG entropy stream")
            zz[b, k] = v if v >= (1 << (size - 1)) else v - (1 << size) + 1
            k += 1
    qc = np.zeros((nb, 64), dtype=np.int32)
    qc[:, ZIGZAG] = zz
    return _reconstruct(qc.reshape(nb, 8, 8), qt[tq], nby, nbx, h, w)

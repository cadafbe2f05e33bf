"""Vendored baseline-DCT JPEG codec (pure python + numpy).

The container has no PIL/libjpeg, so — like operators/png.py — the codec is
implemented from the public JPEG spec (ITU-T T.81): marker segments
(SOI/DQT/SOF0/DHT/SOS/EOI), canonical Huffman entropy coding with byte
stuffing, zigzag ordering, quantization and the 8x8 type-II DCT (orthonormal
matrix form, numpy float64).

Scope (honest gates, mirroring the reference's stub policy for formats it
cannot exercise):
- baseline sequential, 8-bit precision;
- 1-component (grayscale) and 3-component 4:4:4 (no chroma subsampling) —
  subsampled streams raise NotImplementedError;
- no progressive, no restart markers, no arithmetic coding.

Exactness property used by the multimodal oracle: with all-ones quant
tables, an 8x8 block of CONSTANT value has a DC-only spectrum (DC = 8*(v-128),
every AC coefficient is exactly 0), so encode->decode reproduces the block
bit-exactly — a checksum an independent engine can predict without running
a DCT. Non-constant content round-trips within +-1/pixel (float DCT/IDCT
rounding), asserted in tests/test_llm_ops.py.
"""

from __future__ import annotations

import math
import struct

import numpy as np

# ---------------------------------------------------------------------------
# constants

_ZZ: list[tuple[int, int]] = []
for _s in range(15):
    _diag = [(_i, _s - _i) for _i in range(_s + 1) if _i < 8 and _s - _i < 8]
    if _s % 2 == 0:
        _diag = _diag[::-1]  # even diagonals run bottom-left -> top-right
    _ZZ.extend(_diag)
assert _ZZ[:6] == [(0, 0), (0, 1), (1, 0), (2, 0), (1, 1), (0, 2)]

# orthonormal 8x8 DCT-II matrix: F = T @ f @ T.T  (f level-shifted),
# f = T.T @ F @ T. For constant blocks F[0,0] = 8*(v-128), AC exactly 0.
_T = np.zeros((8, 8))
for _u in range(8):
    a = math.sqrt(0.125) if _u == 0 else 0.5
    for _x in range(8):
        _T[_u, _x] = a * math.cos((2 * _x + 1) * _u * math.pi / 16)

# encoder Huffman tables (canonical; carried in DHT so any self-consistent
# table decodes): 12 DC categories at 4 bits, the 162 standard AC symbols
# at 8 bits. Neither uses an all-ones codeword (T.81 C.2 prohibition).
_DC_SYMS = list(range(12))
_AC_SYMS = [0x00, 0xF0] + [(run << 4) | size for run in range(16) for size in range(1, 11)]
_DC_BITS = [0] * 16
_DC_BITS[3] = len(_DC_SYMS)  # all length 4
_AC_BITS = [0] * 16
_AC_BITS[7] = len(_AC_SYMS)  # all length 8


def _canonical_codes(bits: list[int], syms: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) per the canonical JPEG assignment."""
    out: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[syms[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


_DC_ENC = _canonical_codes(_DC_BITS, _DC_SYMS)
_AC_ENC = _canonical_codes(_AC_BITS, _AC_SYMS)


# ---------------------------------------------------------------------------
# bit IO


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            self.n -= 8
            b = (self.acc >> self.n) & 0xFF
            self.buf.append(b)
            if b == 0xFF:
                self.buf.append(0x00)  # byte stuffing

    def flush(self) -> bytes:
        if self.n:
            pad = 8 - self.n
            self.put((1 << pad) - 1, pad)  # 1-fill per spec
        return bytes(self.buf)


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def _fill(self) -> None:
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            nxt = self.data[self.pos]
            if nxt == 0x00:
                self.pos += 1  # unstuff
            else:
                raise ValueError(f"unexpected marker 0xFF{nxt:02X} in entropy data")
        self.acc = (self.acc << 8) | b
        self.n += 8

    def bit(self) -> int:
        if self.n == 0:
            self._fill()
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v


def _magnitude(v: int) -> tuple[int, int]:
    """value -> (category bits, raw code bits) per T.81 F.1.2.1."""
    if v == 0:
        return 0, 0
    s = max(abs(v), 1).bit_length()
    return s, (v if v >= 0 else v + (1 << s) - 1)


def _extend(raw: int, s: int) -> int:
    if s == 0:
        return 0
    return raw if raw >= (1 << (s - 1)) else raw - (1 << s) + 1


# ---------------------------------------------------------------------------
# encoder


def _encode_block(bw: _BitWriter, block: np.ndarray, prev_dc: int) -> int:
    """FDCT + all-ones quant + entropy-code one 8x8 block; returns its DC."""
    coef = _T @ (block.astype(np.float64) - 128.0) @ _T.T
    q = np.rint(coef).astype(np.int64)  # quant table is all ones
    dc = int(q[0, 0])
    s, raw = _magnitude(dc - prev_dc)
    code, ln = _DC_ENC[s]
    bw.put(code, ln)
    if s:
        bw.put(raw, s)
    zz = [int(q[i, j]) for (i, j) in _ZZ[1:]]
    run = 0
    last_nz = -1
    for idx, v in enumerate(zz):
        if v:
            last_nz = idx
    for idx, v in enumerate(zz[: last_nz + 1]):
        if v == 0:
            run += 1
            continue
        while run >= 16:
            code, ln = _AC_ENC[0xF0]  # ZRL
            bw.put(code, ln)
            run -= 16
        s, raw = _magnitude(v)
        code, ln = _AC_ENC[(run << 4) | s]
        bw.put(code, ln)
        bw.put(raw, s)
        run = 0
    if last_nz < 62:
        code, ln = _AC_ENC[0x00]  # EOB
        bw.put(code, ln)
    return dc


def _seg(marker: int, payload: bytes) -> bytes:
    return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload


def _dht_payload(cls: int, tid: int, bits: list[int], syms: list[int]) -> bytes:
    return bytes([(cls << 4) | tid] + bits + syms)


def encode_jpeg(width: int, height: int, pixels: bytes, n_components: int = 1) -> bytes:
    """Baseline JPEG encode. ``pixels``: row-major bytes, interleaved for 3
    components (RGB; converted to YCbCr 4:4:4). Dimensions must be multiples
    of 8 (the synthetic-media use; general padding is out of scope)."""
    if width % 8 or height % 8:
        raise NotImplementedError("encode_jpeg: dimensions must be multiples of 8")
    arr = np.frombuffer(pixels, dtype=np.uint8).reshape(height, width, n_components)
    if n_components == 1:
        planes = [arr[:, :, 0].astype(np.float64)]
    elif n_components == 3:
        r, g, b = (arr[:, :, i].astype(np.float64) for i in range(3))
        y = np.floor(0.299 * r + 0.587 * g + 0.114 * b + 0.5)
        cb = np.floor(128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b + 0.5)
        cr = np.floor(128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b + 0.5)
        planes = [np.clip(p, 0, 255) for p in (y, cb, cr)]
    else:
        raise NotImplementedError("encode_jpeg: 1 or 3 components")

    out = bytearray(b"\xff\xd8")  # SOI
    out += _seg(0xDB, bytes([0x00]) + bytes([1] * 64))  # DQT id0, all ones
    sof = struct.pack(">BHHB", 8, height, width, n_components)
    for cid in range(1, n_components + 1):
        sof += bytes([cid, 0x11, 0x00])  # 1x1 sampling, quant table 0
    out += _seg(0xC0, sof)  # SOF0
    out += _seg(0xC4, _dht_payload(0, 0, _DC_BITS, _DC_SYMS))
    out += _seg(0xC4, _dht_payload(1, 0, _AC_BITS, _AC_SYMS))
    sos = bytes([n_components])
    for cid in range(1, n_components + 1):
        sos += bytes([cid, 0x00])  # DC table 0, AC table 0
    sos += bytes([0, 63, 0])
    out += _seg(0xDA, sos)

    bw = _BitWriter()
    prev_dc = [0] * n_components
    for by in range(height // 8):
        for bx in range(width // 8):
            for ci, plane in enumerate(planes):  # interleaved MCU (4:4:4)
                block = plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
                prev_dc[ci] = _encode_block(bw, block, prev_dc[ci])
    out += bw.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# decoder


def _build_decoder(bits: list[int], syms: list[int]) -> dict[tuple[int, int], int]:
    return {(ln, code): sym for sym, (code, ln) in _canonical_codes(bits, syms).items()}


def _read_huff(br: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code, ln = 0, 0
    while ln < 17:
        code = (code << 1) | br.bit()
        ln += 1
        if (ln, code) in table:
            return table[(ln, code)]
    raise ValueError("invalid Huffman code in entropy stream")


def decode_jpeg(data: bytes) -> tuple[int, int, int, bytes]:
    """-> (width, height, n_components, row-major interleaved pixel bytes).
    Validates markers, reads DQT/DHT from the stream (any canonical tables),
    dequantizes, un-zigzags, IDCTs and color-converts 4:4:4 YCbCr."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    width = height = 0
    comps: list[tuple[int, int]] = []  # (component id, quant table id)
    scan: list[tuple[int, int, int]] = []  # (comp index, dc table, ac table)

    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        # the spec allows any number of 0xFF fill bytes before a marker id
        while pos + 1 < len(data) and data[pos + 1] == 0xFF:
            pos += 1
        if pos + 2 > len(data):
            raise ValueError("truncated JPEG (fill bytes run to end of data)")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            raise ValueError("EOI before SOS")
        if marker == 0x01 or 0xD0 <= marker <= 0xD8:
            continue  # TEM/RSTn/SOI are standalone — no length field
        if pos + 2 > len(data):
            raise ValueError("truncated JPEG segment header")
        (seglen,) = struct.unpack(">H", data[pos : pos + 2])
        if seglen < 2 or pos + seglen > len(data):
            raise ValueError("truncated JPEG segment")
        payload = data[pos + 2 : pos + seglen]
        if marker == 0xDB:
            p = 0
            while p < len(payload):
                pq, tq = payload[p] >> 4, payload[p] & 0x0F
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables unsupported")
                if p + 65 > len(payload):
                    raise ValueError("truncated DQT segment")
                tbl = np.zeros((8, 8), dtype=np.int64)
                for k, (i, j) in enumerate(_ZZ):
                    tbl[i, j] = payload[p + 1 + k]
                qtables[tq] = tbl
                p += 65
        elif marker == 0xC0:
            if len(payload) < 6:
                raise ValueError("truncated SOF0 segment")
            prec, height, width, nc = struct.unpack(">BHHB", payload[:6])
            if prec != 8:
                raise NotImplementedError("only 8-bit precision")
            if len(payload) < 6 + 3 * nc:
                raise ValueError("truncated SOF0 component list")
            for c in range(nc):
                cid, samp, tq = payload[6 + 3 * c : 9 + 3 * c]
                if samp != 0x11:
                    raise NotImplementedError(
                        "chroma subsampling unsupported (4:4:4 only)"
                    )
                comps.append((cid, tq))
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise NotImplementedError("only baseline sequential (SOF0) JPEG")
        elif marker == 0xC4:
            p = 0
            while p < len(payload):
                if p + 17 > len(payload):
                    raise ValueError("truncated DHT segment")
                cls, tid = payload[p] >> 4, payload[p] & 0x0F
                bits = list(payload[p + 1 : p + 17])
                nsym = sum(bits)
                if p + 17 + nsym > len(payload):
                    raise ValueError("truncated DHT symbol list")
                syms = list(payload[p + 17 : p + 17 + nsym])
                htables[(cls, tid)] = _build_decoder(bits, syms)
                p += 17 + nsym
        elif marker == 0xDD:
            raise NotImplementedError("restart markers unsupported")
        elif marker == 0xDA:
            if not payload or len(payload) < 1 + 2 * payload[0]:
                raise ValueError("truncated SOS segment")
            ns = payload[0]
            for c in range(ns):
                cid, tt = payload[1 + 2 * c], payload[2 + 2 * c]
                ci = next(
                    (i for i, (id_, _) in enumerate(comps) if id_ == cid), None
                )
                if ci is None:
                    raise ValueError("SOS references a component missing from SOF0")
                scan.append((ci, tt >> 4, tt & 0x0F))
            pos += seglen
            break
        pos += seglen
    else:
        raise ValueError("no SOS segment")

    if not comps or not width or not height:
        raise ValueError("missing SOF0 before SOS")
    br = _BitReader(data[pos:])
    nbx, nby = (width + 7) // 8, (height + 7) // 8
    planes = [np.zeros((nby * 8, nbx * 8)) for _ in comps]
    prev_dc = [0] * len(comps)
    try:
        for by in range(nby):
            for bx in range(nbx):
                for ci, dct, act in scan:
                    q = qtables[comps[ci][1]]
                    coef = np.zeros((8, 8), dtype=np.int64)
                    s = _read_huff(br, htables[(0, dct)])
                    prev_dc[ci] += _extend(br.bits(s), s)
                    coef[0, 0] = prev_dc[ci]
                    k = 1
                    while k < 64:
                        sym = _read_huff(br, htables[(1, act)])
                        if sym == 0x00:  # EOB
                            break
                        run, s = sym >> 4, sym & 0x0F
                        if s == 0:
                            if run != 15:
                                raise ValueError("invalid AC symbol")
                            k += 16  # ZRL
                            continue
                        k += run
                        if k > 63:
                            raise ValueError("AC run-length past end of block")
                        i, j = _ZZ[k]
                        coef[i, j] = _extend(br.bits(s), s)
                        k += 1
                    block = _T.T @ (coef * q).astype(np.float64) @ _T
                    planes[ci][by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = block
    except (IndexError, KeyError) as e:
        # _BitReader running off the data / a table id the header never
        # defined — consistent corrupt-input contract (ValueError)
        raise ValueError(f"truncated or corrupt JPEG entropy stream: {e!r}") from e
    # trailing EOI check (skip pad bits / stuffing remainder)
    tail = data[pos + br.pos :]
    if b"\xff\xd9" not in tail[:4]:
        raise ValueError("missing EOI after entropy data")

    planes = [p[:height, :width] + 128.0 for p in planes]
    if len(comps) == 1:
        out = np.clip(np.floor(planes[0] + 0.5), 0, 255).astype(np.uint8)
        return width, height, 1, out.tobytes()
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack(
        [np.clip(np.floor(c + 0.5), 0, 255) for c in (r, g, b)], axis=-1
    ).astype(np.uint8)
    return width, height, 3, rgb.tobytes()

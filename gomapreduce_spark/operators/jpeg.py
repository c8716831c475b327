"""REAL baseline JPEG codec — pure numpy + stdlib, no libjpeg/PIL.

Completes the image codec set (P6 PPM and PNG decode natively in
multimodal.py): baseline sequential DCT JPEG (SOF0), the format ~all
JPEG files on the web use. Supported: 8-bit greyscale and YCbCr color,
4:4:4 / 4:2:2 / 4:2:0 chroma subsampling, restart markers, byte
stuffing. Progressive (SOF2) and arithmetic coding raise
NotImplementedError honestly.

The encoder exists for round-trip tests (flat blocks reconstruct
exactly; natural images to within quantization error) and emits
4:4:4 with the Annex K example tables. Entropy coding is bit-level
Python — fine for the small images tests use; a 100 TB media pipeline
would bind libjpeg-turbo inside the same mapInPandas batches (the
Spark-side plumbing is identical, which is the point of proving the
format end-to-end here).

Reference: ITU-T T.81 (the JPEG standard), Annex F (baseline) and
Annex K (example tables). No code is derived from any decoder
implementation — tables are transcribed from the standard.
"""

from __future__ import annotations

import struct

import numpy as np

# --------------------------------------------------------------------------
# Shared tables (ITU-T T.81 Annex K)
# --------------------------------------------------------------------------

ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
])

# Annex K.1 luminance / K.2 chrominance quantization tables (quality 50)
QTABLE_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32)
QTABLE_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32)

# Annex K.3 typical Huffman tables: (bits[1..16] code counts, values)
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
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
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
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
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

# 8x8 DCT-II basis matrix: T @ block @ T.T is the forward 2-D DCT
_k = np.arange(8)
DCT_T = np.sqrt(2.0 / 8) * np.cos((2 * _k[None, :] + 1) * _k[:, None] * np.pi / 16)
DCT_T[0] /= np.sqrt(2.0)


def _huff_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol → (code, length), canonical JPEG code assignment
    (T.81 Annex C: codes of increasing length, value order)."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _huff_decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) → symbol for the decoder."""
    return {(l, c): s for s, (c, l) in _huff_codes(bits, vals).items()}


def _magnitude(v: int) -> tuple[int, int]:
    """DC/AC value → (size category, appended bits) per T.81 F.1.2.1."""
    if v == 0:
        return 0, 0
    size = int(v).bit_length() if v > 0 else int(-v).bit_length()
    return size, v if v >= 0 else v + (1 << size) - 1


def _extend(bits_val: int, size: int) -> int:
    """Inverse of _magnitude (T.81 F.2.2.1 EXTEND)."""
    if size == 0:
        return 0
    if bits_val < (1 << (size - 1)):
        return bits_val - (1 << size) + 1
    return bits_val


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            byte = (self.acc >> (self.n - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:
                self.buf.append(0x00)  # byte stuffing
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def pad_align(self) -> None:
        if self.n:
            self.write((1 << (8 - self.n)) - 1, 8 - self.n)  # pad with 1s

    def restart(self, idx: int) -> None:
        """Byte-align and emit RSTn (marker bytes are never stuffed)."""
        self.pad_align()
        self.buf += bytes([0xFF, 0xD0 + (idx % 8)])

    def flush(self) -> bytes:
        self.pad_align()
        return bytes(self.buf)


class _BitReader:
    """Bit reader over entropy-coded data with 0xFF00 de-stuffing and
    restart-marker awareness."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def _fill(self) -> None:
        while self.n <= 24:
            if self.pos >= len(self.data):
                self.acc = (self.acc << 8) | 0  # pad: spec allows trailing 1s/0s
                self.n += 8
                continue
            b = self.data[self.pos]
            if b == 0xFF:
                nxt = self.data[self.pos + 1] if self.pos + 1 < len(self.data) else 0xD9
                if nxt == 0x00:
                    self.pos += 2
                elif 0xD0 <= nxt <= 0xD7:  # restart marker: stop fill, handled upstream
                    self.acc = (self.acc << 8) | 0
                    self.n += 8
                    continue
                else:  # EOI or next segment — pad
                    self.acc = (self.acc << 8) | 0
                    self.n += 8
                    continue
            else:
                self.pos += 1
            self.acc = (self.acc << 8) | b
            self.n += 8

    def bits(self, k: int) -> int:
        if k == 0:
            return 0
        self._fill()
        v = (self.acc >> (self.n - k)) & ((1 << k) - 1)
        self.n -= k
        self.acc &= (1 << self.n) - 1
        return v

    def align_restart(self) -> None:
        """Discard buffered bits and skip the FFDn restart marker."""
        self.acc = 0
        self.n = 0
        while self.pos + 1 < len(self.data):
            if self.data[self.pos] == 0xFF and 0xD0 <= self.data[self.pos + 1] <= 0xD7:
                self.pos += 2
                return
            self.pos += 1


def _decode_huff_symbol(r: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | r.bits(1)
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in entropy stream")


# --------------------------------------------------------------------------
# Encoder (4:4:4, Annex K tables) — exists to power round-trip tests
# --------------------------------------------------------------------------

def _pad_to(plane: np.ndarray, rows: int, cols: int) -> np.ndarray:
    """Edge-replication pad up to (rows, cols) — what every encoder does."""
    return np.pad(plane, ((0, rows - plane.shape[0]), (0, cols - plane.shape[1])), mode="edge")


def _encode_block(writer, block, qtab, dc_tab, ac_tab, pred: int) -> int:
    coeffs = DCT_T @ block @ DCT_T.T
    quant = np.round(coeffs / qtab.reshape(8, 8)).astype(np.int64).flatten()[ZIGZAG]
    diff = int(quant[0]) - pred
    size, extra = _magnitude(diff)
    code, length = dc_tab[size]
    writer.write(code, length)
    if size:
        writer.write(extra, size)
    run = 0
    for k in range(1, 64):
        v = int(quant[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_tab[0xF0]  # ZRL
            writer.write(code, length)
            run -= 16
        size, extra = _magnitude(v)
        code, length = ac_tab[(run << 4) | size]
        writer.write(code, length)
        writer.write(extra, size)
        run = 0
    if run:
        code, length = ac_tab[0x00]  # EOB
        writer.write(code, length)
    return int(quant[0])


def encode_jpeg(px: np.ndarray, subsample: bool = False, restart_interval: int = 0) -> bytes:
    """(h, w) greyscale or (h, w, 3) RGB uint8 → baseline JFIF bytes
    with the Annex K quant + Huffman tables. ``subsample=True`` emits
    4:2:0 (2×2-averaged chroma, the dominant layout in the wild);
    ``restart_interval`` > 0 emits DRI + byte-aligned RSTn markers with
    DC-predictor resets every that many MCUs — both exist so the
    decoder's subsampling and restart paths have real round-trip
    coverage, not just 4:4:4."""
    px = np.asarray(px, dtype=np.uint8)
    grey = px.ndim == 2
    h, w = px.shape[:2]
    if grey:
        comps = [{"plane": px.astype(np.float64) - 128.0, "h": 1, "v": 1,
                  "q": QTABLE_LUMA, "tsel": 0}]
    else:
        rgb = px.astype(np.float64)
        y = 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
        cb = -0.168736 * rgb[..., 0] - 0.331264 * rgb[..., 1] + 0.5 * rgb[..., 2] + 128.0
        cr = 0.5 * rgb[..., 0] - 0.418688 * rgb[..., 1] - 0.081312 * rgb[..., 2] + 128.0
        if subsample:
            ph, pw = (h + 1) // 2 * 2, (w + 1) // 2 * 2
            sub = lambda p: _pad_to(p, ph, pw).reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
            comps = [
                {"plane": y - 128.0, "h": 2, "v": 2, "q": QTABLE_LUMA, "tsel": 0},
                {"plane": sub(cb) - 128.0, "h": 1, "v": 1, "q": QTABLE_CHROMA, "tsel": 1},
                {"plane": sub(cr) - 128.0, "h": 1, "v": 1, "q": QTABLE_CHROMA, "tsel": 1},
            ]
        else:
            comps = [
                {"plane": y - 128.0, "h": 1, "v": 1, "q": QTABLE_LUMA, "tsel": 0},
                {"plane": cb - 128.0, "h": 1, "v": 1, "q": QTABLE_CHROMA, "tsel": 1},
                {"plane": cr - 128.0, "h": 1, "v": 1, "q": QTABLE_CHROMA, "tsel": 1},
            ]

    dc_tabs = [_huff_codes(DC_LUMA_BITS, DC_LUMA_VALS), _huff_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)]
    ac_tabs = [_huff_codes(AC_LUMA_BITS, AC_LUMA_VALS), _huff_codes(AC_CHROMA_BITS, AC_CHROMA_VALS)]

    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    for c in comps:
        c["plane"] = _pad_to(c["plane"], mcuy * c["v"] * 8, mcux * c["h"] * 8)
        c["pred"] = 0

    writer = _BitWriter()
    mcu_count = 0
    rst_idx = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                writer.restart(rst_idx)
                rst_idx += 1
                for c in comps:
                    c["pred"] = 0
            for c in comps:
                for v in range(c["v"]):
                    for hh in range(c["h"]):
                        ys = (my * c["v"] + v) * 8
                        xs = (mx * c["h"] + hh) * 8
                        block = c["plane"][ys : ys + 8, xs : xs + 8]
                        c["pred"] = _encode_block(
                            writer, block, c["q"], dc_tabs[c["tsel"]], ac_tabs[c["tsel"]], c["pred"]
                        )
            mcu_count += 1
    entropy = writer.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    out = b"\xff\xd8"  # SOI
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xFFDB, b"\x00" + bytes(QTABLE_LUMA.flatten()[ZIGZAG].astype(np.uint8)))
    if not grey:
        out += seg(0xFFDB, b"\x01" + bytes(QTABLE_CHROMA.flatten()[ZIGZAG].astype(np.uint8)))
    sof = struct.pack(">BHHB", 8, h, w, len(comps))
    for ci, c in enumerate(comps):
        sof += struct.pack(">BBB", ci + 1, (c["h"] << 4) | c["v"], 0 if ci == 0 else 1)
    out += seg(0xFFC0, sof)

    def dht(cls: int, tid: int, bits: list[int], vals: list[int]) -> bytes:
        return seg(0xFFC4, bytes([cls << 4 | tid]) + bytes(bits) + bytes(vals))

    out += dht(0, 0, DC_LUMA_BITS, DC_LUMA_VALS)
    out += dht(1, 0, AC_LUMA_BITS, AC_LUMA_VALS)
    if not grey:
        out += dht(0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS)
        out += dht(1, 1, AC_CHROMA_BITS, AC_CHROMA_VALS)
    if restart_interval:
        out += seg(0xFFDD, struct.pack(">H", restart_interval))
    sos = bytes([len(comps)])
    for ci in range(len(comps)):
        sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    sos += b"\x00\x3f\x00"
    out += seg(0xFFDA, sos)
    out += entropy
    out += b"\xff\xd9"  # EOI
    return out


# --------------------------------------------------------------------------
# Decoder (baseline SOF0: greyscale + YCbCr, 4:4:4/4:2:2/4:2:0, restarts)
# --------------------------------------------------------------------------

def decode_jpeg(payload: bytes):
    """Baseline JPEG bytes → (w, h, (h, w, 3) uint8 RGB array).
    Greyscale is replicated to RGB for a uniform downstream interface.
    Raises ValueError for non-JPEG and NotImplementedError for
    progressive/arithmetic/12-bit variants."""
    if len(payload) < 4 or payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    qtables: dict[int, np.ndarray] = {}
    dc_tables: dict[int, dict] = {}
    ac_tables: dict[int, dict] = {}
    frame = None
    restart_interval = 0
    i = 2
    while i + 4 <= len(payload):
        if payload[i] != 0xFF:
            raise ValueError("corrupt JPEG: expected marker")
        marker = payload[i + 1]
        if marker == 0xD9:  # EOI
            break
        if marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError("only baseline sequential JPEG (SOF0) decodes natively")
        size = struct.unpack(">H", payload[i + 2 : i + 4])[0]
        body = payload[i + 4 : i + 2 + size]
        if marker == 0xDB:  # DQT
            j = 0
            while j < len(body):
                pq, tq = body[j] >> 4, body[j] & 0x0F
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables unsupported")
                tbl = np.zeros(64, dtype=np.int32)
                tbl[ZIGZAG] = np.frombuffer(body[j + 1 : j + 65], dtype=np.uint8)
                qtables[tq] = tbl.reshape(8, 8)
                j += 65
        elif marker == 0xC4:  # DHT
            j = 0
            while j < len(body):
                cls, tid = body[j] >> 4, body[j] & 0x0F
                bits = list(body[j + 1 : j + 17])
                nvals = sum(bits)
                vals = list(body[j + 17 : j + 17 + nvals])
                (ac_tables if cls else dc_tables)[tid] = _huff_decode_table(bits, vals)
                j += 17 + nvals
        elif marker == 0xC0:  # SOF0
            precision, h, w, ncomp = struct.unpack(">BHHB", body[:6])
            if precision != 8:
                raise NotImplementedError("only 8-bit precision supported")
            comps = []
            for c in range(ncomp):
                cid, hv, tq = body[6 + c * 3 : 9 + c * 3]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq})
            frame = {"h": h, "w": w, "comps": comps}
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", body[:2])[0]
        elif marker == 0xDA:  # SOS
            ns = body[0]
            scan_comps = []
            for c in range(ns):
                cs, tt = body[1 + c * 2], body[2 + c * 2]
                scan_comps.append({"cs": cs, "dc": tt >> 4, "ac": tt & 0x0F})
            if frame is None:
                raise ValueError("SOS before SOF0")
            data_start = i + 2 + size
            return _decode_scan(
                payload[data_start:], frame, scan_comps, qtables, dc_tables, ac_tables,
                restart_interval,
            )
        i += 2 + size
    raise ValueError("no SOS scan found")


def _decode_scan(data, frame, scan_comps, qtables, dc_tables, ac_tables, restart_interval):
    h, w = frame["h"], frame["w"]
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    by_id = {c["id"]: c for c in comps}
    order = [by_id[s["cs"]] for s in scan_comps]
    for c, s in zip(order, scan_comps):
        c["dc_tab"] = dc_tables[s["dc"]]
        c["ac_tab"] = ac_tables[s["ac"]]
        c["q"] = qtables[c["tq"]].astype(np.float64)
        c["plane"] = np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8))
        c["pred"] = 0

    r = _BitReader(data)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                r.align_restart()
                for c in order:
                    c["pred"] = 0
            for c in order:
                for v in range(c["v"]):
                    for hh in range(c["h"]):
                        zz = np.zeros(64)
                        t = _decode_huff_symbol(r, c["dc_tab"])
                        diff = _extend(r.bits(t), t)
                        c["pred"] += diff
                        zz[0] = c["pred"]
                        k = 1
                        while k < 64:
                            rs = _decode_huff_symbol(r, c["ac_tab"])
                            rrrr, ssss = rs >> 4, rs & 0x0F
                            if ssss == 0:
                                if rrrr == 15:
                                    k += 16  # ZRL
                                    continue
                                break  # EOB
                            k += rrrr
                            if k > 63:
                                raise ValueError("AC run past end of block")
                            zz[k] = _extend(r.bits(ssss), ssss)
                            k += 1
                        block = np.zeros(64)
                        block[ZIGZAG] = zz
                        coeffs = block.reshape(8, 8) * c["q"]
                        pix = DCT_T.T @ coeffs @ DCT_T + 128.0
                        ys = (my * c["v"] + v) * 8
                        xs = (mx * c["h"] + hh) * 8
                        c["plane"][ys : ys + 8, xs : xs + 8] = pix
            mcu_count += 1

    # upsample to full resolution and crop
    planes = []
    for c in order:
        p = c["plane"]
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            p = p.repeat(ry, axis=0).repeat(rx, axis=1)
        planes.append(p[:h, :w])

    if len(planes) == 1:
        y = np.clip(planes[0], 0, 255)
        rgb = np.stack([y, y, y], axis=-1).astype(np.uint8)
        return w, h, rgb
    y, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
    r_ = y + 1.402 * cr
    g_ = y - 0.344136 * cb - 0.714136 * cr
    b_ = y + 1.772 * cb
    rgb = np.clip(np.stack([r_, g_, b_], axis=-1), 0, 255).astype(np.uint8)
    return w, h, rgb

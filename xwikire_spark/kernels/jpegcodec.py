"""Baseline JPEG codec (ITU-T T.81 sequential DCT, Huffman, 8-bit).

Closes the remaining "real image decode" gap for the dominant
training-corpus image format without PIL/libvips: stdlib byte-parsing +
numpy for the 8x8 (I)DCT (numpy is a baked-in dependency of this repo's
Arrow path). `kernels/imagecodec.py` dispatches to `decode_jpeg` from its
format sniffer, so `operators/multimodal.py`'s fake=False path now decodes
PNG, PPM and baseline JPEG end-to-end.

Scope (deliberately bounded, fully tested):
- decode: baseline sequential (SOF0/SOF1), 8-bit, grayscale or YCbCr with
  integer-ratio sampling factors (4:4:4 and 4:2:0 covered by tests),
  restart markers honored (DRI), quant/Huffman tables read from the FILE
  (the decoder never assumes the Annex-K constants). Progressive (SOF2),
  arithmetic coding, 12-bit and non-dyadic sampling raise
  NotImplementedError.
- encode (test-vector source + re-encode path): 4:4:4 or 4:2:0 YCbCr /
  grayscale, Annex-K quantization + Huffman tables, restart-free.

Decoded form matches imagecodec: (width, height, channels, flat bytearray).
"""

from __future__ import annotations

import struct

import numpy as np

# zigzag scan position i -> natural (row-major) index
_ZZ = [
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
]

# Annex K tables (used by the ENCODER only; the decoder always reads the
# tables carried in the file's DQT/DHT segments)
_Q_LUMA = [
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
]
_Q_CHROMA = [
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
]
_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)


def _dct_matrix() -> np.ndarray:
    t = np.zeros((8, 8))
    for u in range(8):
        a = np.sqrt(0.125) if u == 0 else 0.5
        for x in range(8):
            t[u, x] = a * np.cos((2 * x + 1) * u * np.pi / 16)
    return t


_T = _dct_matrix()


def fdct2(block: np.ndarray) -> np.ndarray:
    """Orthonormal 2-D DCT-II of an 8x8 block (level-shifted input)."""
    return _T @ block @ _T.T


def idct2(coef: np.ndarray) -> np.ndarray:
    """Inverse of fdct2 (exact to float precision)."""
    return _T.T @ coef @ _T


def _build_decode_lut(bits: list[int], vals: list[int]) -> dict:
    lut, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            lut[(length, code)] = vals[k]
            k += 1
            code += 1
        code <<= 1
    return lut


def _build_encode_lut(bits: list[int], vals: list[int]) -> dict:
    return {
        sym: (code, length)
        for (length, code), sym in _build_decode_lut(bits, vals).items()
    }


def _extend(v: int, t: int) -> int:
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00
    unstuffing; byte-aligns and validates RSTn at restart boundaries."""

    def __init__(self, data: bytes, pos: int):
        self.d, self.i, self.b, self.n = data, pos, 0, 0

    def bit(self) -> int:
        if self.n == 0:
            byte = self.d[self.i]
            self.i += 1
            if byte == 0xFF:
                nxt = self.d[self.i]
                if nxt == 0x00:
                    self.i += 1
                else:
                    raise ValueError(
                        f"unexpected marker 0xFF{nxt:02X} in entropy data"
                    )
            self.b, self.n = byte, 8
        self.n -= 1
        return (self.b >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v

    def restart(self, expected: int) -> None:
        """Consume the byte-aligned RSTn marker at a restart boundary
        (skipping a stuffed FF00 the 1-padding may have produced)."""
        self.n = 0
        while self.d[self.i] == 0xFF and self.d[self.i + 1] == 0x00:
            self.i += 2
        if self.d[self.i] != 0xFF or self.d[self.i + 1] != 0xD0 + expected:
            raise ValueError("missing restart marker")
        self.i += 2

    def huff(self, lut: dict) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.bit()
            if (length, code) in lut:
                return lut[(length, code)]
        raise ValueError("invalid Huffman code")


def decode_jpeg(payload: bytes) -> tuple[int, int, int, bytearray]:
    """-> (width, height, channels, flat row-major samples).

    channels is 1 (grayscale) or 3 (RGB after JFIF YCbCr conversion).
    """
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    qtabs: dict[int, np.ndarray] = {}
    huffs: dict[tuple[int, int], dict] = {}
    comps: list[dict] = []
    w = h = 0
    restart_interval = 0
    i = 2
    while i < len(payload):
        if payload[i] != 0xFF:
            raise ValueError("bad marker prefix")
        m = payload[i + 1]
        if m == 0xFF:  # fill byte
            i += 1
            continue
        if m in (0x01, 0xD8) or 0xD0 <= m <= 0xD7:
            i += 2
            continue
        if m == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack(">H", payload[i + 2 : i + 4])
        data = payload[i + 4 : i + 2 + seglen]
        i += 2 + seglen
        if m == 0xDB:  # DQT
            p = 0
            while p < len(data):
                pq, tq = data[p] >> 4, data[p] & 15
                p += 1
                if pq:
                    raise NotImplementedError("16-bit quant tables")
                nat = np.zeros(64)
                for z in range(64):
                    nat[_ZZ[z]] = data[p + z]
                qtabs[tq] = nat
                p += 64
        elif m in (0xC0, 0xC1):  # SOF0/1 baseline-compatible
            _prec, h, w = struct.unpack(">BHH", data[:5])
            if _prec != 8:
                raise NotImplementedError("12-bit JPEG")
            comps = []
            for c in range(data[5]):
                cid, hv, tq = data[6 + 3 * c : 9 + 3 * c]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 15, "tq": tq}
                )
        elif m in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD,
                   0xCE, 0xCF):
            raise NotImplementedError(
                f"non-baseline JPEG (SOF marker 0xFF{m:02X})"
            )
        elif m == 0xC4:  # DHT
            p = 0
            while p < len(data):
                tc, th = data[p] >> 4, data[p] & 15
                bits = list(data[p + 1 : p + 17])
                nv = sum(bits)
                vals = list(data[p + 17 : p + 17 + nv])
                huffs[(tc, th)] = _build_decode_lut(bits, vals)
                p += 17 + nv
        elif m == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", data[:2])
        elif m == 0xDA:  # SOS — entropy data follows; decode and finish
            if data[0] < len(comps):
                # legal baseline non-interleaved multi-scan stream: the
                # first SOS covers only some components and more scans
                # follow. We decode single-scan (interleaved) files only;
                # silently returning the partial scan would mis-decode a
                # color image as grayscale.
                raise NotImplementedError(
                    "multi-scan baseline JPEG (SOS lists "
                    f"{data[0]}/{len(comps)} components)"
                )
            scan = []
            for c in range(data[0]):
                cid, tt = data[1 + 2 * c], data[2 + 2 * c]
                comp = next(x for x in comps if x["id"] == cid)
                scan.append((comp, tt >> 4, tt & 15))
            return _decode_scan(
                payload, i, w, h, scan, qtabs, huffs, restart_interval
            )
        # else: APPn / COM — skipped
    raise ValueError("JPEG has no scan")


def _decode_scan(payload, pos, w, h, scan, qtabs, huffs, restart_interval):
    hmax = max(c["h"] for c, _, _ in scan)
    vmax = max(c["v"] for c, _, _ in scan)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    planes = [
        np.zeros((mcus_y * c["v"] * 8, mcus_x * c["h"] * 8))
        for c, _, _ in scan
    ]
    preds = [0] * len(scan)
    rd = _BitReader(payload, pos)
    mcu_n = 0
    rst = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_n and mcu_n % restart_interval == 0:
                rd.restart(rst)
                rst = (rst + 1) & 7
                preds = [0] * len(scan)
            mcu_n += 1
            for ci, (c, td, ta) in enumerate(scan):
                q = qtabs[c["tq"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        coef = np.zeros(64)
                        t = rd.huff(huffs[(0, td)])
                        preds[ci] += _extend(rd.bits(t), t)
                        coef[0] = preds[ci] * q[0]
                        k = 1
                        while k < 64:
                            rs = rd.huff(huffs[(1, ta)])
                            r, s = rs >> 4, rs & 15
                            if s == 0:
                                if r == 15:  # ZRL
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC index overflow")
                            coef[_ZZ[k]] = (
                                _extend(rd.bits(s), s) * q[_ZZ[k]]
                            )
                            k += 1
                        block = idct2(coef.reshape(8, 8)) + 128
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = block
    full = []
    for ci, (c, _, _) in enumerate(scan):
        if hmax % c["h"] or vmax % c["v"]:
            raise NotImplementedError(
                f"non-integer chroma subsampling ratio "
                f"({c['h']}x{c['v']} vs {hmax}x{vmax})"
            )
        p = planes[ci]
        p = np.repeat(np.repeat(p, vmax // c["v"], 0), hmax // c["h"], 1)
        full.append(p[:h, :w])
    if len(full) == 1:
        rgb = np.clip(full[0], 0, 255)
        return w, h, 1, bytearray(rgb.round().astype(np.uint8).tobytes())
    y, cb, cr = full[0], full[1] - 128, full[2] - 128
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.clip(np.stack([r, g, b], axis=-1), 0, 255)
    return w, h, 3, bytearray(rgb.round().astype(np.uint8).tobytes())


# --- encoder (test-vector source + multimodal re-encode) ---------------------


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc, self.n = 0, 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | code
        self.n += length
        while self.n >= 8:
            byte = (self.acc >> (self.n - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self) -> None:
        if self.n:
            self.write((1 << (8 - self.n)) - 1, 8 - self.n)


def _encode_block(bw, block, qnat, dc_lut, ac_lut, pred):
    coef = fdct2(block - 128.0)
    q = np.rint(coef.reshape(64) / qnat).astype(int)
    zz = [int(q[_ZZ[z]]) for z in range(64)]
    diff = zz[0] - pred
    t = abs(diff).bit_length()
    code, length = dc_lut[t]
    bw.write(code, length)
    if t:
        bw.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
    run = 0
    last_nz = max((z for z in range(1, 64) if zz[z]), default=0)
    for z in range(1, last_nz + 1):
        if zz[z] == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_lut[0xF0]
            bw.write(code, length)
            run -= 16
        s = abs(zz[z]).bit_length()
        code, length = ac_lut[(run << 4) | s]
        bw.write(code, length)
        v = zz[z]
        bw.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if last_nz < 63:
        code, length = ac_lut[0x00]
        bw.write(code, length)
    return zz[0]


def _pad_to(plane: np.ndarray, mult: int) -> np.ndarray:
    ph = -(-plane.shape[0] // mult) * mult
    pw = -(-plane.shape[1] // mult) * mult
    return np.pad(
        plane,
        ((0, ph - plane.shape[0]), (0, pw - plane.shape[1])),
        mode="edge",
    )


def encode_jpeg(
    width: int,
    height: int,
    channels: int,
    pixels: bytes | bytearray,
    subsample: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """Baseline JPEG encoder: grayscale or YCbCr 4:4:4 (4:2:0 with
    ``subsample=True``), Annex-K tables, optional DRI/RSTn restart
    markers. Lossy by nature — tests bound the round-trip error rather
    than demanding equality."""
    if channels not in (1, 3):
        raise NotImplementedError("JPEG encode needs 1 or 3 channels")
    px = np.frombuffer(bytes(pixels), dtype=np.uint8).astype(float)
    px = px.reshape(height, width, channels)
    if channels == 1:
        planes = [px[:, :, 0]]
        samp = [(1, 1)]
        qsel = [0]
    else:
        r, g, b = px[:, :, 0], px[:, :, 1], px[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128
        if subsample:
            cb = _pad_to(cb, 2).reshape(-1, 2, (width + 1) // 2 * 2 // 2, 2)
            cb = cb.mean(axis=(1, 3))
            cr = _pad_to(cr, 2).reshape(-1, 2, (width + 1) // 2 * 2 // 2, 2)
            cr = cr.mean(axis=(1, 3))
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            samp = [(1, 1), (1, 1), (1, 1)]
        planes = [y, cb, cr]
        qsel = [0, 1, 1]

    # _Q_* are written natural (row-major) order, exactly as Annex K
    # prints them; the DQT segment below re-orders to zigzag on emit
    qnat = {
        0: np.array(_Q_LUMA, dtype=float),
        1: np.array(_Q_CHROMA, dtype=float),
    }
    dc_luts = [_build_encode_lut(*_DC_LUMA), _build_encode_lut(*_DC_CHROMA)]
    ac_luts = [_build_encode_lut(*_AC_LUMA), _build_encode_lut(*_AC_CHROMA)]

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcus_x = -(-width // (8 * hmax))
    mcus_y = -(-height // (8 * vmax))
    # edge-pad each plane to exactly its MCU-grid coverage
    padded = []
    for ci, p in enumerate(planes):
        need_h = mcus_y * samp[ci][1] * 8
        need_w = mcus_x * samp[ci][0] * 8
        padded.append(np.pad(
            p,
            ((0, need_h - p.shape[0]), (0, need_w - p.shape[1])),
            mode="edge",
        ))

    bw = _BitWriter()
    preds = [0] * len(planes)
    mcu_n = 0
    rst = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_n and mcu_n % restart_interval == 0:
                bw.flush()
                bw.out.extend((0xFF, 0xD0 + rst))
                rst = (rst + 1) & 7
                preds = [0] * len(planes)
            mcu_n += 1
            for ci, p in enumerate(padded):
                hi, vi = samp[ci]
                sel = qsel[ci]
                for by in range(vi):
                    for bx in range(hi):
                        y0 = (my * vi + by) * 8
                        x0 = (mx * hi + bx) * 8
                        preds[ci] = _encode_block(
                            bw,
                            p[y0 : y0 + 8, x0 : x0 + 8],
                            qnat[sel],
                            dc_luts[sel],
                            ac_luts[sel],
                            preds[ci],
                        )
    bw.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    dqt = b""
    for tq, table in ((0, _Q_LUMA), (1, _Q_CHROMA)):
        if channels == 1 and tq == 1:
            continue
        # DQT carries the 64 steps in zigzag scan order
        dqt += bytes([tq]) + bytes(table[_ZZ[i]] for i in range(64))
    sof = struct.pack(">BHHB", 8, height, width, len(planes))
    for ci in range(len(planes)):
        sof += bytes([ci + 1, (samp[ci][0] << 4) | samp[ci][1], qsel[ci]])
    dht = b""
    tables = [(0, 0, _DC_LUMA), (1, 0, _AC_LUMA)]
    if channels == 3:
        tables += [(0, 1, _DC_CHROMA), (1, 1, _AC_CHROMA)]
    for tc, th, (bits, vals) in tables:
        dht += bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)
    sos = bytes([len(planes)])
    for ci in range(len(planes)):
        td_ta = 0 if qsel[ci] == 0 else 0x11
        sos += bytes([ci + 1, td_ta])
    sos += bytes([0, 63, 0])  # spectral selection (baseline fixed)
    dri = (
        seg(0xDD, struct.pack(">H", restart_interval))
        if restart_interval
        else b""
    )
    return (
        b"\xff\xd8"
        + seg(0xDB, dqt)
        + seg(0xC0, sof)
        + seg(0xC4, dht)
        + dri
        + seg(0xDA, sos)
        + bytes(bw.out)
        + b"\xff\xd9"
    )

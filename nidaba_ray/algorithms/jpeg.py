"""From-scratch baseline JPEG codec — ITU-T T.81 (ISO/IEC 10918-1),
baseline sequential DCT, the same build-from-public-spec pattern as
:mod:`nidaba_ray.algorithms.png` (round-4 verdict item 5: real Common
Crawl images are overwhelmingly JPEG).

Decoder scope (errors — never silent wrongness — outside it):

* markers: SOI, APPn/COM (skipped), DQT (8/16-bit precision, multiple
  tables per segment), SOF0 (baseline; SOF1/2/… raise), DHT (DC+AC,
  multiple per segment), DRI + RST0-7 restart intervals, SOS, EOI
* entropy: canonical Huffman per T.81 annex C, 0xFF00 byte unstuffing,
  the EXTEND sign procedure (F.2.2.1)
* sampling: any h/v factors whose max divides evenly (4:4:4, 4:2:2,
  4:2:0, …) with pixel-replication chroma upsampling; single-component
  scans use the T.81 A.2 non-interleaved block order
* color: 1 component → grayscale, 3 components → JFIF YCbCr → RGB

The encoder (grayscale + 4:4:4 YCbCr, Annex K quantization tables
scaled by the libjpeg quality formula, standard Annex K Huffman
tables, optional restart intervals) exists so tests are self-contained
— JPEG is lossy, so roundtrips assert bounded reconstruction error
plus EXACT reconstruction of hand-built single-coefficient streams.
Tables always travel in the stream (DQT/DHT), so decode correctness
never depends on the encoder's table choice."""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["JPEG_SIG", "decode_jpeg", "encode_jpeg", "is_jpeg"]

JPEG_SIG = b"\xff\xd8"


def is_jpeg(payload: bytes) -> bool:
    return payload[:2] == JPEG_SIG


def _zigzag() -> np.ndarray:
    """T.81 figure 5 zigzag: index i of the scan order → raster flat
    position. Generated, not transcribed (no typo surface): diagonal
    d runs bottom-left→top-right when even, top-right→bottom-left
    when odd."""
    out = []
    for d in range(15):
        rng = range(max(0, d - 7), min(d, 7) + 1)
        rows = reversed(rng) if d % 2 == 0 else rng
        out.extend(r * 8 + (d - r) for r in rows)
    return np.array(out, dtype=np.int64)


_ZZ = _zigzag()

# DCT-II basis M[u, x] = c(u)/2 · cos((2x+1)uπ/16); forward F = M f Mᵀ,
# inverse f = Mᵀ F M (T.81 A.3.3 in exact float64 — the spec allows
# any IDCT meeting its accuracy bounds; float64 far exceeds them)
_M = np.array([
    [(np.sqrt(0.5) if u == 0 else 1.0) / 2.0
     * np.cos((2 * x + 1) * u * np.pi / 16.0) for x in range(8)]
    for u in range(8)
])

# Annex K.1 quantization tables (luminance, chrominance)
_QT_LUM = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.float64)
_QT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.float64)

# Annex K.3 standard Huffman tables, (BITS[1..16], HUFFVAL). The
# encoder uses the luminance pair for every component (legal — SOS
# names the table per component); the decoder always reads tables
# from the stream's DHT segments, so these constants never gate
# decode correctness.
_DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_VALS = list(range(12))
_AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_VALS = [
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
]


def _canonical_codes(bits: list[int], vals: list[int]) -> dict:
    """T.81 annex C code assignment: {(length, code): symbol}."""
    if sum(bits) != len(vals):
        raise ValueError("DHT BITS/HUFFVAL length mismatch")
    table: dict[tuple[int, int], int] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


class _BitReader:
    """MSB-first reader over one unstuffed entropy segment."""

    __slots__ = ("bits", "pos")

    def __init__(self, data: bytes) -> None:
        self.bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8))
        self.pos = 0

    def read_bit(self) -> int:
        if self.pos >= len(self.bits):
            raise ValueError("entropy data exhausted")
        b = int(self.bits[self.pos])
        self.pos += 1
        return b

    def receive(self, n: int) -> int:
        if n == 0:
            return 0
        if self.pos + n > len(self.bits):
            raise ValueError("entropy data exhausted")
        out = 0
        for b in self.bits[self.pos:self.pos + n]:
            out = (out << 1) | int(b)
        self.pos += n
        return out

    def decode_symbol(self, table: dict) -> int:
        code, length = 0, 0
        while length < 16:
            code = (code << 1) | self.read_bit()
            length += 1
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code")


def _extend(v: int, t: int) -> int:
    """F.2.2.1 EXTEND: map the t received bits to a signed value."""
    return v - (1 << t) + 1 if t and v < (1 << (t - 1)) else v


def _split_scan(data: bytes, pos: int) -> tuple[list[bytes], int]:
    """Entropy-coded data from ``pos`` → (unstuffed segments split at
    RST markers, position of the terminating marker's 0xFF)."""
    segs: list[bytes] = []
    cur = bytearray()
    i, n = pos, len(data)
    while i < n:
        b = data[i]
        if b != 0xFF:
            cur.append(b)
            i += 1
            continue
        if i + 1 >= n:
            raise ValueError("truncated entropy data")
        nxt = data[i + 1]
        if nxt == 0x00:      # stuffed 0xFF literal
            cur.append(0xFF)
            i += 2
        elif 0xD0 <= nxt <= 0xD7:  # restart marker: segment boundary
            segs.append(bytes(cur))
            cur = bytearray()
            i += 2
        else:                # a real marker terminates the scan
            segs.append(bytes(cur))
            return segs, i
    raise ValueError("scan data ran past end of stream")


def _decode_block(r: _BitReader, dc_tab: dict, ac_tab: dict,
                  qt: np.ndarray, pred: int) -> tuple[np.ndarray, int]:
    """One 8×8 block: Huffman → dequantize → de-zigzag → IDCT.
    Returns (spatial block float64, new DC predictor)."""
    zz = np.zeros(64, dtype=np.float64)
    t = r.decode_symbol(dc_tab)
    diff = _extend(r.receive(t), t)
    pred += diff
    zz[0] = pred
    k = 1
    while k < 64:
        rs = r.decode_symbol(ac_tab)
        run, size = rs >> 4, rs & 0x0F
        if size == 0:
            if run == 15:   # ZRL: sixteen zeros
                k += 16
                continue
            break           # EOB
        k += run
        if k > 63:
            raise ValueError("AC run past end of block")
        zz[k] = _extend(r.receive(size), size)
        k += 1
    blk = np.zeros(64, dtype=np.float64)
    blk[_ZZ] = zz * qt
    return _M.T @ blk.reshape(8, 8) @ _M, pred


def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline JPEG bytes → uint8 array: (h, w) for grayscale,
    (h, w, 3) RGB for 3-component YCbCr. ValueError on malformed or
    non-baseline input (the per-row quarantine contract)."""
    if not is_jpeg(data):
        raise ValueError("not a JPEG (missing SOI)")
    qts: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}  # (class, id) → code table
    frame = None           # (h, w, [(cid, hs, vs, tq), ...])
    restart = 0
    pos = 2
    n = len(data)
    while pos + 4 <= n:
        if data[pos] != 0xFF:
            raise ValueError(f"expected marker at byte {pos}")
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack(">H", data[pos + 2:pos + 4])
        body = data[pos + 4:pos + 2 + seglen]
        if len(body) != seglen - 2:
            raise ValueError("truncated marker segment")
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0x0F
                i += 1
                if pq:      # 16-bit precision
                    vals = np.frombuffer(body[i:i + 128], ">u2")
                    i += 128
                else:
                    vals = np.frombuffer(body[i:i + 64], np.uint8)
                    i += 64
                if len(vals) != 64:
                    raise ValueError("truncated DQT")
                qts[tq] = vals.astype(np.float64)
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0x0F
                bits = list(body[i + 1:i + 17])
                nv = sum(bits)
                vals = list(body[i + 17:i + 17 + nv])
                huff[(tc, th)] = _canonical_codes(bits, vals)
                i += 17 + nv
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise ValueError("only 8-bit precision supported")
            comps = []
            for c in range(nc):
                cid, hv, tq = body[6 + 3 * c:9 + 3 * c]
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
            frame = (h, w, comps)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"non-baseline JPEG (SOF{marker - 0xC0}) unsupported")
        elif marker == 0xDD:  # DRI
            (restart,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("SOS before SOF")
            return _decode_scan(data, pos + 2 + seglen, body, frame,
                                qts, huff, restart)
        # APPn / COM / others: skipped
        pos += 2 + seglen
    raise ValueError("no SOS marker found")


def _decode_scan(data: bytes, pos: int, sos: bytes, frame, qts, huff,
                 restart: int) -> np.ndarray:
    h, w, comps = frame
    ns = sos[0]
    sel = {}
    for i in range(ns):
        cs, tabs = sos[1 + 2 * i], sos[2 + 2 * i]
        sel[cs] = (tabs >> 4, tabs & 0x0F)
    scan_comps = [c for c in comps if c[0] in sel]
    if len(scan_comps) != len(comps) or ns != len(comps):
        raise ValueError("multi-scan streams unsupported (baseline "
                         "interleaved scans only)")
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    for _, hs, vs, _ in comps:
        if hmax % hs or vmax % vs:
            raise ValueError("non-integer sampling ratio")
    segs, _end = _split_scan(data, pos)
    if ns == 1:
        cid, hs, vs, tq = comps[0]
        cw = -(-w * hs // hmax)
        ch = -(-h * vs // vmax)
        mx, my = -(-cw // 8), -(-ch // 8)
        grid = [[(0, 0, 0)]]  # one block per MCU, the sole component
        planes = {cid: np.zeros((my * 8, mx * 8))}
        block_dims = {cid: (my, mx)}
        n_mcus = mx * my
    else:
        mx = -(-w // (8 * hmax))
        my = -(-h // (8 * vmax))
        planes = {c[0]: np.zeros((my * 8 * c[2], mx * 8 * c[1]))
                  for c in comps}
        block_dims = None
        n_mcus = mx * my

    dc_pred = {c[0]: 0 for c in comps}
    seg_idx = 0
    reader = _BitReader(segs[0])
    for m in range(n_mcus):
        if restart and m and m % restart == 0:
            seg_idx += 1        # RST boundary: new segment, reset DC
            if seg_idx >= len(segs):
                raise ValueError("missing restart segment")
            reader = _BitReader(segs[seg_idx])
            dc_pred = {c[0]: 0 for c in comps}
        for cid, hs, vs, tq in comps:
            if tq not in qts:
                raise ValueError(f"undefined quant table {tq}")
            dct, act = sel[cid]
            dc_tab = huff.get((0, dct))
            ac_tab = huff.get((1, act))
            if dc_tab is None or ac_tab is None:
                raise ValueError("undefined Huffman table")
            if ns == 1:
                bmy, bmx = block_dims[cid]
                by, bx = divmod(m, bmx)
                blk, dc_pred[cid] = _decode_block(
                    reader, dc_tab, ac_tab, qts[tq], dc_pred[cid])
                planes[cid][by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] = blk
            else:
                mcy, mcx = divmod(m, mx)
                for by in range(vs):
                    for bx in range(hs):
                        blk, dc_pred[cid] = _decode_block(
                            reader, dc_tab, ac_tab, qts[tq], dc_pred[cid])
                        y0 = (mcy * vs + by) * 8
                        x0 = (mcx * hs + bx) * 8
                        planes[cid][y0:y0 + 8, x0:x0 + 8] = blk

    out_planes = []
    for cid, hs, vs, _tq in comps:
        p = planes[cid] + 128.0
        p = np.repeat(np.repeat(p, vmax // vs, axis=0), hmax // hs, axis=1)
        out_planes.append(p[:h, :w])
    if len(out_planes) == 1:
        return np.clip(np.round(out_planes[0]), 0, 255).astype(np.uint8)
    if len(out_planes) != 3:
        raise ValueError(f"{len(out_planes)}-component color unsupported")
    y, cb, cr = out_planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# Encoder (tests' counterpart: grayscale or 4:4:4 color, Annex K
# tables, optional restart interval)
# ---------------------------------------------------------------------------

class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int) -> None:
        self.acc = (self.acc << n) | (value & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            self.write(0x7F, 8 - self.nbits)  # pad with 1s per spec


def _encode_codes(bits: list[int], vals: list[int]) -> dict[int, tuple]:
    """symbol → (code, length) for the encoder side."""
    table: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return table


def _magnitude(v: int) -> tuple[int, int]:
    """(category, bits-to-send) per F.1.2.1."""
    t = int(abs(v)).bit_length()
    return t, (v if v >= 0 else v + (1 << t) - 1)


def _scaled_qt(base: np.ndarray, quality: int) -> np.ndarray:
    """The public libjpeg quality scaling of the Annex K tables."""
    quality = min(max(int(quality), 1), 100)
    scale = 5000 / quality if quality < 50 else 200 - 2 * quality
    return np.clip(np.floor((base * scale + 50) / 100), 1, 255)


def _encode_component_block(bw: _BitWriter, blk: np.ndarray,
                            qt: np.ndarray, pred: int,
                            dc_enc: dict, ac_enc: dict) -> int:
    f = _M @ (blk.astype(np.float64) - 128.0) @ _M.T
    q = np.round(f.reshape(64) / qt.reshape(64)).astype(np.int64)
    zz = q[_ZZ]
    t, bits_v = _magnitude(int(zz[0]) - pred)
    code, ln = dc_enc[t]
    bw.write(code, ln)
    bw.write(bits_v, t)
    pred = int(zz[0])
    run = 0
    last_nz = np.nonzero(zz[1:])[0]
    last = last_nz[-1] + 1 if len(last_nz) else 0
    for k in range(1, last + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_enc[0xF0]
            bw.write(code, ln)
            run -= 16
        t, bits_v = _magnitude(v)
        code, ln = ac_enc[(run << 4) | t]
        bw.write(code, ln)
        bw.write(bits_v, t)
        run = 0
    if last < 63:
        code, ln = ac_enc[0x00]
        bw.write(code, ln)
    return pred


def encode_jpeg(img: np.ndarray, quality: int = 90,
                restart: int = 0) -> bytes:
    """uint8 (h, w) grayscale or (h, w, 3) RGB → baseline JPEG bytes
    (4:4:4 for color). ``restart`` > 0 emits DRI + RST markers every
    ``restart`` MCUs (exercises the decoder's restart path)."""
    img = np.asarray(img)
    if img.dtype != np.uint8 or img.ndim not in (2, 3):
        raise ValueError("need uint8 (h, w) or (h, w, 3)")
    h, w = img.shape[:2]
    if img.ndim == 2:
        planes = [img.astype(np.float64)]
        qt_ids = [0]
    else:
        if img.shape[2] != 3:
            raise ValueError("color images must be (h, w, 3)")
        r, g, b = (img[:, :, i].astype(np.float64) for i in range(3))
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
        planes = [np.clip(np.round(p), 0, 255) for p in (y, cb, cr)]
        qt_ids = [0, 1, 1]
    qts = {0: _scaled_qt(_QT_LUM, quality)}
    if len(planes) == 3:
        qts[1] = _scaled_qt(_QT_CHROMA, quality)

    # pad to 8×8 blocks by edge replication
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    planes = [np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge")
              for p in planes]
    mx, my = pw // 8, ph // 8

    dc_enc = _encode_codes(_DC_BITS, _DC_VALS)
    ac_enc = _encode_codes(_AC_BITS, _AC_VALS)

    out = bytearray(b"\xff\xd8")
    out += (b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01"
            + b"\x00" + struct.pack(">HH", 1, 1) + b"\x00\x00")
    for tq, qt in qts.items():
        zzq = qt.reshape(64)[_ZZ].astype(np.uint8).tobytes()
        out += b"\xff\xdb" + struct.pack(">HB", 67, tq) + zzq
    nc = len(planes)
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for i in range(nc):
        sof += bytes([i + 1, 0x11, qt_ids[i]])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    for tc, (bits, vals) in ((0, (_DC_BITS, _DC_VALS)),
                             (1, (_AC_BITS, _AC_VALS))):
        body = bytes([tc << 4]) + bytes(bits) + bytes(vals)
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body
    if restart:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart)
    sos = bytes([nc])
    for i in range(nc):
        sos += bytes([i + 1, 0x00])
    sos += b"\x00\x3f\x00"
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    bw = _BitWriter()
    preds = [0] * nc
    rst = 0
    for m in range(mx * my):
        if restart and m and m % restart == 0:
            bw.flush()
            out += bw.out
            out += bytes([0xFF, 0xD0 + (rst % 8)])
            rst += 1
            bw = _BitWriter()
            preds = [0] * nc
        by, bx = divmod(m, mx)
        for i, p in enumerate(planes):
            blk = p[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8]
            preds[i] = _encode_component_block(
                bw, blk, qts[qt_ids[i]], preds[i], dc_enc, ac_enc)
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)

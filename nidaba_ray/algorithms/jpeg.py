"""From-scratch JPEG codec — ITU-T T.81 (ISO/IEC 10918-1), baseline +
progressive DCT, the same build-from-public-spec pattern as
:mod:`nidaba_ray.algorithms.png` (round-4 verdict item 5: real Common
Crawl images are overwhelmingly JPEG — and the majority of those are
PROGRESSIVE, added round 5).

Decoder scope (errors — never silent wrongness — outside it):

* markers: SOI, APPn/COM (skipped), DQT (8/16-bit precision, multiple
  tables per segment), SOF0/SOF1 (sequential) and SOF2 (progressive;
  other SOFn raise), DHT (DC+AC, multiple per segment, redefinable
  between scans), DRI + RST0-7 restart intervals, multi-SOS, EOI
* entropy: canonical Huffman per T.81 annex C, 0xFF00 byte unstuffing,
  the EXTEND sign procedure (F.2.2.1)
* progressive: spectral selection + successive approximation per
  annex G — DC first/refine (interleaved), AC first/refine
  (single-component scans) with EOB-run decoding and the
  correction-bit walk; coefficients accumulate across scans and the
  IDCT runs once at the end (batched einsum over every block)
* sampling: any h/v factors whose max divides evenly (4:4:4, 4:2:2,
  4:2:0, …) with pixel-replication chroma upsampling; single-component
  scans use the T.81 A.2 non-interleaved block order
* color: 1 component → grayscale, 3 components → JFIF YCbCr → RGB

The encoder (grayscale + 4:4:4 YCbCr, Annex K quantization tables
scaled by the libjpeg quality formula, standard Annex K Huffman
tables, optional restart intervals, and a ``progressive=True`` mode
emitting a DC-first / banded-AC-first / AC-refine / DC-refine scan
script) exists so tests are self-contained — JPEG is lossy, so
roundtrips assert bounded reconstruction error, and the progressive
differential oracle is EXACT: both modes quantize identically, so
``decode(progressive) == decode(baseline)`` bit-for-bit. Tables
always travel in the stream (DQT/DHT), so decode correctness never
depends on the encoder's table choice."""

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


def _decode_block_seq(r: _BitReader, dc_tab: dict, ac_tab: dict,
                      coef: np.ndarray, pred: int) -> int:
    """Sequential full-band block → zigzag integer coefficients into
    ``coef`` (a length-64 int view). Returns the new DC predictor."""
    t = r.decode_symbol(dc_tab)
    pred += _extend(r.receive(t), t)
    coef[0] = pred
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
        coef[k] = _extend(r.receive(size), size)
        k += 1
    return pred


def _decode_block_ac_first(r: _BitReader, ac_tab: dict, coef: np.ndarray,
                           ss: int, se: int, al: int, eobrun: int) -> int:
    """Progressive AC first pass (G.1.2.2): band coefficients at
    point-transform Al, EOB-run aware. Returns the remaining eobrun."""
    if eobrun > 0:
        return eobrun - 1   # whole band is zero in this block
    k = ss
    while k <= se:
        rs = r.decode_symbol(ac_tab)
        run, size = rs >> 4, rs & 0x0F
        if size == 0:
            if run == 15:   # ZRL
                k += 16
                continue
            eobrun = (1 << run) - 1     # EOBn: this block ends now
            if run:
                eobrun += r.receive(run)
            break
        k += run
        if k > se:
            raise ValueError("AC run past spectral band")
        coef[k] = _extend(r.receive(size), size) << al
        k += 1
    return eobrun


def _decode_block_ac_refine(r: _BitReader, ac_tab: dict, coef: np.ndarray,
                            ss: int, se: int, al: int, eobrun: int) -> int:
    """Progressive AC refinement (G.1.2.3): the correction-bit walk —
    every nonzero-history coefficient encountered consumes one bit;
    zero-history runs place new ±1<<Al values."""
    p1, m1 = 1 << al, -(1 << al)

    def correct(k: int) -> None:
        if r.read_bit() and not (int(coef[k]) & p1):
            coef[k] += p1 if coef[k] >= 0 else m1

    k = ss
    if eobrun == 0:
        while k <= se:
            rs = r.decode_symbol(ac_tab)
            run, size = rs >> 4, rs & 0x0F
            newval = 0
            if size:
                if size != 1:
                    raise ValueError("AC refine size must be 1")
                newval = p1 if r.read_bit() else m1
            elif run != 15:
                eobrun = (1 << run)     # EOBn
                if run:
                    eobrun += r.receive(run)
                break
            # advance: skip `run` zero-history slots (16 for ZRL),
            # correcting nonzero-history coefficients along the way
            while k <= se:
                if coef[k] != 0:
                    correct(k)
                else:
                    if run == 0:
                        if newval:
                            coef[k] = newval
                        k += 1
                        break
                    run -= 1
                k += 1
    if eobrun > 0:          # EOB-run tail: corrections only
        while k <= se:
            if coef[k] != 0:
                correct(k)
            k += 1
        eobrun -= 1
    return eobrun


def decode_jpeg(data: bytes) -> np.ndarray:
    """JPEG bytes (baseline SOF0/SOF1 or progressive SOF2) → uint8
    array: (h, w) for grayscale, (h, w, 3) RGB for 3-component YCbCr.
    Coefficients accumulate across scans; dequantization + a batched
    IDCT run once at the end. ValueError on malformed/unsupported
    input (the per-row quarantine contract)."""
    if not is_jpeg(data):
        raise ValueError("not a JPEG (missing SOI)")
    qts: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}  # (class, id) → code table
    frame = None           # (h, w, comps, progressive)
    coef: dict[int, np.ndarray] = {}        # cid → (bh, bw, 64) int32
    nblocks: dict[int, tuple[int, int]] = {}  # cid → non-interleaved dims
    mcu_dims = (0, 0)
    restart = 0
    any_scan = False
    pos = 2
    n = len(data)
    while pos + 2 <= n:
        if data[pos] != 0xFF:
            raise ValueError(f"expected marker at byte {pos}")
        while pos + 1 < n and data[pos + 1] == 0xFF:
            pos += 1        # fill bytes before a marker are legal
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI
            break
        if pos + 4 > n:
            raise ValueError("truncated marker segment")
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
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 sequential, SOF2 prog
            prec, h, w, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise ValueError("only 8-bit precision supported")
            comps = []
            for c in range(nc):
                cid, hv, tq = body[6 + 3 * c:9 + 3 * c]
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
            frame = (h, w, comps, marker == 0xC2)
            hmax = max(c[1] for c in comps)
            vmax = max(c[2] for c in comps)
            for _, hs, vs, _ in comps:
                if hmax % hs or vmax % vs:
                    raise ValueError("non-integer sampling ratio")
            mx = -(-w // (8 * hmax))
            my = -(-h // (8 * vmax))
            mcu_dims = (my, mx)
            for cid, hs, vs, _tq in comps:
                # interleaved dims cover the non-interleaved grid too
                coef[cid] = np.zeros((my * vs, mx * hs, 64), np.int32)
                cw, ch = -(-w * hs // hmax), -(-h * vs // vmax)
                nblocks[cid] = (-(-ch // 8), -(-cw // 8))
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"unsupported JPEG coding process (SOF{marker - 0xC0})")
        elif marker == 0xDD:  # DRI
            (restart,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS — one scan's entropy data follows
            if frame is None:
                raise ValueError("SOS before SOF")
            pos = _decode_scan(data, pos + 2 + seglen, body, frame,
                               coef, nblocks, mcu_dims, huff, restart)
            any_scan = True
            continue
        # APPn / COM / others: skipped
        pos += 2 + seglen
    if frame is None or not any_scan:
        raise ValueError("no SOS marker found")
    return _finish(frame, coef, nblocks, qts)


def _decode_scan(data: bytes, pos: int, sos: bytes, frame, coef,
                 nblocks, mcu_dims, huff, restart: int) -> int:
    """Decode ONE scan's entropy data into the coefficient arrays.
    Returns the stream position of the terminating marker."""
    h, w, comps, progressive = frame
    ns = sos[0]
    sel = {}
    for i in range(ns):
        cs, tabs = sos[1 + 2 * i], sos[2 + 2 * i]
        sel[cs] = (tabs >> 4, tabs & 0x0F)
    ss, se, ahal = sos[1 + 2 * ns:4 + 2 * ns]
    ah, al = ahal >> 4, ahal & 0x0F
    scan_comps = [c for c in comps if c[0] in sel]
    if len(scan_comps) != ns:
        raise ValueError("SOS names a component missing from SOF")
    if not progressive and (ss, se, ah, al) != (0, 63, 0, 0):
        raise ValueError("spectral selection in a sequential frame")
    if progressive:
        if ss == 0 and se != 0:
            raise ValueError("progressive DC scan must have Se=0")
        if ss > 0 and ns != 1:
            raise ValueError("progressive AC scans are single-component")
        if se > 63 or ss > se:
            raise ValueError("bad spectral band")
    segs, end = _split_scan(data, pos)

    if ns == 1:
        cid = scan_comps[0][0]
        bh, bw = nblocks[cid]
        n_mcus = bh * bw
    else:
        my, mx = mcu_dims
        n_mcus = my * mx

    dc_pred = {c[0]: 0 for c in scan_comps}
    eobrun = 0
    seg_idx = 0
    reader = _BitReader(segs[0])

    def tables(cid):
        dct, act = sel[cid]
        dc_tab = huff.get((0, dct))
        ac_tab = huff.get((1, act))
        return dc_tab, ac_tab

    ac_decode = _decode_block_ac_refine if ah else _decode_block_ac_first
    for m in range(n_mcus):
        if restart and m and m % restart == 0:
            seg_idx += 1        # RST boundary: new segment, reset state
            if seg_idx >= len(segs):
                raise ValueError("missing restart segment")
            reader = _BitReader(segs[seg_idx])
            dc_pred = {c[0]: 0 for c in scan_comps}
            eobrun = 0
        if ns == 1:
            cid, hs, vs, _tq = scan_comps[0]
            by, bx = divmod(m, nblocks[cid][1])
            blk = coef[cid][by, bx]
            if not progressive:
                dc_tab, ac_tab = tables(cid)
                if dc_tab is None or ac_tab is None:
                    raise ValueError("undefined Huffman table")
                dc_pred[cid] = _decode_block_seq(
                    reader, dc_tab, ac_tab, blk, dc_pred[cid])
            elif ss == 0:
                dc_tab, _ = tables(cid)
                if ah == 0:
                    if dc_tab is None:
                        raise ValueError("undefined Huffman table")
                    t = reader.decode_symbol(dc_tab)
                    dc_pred[cid] += _extend(reader.receive(t), t)
                    blk[0] = dc_pred[cid] << al
                else:
                    blk[0] |= reader.read_bit() << al
            else:
                _, ac_tab = tables(cid)
                if ac_tab is None:
                    raise ValueError("undefined Huffman table")
                eobrun = ac_decode(reader, ac_tab, blk, ss, se, al, eobrun)
        else:
            if progressive and ss != 0:
                raise ValueError("interleaved progressive AC scan")
            my, mx = mcu_dims
            mcy, mcx = divmod(m, mx)
            for cid, hs, vs, _tq in scan_comps:
                dc_tab, ac_tab = tables(cid)
                for by in range(vs):
                    for bx in range(hs):
                        blk = coef[cid][mcy * vs + by, mcx * hs + bx]
                        if not progressive:
                            if dc_tab is None or ac_tab is None:
                                raise ValueError("undefined Huffman table")
                            dc_pred[cid] = _decode_block_seq(
                                reader, dc_tab, ac_tab, blk, dc_pred[cid])
                        elif ah == 0:   # DC first
                            if dc_tab is None:
                                raise ValueError("undefined Huffman table")
                            t = reader.decode_symbol(dc_tab)
                            dc_pred[cid] += _extend(reader.receive(t), t)
                            blk[0] = dc_pred[cid] << al
                        else:           # DC refine
                            blk[0] |= reader.read_bit() << al
    return end


def _finish(frame, coef, nblocks, qts) -> np.ndarray:
    """Dequantize + batched IDCT + upsample + color convert."""
    h, w, comps, _prog = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    out_planes = []
    for cid, hs, vs, tq in comps:
        if tq not in qts:
            raise ValueError(f"undefined quant table {tq}")
        c = coef[cid]
        bh, bw = c.shape[:2]
        natural = np.zeros((bh * bw, 64), np.float64)
        natural[:, _ZZ] = c.reshape(-1, 64) * qts[tq]
        spatial = np.einsum(
            "ij,njk,kl->nil", _M.T, natural.reshape(-1, 8, 8), _M)
        plane = (spatial.reshape(bh, bw, 8, 8).transpose(0, 2, 1, 3)
                 .reshape(bh * 8, bw * 8)) + 128.0
        plane = np.repeat(np.repeat(plane, vmax // vs, axis=0),
                          hmax // hs, axis=1)
        out_planes.append(plane[:h, :w])
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


def _quantize_block(blk: np.ndarray, qt: np.ndarray) -> np.ndarray:
    """FDCT + quantize one spatial 8×8 block → zigzag int64[64].
    Shared by the baseline and progressive emitters so the two modes
    quantize IDENTICALLY (the differential oracle depends on it)."""
    f = _M @ (blk.astype(np.float64) - 128.0) @ _M.T
    q = np.round(f.reshape(64) / qt.reshape(64)).astype(np.int64)
    return q[_ZZ]


def _encode_component_block(bw: _BitWriter, blk: np.ndarray,
                            qt: np.ndarray, pred: int,
                            dc_enc: dict, ac_enc: dict) -> int:
    zz = _quantize_block(blk, qt)
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


def _emit_ac_first(bw: _BitWriter, blocks_zz: np.ndarray, ss: int,
                   se: int, al: int, ac_enc: dict) -> None:
    """Progressive AC first-pass scan body (G.1.2.2 encode side):
    point-transformed band runs with cross-block EOB-run accumulation."""
    eobrun = 0

    def flush() -> None:
        nonlocal eobrun
        if eobrun:
            nbits = eobrun.bit_length() - 1
            code, ln = ac_enc[nbits << 4]
            bw.write(code, ln)
            if nbits:
                bw.write(eobrun - (1 << nbits), nbits)
            eobrun = 0

    for zz in blocks_zz:
        band = zz[ss:se + 1]
        a = np.abs(band) >> al
        t = np.where(band < 0, -a, a)  # round-toward-zero point transform
        nz = np.nonzero(t)[0]
        if len(nz) == 0:
            eobrun += 1
            if eobrun == 0x7FFF:
                flush()
            continue
        flush()
        run = 0
        for i in range(nz[-1] + 1):
            v = int(t[i])
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, ln = ac_enc[0xF0]
                bw.write(code, ln)
                run -= 16
            s, bits_v = _magnitude(v)
            code, ln = ac_enc[(run << 4) | s]
            bw.write(code, ln)
            bw.write(bits_v, s)
            run = 0
        if nz[-1] < se - ss:
            eobrun += 1
            if eobrun == 0x7FFF:
                flush()
    flush()


def _emit_ac_refine(bw: _BitWriter, blocks_zz: np.ndarray, ss: int,
                    se: int, al: int, ac_enc: dict) -> None:
    """Progressive AC refinement scan body (G.1.2.3 encode side).

    Correction bits attach POSITIONALLY to the symbol whose decoder
    walk consumes them: a ZRL's walk ends at its 16th zero-history
    slot, so it carries only the history bits BEFORE that slot; the
    bits between that slot and the next placement ride the next
    symbol. Block tails past the last placement fold into the EOB
    run, whose correction bits (in block order) ride the EOBn flush."""
    eobrun = 0
    pending: list[int] = []     # EOB-run tail corrections, block order

    def flush_eob() -> None:
        nonlocal eobrun
        if eobrun:
            nbits = eobrun.bit_length() - 1
            code, ln = ac_enc[nbits << 4]
            bw.write(code, ln)
            if nbits:
                bw.write(eobrun - (1 << nbits), nbits)
            for b in pending:
                bw.write(b, 1)
            pending.clear()
            eobrun = 0

    for zz in blocks_zz:
        band = zz[ss:se + 1]
        absv = np.abs(band) >> al

        def hist_bits(a: int, b: int) -> list[int]:
            return [int(absv[j]) & 1 for j in range(a, b) if absv[j] > 1]

        k = 0
        for p in np.nonzero(absv == 1)[0]:
            p = int(p)
            zeros = np.nonzero(absv[k:p] == 0)[0] + k  # absolute slots
            run = len(zeros)
            consumed = 0
            while run > 15:
                q = int(zeros[consumed + 15])  # this window's 16th zero
                flush_eob()
                code, ln = ac_enc[0xF0]
                bw.write(code, ln)
                for b in hist_bits(k, q):
                    bw.write(b, 1)
                k = q + 1
                consumed += 16
                run -= 16
            flush_eob()
            code, ln = ac_enc[(run << 4) | 1]
            bw.write(code, ln)
            bw.write(1 if band[p] > 0 else 0, 1)
            for b in hist_bits(k, p):
                bw.write(b, 1)
            k = p + 1
        if k < len(band):           # tail folds into the EOB run
            pending.extend(hist_bits(k, len(band)))
            eobrun += 1
            if eobrun == 0x7FFF:
                flush_eob()
    flush_eob()


def encode_jpeg(img: np.ndarray, quality: int = 90,
                restart: int = 0, progressive: bool = False) -> bytes:
    """uint8 (h, w) grayscale or (h, w, 3) RGB → JPEG bytes (4:4:4
    for color). ``restart`` > 0 emits DRI + RST markers every
    ``restart`` MCUs (exercises the decoder's restart path; baseline
    only). ``progressive=True`` emits SOF2 with a DC-first /
    banded-AC-first / two AC-refine rounds / DC-refine scan script —
    quantization is shared with the baseline path, so decoding both
    encodings of the same image yields IDENTICAL pixels."""
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
    if progressive and restart:
        raise ValueError("restart intervals unsupported in progressive "
                         "encode (decode handles both)")
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for i in range(nc):
        sof += bytes([i + 1, 0x11, qt_ids[i]])
    sof_marker = b"\xff\xc2" if progressive else b"\xff\xc0"
    out += sof_marker + struct.pack(">H", 2 + len(sof)) + sof
    for tc, (bits, vals) in ((0, (_DC_BITS, _DC_VALS)),
                             (1, (_AC_BITS, _AC_VALS))):
        body = bytes([tc << 4]) + bytes(bits) + bytes(vals)
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body
    if restart:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart)

    if progressive:
        # The Annex K AC table carries only EOB0 — progressive scans
        # need EOBn (0x10..0xE0), so ship a dedicated flat 9-bit table
        # as AC id 1 (176 symbols ≤ 2^9; canonical, decoder reads it
        # from this DHT like any other). Real encoders optimize per
        # scan; a uniform static table is equally valid.
        prog_vals = sorted(
            [(r << 4) | s for r in range(16) for s in range(1, 11)]
            + [r << 4 for r in range(15)] + [0xF0]
        )
        prog_bits = [0] * 16
        prog_bits[8] = len(prog_vals)  # all codes at length 9
        body = bytes([0x11]) + bytes(prog_bits) + bytes(prog_vals)
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body
        ac_prog = _encode_codes(prog_bits, prog_vals)
        # precompute every block's zigzag coefficients once (raster
        # block order per component; 4:4:4 ⇒ MCU order == raster)
        zz_all = []
        for i, p in enumerate(planes):
            qt = qts[qt_ids[i]]
            blocks = np.empty((my * mx, 64), np.int64)
            for m in range(my * mx):
                by, bx = divmod(m, mx)
                blocks[m] = _quantize_block(
                    p[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8], qt)
            zz_all.append(blocks)

        def sos_header(comp_ids, ss, se, ah, al) -> bytes:
            body = bytes([len(comp_ids)])
            tabs = 0x00 if ss == 0 else 0x01  # AC scans use table id 1
            for ci in comp_ids:
                body += bytes([ci + 1, tabs])
            body += bytes([ss, se, (ah << 4) | al])
            return b"\xff\xda" + struct.pack(">H", 2 + len(body)) + body

        def scan(comp_ids, ss, se, ah, al, emit) -> None:
            nonlocal out
            out += sos_header(comp_ids, ss, se, ah, al)
            bw = _BitWriter()
            emit(bw)
            bw.flush()
            out += bw.out

        def dc_first(bw: _BitWriter) -> None:
            preds = [0] * nc
            for m in range(my * mx):
                for ci in range(nc):
                    v = int(zz_all[ci][m, 0]) >> 1  # Al=1 arith shift
                    s, bits_v = _magnitude(v - preds[ci])
                    preds[ci] = v
                    code, ln = dc_enc[s]
                    bw.write(code, ln)
                    bw.write(bits_v, s)

        def dc_refine(bw: _BitWriter) -> None:
            for m in range(my * mx):
                for ci in range(nc):
                    bw.write(int(zz_all[ci][m, 0]) & 1, 1)

        scan(list(range(nc)), 0, 0, 0, 1, dc_first)
        for ss, se in ((1, 5), (6, 63)):
            for ci in range(nc):
                scan([ci], ss, se, 0, 2,
                     lambda bw, c=ci, a=ss, b=se:
                     _emit_ac_first(bw, zz_all[c], a, b, 2, ac_prog))
        for ah, al in ((2, 1), (1, 0)):
            for ss, se in ((1, 5), (6, 63)):
                for ci in range(nc):
                    scan([ci], ss, se, ah, al,
                         lambda bw, c=ci, a=ss, b=se, lo=al:
                         _emit_ac_refine(bw, zz_all[c], a, b, lo, ac_prog))
        scan(list(range(nc)), 0, 0, 1, 0, dc_refine)
        out += b"\xff\xd9"
        return bytes(out)

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

"""Progressive JPEG (T.81 annex G, round 5): the exact differential
oracle against the baseline path (shared quantization ⇒ identical
pixels), scan-script structure, and a decoder-only hand-built stream
pinning DC first/refine, AC-first EOB runs, and the refine
correction-bit walk with ZRL."""
from __future__ import annotations

import struct

import numpy as np
import pytest

from nidaba_ray.algorithms.jpeg import (
    _BitWriter,
    _M,
    _ZZ,
    _encode_codes,
    _magnitude,
    decode_jpeg,
    encode_jpeg,
)


def test_progressive_differential_fuzz():
    """decode(progressive) must equal decode(baseline) BIT-FOR-BIT:
    both modes share _quantize_block, so the only difference is the
    scan script — a desync anywhere (EOB runs, ZRL windows,
    correction-bit order, DC point transform) breaks equality."""
    rng = np.random.default_rng(81)
    shapes = [(8, 8), (16, 16), (24, 17), (15, 9), (40, 33, 3),
              (64, 64), (32, 56, 3), (9, 80)]
    for i, shape in enumerate(shapes):
        for q in (5, 50, 85, 98):
            img = rng.integers(0, 256, size=shape).astype(np.uint8)
            base = decode_jpeg(encode_jpeg(img, quality=q))
            prog = decode_jpeg(encode_jpeg(img, quality=q,
                                           progressive=True))
            assert np.array_equal(base, prog), (shape, q)


def test_progressive_structured_images():
    # flat image: every AC scan is one long EOB run
    f = np.full((48, 48), 200, np.uint8)
    assert np.array_equal(decode_jpeg(encode_jpeg(f)),
                          decode_jpeg(encode_jpeg(f, progressive=True)))
    # smooth gradient: DC-dominated, AC refines sparse
    g = np.tile((np.arange(64) * 4).astype(np.uint8), (32, 1))
    assert np.array_equal(decode_jpeg(encode_jpeg(g)),
                          decode_jpeg(encode_jpeg(g, progressive=True)))
    # high-frequency checkerboard at high quality: dense AC bands
    c = (np.indices((40, 40)).sum(axis=0) % 2 * 255).astype(np.uint8)
    assert np.array_equal(decode_jpeg(encode_jpeg(c, quality=98)),
                          decode_jpeg(encode_jpeg(c, quality=98,
                                                  progressive=True)))
    # single hot pixel per block: sparse placements, long zero runs
    s = np.zeros((32, 32), np.uint8)
    s[7::8, 7::8] = 255
    assert np.array_equal(decode_jpeg(encode_jpeg(s, quality=95)),
                          decode_jpeg(encode_jpeg(s, quality=95,
                                                  progressive=True)))


def test_progressive_scan_script_structure():
    img = np.zeros((16, 16), np.uint8)
    data = encode_jpeg(img, progressive=True)
    assert b"\xff\xc2" in data and b"\xff\xc0" not in data
    # grayscale script: DC first + 2 AC-first bands + 2×2 AC refines
    # + DC refine = 8 SOS markers
    assert data.count(b"\xff\xda") == 8
    color = encode_jpeg(np.zeros((16, 16, 3), np.uint8), progressive=True)
    # color: 1 + 3×2 + 3×4 + 1 = 20
    assert color.count(b"\xff\xda") == 20
    with pytest.raises(ValueError):
        encode_jpeg(img, progressive=True, restart=4)


# ---------------------------------------------------------------------------
# Decoder-only hand-built stream: exact coefficient pins independent
# of the encoder.


_PROG_VALS = sorted(
    [(r << 4) | s for r in range(16) for s in range(1, 11)]
    + [r << 4 for r in range(15)] + [0xF0]
)
_PROG_BITS = [0] * 16
_PROG_BITS[8] = len(_PROG_VALS)
_DC_BITS1 = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_VALS1 = list(range(12))


def _dht(tc: int, th: int, bits: list[int], vals: list[int]) -> bytes:
    body = bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)
    return b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body


def _sos(comp_tabs: list[tuple[int, int, int]], ss: int, se: int,
         ah: int, al: int) -> bytes:
    body = bytes([len(comp_tabs)])
    for cid, dct, act in comp_tabs:
        body += bytes([cid, (dct << 4) | act])
    body += bytes([ss, se, (ah << 4) | al])
    return b"\xff\xda" + struct.pack(">H", 2 + len(body)) + body


def test_hand_built_progressive_stream_exact():
    """One 8×8 block, qt = all-ones, four scans:

    1. DC first Al=1: diff 3  → DC = 6
    2. AC first 1..63 Al=1: zz1 = 1<<1 = 2, then EOB
    3. AC refine 1..63 Ah=1→Al=0: correction bit 1 on zz1 (2 → 3),
       then a 28-zero run → ZRL + (12<<4|1) placing −1 at zz30 —
       with the history correction bit riding the ZRL window
    4. DC refine Ah=1→Al=0: bit 1 → DC = 7

    Expected pixels = round(IDCT of those exact coefficients) + 128.
    """
    dc_enc = _encode_codes(_DC_BITS1, _DC_VALS1)
    ac_enc = _encode_codes(_PROG_BITS, _PROG_VALS)

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">HB", 67, 0) + bytes([1] * 64)
    sof = struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0])
    out += b"\xff\xc2" + struct.pack(">H", 2 + len(sof)) + sof
    out += _dht(0, 0, _DC_BITS1, _DC_VALS1)
    out += _dht(1, 1, _PROG_BITS, _PROG_VALS)

    # scan 1: DC first, Al=1, diff = 3 (category 2, bits '11')
    out += _sos([(1, 0, 0)], 0, 0, 0, 1)
    bw = _BitWriter()
    s, bits = _magnitude(3)
    code, ln = dc_enc[s]
    bw.write(code, ln)
    bw.write(bits, s)
    bw.flush()
    out += bw.out

    # scan 2: AC first 1..63, Al=1: (run0,size1) value 1 at zz1, EOB0
    out += _sos([(1, 0, 1)], 1, 63, 0, 1)
    bw = _BitWriter()
    code, ln = ac_enc[0x01]
    bw.write(code, ln)
    bw.write(1, 1)          # +1
    code, ln = ac_enc[0x00]  # EOB0
    bw.write(code, ln)
    bw.flush()
    out += bw.out

    # scan 3: AC refine 1..63 Ah=1 Al=0. Band slots: zz1 history (=2),
    # zz2..zz29 zero (28 slots), placement at zz30, tail 2..63 zero →
    # EOB member afterwards? No: place at zz30 then remaining zeros →
    # EOB0 for the tail.
    out += _sos([(1, 0, 1)], 1, 63, 1, 0)
    bw = _BitWriter()
    code, ln = ac_enc[0xF0]  # ZRL: skips 16 zero-history slots
    bw.write(code, ln)
    bw.write(1, 1)           # correction bit for zz1 (2 → 3), inside window
    code, ln = ac_enc[(12 << 4) | 1]  # 12 more zeros, then place
    bw.write(code, ln)
    bw.write(0, 1)           # sign bit 0 → −1
    code, ln = ac_enc[0x00]  # EOB0 for the all-zero tail
    bw.write(code, ln)
    bw.flush()
    out += bw.out

    # scan 4: DC refine: bit 1 → DC 6|1 = 7
    out += _sos([(1, 0, 0)], 0, 0, 1, 0)
    bw = _BitWriter()
    bw.write(1, 1)
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"

    got = decode_jpeg(bytes(out))

    zz = np.zeros(64)
    zz[0], zz[1], zz[30] = 7, 3, -1
    natural = np.zeros(64)
    natural[_ZZ] = zz
    want = np.clip(np.round(
        _M.T @ natural.reshape(8, 8) @ _M + 128.0), 0, 255).astype(np.uint8)
    assert np.array_equal(got, want)


def test_progressive_rejects_inconsistent_scans():
    img = np.zeros((8, 8), np.uint8)
    good = bytearray(encode_jpeg(img, progressive=True))
    # AC scan naming two components is illegal in progressive
    data = encode_jpeg(np.zeros((8, 8, 3), np.uint8), progressive=True)
    i = data.find(b"\xff\xda", data.find(b"\xff\xda") + 2)
    bad = bytearray(data)
    # widen the second SOS (an AC scan) to two components: rebuild is
    # fiddly, so instead corrupt its Ss/Se into ss>se
    ln = struct.unpack(">H", bad[i + 2:i + 4])[0]
    bad[i + 2 + ln - 3] = 63   # Ss
    bad[i + 2 + ln - 2] = 1    # Se < Ss
    with pytest.raises(ValueError):
        decode_jpeg(bytes(bad))
    assert decode_jpeg(bytes(good)).shape == (8, 8)

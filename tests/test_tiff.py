"""From-scratch baseline TIFF codec (algorithms/tiff.py) and its
dispatch through the multimodal image path. Self-contained: goldens
are encode→decode roundtrips of this repo's own encoder plus
hand-built IFD streams for the decoder-only features the encoder
doesn't emit (bilevel, palette, WhiteIsZero, predictor 2,
FillOrder 2)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from nidaba_ray.algorithms.tiff import (
    decode_tiff,
    encode_tiff,
    is_tiff,
    packbits_decode,
    packbits_encode,
)


def _img(h, w, c=None, seed=1):
    rng = np.random.default_rng(seed)
    shape = (h, w) if c is None else (h, w, c)
    return rng.integers(0, 256, size=shape, dtype=np.uint8)


# ---------------------------------------------------------------------------
# PackBits kernel
# ---------------------------------------------------------------------------


def test_packbits_spec_example():
    # the worked example from TIFF 6.0 §9 (Apple PackBits)
    raw = bytes.fromhex("aaaaaa80002aaaaaaaaa80002a22"
                        "aaaaaaaaaaaaaaaaaaaa")
    comp = bytes.fromhex("feaa0280002afdaa0380002a22f7aa")
    # don't require OUR encoder to emit the historical packing — but
    # the decoder must accept it and the roundtrip must hold
    assert packbits_decode(comp, len(raw)) == raw
    assert packbits_decode(packbits_encode(raw), len(raw)) == raw


def test_packbits_roundtrip_property():
    rng = np.random.default_rng(3)
    for trial in range(200):
        n = int(rng.integers(0, 80))
        # low-cardinality alphabets force long runs
        row = bytes(rng.integers(0, int(rng.integers(2, 9)),
                                 size=n).astype(np.uint8))
        enc = packbits_encode(row)
        assert packbits_decode(enc, n) == row, trial


def test_packbits_long_runs_and_literals():
    # runs > 128 must split; literals > 128 must split
    row = b"\x07" * 300
    assert packbits_decode(packbits_encode(row), 300) == row
    lit = bytes(range(256)) + bytes(range(256))
    assert packbits_decode(packbits_encode(lit), len(lit)) == lit


def test_packbits_malformed():
    with pytest.raises(ValueError):
        packbits_decode(b"\x05ab", 6)  # truncated literal
    with pytest.raises(ValueError):
        packbits_decode(b"\xfe", 3)  # repeat missing its byte
    with pytest.raises(ValueError):
        packbits_decode(b"\xfdz", 2)  # 4-byte run overruns the row
    assert packbits_decode(b"\x80\x80\xffz", 2) == b"zz"  # no-ops skip


# ---------------------------------------------------------------------------
# encode → decode roundtrips (both byte orders × compressions × strips)
# ---------------------------------------------------------------------------


def test_tiff_roundtrip_matrix():
    for h, w, c in [(1, 1, None), (5, 7, None), (9, 3, 3), (16, 16, 3),
                    (4, 11, 4)]:
        a = _img(h, w, c, seed=h * 31 + w)
        for bo in ("<", ">"):
            for comp in ("none", "packbits"):
                for rps in (None, 1, 3):
                    data = encode_tiff(a, compression=comp,
                                       byte_order=bo, rows_per_strip=rps)
                    assert is_tiff(data)
                    got = decode_tiff(data)
                    assert got.shape == a.shape
                    assert np.array_equal(got, a), (h, w, c, bo, comp, rps)


def test_tiff_packbits_actually_compresses():
    flat = np.full((40, 50), 9, dtype=np.uint8)
    assert (len(encode_tiff(flat, compression="packbits"))
            < len(encode_tiff(flat)) / 10)


# ---------------------------------------------------------------------------
# hand-built streams: decoder-only features
# ---------------------------------------------------------------------------


def _build_tiff(bo, w, h, strips, entries_extra, bits=(8,), spp=1,
                photo=1, comp=1, rps=None):
    """Minimal classic-TIFF writer for decoder-only shapes the public
    encoder doesn't emit. Entries auto-include the required set."""
    body = bytearray(b"II*\x00" if bo == "<" else b"MM\x00*")
    body += struct.pack(bo + "I", 0)
    offs = []
    for s in strips:
        offs.append(len(body))
        body += s
        if len(body) % 2:
            body += b"\x00"
    entries = {
        256: (4, (w,)), 257: (4, (h,)), 258: (3, bits),
        259: (3, (comp,)), 262: (3, (photo,)),
        273: (4, tuple(offs)), 277: (3, (spp,)),
        278: (4, (rps if rps is not None else h,)),
        279: (4, tuple(len(s) for s in strips)),
    }
    entries.update(entries_extra)
    fmt = {3: "H", 4: "I"}
    items = sorted(entries.items())
    ifd_off = len(body)
    ext_off = ifd_off + 2 + 12 * len(items) + 4
    ifd = bytearray(struct.pack(bo + "H", len(items)))
    ext = bytearray()
    for tag, (typ, vals) in items:
        packed = struct.pack(bo + fmt[typ] * len(vals), *vals)
        ifd += struct.pack(bo + "HHI", tag, typ, len(vals))
        if len(packed) <= 4:
            ifd += packed.ljust(4, b"\x00")
        else:
            ifd += struct.pack(bo + "I", ext_off + len(ext))
            ext += packed
    ifd += struct.pack(bo + "I", 0)
    body[4:8] = struct.pack(bo + "I", ifd_off)
    return bytes(body + ifd + ext)


def test_tiff_bilevel_both_photometrics_and_fillorders():
    bits = np.array([[1, 0, 1, 0, 1, 0, 1, 0, 1, 1],
                     [0, 0, 1, 1, 0, 0, 1, 1, 0, 0],
                     [1, 1, 1, 1, 1, 1, 1, 1, 1, 1]], dtype=np.uint8)
    h, w = bits.shape
    for photo in (0, 1):
        for fill in (1, 2):
            rows = np.packbits(bits, axis=1,
                               bitorder="big" if fill == 1 else "little")
            data = _build_tiff("<", w, h, [rows.tobytes()],
                               {266: (3, (fill,))},
                               bits=(1,), photo=photo)
            got = decode_tiff(data)
            want = ((1 - bits) if photo == 0 else bits) * 255
            assert np.array_equal(got, want), (photo, fill)


def test_tiff_gray_white_is_zero_inverts():
    g = _img(4, 6, seed=5)
    data = _build_tiff("<", 6, 4, [g.tobytes()], {}, photo=0)
    assert np.array_equal(decode_tiff(data), 255 - g)


def test_tiff_palette_colormap():
    idx = np.array([[0, 1], [2, 255]], dtype=np.uint8)
    # 16-bit colormap planes R,G,B; entry k = (k*257, 0, 65535-k*257)
    r = tuple(k * 257 for k in range(256))
    g = tuple(0 for _ in range(256))
    b = tuple(65535 - k * 257 for k in range(256))
    data = _build_tiff("<", 2, 2, [idx.tobytes()],
                       {320: (3, r + g + b)}, photo=3)
    got = decode_tiff(data)
    assert got.shape == (2, 2, 3)
    # (k*257) >> 8 == k exactly — the 16→8 bit mapping is the identity
    want = np.stack([idx, np.zeros_like(idx), 255 - idx], axis=2)
    assert np.array_equal(got, want)


def test_tiff_predictor2_horizontal_differencing():
    a = _img(5, 9, 3, seed=11)
    # encode predictor-2 by hand: first pixel absolute, rest deltas
    diff = a.astype(np.int16)
    diff[:, 1:] = (a[:, 1:].astype(np.int16) - a[:, :-1]) % 256
    data = _build_tiff("<", 9, 5, [diff.astype(np.uint8).tobytes()],
                       {317: (3, (2,))}, bits=(8, 8, 8), spp=3, photo=2)
    assert np.array_equal(decode_tiff(data), a)


def test_tiff_big_endian_hand_built():
    g = _img(3, 5, seed=9)
    data = _build_tiff(">", 5, 3, [g.tobytes()], {})
    assert data[:2] == b"MM"
    assert np.array_equal(decode_tiff(data), g)


def test_tiff_multistrip_packbits_per_strip():
    a = _img(7, 4, seed=13)
    strips = []
    for y0 in range(0, 7, 2):
        block = a[y0:y0 + 2]
        strips.append(b"".join(packbits_encode(r.tobytes())
                               for r in block))
    data = _build_tiff("<", 4, 7, strips, {}, comp=32773, rps=2)
    assert np.array_equal(decode_tiff(data), a)


# ---------------------------------------------------------------------------
# malformed / out-of-scope input → ValueError (quarantine path)
# ---------------------------------------------------------------------------


def test_tiff_malformed_inputs():
    good = encode_tiff(_img(4, 4))
    with pytest.raises(ValueError):
        decode_tiff(b"II+\x00" + good[4:])  # bad magic
    with pytest.raises(ValueError):
        decode_tiff(good[:20])  # truncated IFD
    g = _img(2, 2)
    with pytest.raises(ValueError, match="tiled"):
        decode_tiff(_build_tiff("<", 2, 2, [g.tobytes()],
                                {322: (4, (16,)), 323: (4, (16,))}))
    with pytest.raises(ValueError, match="compression"):
        decode_tiff(_build_tiff("<", 2, 2, [g.tobytes()], {}, comp=7))
    with pytest.raises(ValueError, match="planar"):
        decode_tiff(_build_tiff("<", 2, 2, [g.tobytes()],
                                {284: (3, (2,))}))
    with pytest.raises(ValueError, match="bits-per-sample"):
        decode_tiff(_build_tiff("<", 2, 2, [g.tobytes()], {},
                                bits=(16,)))
    with pytest.raises(ValueError, match="strip out of range"):
        # StripByteCounts claims more bytes than the file holds
        decode_tiff(_build_tiff("<", 4, 4, [b"\x00" * 16],
                                {279: (4, (10**6,))}))
    with pytest.raises(ValueError, match="size mismatch"):
        decode_tiff(_build_tiff("<", 4, 4, [b"\x00" * 15], {}))
    with pytest.raises(ValueError, match="IFD offset out of range"):
        decode_tiff(good[:4] + struct.pack("<I", 10**6) + good[8:])


def test_tiff_missing_photometric():
    g = _img(2, 2)
    body = _build_tiff("<", 2, 2, [g.tobytes()], {})
    # rebuild without tag 262 via the builder's entries_extra can't
    # remove — hand-check the error through a truncated required set
    import nidaba_ray.algorithms.tiff as t
    tags = t._read_ifd(body, "<")
    del tags[262]
    with pytest.raises(ValueError, match="262"):
        t._tag(tags, 262)


# ---------------------------------------------------------------------------
# multimodal dispatch
# ---------------------------------------------------------------------------


def test_decode_image_dispatches_tiff():
    from nidaba_ray.stages.multimodal import decode_image

    g = _img(6, 8, seed=21)
    assert np.array_equal(decode_image(encode_tiff(g)), g)
    rgb = _img(6, 8, 3, seed=22)
    from nidaba_ray.algorithms.png import to_gray

    assert np.array_equal(
        decode_image(encode_tiff(rgb, compression="packbits",
                                 byte_order=">")), to_gray(rgb))


def test_synth_rotation_carries_tiff_wire():
    from nidaba_ray.stages.multimodal import ImageDecoder, synth_media_batch

    # image ids are i%3==0; wire=(i//3)%5 → i=12 is the TIFF leg
    t = synth_media_batch([0, 3, 6, 9, 12])
    payloads = t["payload"].to_pylist()
    assert is_tiff(payloads[4])
    out = ImageDecoder()(t).to_pylist()
    assert all(r["error"] == "" for r in out)
    # TIFF is lossless: the decoded mean equals the source bytes' mean
    from nidaba_ray.stages.multimodal import _bytes_for

    w, h = 32 + (12 % 4) * 16, 24 + (12 % 3) * 16
    px = np.frombuffer(_bytes_for("img12", w * h), np.uint8)
    assert out[4]["mean_px"] == pytest.approx(float(px.mean()))


# ---------------------------------------------------------------------------
# multi-page (IFD chain)
# ---------------------------------------------------------------------------


def test_tiff_multipage_roundtrip():
    from nidaba_ray.algorithms.tiff import tiff_n_pages

    pages = [_img(4 + i, 6, seed=40 + i) for i in range(3)]
    for bo in ("<", ">"):
        for comp in ("none", "packbits"):
            data = encode_tiff(pages, compression=comp, byte_order=bo,
                               rows_per_strip=2)
            assert tiff_n_pages(data) == 3
            assert tiff_n_pages(data, limit=2) == 2  # early exit
            for i, want in enumerate(pages):
                assert np.array_equal(decode_tiff(data, page=i), want), \
                    (bo, comp, i)
    # single page unchanged: page 0 default, no page 1
    one = encode_tiff(pages[0])
    assert tiff_n_pages(one) == 1
    with pytest.raises(ValueError, match="no page 1"):
        decode_tiff(one, page=1)


def test_tiff_ifd_chain_loop_detected():
    pages = [_img(3, 3, seed=50), _img(3, 3, seed=51)]
    data = bytearray(encode_tiff(pages))
    # point page 2's "next" pointer back at page 1's IFD
    from nidaba_ray.algorithms.tiff import _ifd_offsets

    offs = _ifd_offsets(bytes(data), "<")
    (n1,) = struct.unpack("<H", data[offs[1]:offs[1] + 2])
    nxt_at = offs[1] + 2 + 12 * n1
    data[nxt_at:nxt_at + 4] = struct.pack("<I", offs[0])
    from nidaba_ray.algorithms.tiff import tiff_n_pages

    with pytest.raises(ValueError, match="loops"):
        tiff_n_pages(bytes(data))


# ---------------------------------------------------------------------------
# LZW compression (TIFF 6.0 §13 — codec shared with the PDF filter)
# ---------------------------------------------------------------------------


def test_tiff_lzw_roundtrip_all_layouts():
    for shape, seed in (((20, 30), 7), ((15, 9, 3), 8), ((8, 8, 4), 9)):
        a = _img(*shape[:2], shape[2] if len(shape) > 2 else None, seed=seed)
        for pred in (1, 2):
            for rps in (None, 5):
                b = decode_tiff(encode_tiff(a, compression="lzw",
                                            predictor=pred,
                                            rows_per_strip=rps))
                assert np.array_equal(a, b), (shape, pred, rps)


def test_tiff_lzw_predictor_improves_smooth_images():
    g = np.tile(np.arange(256, dtype=np.uint8), (64, 1))
    raw = 64 * 256
    plain = len(encode_tiff(g, compression="lzw"))
    pred = len(encode_tiff(g, compression="lzw", predictor=2))
    assert pred < plain < raw
    # tag 317 travels, and the decode reverses the differencing
    assert np.array_equal(
        decode_tiff(encode_tiff(g, compression="lzw", predictor=2)), g)


def test_lzw_module_roundtrip_and_table_clear():
    import random

    from nidaba_ray.algorithms.lzw import lzw_decode, lzw_encode

    r = random.Random(13)
    for n in (0, 1, 257, 5000, 60000):  # 60k forces a mid-stream clear
        data = bytes(r.choice(b"abcd\x00\xff") for _ in range(n))
        for early in (0, 1):
            assert lzw_decode(lzw_encode(data, early), early) == data
    # the two EarlyChange variants produce different bitstreams on
    # inputs long enough to cross a width boundary
    data = bytes(range(256)) * 2
    assert lzw_encode(data, 0) != lzw_encode(data, 1)


def test_tiff_lzw_truncated_strip_raises():
    a = _img(16, 16, seed=3)
    data = bytearray(encode_tiff(a, compression="lzw"))
    # find the strip (right after the 8-byte header) and corrupt its
    # tail so the decoded length disagrees with rows*row_bytes
    data[9] ^= 0xFF
    with pytest.raises(ValueError):
        decode_tiff(bytes(data))


def test_synth_rotation_alternates_tiff_compressions():
    from nidaba_ray.stages.multimodal import ImageDecoder, synth_media_batch

    # TIFF wire ids: i%3==0 and (i//3)%5==4 → 12, 27, 42, ...
    t = synth_media_batch([12, 27])
    p12, p27 = t["payload"].to_pylist()
    assert is_tiff(p12) and is_tiff(p27)
    assert b"\x05\x00" not in p12[:2] and struct.pack("<H", 32773) in p12
    assert struct.pack("<H", 5) in p27  # LZW compression tag value
    out = ImageDecoder()(t).to_pylist()
    assert all(r["error"] == "" for r in out)


def test_tiff_deflate_roundtrip_and_legacy_code():
    import zlib

    a = _img(12, 18, 3, seed=21)
    data = encode_tiff(a, compression="deflate", predictor=2)
    assert struct.pack("<H", 8) in data
    assert np.array_equal(decode_tiff(data), a)
    # the legacy 32946 code decodes identically
    legacy = data.replace(struct.pack("<HHI", 259, 3, 1)
                          + struct.pack("<I", 8),
                          struct.pack("<HHI", 259, 3, 1)
                          + struct.pack("<I", 32946))
    assert np.array_equal(decode_tiff(legacy), a)
    with pytest.raises(ValueError, match="deflate"):
        g = _img(2, 2)
        decode_tiff(_build_tiff("<", 2, 2, [b"not-zlib!"], {}, comp=8))

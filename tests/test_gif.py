"""GIF codec tests — hand-built bitstream pins (no external imaging
library anywhere; the encoder exists so roundtrips are self-contained,
exactly the png.py / jpeg.py / avi.py pattern)."""

import struct

import numpy as np
import pytest

from nidaba_ray.algorithms.gif import (
    _lzw_decode,
    _lzw_encode,
    decode_gif,
    encode_gif,
    gif_frames,
    is_gif,
)

# 4-entry palette used by the hand-built files
_PAL4 = bytes([0, 0, 0, 255, 0, 0, 0, 255, 0, 0, 0, 255])


def _lsd(w, h, gct_size_field=1, bg=0):
    return b"GIF89a" + struct.pack("<HHBBB", w, h, 0x80 | gct_size_field,
                                   bg, 0)


def _img_block(left, top, w, h, lzw, min_code=2, packed=0):
    out = b"\x2C" + struct.pack("<HHHHB", left, top, w, h, packed)
    out += bytes([min_code])
    for i in range(0, len(lzw), 255):
        chunk = lzw[i:i + 255]
        out += bytes([len(chunk)]) + chunk
    return out + b"\x00"


def test_hand_built_bitstream_pin():
    # 2x2, 4-color, pixels [0,1,1,0]; LZW codes hand-assembled:
    # clear(4) 0 1 1 at width 3, then 0 eoi(5) at width 4 (the table
    # crosses 8 entries after the third pixel code) → LSB-first bytes
    lzw = b"\x44\x02\x05"
    gif = _lsd(2, 2) + _PAL4 + _img_block(0, 0, 2, 2, lzw) + b"\x3B"
    assert is_gif(gif)
    frames = decode_gif(gif)
    assert frames.shape == (1, 2, 2, 3)
    expect = np.array([[[0, 0, 0], [255, 0, 0]],
                       [[255, 0, 0], [0, 0, 0]]], dtype=np.uint8)
    assert np.array_equal(frames[0], expect)


def test_lzw_kwkwk_case():
    # "1111" emits code 1 then code 6 == len(table) — the KwKwK branch
    data = _lzw_encode(np.array([1, 1, 1, 1], np.uint8), 2)
    out = _lzw_decode(data, 2, 4)
    assert out.tolist() == [1, 1, 1, 1]


def test_lzw_table_reset_roundtrip():
    # enough distinct phrases to fill the 4096-entry table and force
    # the encoder's mid-stream clear; decoder must follow the reset
    rng = np.random.default_rng(7)
    data = rng.integers(0, 256, size=40_000, dtype=np.uint8)
    enc = _lzw_encode(data, 8)
    out = _lzw_decode(enc, 8, len(data))
    assert np.array_equal(out, data)


@pytest.mark.parametrize("interlace", [False, True])
@pytest.mark.parametrize("shape", [(1, 1), (2, 3), (7, 5), (16, 16),
                                   (23, 9)])
def test_gray_roundtrip(shape, interlace):
    rng = np.random.default_rng(shape[0] * 100 + shape[1])
    img = rng.integers(0, 256, size=shape, dtype=np.uint8)
    gif = encode_gif(img, interlace=interlace)
    frames = decode_gif(gif)
    assert frames.shape == (1, *shape, 3)
    # grayscale identity palette → every channel is the index
    assert np.array_equal(frames[0, :, :, 0], img)
    assert np.array_equal(frames[0, :, :, 1], img)


def test_constant_image_roundtrip():
    img = np.zeros((12, 12), np.uint8)
    assert np.array_equal(decode_gif(encode_gif(img))[0, :, :, 0], img)


def test_animation_roundtrip():
    rng = np.random.default_rng(3)
    frames = rng.integers(0, 256, size=(5, 8, 6), dtype=np.uint8)
    gif = encode_gif(frames, delay_cs=10)
    out = decode_gif(gif)
    assert out.shape == (5, 8, 6, 3)
    assert np.array_equal(out[:, :, :, 0], frames)


def test_subimage_compositing_and_disposal():
    # frame 1: full 2x2 [[0,1],[2,3]]; frame 2: 1x1 sub-image at
    # (1, 0) drawing index 2, disposal "restore to background" (2);
    # frame 3: 1x1 at (0, 1), transparent pixel (canvas unchanged
    # where transparent)
    f1 = _img_block(0, 0, 2, 2, _lzw_encode(np.array([0, 1, 2, 3],
                                                     np.uint8), 2))
    gce_disp2 = b"\x21\xF9\x04" + struct.pack("<BHB", 2 << 2, 0, 0) + b"\x00"
    f2 = _img_block(1, 0, 1, 1, _lzw_encode(np.array([2], np.uint8), 2))
    gce_transp = b"\x21\xF9\x04" + struct.pack("<BHB", 0x01, 0, 2) + b"\x00"
    f3 = _img_block(0, 1, 1, 1, _lzw_encode(np.array([2], np.uint8), 2))
    gif = (_lsd(2, 2) + _PAL4 + f1 + gce_disp2 + f2 + gce_transp + f3
           + b"\x3B")
    out = decode_gif(gif)
    assert out.shape == (3, 2, 2, 3)
    pal = np.frombuffer(_PAL4, np.uint8).reshape(4, 3)
    # frame 1 verbatim
    assert np.array_equal(out[0], pal[[[0, 1], [2, 3]]])
    # frame 2: (0,1) overwritten by index 2
    assert np.array_equal(out[1], pal[[[0, 2], [2, 3]]])
    # frame 3: disposal 2 restored (0,1) to background (index 0);
    # frame 3's own pixel is transparent → (1,0) keeps frame-1 color
    assert np.array_equal(out[2], pal[[[0, 0], [2, 3]]])


def test_disposal_restore_previous():
    # frame 2 draws over the full canvas with disposal 3; frame 3 is
    # transparent-only → shows the PRE-frame-2 canvas again
    f1 = _img_block(0, 0, 2, 1, _lzw_encode(np.array([1, 2], np.uint8), 2))
    gce_disp3 = b"\x21\xF9\x04" + struct.pack("<BHB", 3 << 2, 0, 0) + b"\x00"
    f2 = _img_block(0, 0, 2, 1, _lzw_encode(np.array([3, 3], np.uint8), 2))
    gce_transp = b"\x21\xF9\x04" + struct.pack("<BHB", 0x01, 0, 0) + b"\x00"
    f3 = _img_block(0, 0, 1, 1, _lzw_encode(np.array([0], np.uint8), 2))
    gif = (_lsd(2, 1) + _PAL4 + f1 + gce_disp3 + f2 + gce_transp + f3
           + b"\x3B")
    out = decode_gif(gif)
    pal = np.frombuffer(_PAL4, np.uint8).reshape(4, 3)
    assert np.array_equal(out[1], pal[[[3, 3]]])
    assert np.array_equal(out[2], pal[[[1, 2]]])


def test_extensions_skipped():
    comment = b"\x21\xFE\x05hello\x00"
    app = b"\x21\xFF\x0BNETSCAPE2.0\x03\x01\x00\x00\x00"
    img = _img_block(0, 0, 1, 1, _lzw_encode(np.array([1], np.uint8), 2))
    gif = _lsd(1, 1) + _PAL4 + comment + app + img + b"\x3B"
    out = decode_gif(gif)
    assert out[0, 0, 0].tolist() == [255, 0, 0]


def test_error_paths():
    img = np.zeros((2, 2), np.uint8)
    good = encode_gif(img)
    with pytest.raises(ValueError):
        decode_gif(b"NOTAGIF" + good[7:])
    with pytest.raises(ValueError):
        decode_gif(good[:20])  # truncated
    with pytest.raises(ValueError):
        decode_gif(_lsd(1, 1) + _PAL4 + b"\x3B")  # no image
    # image extends outside the logical screen
    bad = (_lsd(1, 1) + _PAL4
           + _img_block(0, 0, 2, 2,
                        _lzw_encode(np.zeros(4, np.uint8), 2)) + b"\x3B")
    with pytest.raises(ValueError):
        decode_gif(bad)
    # no color table anywhere
    nopal = (b"GIF89a" + struct.pack("<HHBBB", 1, 1, 0, 0, 0)
             + _img_block(0, 0, 1, 1,
                          _lzw_encode(np.zeros(1, np.uint8), 2)) + b"\x3B")
    with pytest.raises(ValueError):
        decode_gif(nopal)
    with pytest.raises(ValueError):
        decode_gif(_lsd(1, 1) + _PAL4 + b"\x99" + b"\x3B")  # bad block


def test_gif_frames_lazy(monkeypatch):
    import nidaba_ray.algorithms.gif as gif_mod

    frames = np.arange(6 * 4 * 4, dtype=np.uint8).reshape(6, 4, 4) % 251
    gif = encode_gif(frames)
    calls = []
    real = gif_mod._Frame.indices
    monkeypatch.setattr(gif_mod._Frame, "indices",
                        lambda self: (calls.append(1), real(self))[1])
    walked = list(gif_frames(gif))
    assert calls == []  # parse alone decodes nothing
    kept = [t() for i, t in walked if i % 3 == 0]
    assert len(calls) == 2 and len(kept) == 2
    assert np.array_equal(kept[1][:, :, 0], frames[3])


def test_gif_frames_dependent_out_of_order_replays():
    # sampling a dependent stream's thunks in REVERSE order forces
    # the replay-from-start branch; results must still match the
    # eager compositor exactly
    f1 = _img_block(0, 0, 2, 2, _lzw_encode(np.array([0, 1, 2, 3],
                                                     np.uint8), 2))
    gce = b"\x21\xF9\x04" + struct.pack("<BHB", 0x01, 0, 3) + b"\x00"
    f2 = _img_block(0, 0, 2, 2, _lzw_encode(np.array([3, 3, 3, 2],
                                                     np.uint8), 2))
    f3 = _img_block(0, 0, 2, 2, _lzw_encode(np.array([1, 1, 0, 0],
                                                     np.uint8), 2))
    gif = _lsd(2, 2) + _PAL4 + f1 + gce + f2 + gce + f3 + b"\x3B"
    want = decode_gif(gif)
    thunks = dict(gif_frames(gif))
    for i in reversed(range(len(want))):
        assert np.array_equal(thunks[i](), want[i]), i


def test_gif_frames_dependent_stream_memoized():
    # a transparent sub-frame forces the composited (stateful) path;
    # in-order thunks must replay the animation exactly
    f1 = _img_block(0, 0, 2, 2, _lzw_encode(np.array([0, 1, 2, 3],
                                                     np.uint8), 2))
    gce = b"\x21\xF9\x04" + struct.pack("<BHB", 0x01, 0, 3) + b"\x00"
    f2 = _img_block(0, 0, 2, 2, _lzw_encode(np.array([3, 3, 3, 2],
                                                     np.uint8), 2))
    gif = _lsd(2, 2) + _PAL4 + f1 + gce + f2 + b"\x3B"
    got = [t() for _, t in gif_frames(gif)]
    want = decode_gif(gif)
    assert np.array_equal(np.stack(got), want)


def test_decode_image_animated_gif_single_decode(monkeypatch):
    # the still-image path over an animated GIF composites only the
    # first frame → exactly one LZW decode
    import nidaba_ray.algorithms.gif as gif_mod
    from nidaba_ray.stages.multimodal import decode_image

    frames = np.arange(4 * 4 * 4, dtype=np.uint8).reshape(4, 4, 4) % 251
    gif = encode_gif(frames)
    calls = []
    real = gif_mod._Frame.indices
    monkeypatch.setattr(gif_mod._Frame, "indices",
                        lambda self: (calls.append(1), real(self))[1])
    out = decode_image(gif)
    assert len(calls) == 1
    assert np.array_equal(out, frames[0])
    # max_frames caps the composited prefix
    assert decode_gif(gif, max_frames=2).shape == (2, 4, 4, 3)


def test_gif_n_frames_copy_free_walk():
    from nidaba_ray.algorithms.gif import gif_n_frames

    frames = np.zeros((5, 4, 4), np.uint8)
    gif = encode_gif(frames)
    assert gif_n_frames(gif) == 5
    assert gif_n_frames(gif, limit=2) == 2  # early exit
    assert gif_n_frames(encode_gif(frames[0])) == 1
    with pytest.raises(ValueError):
        gif_n_frames(b"GIF89a\x00")  # truncated header


def test_video_sampler_quarantines_corrupt_lzw(ray_session):
    # intact GIF block framing (sniffs as 2-frame video) but the LZW
    # data is garbage — the sampler must skip the row, not crash
    import pyarrow as pa

    from nidaba_ray.stages.multimodal import (
        VideoFrameSampler,
        _is_video_payload,
    )

    good = encode_gif(np.zeros((3, 4, 4), np.uint8))
    f = _img_block(0, 0, 2, 2, b"\xff\xff")  # bad LZW bytes
    bad = _lsd(2, 2) + _PAL4 + f + f + b"\x3B"
    assert _is_video_payload(bad)
    t = pa.table({"media_id": pa.array([1, 2], pa.int64()),
                  "payload": pa.array([bad, good], pa.binary())})
    out = VideoFrameSampler(every=1)(t).to_pylist()
    assert {r["media_id"] for r in out} == {2}  # bad row skipped


def test_decode_image_dispatch():
    from nidaba_ray.stages.multimodal import decode_image

    img = np.arange(64, dtype=np.uint8).reshape(8, 8) * 3
    out = decode_image(encode_gif(img))
    assert np.array_equal(out, img)  # gray identity palette → exact

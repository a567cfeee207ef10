"""EXIF harvest (functions/exif.py): hand-built IFD blobs in both
byte orders, the APP1-in-JPEG walk, sub-IFD resolution, and the
no-EXIF / malformed contracts."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from nidaba_ray.functions.exif import exif_from_jpeg, exif_from_tiff_blob


def _entry(bo, tag, typ, count, value_or_off, inline=False):
    if inline:
        tail = struct.pack(bo + "H", value_or_off) + b"\x00\x00"
    else:
        tail = struct.pack(bo + "I", value_or_off)
    return struct.pack(bo + "HHI", tag, typ, count) + tail


def _tiff_blob(bo="<"):
    make = b"HarborCam\x00"
    dt = b"2024:05:01 10:00:00\x00"
    dto = b"2024:04:30 18:30:12\x00"
    # IFD0 at 8 with 4 entries → values start at 8 + 2 + 48 + 4 = 62
    make_off, dt_off = 62, 72
    sub_off = dt_off + len(dt)               # 92
    dto_off = sub_off + 2 + 12 + 4           # 110
    ifd0 = (struct.pack(bo + "H", 4)
            + _entry(bo, 271, 2, len(make), make_off)
            + _entry(bo, 274, 3, 1, 6, inline=True)
            + _entry(bo, 306, 2, len(dt), dt_off)
            + _entry(bo, 34665, 4, 1, sub_off)
            + struct.pack(bo + "I", 0))
    sub = (struct.pack(bo + "H", 1)
           + _entry(bo, 36867, 2, len(dto), dto_off)
           + struct.pack(bo + "I", 0))
    head = (b"II*\x00" if bo == "<" else b"MM\x00*") \
        + struct.pack(bo + "I", 8)
    return head + ifd0 + make + dt + sub + dto


@pytest.mark.parametrize("bo", ["<", ">"])
def test_tiff_blob_both_orders(bo):
    got = exif_from_tiff_blob(_tiff_blob(bo))
    assert got == {
        "make": "HarborCam",
        "orientation": 6,
        "datetime": "2024:05:01 10:00:00",
        "datetime_original": "2024:04:30 18:30:12",
    }


def test_jpeg_app1_walk():
    from nidaba_ray.algorithms.jpeg import encode_jpeg

    img = np.zeros((8, 8), dtype=np.uint8)
    plain = encode_jpeg(img)
    assert exif_from_jpeg(plain) == {}  # no APP1 → absence, not error
    blob = _tiff_blob()
    app1 = b"\xff\xe1" + struct.pack(
        ">H", 2 + 6 + len(blob)) + b"Exif\x00\x00" + blob
    tagged = plain[:2] + app1 + plain[2:]
    got = exif_from_jpeg(tagged)
    assert got["make"] == "HarborCam" and got["orientation"] == 6
    assert got["datetime_original"] == "2024:04:30 18:30:12"


def test_malformed_quarantines():
    with pytest.raises(ValueError):
        exif_from_jpeg(b"not a jpeg")
    with pytest.raises(ValueError):
        exif_from_tiff_blob(b"XXXX")
    # truncated IFD inside a valid header raises from the walker
    with pytest.raises(ValueError):
        exif_from_tiff_blob(_tiff_blob()[:20])


def test_encoder_tiff_has_no_camera_fields():
    from nidaba_ray.algorithms.tiff import encode_tiff

    img = np.zeros((4, 4), dtype=np.uint8)
    assert exif_from_tiff_blob(encode_tiff(img)) == {}

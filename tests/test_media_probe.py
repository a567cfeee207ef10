"""MP4 (ISO-BMFF) and MP3 metadata probes (algorithms/mp4.py,
algorithms/mp3.py): box/frame grammar, v0/v1 time fields, CBR/VBR,
ID3 handling, and malformed-stream quarantine."""

from __future__ import annotations

import pytest

from nidaba_ray.algorithms.mp3 import encode_mp3_frames, is_mp3, mp3_probe
from nidaba_ray.algorithms.mp4 import encode_mp4_skeleton, is_mp4, mp4_probe


def _av_tracks():
    return [
        {"kind": "vide", "codec": "avc1", "width": 640, "height": 360,
         "timescale": 30_000, "duration_ms": 4000, "n_samples": 120},
        {"kind": "soun", "codec": "mp4a", "timescale": 44_100,
         "duration_ms": 4000, "n_samples": 172},
    ]


def test_mp4_probe_two_tracks():
    payload = encode_mp4_skeleton(_av_tracks(), duration_ms=4000)
    assert is_mp4(payload)
    info = mp4_probe(payload)
    assert info["brand"] == "isom" and info["duration_ms"] == 4000
    v, a = info["tracks"]
    assert (v["kind"], v["codec"], v["width"], v["height"]) == \
        ("vide", "avc1", 640, 360)
    assert v["n_samples"] == 120 and v["duration_ms"] == 4000
    assert (a["kind"], a["codec"], a["n_samples"]) == ("soun", "mp4a", 172)
    assert a["timescale"] == 44_100


def test_mp4_v1_64bit_times():
    p0 = encode_mp4_skeleton(_av_tracks(), duration_ms=7500, version=0)
    p1 = encode_mp4_skeleton(_av_tracks(), duration_ms=7500, version=1)
    assert p1 != p0
    i0, i1 = mp4_probe(p0), mp4_probe(p1)
    assert i0["duration_ms"] == i1["duration_ms"] == 7500
    assert i0["tracks"] == i1["tracks"]


def test_mp4_malformed_quarantines():
    good = encode_mp4_skeleton(_av_tracks())
    with pytest.raises(ValueError):
        mp4_probe(b"\x00\x00\x00\x08free")  # no ftyp
    with pytest.raises(ValueError):
        mp4_probe(good[:40])  # truncated inside moov
    # box size pointing past the buffer
    bad = bytearray(good)
    bad[0] = 0xFF
    with pytest.raises(ValueError):
        mp4_probe(bytes(bad))
    assert not is_mp4(b"RIFF1234WEBP")


def test_mp3_cbr_probe():
    payload = encode_mp3_frames(38, bitrate=128, rate=44100)
    assert is_mp3(payload)
    info = mp3_probe(payload)
    assert info == {
        "container": "mp3", "version": "1", "sample_rate": 44100,
        "n_frames": 38, "duration_ms": 38 * 1152 * 1000 // 44100,
        "bitrate_kbps": 128, "mode": "cbr",
    }


def test_mp3_vbr_and_id3():
    payload = encode_mp3_frames(
        10, rate=44100, bitrates=[128, 192], id3v2=b"\x00" * 300)
    info = mp3_probe(payload)
    assert info["mode"] == "vbr" and info["n_frames"] == 10
    assert info["bitrate_kbps"] == 160  # exact integer mean
    # trailing ID3v1 accepted
    info2 = mp3_probe(payload + b"TAG" + b"\x00" * 125)
    assert info2["n_frames"] == 10


def test_mp3_mpeg2_half_rate():
    payload = encode_mp3_frames(20, bitrate=64, rate=22050, version=2)
    info = mp3_probe(payload)
    assert info["version"] == "2" and info["sample_rate"] == 22050
    assert info["duration_ms"] == 20 * 576 * 1000 // 22050


def test_mp3_malformed_quarantines():
    good = encode_mp3_frames(5)
    with pytest.raises(ValueError):
        mp3_probe(good + b"\x12\x34garbage")  # lost sync
    with pytest.raises(ValueError):
        mp3_probe(good[:-10])  # truncated final frame
    with pytest.raises(ValueError):
        mp3_probe(b"")  # no frames
    assert not is_mp3(b"fLaC....")


def test_ogg_opus_probe():
    from nidaba_ray.algorithms.ogg import encode_ogg_skeleton, is_ogg, ogg_probe

    p = encode_ogg_skeleton("opus", channels=2, rate=44100,
                            pre_skip=312, n_samples=96000)
    assert is_ogg(p)
    info = ogg_probe(p)
    assert info["codec"] == "opus" and info["channels"] == 2
    assert info["sample_rate"] == 44100 and info["pre_skip"] == 312
    assert info["n_samples"] == 96000  # 48 kHz granule clock
    assert info["duration_ms"] == 2000 and info["n_pages"] == 2


def test_ogg_vorbis_probe():
    from nidaba_ray.algorithms.ogg import encode_ogg_skeleton, ogg_probe

    p = encode_ogg_skeleton("vorbis", channels=1, rate=22050,
                            n_samples=44100)
    info = ogg_probe(p)
    assert info["codec"] == "vorbis" and info["channels"] == 1
    assert info["sample_rate"] == 22050
    assert info["duration_ms"] == 2000


def test_ogg_malformed_quarantines():
    from nidaba_ray.algorithms.ogg import encode_ogg_skeleton, ogg_probe

    good = encode_ogg_skeleton("opus")
    with pytest.raises(ValueError):
        ogg_probe(good[:-5])  # truncated body
    with pytest.raises(ValueError):
        ogg_probe(good + b"junk")  # lost sync after last page
    with pytest.raises(ValueError):
        ogg_probe(b"NotOgg")


def test_probe_media_routes_ogg():
    from nidaba_ray.algorithms.ogg import encode_ogg_skeleton
    from nidaba_ray.stages.multimodal import probe_media

    info = probe_media(encode_ogg_skeleton("opus", n_samples=48000))
    assert (info["container"], info["kind"], info["codec"]) == \
        ("ogg", "audio", "opus")
    assert info["duration_ms"] == 1000 and info["n_units"] == 48000

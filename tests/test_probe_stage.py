"""Header-only media probe (stages/multimodal.py probe_media /
MediaProbe): every real container the repo speaks reports its
container/kind/dims/duration from headers alone, agreeing with the
full decoders; malformed payloads quarantine per-row."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from nidaba_ray.stages.multimodal import MediaProbe, probe_media


def _img(w=23, h=11):
    rng = np.random.default_rng(7)
    return rng.integers(0, 255, (h, w), dtype=np.uint8)


def test_probe_image_containers():
    from nidaba_ray.algorithms.gif import encode_gif
    from nidaba_ray.algorithms.jpeg import encode_jpeg
    from nidaba_ray.algorithms.png import encode_bmp, encode_png
    from nidaba_ray.algorithms.tiff import encode_tiff
    from nidaba_ray.algorithms.webp import encode_webp

    img = _img()
    rgb = np.stack([img] * 3, axis=-1)
    for payload, container in [
        (encode_png(img), "png"),
        (encode_bmp(rgb), "bmp"),
        (encode_jpeg(img), "jpeg"),
        (encode_tiff(img), "tiff"),
        (encode_webp(img), "webp"),
        (encode_gif(img[None]), "gif"),
    ]:
        info = probe_media(payload)
        assert info["container"] == container, container
        assert (info["width"], info["height"]) == (23, 11), container
        assert info["kind"] == "image" and info["n_units"] == 1, container


def test_probe_animated_gif_is_video():
    from nidaba_ray.algorithms.gif import encode_gif

    frames = np.stack([_img(), _img() ^ 255, _img()])
    info = probe_media(encode_gif(frames))
    assert info["kind"] == "video" and info["n_units"] == 3


def test_probe_audio_containers():
    from nidaba_ray.algorithms.aiff import encode_aiff
    from nidaba_ray.algorithms.flac import encode_flac
    from nidaba_ray.algorithms.wav import encode_wav

    t = np.linspace(0, 1, 8000, endpoint=False)
    mono = (16000 * np.sin(2 * np.pi * 440 * t)).astype(np.int16)[:, None]
    for payload, container in [
        (encode_wav(mono, rate=8000), "wav"),
        (encode_aiff(mono, rate=8000), "aiff"),
        (encode_flac(mono, rate=8000), "flac"),
    ]:
        info = probe_media(payload)
        assert info["container"] == container, container
        assert info["kind"] == "audio", container
        assert info["sample_rate"] == 8000, container
        assert info["n_units"] == 8000, container
        assert info["duration_ms"] == 1000, container


def test_probe_avi_video():
    from nidaba_ray.algorithms.avi import encode_avi

    frames = np.stack([_img(16, 16) for _ in range(6)])
    info = probe_media(encode_avi(frames, fps=12))
    assert info["container"] == "avi" and info["kind"] == "video"
    # 499 not 500: avih stores int(1e6/12)=83333 µs/frame and the
    # probe truncates — header-faithful, not nominal-fps
    assert info["n_units"] == 6 and info["duration_ms"] == 499
    assert (info["width"], info["height"]) == (16, 16)


def test_probe_mp4_mp3():
    from nidaba_ray.algorithms.mp3 import encode_mp3_frames
    from nidaba_ray.algorithms.mp4 import encode_mp4_skeleton

    mp4 = encode_mp4_skeleton(
        [{"kind": "vide", "codec": "avc1", "width": 320, "height": 240,
          "n_samples": 90, "duration_ms": 3000},
         {"kind": "soun", "codec": "mp4a", "timescale": 48000,
          "n_samples": 140}],
        duration_ms=3000)
    info = probe_media(mp4)
    assert info["container"] == "mp4" and info["kind"] == "video"
    assert info["codec"] == "avc1" and info["duration_ms"] == 3000
    assert (info["width"], info["height"]) == (320, 240)
    assert info["sample_rate"] == 48000 and info["n_units"] == 90

    info = probe_media(encode_mp3_frames(19, bitrate=96, rate=32000))
    assert (info["container"], info["kind"], info["codec"]) == \
        ("mp3", "audio", "mp3")
    assert info["n_units"] == 19


def test_probe_stage_batch_and_quarantine(ray_session):
    from nidaba_ray.algorithms.png import encode_png
    from nidaba_ray.stages.registry import get_stage, list_stages

    assert "media.probe" in list_stages()
    batch = pa.table({
        "media_id": pa.array([0, 1, 2], pa.int64()),
        "payload": pa.array(
            [encode_png(_img()), b"\x00garbage\xff" * 4, b""],
            pa.binary()),
    })
    out = MediaProbe()(batch)
    assert out["container"].to_pylist() == ["png", "", ""]
    errs = out["error"].to_pylist()
    assert errs[0] == "" and errs[1] != "" and errs[2] != ""


def test_probe_agrees_with_decoders():
    """Dims/duration from headers must equal the full decode."""
    from nidaba_ray.algorithms.jpeg import decode_jpeg, encode_jpeg
    from nidaba_ray.algorithms.wav import decode_wav, encode_wav
    from nidaba_ray.stages.multimodal import decode_image

    img = _img(37, 29)
    payload = encode_jpeg(img)
    info = probe_media(payload)
    h, w = decode_image(payload).shape
    assert (info["width"], info["height"]) == (w, h)

    mono = np.zeros((4410, 1))
    wav = encode_wav(mono, rate=44100)
    samples, rate = decode_wav(wav)
    info = probe_media(wav)
    assert info["n_units"] == len(samples) and info["sample_rate"] == rate


def test_media_triage_example_spec(ray_session):
    """examples/media_triage.yaml: the probe as a compiled spec over a
    mixed media table (mp4 + png + corrupt row)."""
    import ray.data as rd

    from nidaba_ray.algorithms.mp4 import encode_mp4_skeleton
    from nidaba_ray.algorithms.png import encode_png
    from nidaba_ray.stages import registry

    spec = registry.load_spec("examples/media_triage.yaml")
    t = pa.table({
        "media_id": pa.array([0, 1, 2], pa.int64()),
        "payload": pa.array([
            encode_mp4_skeleton([{"kind": "soun", "codec": "mp4a",
                                  "n_samples": 5}]),
            encode_png(_img()),
            b"\x00junk",
        ], pa.binary()),
    })
    out = (registry.compile_pipeline(rd.from_arrow(t), spec)
           .to_pandas().sort_values("media_id"))
    assert out["container"].tolist() == ["mp4", "png", ""]
    assert out["kind"].tolist() == ["audio", "image", ""]
    assert (out["error"] != "").tolist() == [False, False, True]

"""Perceptual audio dedup: fingerprint determinism, gain and
container invariance (the same PCM in WAV, AIFF and AIFF-sowt hashes
identically; half volume hashes identically), near-dup proximity
under small noise, and the distributed exact/near passes over the
shared Hamming machinery."""
from __future__ import annotations

import numpy as np
import pyarrow as pa

from nidaba_ray.functions.audiodedup import (
    AudioFingerprinter,
    audio_dhash64,
    audio_exact_dup_groups,
    audio_near_dup_pairs,
    audio_spectral64,
)


def _tone(n=4000, rate=8000, f0=440.0, amp=0.5):
    t = np.arange(n) / rate
    # amplitude envelope gives the energy hash real structure
    env = 0.2 + 0.8 * np.abs(np.sin(2 * np.pi * t * 0.7))
    return (np.sin(2 * np.pi * f0 * t) * env * amp)


def test_fingerprint_determinism_and_gain_invariance():
    s = _tone()
    assert audio_dhash64(s) == audio_dhash64(s.copy())
    assert audio_spectral64(s) == audio_spectral64(s.copy())
    # uniform gain: energy comparisons are scale-invariant (×0.5 and
    # ×2 are exact binary scalings, so quantization can't flip ties)
    assert audio_dhash64(s) == audio_dhash64(s * 0.5) == audio_dhash64(s * 2.0)
    # different pitch and envelope → a different spectral hash
    other = _tone(f0=1800.0) * np.linspace(1, 0.1, 4000)
    assert audio_spectral64(other) != audio_spectral64(s)
    # short clips repeat-pad deterministically
    short = _tone(n=30)
    assert audio_dhash64(short) == audio_dhash64(short)


def test_container_invariance_wav_aiff_sowt():
    from nidaba_ray.algorithms.aiff import encode_aiff
    from nidaba_ray.algorithms.wav import encode_wav
    from nidaba_ray.stages.multimodal import decode_audio

    pcm = (np.clip(_tone(), -1, 1) * 32767).astype(np.int16)
    wav = encode_wav(pcm, rate=8000)
    aiff = encode_aiff(pcm, rate=8000)
    sowt = encode_aiff(pcm, rate=8000, compression="sowt")
    hashes = {audio_dhash64(decode_audio(p)[0]) for p in (wav, aiff, sowt)}
    assert len(hashes) == 1
    shashes = {audio_spectral64(decode_audio(p)[0])
               for p in (wav, aiff, sowt)}
    assert len(shashes) == 1


def test_near_dup_under_noise():
    s = _tone()
    rng = np.random.default_rng(8)
    noisy = s + rng.normal(0, 0.002, len(s))
    x = np.uint64(audio_dhash64(s)) ^ np.uint64(audio_dhash64(noisy))
    assert bin(int(x)).count("1") <= 6


def _media(rows):
    return pa.table({
        "media_id": pa.array([r[0] for r in rows], pa.int64()),
        "kind": pa.array(["audio"] * len(rows), pa.string()),
        "payload": pa.array([r[1] for r in rows], pa.binary()),
    })


def test_distributed_groups_and_pairs(ray_session):
    import ray.data as rd

    from nidaba_ray.algorithms.aiff import encode_aiff
    from nidaba_ray.algorithms.wav import encode_wav

    pcm = (np.clip(_tone(), -1, 1) * 32767).astype(np.int16)
    rng = np.random.default_rng(9)
    noisy = (np.clip(_tone() + rng.normal(0, 0.002, 4000), -1, 1)
             * 32767).astype(np.int16)
    other = (np.clip(_tone(f0=2500.0)[::-1] * np.linspace(0.05, 1, 4000),
                     -1, 1) * 32767).astype(np.int16)
    rows = [
        (1, encode_wav(pcm, rate=8000)),
        (2, encode_aiff(pcm, rate=8000)),       # same PCM, other container
        (3, encode_wav(noisy, rate=8000)),
        (4, encode_wav(other, rate=8000)),
        (5, b"not audio"),
    ]
    media = rd.from_arrow(_media(rows))
    groups = audio_exact_dup_groups(media).to_pandas()
    gmap = dict(zip(groups["media_id"], groups["group_id"]))
    assert gmap[1] == gmap[2] == 1       # cross-container exact dup
    assert 5 not in gmap
    pairs = audio_near_dup_pairs(media, max_hamming=6).to_pandas()
    pairset = set(zip(pairs["id_a"], pairs["id_b"]))
    assert (1, 2) in pairset and (1, 3) in pairset
    assert not any(4 in p for p in pairset)


def test_over_full_synth_media_corpus(ray_session):
    from nidaba_ray.functions.audiodedup import audio_hash_table
    from nidaba_ray.pipelines.media import media_dataset

    ht = audio_hash_table(media_dataset("/root/testdata/sf0.001")).to_pandas()
    assert (ht["error"] == "").all() and len(ht) > 100

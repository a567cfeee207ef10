"""MPEG-1/2/2.5 Layer III (MP3) metadata probe — header-only triage
from the public frame-header grammar (ISO/IEC 11172-3 §2.4 header
fields; the bitrate/sample-rate index tables are the spec's published
constants for Layer III). Audio DECODE is out of scope by design: the
Layer III Huffman codebooks are arbitrary published tables that cannot
be re-derived from rules (the MP3/Vorbis verdict in docs/NEXT.md) —
but duration/bitrate/sample-rate triage only needs the 4-byte frame
headers, which carry everything.

Walk: skip an ID3v2 prefix (synchsafe size), then step frame to frame
by computed frame length — CBR and VBR alike (each frame declares its
own bitrate). A trailing ID3v1 block ('TAG', 128 bytes) is accepted;
any other non-frame bytes raise ValueError (quarantine contract).
Layers I/II are recognized but rejected by name — web MP3s are
Layer III, and a silent mis-parse would be worse than a named error.
"""

from __future__ import annotations

__all__ = ["is_mp3", "mp3_probe", "encode_mp3_frames"]

# Layer III bitrate tables (kbps), index 1..14; 0 = free, 15 = bad.
_BITRATE_V1_L3 = (0, 32, 40, 48, 56, 64, 80, 96, 112,
                  128, 160, 192, 224, 256, 320)
_BITRATE_V2_L3 = (0, 8, 16, 24, 32, 40, 48, 56, 64,
                  80, 96, 112, 128, 144, 160)
# sample-rate tables by version bits (11=MPEG1, 10=MPEG2, 00=MPEG2.5)
_RATES = {3: (44100, 48000, 32000),
          2: (22050, 24000, 16000),
          0: (11025, 12000, 8000)}
_VERSION_NAME = {3: "1", 2: "2", 0: "2.5"}


def _id3v2_size(payload: bytes) -> int:
    """Bytes to skip for an ID3v2 prefix (0 if absent)."""
    if payload[:3] != b"ID3" or len(payload) < 10:
        return 0
    if any(b & 0x80 for b in payload[6:10]):
        raise ValueError("mp3: non-synchsafe ID3v2 size")
    size = (payload[6] << 21) | (payload[7] << 14) \
        | (payload[8] << 7) | payload[9]
    return 10 + size


def _frame_header(payload: bytes, pos: int):
    """Parse one header → (frame_len, samples, rate, bitrate_kbps)
    or None when pos doesn't start a syncword."""
    if pos + 4 > len(payload):
        return None
    b0, b1, b2, _b3 = payload[pos:pos + 4]
    if b0 != 0xFF or (b1 & 0xE0) != 0xE0:
        return None
    version = (b1 >> 3) & 0x3
    layer = (b1 >> 1) & 0x3
    if version == 1:
        raise ValueError("mp3: reserved MPEG version")
    if layer != 1:  # 01 = Layer III
        raise ValueError(f"mp3: unsupported layer index {layer}")
    br_idx = (b2 >> 4) & 0xF
    sr_idx = (b2 >> 2) & 0x3
    padding = (b2 >> 1) & 0x1
    if br_idx in (0, 15) or sr_idx == 3:
        raise ValueError("mp3: free/bad bitrate or reserved rate")
    rate = _RATES[version][sr_idx]
    if version == 3:  # MPEG1
        bitrate = _BITRATE_V1_L3[br_idx]
        samples = 1152
        flen = 144_000 * bitrate // rate + padding
    else:  # MPEG2 / 2.5: 576-sample granule, half the slot count
        bitrate = _BITRATE_V2_L3[br_idx]
        samples = 576
        flen = 72_000 * bitrate // rate + padding
    return flen, samples, rate, bitrate, version


def is_mp3(payload: bytes) -> bool:
    """Sniff: ID3v2 prefix (probe still validates the frames), or a
    valid Layer III syncword at byte 0."""
    if payload[:3] == b"ID3" and len(payload) >= 10:
        return True
    try:
        return _frame_header(payload, 0) is not None
    except ValueError:
        return False


def mp3_probe(payload: bytes) -> dict:
    """Walk every frame → {container, version, sample_rate, n_frames,
    duration_ms, bitrate_kbps, mode} where mode is 'cbr'/'vbr' (by
    distinct per-frame bitrates) and bitrate_kbps the exact integer
    mean over frames (kbit·frames summed before the one division)."""
    pos = _id3v2_size(payload)
    n_frames = 0
    total_samples = 0
    kbps_sum = 0
    kbps_set: set[int] = set()
    rate = 0
    version = -1
    end = len(payload)
    while pos < end:
        if payload[pos:pos + 3] == b"TAG" and end - pos == 128:
            break  # trailing ID3v1
        hdr = _frame_header(payload, pos)
        if hdr is None:
            raise ValueError(f"mp3: lost sync at byte {pos}")
        flen, samples, frate, kbps, fver = hdr
        if pos + flen > end:
            raise ValueError("mp3: truncated final frame")
        if n_frames and frate != rate:
            raise ValueError("mp3: sample-rate change mid-stream")
        rate, version = frate, fver
        n_frames += 1
        total_samples += samples
        kbps_sum += kbps
        kbps_set.add(kbps)
        pos += flen
    if n_frames == 0:
        raise ValueError("mp3: no frames")
    return {
        "container": "mp3",
        "version": _VERSION_NAME[version],
        "sample_rate": rate,
        "n_frames": n_frames,
        "duration_ms": total_samples * 1000 // rate,
        "bitrate_kbps": kbps_sum // n_frames,
        "mode": "cbr" if len(kbps_set) == 1 else "vbr",
    }


def encode_mp3_frames(n_frames: int, bitrate: int = 128,
                      rate: int = 44100, version: int = 3,
                      id3v2: bytes = b"",
                      bitrates: list[int] | None = None) -> bytes:
    """Valid-header frames with zero audio bodies (tests/synth).
    ``bitrates`` overrides per-frame bitrate for VBR streams."""
    table = _BITRATE_V1_L3 if version == 3 else _BITRATE_V2_L3
    sr_idx = _RATES[version].index(rate)
    out = bytearray()
    if id3v2:
        body = id3v2
        size = len(body)
        out += b"ID3\x04\x00\x00" + bytes([
            (size >> 21) & 0x7F, (size >> 14) & 0x7F,
            (size >> 7) & 0x7F, size & 0x7F]) + body
    for i in range(n_frames):
        kbps = (bitrates[i % len(bitrates)] if bitrates else bitrate)
        br_idx = table.index(kbps)
        if version == 3:
            flen = 144_000 * kbps // rate
        else:
            flen = 72_000 * kbps // rate
        hdr = bytes([
            0xFF,
            0xE0 | (version << 3) | (1 << 1) | 1,  # layer III, no CRC
            (br_idx << 4) | (sr_idx << 2),
            0xC4,  # mono, no emphasis bits set meaningfully
        ])
        out += hdr + b"\x00" * (flen - 4)
    return bytes(out)

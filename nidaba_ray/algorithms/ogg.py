"""Ogg container metadata probe — header-only triage for the open
web-audio family (RFC 3533 page framing; Opus RFC 7845 and Vorbis I
identification headers). Audio DECODE stays out of scope by the
published-table rule (Opus/Vorbis codebooks — see docs/NEXT.md); the
triage fields live entirely in page headers and the first
identification packet:

* page walk: 27-byte header ("OggS", version 0, type flags, 64-bit
  granule position, serial, sequence, CRC, segment count) + lacing
  table; CRC is NOT verified (a probe reads structure, it does not
  certify payloads — same stance as the MP4 probe).
* codec id from the first page's packet head: "OpusHead" (channels,
  pre-skip, input rate; granule clock is ALWAYS 48 kHz per RFC 7845),
  ``\\x01vorbis`` (channels, rate), ``\\x7fFLAC`` (Ogg-FLAC mapping).
* duration from the LAST page's granule position of the first audio
  stream: Opus subtracts pre-skip and divides by 48000; Vorbis
  divides by the id-header rate.

``encode_ogg_skeleton`` builds minimal valid streams for tests.
Malformed structure raises ValueError (the quarantine contract)."""

from __future__ import annotations

import struct

__all__ = ["is_ogg", "ogg_probe", "encode_ogg_skeleton"]


def is_ogg(payload: bytes) -> bool:
    return payload[:4] == b"OggS"


def _pages(payload: bytes):
    """Yield (serial, granule, is_first, body) per page."""
    pos = 0
    end = len(payload)
    while pos < end:
        if payload[pos:pos + 4] != b"OggS":
            raise ValueError(f"ogg: lost page sync at byte {pos}")
        if pos + 27 > end:
            raise ValueError("ogg: truncated page header")
        version = payload[pos + 4]
        if version != 0:
            raise ValueError(f"ogg: unknown stream version {version}")
        flags = payload[pos + 5]
        granule = struct.unpack("<q", payload[pos + 6:pos + 14])[0]
        serial = struct.unpack("<I", payload[pos + 14:pos + 18])[0]
        nsegs = payload[pos + 26]
        lacing = payload[pos + 27:pos + 27 + nsegs]
        if len(lacing) != nsegs:
            raise ValueError("ogg: truncated lacing table")
        body_len = sum(lacing)
        body_start = pos + 27 + nsegs
        if body_start + body_len > end:
            raise ValueError("ogg: truncated page body")
        yield serial, granule, bool(flags & 0x02), \
            payload[body_start:body_start + body_len]
        pos = body_start + body_len


def ogg_probe(payload: bytes) -> dict:
    """→ {container, codec, channels, sample_rate, pre_skip,
    duration_ms, n_pages}; fields the codec id doesn't carry stay 0."""
    if not is_ogg(payload):
        raise ValueError("ogg: no OggS capture pattern")
    codec = ""
    channels = 0
    rate = 0
    pre_skip = 0
    first_serial = None
    last_granule = 0
    n_pages = 0
    for serial, granule, is_first, body in _pages(payload):
        n_pages += 1
        if is_first and first_serial is None:
            first_serial = serial
            if body[:8] == b"OpusHead":
                codec = "opus"
                channels = body[9]
                pre_skip = struct.unpack("<H", body[10:12])[0]
                rate = struct.unpack("<I", body[12:16])[0]
            elif body[:7] == b"\x01vorbis":
                codec = "vorbis"
                channels = body[11]
                rate = struct.unpack("<I", body[12:16])[0]
            elif body[:5] == b"\x7fFLAC":
                codec = "flac"
        if serial == first_serial and granule > 0:
            last_granule = max(last_granule, granule)
    if n_pages == 0:
        raise ValueError("ogg: no pages")
    if codec == "opus":
        n_samples = max(0, last_granule - pre_skip)  # 48 kHz clock
        duration_ms = n_samples * 1000 // 48000
    elif codec == "vorbis" and rate:
        n_samples = last_granule
        duration_ms = n_samples * 1000 // rate
    else:
        n_samples = 0
        duration_ms = 0
    return {"container": "ogg", "codec": codec, "channels": channels,
            "sample_rate": rate, "pre_skip": pre_skip,
            "duration_ms": duration_ms, "n_samples": n_samples,
            "n_pages": n_pages}


def _page(serial: int, seq: int, granule: int, flags: int,
          body: bytes) -> bytes:
    segs = []
    rest = len(body)
    while rest >= 255:
        segs.append(255)
        rest -= 255
    segs.append(rest)
    return (b"OggS" + bytes([0, flags])
            + struct.pack("<qII", granule, serial, seq)
            + struct.pack("<I", 0)  # CRC unverified by the probe
            + bytes([len(segs)]) + bytes(segs) + body)


def encode_ogg_skeleton(codec: str = "opus", channels: int = 2,
                        rate: int = 48000, pre_skip: int = 312,
                        n_samples: int = 96000,
                        serial: int = 0x1234) -> bytes:
    """Minimal valid Ogg stream: id-header page (BOS) + one data page
    carrying the final granule position (EOS)."""
    if codec == "opus":
        head = (b"OpusHead" + bytes([1, channels])
                + struct.pack("<HIhB", pre_skip, rate, 0, 0))
        final_granule = pre_skip + n_samples
    elif codec == "vorbis":
        head = (b"\x01vorbis" + struct.pack("<I", 0)
                + bytes([channels]) + struct.pack("<I", rate)
                + b"\x00" * 13)
        final_granule = n_samples
    else:
        raise ValueError(f"unsupported skeleton codec {codec!r}")
    return (_page(serial, 0, 0, 0x02, head)
            + _page(serial, 1, final_granule, 0x04, b"\x00" * 40))

"""ISO-BMFF (MP4/MOV) metadata probe — header-only triage for the
dominant web video container, from the public ISO/IEC 14496-12 box
grammar. Frame DECODE is out of scope by design: the payload codecs
(H.264/H.265/AAC) need licensed arithmetic decoders that cannot be
rebuilt from memory with confidence (the WebP-lossy/Brotli verdict in
docs/NEXT.md) — but at 100 TB the triage question ("how long, what
codec, what dimensions, is it worth shipping to a decode farm?") only
needs the moov metadata tree, which is pure public structure.

Box walk: 32-bit big-endian size + fourcc; size==1 → 64-bit
largesize; size==0 → to end of enclosing box. Versioned full boxes
(mvhd/tkhd/mdhd) handle both v0 (32-bit times) and v1 (64-bit).
Malformed structure raises ValueError (the per-row quarantine
contract). ``encode_mp4_skeleton`` builds minimal valid streams for
tests (and doubles as the synthetic video-metadata source)."""

from __future__ import annotations

import struct

__all__ = ["is_mp4", "mp4_probe", "encode_mp4_skeleton"]


def is_mp4(payload: bytes) -> bool:
    return len(payload) >= 12 and payload[4:8] == b"ftyp"


def _boxes(data: bytes, pos: int, end: int):
    """Yield (fourcc, body_start, body_end) for sibling boxes."""
    while pos + 8 <= end:
        size = int.from_bytes(data[pos:pos + 4], "big")
        btype = data[pos + 4:pos + 8]
        hdr = 8
        if size == 1:
            if pos + 16 > end:
                raise ValueError("mp4: truncated largesize box")
            size = int.from_bytes(data[pos + 8:pos + 16], "big")
            hdr = 16
        elif size == 0:
            size = end - pos
        if size < hdr or pos + size > end:
            raise ValueError("mp4: box size out of bounds")
        yield btype, pos + hdr, pos + size
        pos += size
    if pos != end:
        raise ValueError("mp4: trailing bytes inside box")


def _children(data: bytes, span: tuple[int, int]) -> dict[bytes, list]:
    out: dict[bytes, list] = {}
    for t, s, e in _boxes(data, span[0], span[1]):
        out.setdefault(t, []).append((s, e))
    return out


def _full(data: bytes, s: int) -> tuple[int, int]:
    """(version, payload offset after version/flags word)."""
    return data[s], s + 4


def _mvhd(data: bytes, span) -> tuple[int, int]:
    v, p = _full(data, span[0])
    if v == 1:
        timescale = int.from_bytes(data[p + 16:p + 20], "big")
        duration = int.from_bytes(data[p + 20:p + 28], "big")
    else:
        timescale = int.from_bytes(data[p + 8:p + 12], "big")
        duration = int.from_bytes(data[p + 12:p + 16], "big")
    if timescale == 0:
        raise ValueError("mp4: zero mvhd timescale")
    return timescale, duration


def _tkhd(data: bytes, span) -> tuple[int, int, int]:
    """(track_id, width_px, height_px) — width/height are 16.16."""
    v, p = _full(data, span[0])
    track_id = int.from_bytes(
        data[p + (16 if v == 1 else 8):][:4], "big")
    # width/height are the LAST 8 bytes of the box either version
    w = int.from_bytes(data[span[1] - 8:span[1] - 4], "big") >> 16
    h = int.from_bytes(data[span[1] - 4:span[1]], "big") >> 16
    return track_id, w, h


def _mdhd(data: bytes, span) -> tuple[int, int]:
    v, p = _full(data, span[0])
    if v == 1:
        timescale = int.from_bytes(data[p + 16:p + 20], "big")
        duration = int.from_bytes(data[p + 20:p + 28], "big")
    else:
        timescale = int.from_bytes(data[p + 8:p + 12], "big")
        duration = int.from_bytes(data[p + 12:p + 16], "big")
    if timescale == 0:
        raise ValueError("mp4: zero mdhd timescale")
    return timescale, duration


def mp4_probe(payload: bytes) -> dict:
    """Parse the metadata tree → {brand, duration_ms, tracks: [{id,
    kind, codec, width, height, timescale, duration_ms, n_samples}]}.
    ``kind`` is the hdlr handler ('vide'/'soun'/...), ``codec`` the
    first stsd sample-entry fourcc, ``n_samples`` the stsz count."""
    if not is_mp4(payload):
        raise ValueError("mp4: no ftyp at start")
    top = _children(payload, (0, len(payload)))
    brand = payload[top[b"ftyp"][0][0]:top[b"ftyp"][0][0] + 4].decode(
        "latin-1")
    if b"moov" not in top:
        raise ValueError("mp4: no moov box")
    moov = _children(payload, top[b"moov"][0])
    if b"mvhd" not in moov:
        raise ValueError("mp4: no mvhd box")
    timescale, duration = _mvhd(payload, moov[b"mvhd"][0])
    tracks = []
    for tspan in moov.get(b"trak", []):
        trak = _children(payload, tspan)
        track_id, w, h = _tkhd(payload, trak[b"tkhd"][0])
        mdia = _children(payload, trak[b"mdia"][0])
        mts, mdur = _mdhd(payload, mdia[b"mdhd"][0])
        hs, _he = mdia[b"hdlr"][0]
        kind = payload[hs + 8:hs + 12].decode("latin-1")
        stbl = _children(
            payload, _children(payload, mdia[b"minf"][0])[b"stbl"][0])
        ss, _se = stbl[b"stsd"][0]
        n_entries = int.from_bytes(payload[ss + 4:ss + 8], "big")
        codec = (payload[ss + 12:ss + 16].decode("latin-1")
                 if n_entries else "")
        n_samples = 0
        if b"stsz" in stbl:
            zs, _ze = stbl[b"stsz"][0]
            n_samples = int.from_bytes(payload[zs + 8:zs + 12], "big")
        tracks.append({
            "id": track_id, "kind": kind, "codec": codec,
            "width": w, "height": h, "timescale": mts,
            "duration_ms": mdur * 1000 // mts,
            "n_samples": n_samples,
        })
    return {
        "container": "mp4", "brand": brand,
        "duration_ms": duration * 1000 // timescale,
        "tracks": tracks,
    }


# ---------------------------------------------------------------------------
# Skeleton encoder (tests + synthetic corpora)
# ---------------------------------------------------------------------------

def _box(name: bytes, body: bytes) -> bytes:
    return struct.pack(">I", 8 + len(body)) + name + body


def _full_box(name: bytes, version: int, body: bytes) -> bytes:
    return _box(name, bytes([version, 0, 0, 0]) + body)


def encode_mp4_skeleton(tracks: list[dict], duration_ms: int = 4000,
                        timescale: int = 1000,
                        brand: bytes = b"isom",
                        version: int = 0) -> bytes:
    """Minimal valid ISO-BMFF stream: ftyp + moov(mvhd + trak…) +
    empty mdat. Each track dict: kind ('vide'/'soun'), codec (4 chars),
    width/height (px), timescale, duration_ms, n_samples. ``version``
    selects v0 (32-bit) or v1 (64-bit) time fields in mvhd/mdhd."""
    def times(ts: int, dur: int) -> bytes:
        if version == 1:
            return struct.pack(">QQIQ", 0, 0, ts, dur)
        return struct.pack(">IIII", 0, 0, ts, dur)

    moov_body = _full_box(
        b"mvhd", version,
        times(timescale, duration_ms * timescale // 1000)
        + struct.pack(">I", 0x00010000) + struct.pack(">H", 0x0100)
        + b"\x00" * 10 + _UNITY_MATRIX + b"\x00" * 24
        + struct.pack(">I", len(tracks) + 1))
    for i, t in enumerate(tracks, start=1):
        mts = t.get("timescale", 1000)
        mdur = t.get("duration_ms", duration_ms) * mts // 1000
        tkhd = _full_box(
            b"tkhd", 0,
            struct.pack(">IIII", 0, 0, i, 0)
            + struct.pack(">I", duration_ms * timescale // 1000)
            + b"\x00" * 8 + struct.pack(">hhhh", 0, 0, 0, 0)
            + _UNITY_MATRIX
            + struct.pack(">II", t.get("width", 0) << 16,
                          t.get("height", 0) << 16))
        mdhd = _full_box(b"mdhd", version,
                         times(mts, mdur) + struct.pack(">HH", 0x55C4, 0))
        hdlr = _full_box(
            b"hdlr", 0,
            struct.pack(">I", 0) + t["kind"].encode("latin-1")
            + b"\x00" * 12 + b"probe\x00")
        entry = _box(t["codec"].encode("latin-1"), b"\x00" * 78)
        stsd = _full_box(b"stsd", 0, struct.pack(">I", 1) + entry)
        stsz = _full_box(b"stsz", 0,
                         struct.pack(">II", 0, t.get("n_samples", 0)))
        stbl = _box(b"stbl", stsd + stsz)
        minf = _box(b"minf", stbl)
        mdia = _box(b"mdia", mdhd + hdlr + minf)
        moov_body += _box(b"trak", tkhd + mdia)
    return (_box(b"ftyp", brand + struct.pack(">I", 0) + brand)
            + _box(b"moov", moov_body) + _box(b"mdat", b""))


_UNITY_MATRIX = struct.pack(">9i", 0x00010000, 0, 0,
                            0, 0x00010000, 0,
                            0, 0, 0x40000000)

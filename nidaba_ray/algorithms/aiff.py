"""AIFF / AIFF-C audio codec — from-scratch, public-spec only (Apple
"Audio Interchange File Format 1.3" on the EA IFF 85 container; same
build-from-spec approach as :mod:`nidaba_ray.algorithms.wav`, which
documents the little-endian RIFF sibling). No external audio libs.

Decode supports the variants that cover real-world AIFF files:

* AIFF PCM: big-endian SIGNED 8/16/24/32-bit (note 8-bit AIFF is
  signed where 8-bit WAV is unsigned — a classic codec trap)
* AIFF-C ``NONE`` (BE PCM), ``sowt`` (byte-swapped, i.e. LE, 16-bit
  PCM — the common Mac-OS-X flavor), ``fl32``/``FL32`` and ``fl64``
  (big-endian IEEE floats)

The COMM sample rate is an 80-bit IEEE 754 extended float (sign,
15-bit exponent, explicit-integer-bit 64-bit mantissa) — parsed and
written exactly. IFF chunks are big-endian sized with the odd-size
pad byte; unknown chunks skip; malformed payloads raise ``ValueError``
(the actor stages' per-row quarantine contract). The encoder exists
so tests are self-contained exact roundtrips for integer PCM."""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["encode_aiff", "decode_aiff", "is_aiff"]


def is_aiff(payload: bytes) -> bool:
    return payload[:4] == b"FORM" and payload[8:12] in (b"AIFF", b"AIFC")


def _pack_extended(rate: float) -> bytes:
    """float → 80-bit IEEE extended (the COMM sampleRate field)."""
    if rate <= 0:
        raise ValueError("sample rate must be positive")
    m, e = np.frexp(rate)  # rate = m * 2**e, m in [0.5, 1)
    exponent = int(e) + 16382
    mantissa = int(m * (1 << 64))  # integer bit explicit
    return struct.pack(">HQ", exponent, mantissa)


def _unpack_extended(b: bytes) -> float:
    if len(b) != 10:
        raise ValueError("sampleRate field is not 10 bytes")
    exponent, mantissa = struct.unpack(">HQ", b)
    sign = -1.0 if exponent & 0x8000 else 1.0
    exponent &= 0x7FFF
    if exponent == 0 and mantissa == 0:
        return 0.0
    if exponent == 0x7FFF:
        raise ValueError("non-finite sample rate")
    return sign * mantissa * 2.0 ** (exponent - 16383 - 63)


def encode_aiff(samples: np.ndarray, rate: int = 16000,
                compression: str = "none") -> bytes:
    """Serialize samples to AIFF (plain) or AIFF-C.

    ``samples`` is (frames,) or (frames, channels); dtype picks the
    wire width: int8/int16/int32 → PCM. ``compression``: ``"none"``
    (plain AIFF, BE), ``"sowt"`` (AIFF-C byte-swapped 16-bit),
    ``"fl32"``/``"fl64"`` (AIFF-C floats, input float32/float64)."""
    s = np.asarray(samples)
    if s.ndim == 1:
        s = s[:, None]
    if s.ndim != 2:
        raise ValueError("samples must be (frames,) or (frames, channels)")
    comp = compression.lower()
    if comp in ("none", "sowt"):
        if s.dtype not in (np.int8, np.int16, np.int32):
            raise ValueError(f"PCM encode needs int8/16/32, got {s.dtype}")
        bits = s.dtype.itemsize * 8
        if comp == "sowt":
            if s.dtype != np.int16:
                raise ValueError("sowt is 16-bit only")
            data = s.astype("<i2").tobytes(order="C")
        else:
            data = s.astype(s.dtype.newbyteorder(">")).tobytes(order="C")
    elif comp in ("fl32", "fl64"):
        want = np.float32 if comp == "fl32" else np.float64
        if s.dtype != want:
            raise ValueError(f"{comp} encode needs {want.__name__}")
        bits = s.dtype.itemsize * 8
        data = s.astype(s.dtype.newbyteorder(">")).tobytes(order="C")
    else:
        raise ValueError(f"unsupported compression {compression!r}")

    n_frames, n_ch = s.shape
    comm = struct.pack(">HIH", n_ch, n_frames, bits) + _pack_extended(rate)
    form_type = b"AIFF"
    if comp != "none":
        # AIFF-C: compressionType + pstring name (even-padded INSIDE
        # the chunk: pstring counts length byte + text, pad to even)
        cid = {"sowt": b"sowt", "fl32": b"fl32", "fl64": b"fl64"}[comp]
        name = cid  # descriptive name, content is free-form
        pstr = bytes([len(name)]) + name
        if len(pstr) % 2:
            pstr += b"\x00"
        comm += cid + pstr
        form_type = b"AIFC"

    def chunk(cid: bytes, body: bytes) -> bytes:
        return cid + struct.pack(">I", len(body)) + body + (
            b"\x00" if len(body) % 2 else b"")

    body = form_type
    if form_type == b"AIFC":
        body += chunk(b"FVER", struct.pack(">I", 0xA2805140))
    body += chunk(b"COMM", comm)
    body += chunk(b"SSND", struct.pack(">II", 0, 0) + data)
    return b"FORM" + struct.pack(">I", len(body)) + body


def decode_aiff(payload: bytes) -> tuple[np.ndarray, int]:
    """AIFF/AIFF-C bytes → ((frames, channels) float64 in [-1, 1],
    sample_rate). ValueError on malformed input."""
    if not is_aiff(payload):
        raise ValueError("not an AIFF payload")
    is_aifc = payload[8:12] == b"AIFC"
    pos, end = 12, len(payload)
    comm: bytes | None = None
    sound: bytes | None = None
    while pos + 8 <= end:
        cid = payload[pos:pos + 4]
        (size,) = struct.unpack(">I", payload[pos + 4:pos + 8])
        body = payload[pos + 8:pos + 8 + size]
        if len(body) < size:
            raise ValueError(f"truncated {cid!r} chunk")
        if cid == b"COMM":
            comm = body
        elif cid == b"SSND":
            if len(body) < 8:
                raise ValueError("SSND chunk too short")
            offset, _block = struct.unpack(">II", body[:8])
            sound = body[8 + offset:]
        pos += 8 + size + (size % 2)  # IFF pad byte on odd chunks
    if comm is None or sound is None:
        raise ValueError("missing COMM or SSND chunk")
    if len(comm) < 18:
        raise ValueError("COMM chunk too short")
    n_ch, n_frames, bits = struct.unpack(">HIH", comm[:8])
    rate = _unpack_extended(comm[8:18])
    if n_ch == 0:
        raise ValueError("zero channels")
    comp = b"NONE"
    if is_aifc:
        if len(comm) < 22:
            raise ValueError("AIFC COMM missing compressionType")
        comp = comm[18:22]

    width = (bits + 7) // 8
    need = n_frames * n_ch * width
    if len(sound) < need:
        raise ValueError("SSND data shorter than COMM frame count")
    data = sound[:need]

    if comp in (b"NONE", b"sowt", b"twos"):
        endian = "<" if comp == b"sowt" else ">"
        if bits == 8:
            flat = np.frombuffer(data, np.int8).astype(np.float64) / 128.0
        elif bits == 16:
            flat = np.frombuffer(data, f"{endian}i2").astype(np.float64) / 32768.0
        elif bits == 24:
            b3 = np.frombuffer(data, np.uint8).reshape(-1, 3).astype(np.int32)
            if comp == b"sowt":
                val = b3[:, 0] | (b3[:, 1] << 8) | (b3[:, 2] << 16)
            else:
                val = (b3[:, 0] << 16) | (b3[:, 1] << 8) | b3[:, 2]
            val = (val ^ 0x800000) - 0x800000
            flat = val.astype(np.float64) / 8388608.0
        elif bits == 32:
            flat = np.frombuffer(data, f"{endian}i4").astype(np.float64) / 2147483648.0
        else:
            raise ValueError(f"unsupported AIFF PCM width {bits}")
    elif comp in (b"fl32", b"FL32"):
        flat = np.frombuffer(data, ">f4").astype(np.float64)
    elif comp in (b"fl64", b"FL64"):
        flat = np.frombuffer(data, ">f8").astype(np.float64)
    else:
        raise ValueError(f"unsupported AIFF-C compression {comp!r}")

    r = int(round(rate))
    if r <= 0:
        raise ValueError("non-positive sample rate")
    return flat.reshape(-1, n_ch), r

"""AVI/RIFF video container codec — from-scratch, public-spec only
(the Microsoft "AVI RIFF File Reference" layout: RIFF 'AVI ' →
LIST 'hdrl' {avih, LIST 'strl' {strh, strf}} → LIST 'movi' → idx1),
the same build-from-spec approach as :mod:`nidaba_ray.algorithms.wav`
(RIFF chunk walk) and :mod:`.png` / :mod:`.jpeg`. No external video
libraries.

Two frame codecs cover the public uncompressed/IJG lineage:

* **MJPG** (Motion-JPEG): every ``00dc`` chunk is a standalone
  baseline JPEG stream, decoded by the repo's own ITU T.81 codec
  (:func:`nidaba_ray.algorithms.jpeg.decode_jpeg`).
* **DIB** (``BI_RGB`` uncompressed): every ``00db`` chunk is a
  bottom-up Windows DIB — 8-bit palettized (palette from ``strf``) or
  24-bit BGR — rows padded to 4-byte boundaries.

Frames decode to ``(h, w)`` grayscale uint8 via the repo's integer
BT.601 luma (:func:`nidaba_ray.algorithms.png.to_gray`), keeping the
media feature path deterministic. The parse is lazy-friendly:
:func:`parse_avi` returns raw frame chunks so a sampler can decode
only every k-th frame (the 100 TB frame-sampling shape — unsampled
MJPG frames never pay the IDCT). Malformed/truncated payloads raise
``ValueError`` — the actor stages' per-row quarantine contract.

Reference parity: nidaba has no video path at all (Celery/leptonica
OCR system); this module exists for the driver brief's multimodal
requirement, composed from the public AVI spec.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["is_avi", "encode_avi", "decode_avi", "parse_avi",
           "decode_frame"]

_BI_RGB = 0
_FOURCC_MJPG = struct.unpack("<I", b"MJPG")[0]


def is_avi(payload: bytes) -> bool:
    return payload[:4] == b"RIFF" and payload[8:12] == b"AVI "


# ---------------------------------------------------------------- encode

def _chunk(cid: bytes, body: bytes) -> bytes:
    """RIFF chunk: id + size + body + pad byte when the size is odd."""
    return (cid + struct.pack("<I", len(body)) + body
            + (b"\x00" if len(body) % 2 else b""))


def _list(ltype: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", ltype + body)


def _dib_rows(frame: np.ndarray) -> bytes:
    """8-bit grayscale frame → bottom-up DIB pixel data, 4-byte row
    stride (the BITMAPINFOHEADER contract)."""
    h, w = frame.shape
    stride = (w + 3) & ~3
    rows = np.zeros((h, stride), np.uint8)
    rows[:, :w] = frame
    return rows[::-1].tobytes()


def encode_avi(frames: np.ndarray, fps: int = 12, codec: str = "MJPG",
               quality: int = 90) -> bytes:
    """Serialize (n, h, w) uint8 grayscale frames to an AVI stream.

    ``codec`` picks the wire format: ``"MJPG"`` (each frame a baseline
    JPEG at ``quality``, lossy) or ``"DIB "`` (uncompressed 8-bit
    palettized bottom-up DIB, exact roundtrip). Writes a spec-complete
    single-stream file: avih + strh/strf, movi, and an idx1 index."""
    f = np.asarray(frames)
    if f.ndim != 3 or f.dtype != np.uint8:
        raise ValueError("frames must be (n, h, w) uint8")
    n, h, w = f.shape
    if n == 0:
        raise ValueError("empty frame list")
    if fps <= 0:
        raise ValueError("fps must be positive")
    if codec == "MJPG":
        from nidaba_ray.algorithms.jpeg import encode_jpeg

        datas = [encode_jpeg(fr, quality=quality) for fr in f]
        cid, handler = b"00dc", b"MJPG"
        compression, bitcount, palette = _FOURCC_MJPG, 24, b""
    elif codec == "DIB ":
        datas = [_dib_rows(fr) for fr in f]
        cid, handler = b"00db", b"DIB "
        compression, bitcount = _BI_RGB, 8
        # 256-entry grayscale palette, RGBQUAD = (B, G, R, reserved)
        palette = b"".join(struct.pack("<BBBB", i, i, i, 0)
                           for i in range(256))
    else:
        raise ValueError(f"unsupported codec {codec!r}")

    buf_max = max(len(d) for d in datas)
    avih = struct.pack(
        "<IIIIIIIIII4I",
        1_000_000 // fps,   # dwMicroSecPerFrame
        buf_max * fps,      # dwMaxBytesPerSec
        0,                  # dwPaddingGranularity
        0x10,               # dwFlags = AVIF_HASINDEX
        n, 0, 1,            # dwTotalFrames, dwInitialFrames, dwStreams
        buf_max,            # dwSuggestedBufferSize
        w, h, 0, 0, 0, 0)   # dwWidth, dwHeight, dwReserved[4]
    strh = struct.pack(
        "<4s4sIHHIIIIIIII4h",
        b"vids", handler,
        0, 0, 0, 0,         # flags, priority, language, initial frames
        1, fps,             # dwScale / dwRate → fps frames per second
        0, n,               # dwStart, dwLength (in frames)
        buf_max, 0xFFFFFFFF, 0,   # buffer, quality (default), samplesize
        0, 0, w, h)         # rcFrame
    strf = struct.pack(
        "<IiiHHIIiiII",
        40, w, h,           # biSize, biWidth, biHeight (bottom-up)
        1, bitcount,        # biPlanes, biBitCount
        compression,        # biCompression (BI_RGB or FOURCC)
        len(datas[0]),      # biSizeImage (informational)
        0, 0,               # biXPelsPerMeter, biYPelsPerMeter
        256 if palette else 0, 0,  # biClrUsed, biClrImportant
    ) + palette

    hdrl = _list(b"hdrl", _chunk(b"avih", avih)
                 + _list(b"strl", _chunk(b"strh", strh)
                         + _chunk(b"strf", strf)))
    # movi data + idx1 offsets (relative to the 'movi' fourcc, the
    # convention consumers expect)
    movi_body = b""
    idx_entries = []
    for d in datas:
        idx_entries.append((cid, len(d), 4 + len(movi_body)))
        movi_body += _chunk(cid, d)
    movi = _list(b"movi", movi_body)
    idx1 = _chunk(b"idx1", b"".join(
        ck + struct.pack("<III", 0x10, off, sz)   # AVIIF_KEYFRAME
        for ck, sz, off in idx_entries))
    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body


# ---------------------------------------------------------------- decode

def _walk(data: bytes, pos: int, end: int):
    """Yield (chunk_id, body_start, body_size) over a RIFF chunk run;
    odd-sized chunks carry the spec's pad byte."""
    while pos + 8 <= end:
        cid = data[pos:pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4:pos + 8])
        if pos + 8 + size > end:
            raise ValueError(f"truncated {cid!r} chunk")
        yield cid, pos + 8, size
        pos += 8 + size + (size % 2)


def _parse_hdrl(data: bytes, start: int, size: int) -> dict:
    info: dict = {}
    for cid, off, sz in _walk(data, start, start + size):
        if cid == b"avih":
            if sz < 40:
                raise ValueError("avih chunk too short")
            usec, _, _, _, total, _, _, _, w, h = struct.unpack(
                "<IIIIIIIIII", data[off:off + 40])
            info.update(width=w, height=h, total_frames=total,
                        usec_per_frame=usec,
                        fps=(1_000_000 / usec if usec else 0.0))
        elif cid == b"LIST" and data[off:off + 4] == b"strl":
            for scid, soff, ssz in _walk(data, off + 4, off + sz):
                if scid == b"strh":
                    if ssz < 8:
                        raise ValueError("strh chunk too short")
                    ftype, handler = struct.unpack(
                        "<4s4s", data[soff:soff + 8])
                    if ftype != b"vids":
                        break  # audio/text stream — not ours
                    info["handler"] = handler
                elif scid == b"strf" and info.get("handler") is not None:
                    if ssz < 40:
                        raise ValueError("strf BITMAPINFOHEADER too short")
                    (_, bw, bh, _, bits, comp, _, _, _, clr_used,
                     _) = struct.unpack("<IiiHHIIiiII", data[soff:soff + 40])
                    info.update(bits=bits, compression=comp,
                                bmp_w=bw, bmp_h=bh)
                    if bits == 8:
                        n_pal = clr_used or 256
                        pal = data[soff + 40:soff + 40 + 4 * n_pal]
                        if len(pal) < 4 * n_pal:
                            raise ValueError("truncated strf palette")
                        q = np.frombuffer(pal, np.uint8).reshape(-1, 4)
                        b, g, r = (q[:, 0].astype(np.int64),
                                   q[:, 1].astype(np.int64),
                                   q[:, 2].astype(np.int64))
                        lut = ((299 * r + 587 * g + 114 * b) // 1000
                               ).astype(np.uint8)
                        info["palette"] = np.concatenate(
                            [lut, np.zeros(256 - len(lut), np.uint8)]
                        ) if len(lut) < 256 else lut
    return info


def _collect_frames(data: bytes, start: int, size: int,
                    out: list[bytes]) -> None:
    """Gather video frame chunks (``##db``/``##dc``) from a movi list
    body, recursing into nested LIST 'rec ' groups."""
    for cid, off, sz in _walk(data, start, start + size):
        if cid == b"LIST" and data[off:off + 4] == b"rec ":
            _collect_frames(data, off + 4, sz - 4, out)
        elif (cid[2:4] in (b"db", b"dc")
              and cid[0:1].isdigit() and cid[1:2].isdigit()):
            out.append(data[off:off + sz])


def parse_avi(payload: bytes) -> tuple[dict, list[bytes]]:
    """AVI bytes → (stream info, raw frame chunks in movi order).

    Frames stay undecoded so callers sampling every k-th frame skip
    the per-frame JPEG cost entirely; pass each raw chunk to
    :func:`decode_frame`. ValueError on malformed input."""
    if not is_avi(payload):
        raise ValueError("not a RIFF AVI payload")
    info: dict = {}
    frames: list[bytes] = []
    for cid, off, size in _walk(payload, 12, len(payload)):
        if cid != b"LIST":
            continue  # idx1 / JUNK — not needed for a full scan
        ltype = payload[off:off + 4]
        if ltype == b"hdrl":
            info = _parse_hdrl(payload, off + 4, size - 4)
        elif ltype == b"movi":
            _collect_frames(payload, off + 4, size - 4, frames)
    if not info.get("handler"):
        raise ValueError("no video stream header (strh 'vids')")
    if not frames:
        raise ValueError("no frame chunks in movi list")
    return info, frames


def decode_frame(raw: bytes, info: dict) -> np.ndarray:
    """One raw movi chunk → (h, w) grayscale uint8."""
    comp = info.get("compression", _BI_RGB)
    if comp == _FOURCC_MJPG:
        from nidaba_ray.algorithms.jpeg import decode_jpeg
        from nidaba_ray.algorithms.png import to_gray

        return to_gray(decode_jpeg(raw))
    if comp != _BI_RGB:
        raise ValueError(f"unsupported biCompression 0x{comp:08x}")
    w, h = info["bmp_w"], abs(info["bmp_h"])
    bottom_up = info["bmp_h"] > 0
    bits = info["bits"]
    if bits == 8:
        stride = (w + 3) & ~3
        if len(raw) < stride * h:
            raise ValueError("truncated DIB frame")
        rows = np.frombuffer(raw[:stride * h], np.uint8).reshape(h, stride)
        img = rows[::-1, :w] if bottom_up else rows[:, :w]
        pal = info.get("palette")
        return pal[img] if pal is not None else img.copy()
    if bits == 24:
        stride = (3 * w + 3) & ~3
        if len(raw) < stride * h:
            raise ValueError("truncated DIB frame")
        rows = np.frombuffer(raw[:stride * h], np.uint8).reshape(h, stride)
        if bottom_up:
            rows = rows[::-1]
        bgr = rows[:, :3 * w].reshape(h, w, 3).astype(np.int64)
        b, g, r = bgr[:, :, 0], bgr[:, :, 1], bgr[:, :, 2]
        return ((299 * r + 587 * g + 114 * b) // 1000).astype(np.uint8)
    raise ValueError(f"unsupported DIB bit depth {bits}")


def decode_avi(payload: bytes) -> tuple[np.ndarray, float]:
    """AVI bytes → ((n, h, w) grayscale uint8, fps). Convenience
    full decode; frame-sampling callers use parse_avi/decode_frame."""
    info, raws = parse_avi(payload)
    frames = [decode_frame(r, info) for r in raws]
    h, w = frames[0].shape
    if any(f.shape != (h, w) for f in frames):
        raise ValueError("frame dimensions vary within one stream")
    return np.stack(frames), float(info.get("fps", 0.0))
